#!/bin/bash
# On-chip A/B adoption batch (round 4). Runs every queued measurement from
# rounds 3-4 against the real TPU, bounded per item, and archives each
# result into BENCH_LEDGER.jsonl so a later tunnel death cannot lose the
# evidence (VERDICT round 3, next-round item 6).
#
# Usage: bash tools/onchip_batch.sh [logdir] [item ...]
#   logdir defaults to /tmp/onchip_logs; with item names only those run
#   (e.g. `bash tools/onchip_batch.sh /tmp/onchip_logs infer servload`).
# Safe to re-run: each item overwrites its own log and appends a fresh
# ledger row (the ledger is append-only history, newest row wins).
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/onchip_logs}"
shift $(( $# > 0 ? 1 : 0 ))
ONLY=("$@")
mkdir -p "$LOGDIR"
LEDGER=BENCH_LEDGER.jsonl
SHA=$(git rev-parse --short HEAD)

run_item () {
  local name="$1" tmo="$2"; shift 2
  if [ "${#ONLY[@]}" -gt 0 ]; then
    local found=0
    for o in "${ONLY[@]}"; do [ "$o" = "$name" ] && found=1; done
    [ "$found" = 1 ] || return 0
  fi
  local log="$LOGDIR/$name.log"
  echo "=== [$name] $* (timeout ${tmo}s) ==="
  timeout "$tmo" env "${ENVV[@]:-DUMMY=1}" "$@" >"$log" 2>&1
  local rc=$?
  # archive the last JSON object line (bench tools end with one)
  python - "$name" "$log" "$SHA" "$rc" <<'EOF'
import json, sys, time
name, log, sha, rc = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
last = None
try:
    for line in open(log, errors="replace"):
        s = line.strip()
        if s.startswith("{") and s.endswith("}"):
            try:
                last = json.loads(s)
            except ValueError:
                pass
except OSError:
    pass
row = {"mode": name, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
       "sha": sha, "rc": rc, "result": last}
with open("BENCH_LEDGER.jsonl", "a") as f:
    f.write(json.dumps(row) + "\n")
print(f"[{name}] rc={rc} -> {json.dumps(last)[:300] if last else 'NO JSON'}")
EOF
}

ENVV=(DUMMY=1)
run_item gate      2400 python bench.py --gate
run_item default   2400 python bench.py
run_item fused_ln  3600 python tools/bench_fused_ln.py
# fused grapheme-head CE is the default since round 4; mtbase forces
# the chunked path for the A/B
ENVV=(PLBERT_FUSED_LM_HEAD=0)
run_item mtbase    2400 python bench.py --multitask
ENVV=(DUMMY=1)
run_item mtfused   2400 python bench.py --multitask
run_item infer     2400 python bench.py --inference
run_item bucketlat 2400 python tools/measure_bucket_latency.py
run_item servload  2400 python tools/bench_serving.py
run_item servflat  2400 python tools/bench_serving.py --flat_batching
run_item servpipe  2400 python tools/bench_serving.py --pipeline_depth 2
run_item servhttp  2400 python tools/bench_serving.py --http
# round-4 HTTP transport work: keep-alive client (in servhttp above,
# same json wire format as the round-4 adoption row) vs binary payloads
run_item servb64   2400 python tools/bench_serving.py --http --encoding b64
run_item servb16   2400 python tools/bench_serving.py --http --encoding b64 --dtype float16
run_item mtrun     7200 python tools/run_integrated_multitask.py
run_item accum     2400 python bench.py --accum
run_item packed    2400 python bench.py --packed
# round-5 additions (VERDICT r4 items 3, 4, 6)
run_item production 2400 python bench.py --production
# round-5 session-4: grapheme-head gather capacity A/B (config knob
# lm_head_capacity; 144 = 4.8 sigma, zero fallbacks expected; 128 =
# 3.9 sigma, ~3.5% of batches take the exact full-length cond fallback)
ENVV=(PLBERT_LM_CAPACITY=144)
run_item mtcap144  2400 python bench.py --multitask
ENVV=(PLBERT_LM_CAPACITY=128)
run_item mtcap128  2400 python bench.py --multitask
ENVV=(DUMMY=1)
run_item shardkernels 3600 python tools/compile_shard_kernels.py
run_item servreload 2400 python tools/bench_serving.py --http --reload_mid
ENVV=(PLBERT_TPU_TESTS=1)
run_item hwtests   3600 python -m pytest tests/test_tpu_hardware.py -q --no-header
ENVV=(DUMMY=1)
echo "=== batch complete; ledger tail: ==="
tail -n 20 "$LEDGER"
