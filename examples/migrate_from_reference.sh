#!/usr/bin/env bash
# Migration demo: continue a REFERENCE (torch) PL-BERT run on TPU.
#
# 1. fabricates a reference-format step_N.pth checkpoint — torch AdamW
#    state included — using the actual reference model classes (stand-in
#    for a real run's artifact, e.g. the published 1M-step checkpoint);
# 2. packs a corpus into the memory-mapped training store;
# 3. scores the torch checkpoint as-is (evaluate CLI reads .pth);
# 4. converts it into a resumable orbax run dir (full optimizer state,
#    so the continued run has no Adam re-warm bump) — for a params-only
#    warm start instead, point model_params.pretrained_model at the .pth;
# 5. the trainer RESUMES it like one of its own checkpoints;
# 6. scores the continued run and exports it to HF AlbertModel for
#    StyleTTS.
#
# Needs the reference checkout at /root/reference (for step 1 only).
set -euo pipefail

WORK="${1:-/tmp/pl_bert_migrate}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
rm -rf "$WORK" && mkdir -p "$WORK"

echo "== 1. fabricate a reference-format checkpoint (torch, reference classes) =="
python - <<PY
import sys, torch
sys.path.insert(0, "/root/reference")
from transformers import AlbertConfig, AlbertModel
import model as ref_model  # the reference's model.py

torch.manual_seed(0)
cfg = AlbertConfig(
    vocab_size=188, hidden_size=256, num_attention_heads=4,
    intermediate_size=512, max_position_embeddings=512,
    num_hidden_layers=4, embedding_size=128,
)
m = ref_model.PhonemeOnlyModel(AlbertModel(cfg), num_phonemes=188,
                               hidden_size=256)
# a couple of real AdamW steps so the checkpoint carries genuine
# optimizer state (exp_avg / exp_avg_sq / step), like any mid-run save
opt = torch.optim.AdamW(m.parameters(), lr=1e-4)
ids = torch.randint(0, 188, (2, 64))
for _ in range(2):
    loss = m(ids).float().pow(2).mean()
    opt.zero_grad(); loss.backward(); opt.step()
torch.save(
    {"net": m.state_dict(), "step": 6, "epoch": 0,
     "optimizer": opt.state_dict()},
    "$WORK/reference_step_6.pth",
)
print("saved $WORK/reference_step_6.pth (with AdamW state)")
PY

echo "== 2. corpus -> packed store =="
cat > "$WORK/config.yml" <<YML
preprocess_params:
  num_shards: 2
  max_workers: 2
  max_try_count: 1
  timeout: 120
  preprocess_dir: "$WORK/prep"
  cleaned_output_dir: "cleaned"
  g2p_backend: "identity"
training_params:
  output_dir: "$WORK/ckpt"
  batch_size: 4
  save_interval: 10
  log_interval: 2
  num_steps: 10
  learning_rate: 1e-4
  training_dataset: "$WORK/prep/cleaned.phonemized.packed"
  mixed_precision: "fp32"
dataset_params:
  max_seq_length: 512
  ondevice_masking: true
model_params:
  hidden_size: 256
  num_attention_heads: 4
  intermediate_size: 512
  max_position_embeddings: 512
  num_hidden_layers: 4
  embedding_size: 128
YML
cat > "$WORK/base_corpus.txt" <<'TXT'
ولد الكاتب عام 1986 في مدينة كبيرة، وكان يحب القراءة منذ الصغر.
العلم نور والجهل ظلام، والقراءة مفتاح المعرفة لكل إنسان.
ذهب الطفل إلى المدرسة صباحا، وعاد إلى البيت مساء وهو سعيد.
كتب 3 رسائل إلى أصدقائه القدامى في المدينة البعيدة جدا.
TXT
# 40 articles so the reference's 95/5 split semantics (int(0.05*N))
# leave a non-empty validation set for the evaluate steps below
for _ in $(seq 1 10); do cat "$WORK/base_corpus.txt"; done > "$WORK/corpus.txt"
python -m pl_bert_tpu.preprocess.pipeline --config_path "$WORK/config.yml" \
    --local_dataset_path "$WORK/corpus.txt" --stage clean
python -m pl_bert_tpu.preprocess.pipeline --config_path "$WORK/config.yml" \
    --stage phonemize --dataset_path "$WORK/prep/cleaned"
python -m pl_bert_tpu.preprocess.pipeline --config_path "$WORK/config.yml" \
    --stage pack --dataset_path "$WORK/prep/cleaned.phonemized"

echo "== 3. score the reference checkpoint as-is (no training needed) =="
python -m pl_bert_tpu.training.evaluate --config_path "$WORK/config.yml" \
    --checkpoint "$WORK/reference_step_6.pth"

echo "== 4. convert .pth -> resumable orbax checkpoint (AdamW moments included) =="
python -m pl_bert_tpu.export.from_torch --pth "$WORK/reference_step_6.pth" \
    --config_path "$WORK/config.yml" --run_dir "$WORK/ckpt/migrated"

echo "== 5. the trainer resumes the reference run (steps 7..10) =="
python -m pl_bert_tpu.training.train --config_path "$WORK/config.yml" \
    --run_name migrated

echo "== 6. score the continued run =="
python -m pl_bert_tpu.training.evaluate --config_path "$WORK/config.yml" \
    --checkpoint "$WORK/ckpt/migrated"

echo "== 7. export the continued run for StyleTTS =="
python -m pl_bert_tpu.export.cli \
    --checkpoint_path "$WORK/ckpt/migrated/step_10" \
    --config_path "$WORK/config.yml" \
    --output_dir "$WORK/hf_export"

echo "migration complete: artifacts in $WORK"
