#!/usr/bin/env bash
# Migration demo: continue a REFERENCE (torch) PL-BERT run on TPU.
#
# 1. fabricates a reference-format step_N.pth checkpoint using the
#    actual reference model classes (stand-in for a real run's artifact,
#    e.g. the published 1M-step checkpoint);
# 2. packs a corpus into the memory-mapped training store;
# 3. warm-starts TPU training from the .pth via
#    model_params.pretrained_model (loud name+shape validation);
# 4. exports the continued run back to an HF AlbertModel for StyleTTS.
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
torch.save(
    {"net": m.state_dict(), "step": 100000, "epoch": 3, "optimizer": {}},
    "$WORK/reference_step_100000.pth",
)
print("saved $WORK/reference_step_100000.pth")
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
  pretrained_model: "$WORK/reference_step_100000.pth"
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
    --checkpoint "$WORK/reference_step_100000.pth"

echo "== 4. continue the reference run on TPU (warm-start from .pth) =="
python -m pl_bert_tpu.training.train --config_path "$WORK/config.yml" \
    --run_name migrated

echo "== 5. score the continued run =="
python -m pl_bert_tpu.training.evaluate --config_path "$WORK/config.yml" \
    --checkpoint "$WORK/ckpt/migrated"

echo "== 6. export the continued run for StyleTTS =="
python -m pl_bert_tpu.export.cli \
    --checkpoint_path "$WORK/ckpt/migrated/step_10" \
    --config_path "$WORK/config.yml" \
    --output_dir "$WORK/hf_export"

echo "migration complete: artifacts in $WORK"
