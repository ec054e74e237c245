"""pl_bert_tpu — a TPU-native phoneme-level BERT (PL-BERT) framework.

A from-scratch JAX/Flax/Pallas/pjit rebuild of the capabilities of
Fadi987/PL-BERT (reference: /root/reference): Arabic Wikipedia text
normalization, espeak-ng phonemization, whole-word phoneme-span masking,
shared-layer ALBERT masked-phoneme pretraining, and HF-compatible export
for StyleTTS consumption.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):

    text/        symbol table, normalization, converters, tokenizers
    preprocess/  sharded corpus pipeline (clean → phonemize → diacritize)
    data/        masking datasets, fixed-shape collation, device feed
    models/      Flax ALBERT encoder + prediction heads
    ops/         Pallas/XLA kernels: fused attention, masked CE
    parallel/    mesh construction + sharding rules (dp × tp over ICI)
    training/    train loop, optimizer, checkpoints, metrics
    export/      JAX ↔ HuggingFace AlbertModel interop
    runtime/     native (C++) host-side hot paths
"""

__version__ = "0.4.0"

from pl_bert_tpu.text.symbols import symbols, CharacterIndexer  # noqa: F401
