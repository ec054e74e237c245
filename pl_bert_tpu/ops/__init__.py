from pl_bert_tpu.ops.masked_ce import masked_phoneme_loss  # noqa: F401
from pl_bert_tpu.ops.attention import fused_attention, pallas_supported  # noqa: F401
