"""Online serving: dynamic batching + HTTP front-end over PhonemeEncoder."""

from pl_bert_tpu.serving.batcher import DynamicBatcher  # noqa: F401
