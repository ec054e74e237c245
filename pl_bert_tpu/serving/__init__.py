"""Online serving: dynamic batching + HTTP front-end over PhonemeEncoder."""

from pl_bert_tpu.serving.batcher import DynamicBatcher, QueueFull  # noqa: F401
from pl_bert_tpu.serving.client import (  # noqa: F401
    ServerOverloaded,
    ServingClient,
    ServingError,
)
from pl_bert_tpu.serving.pool import ReplicaPool  # noqa: F401
