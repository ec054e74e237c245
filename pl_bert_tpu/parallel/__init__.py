from pl_bert_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
    zero1_shardings,
)
