from pl_bert_tpu.training.train_step import (  # noqa: F401
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from pl_bert_tpu.training.checkpoint import (  # noqa: F401
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from pl_bert_tpu.training.metrics import MetricsLogger  # noqa: F401
