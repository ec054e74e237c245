from pl_bert_tpu.models.albert import (  # noqa: F401
    AlbertConfig,
    AlbertModel,
    MultiTaskModel,
    PhonemeOnlyModel,
    build_model,
)
