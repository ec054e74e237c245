from pl_bert_tpu.preprocess.shard_engine import process_dataset  # noqa: F401
from pl_bert_tpu.preprocess.phonemize import (  # noqa: F401
    EspeakBackend,
    IdentityG2P,
    get_g2p_backend,
    phonemize_text,
    separate_text_into_segments,
)
from pl_bert_tpu.preprocess.pipeline import (  # noqa: F401
    main_clean,
    main_diacritize,
    main_phonemize,
    standardize_text,
)
