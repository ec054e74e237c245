from pl_bert_tpu.data.masking import (  # noqa: F401
    MaskingParams,
    WholeWordMasker,
    mask_sample_reference_parity,
)
from pl_bert_tpu.data.dataset import (  # noqa: F401
    MaskedPhonemeDataset,
    TruncatedTextDataset,
)
from pl_bert_tpu.data.collate import collate_fixed, Batch  # noqa: F401
from pl_bert_tpu.data.packed_store import (  # noqa: F401
    MemmapPackedDataset,
    MemmapPackedSequenceDataset,
    is_packed_store,
    open_packed_store,
    write_packed_store,
)
from pl_bert_tpu.data.pipeline import build_dataloader, DataPipeline  # noqa: F401
