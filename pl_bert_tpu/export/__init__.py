from pl_bert_tpu.export.to_hf import (  # noqa: F401
    export_checkpoint,
    flax_encoder_to_hf_state_dict,
    hf_state_dict_to_flax_encoder,
    load_pl_bert_model,
)
