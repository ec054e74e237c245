from pl_bert_tpu.utils.profiler import profile_trace, maybe_profile  # noqa: F401
