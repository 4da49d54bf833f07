from gritlm_tpu.utils.profiling import device_sync, timed, trace  # noqa: F401
