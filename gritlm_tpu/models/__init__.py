from gritlm_tpu.models.transformer import (  # noqa: F401
    KVCache,
    forward,
    forward_lm,
    init_cache,
    init_params,
)
