from gritlm_tpu.ops.attention import multi_head_attention  # noqa: F401
from gritlm_tpu.ops.pooling import pool  # noqa: F401
