"""Pallas flash attention for TPU.

Blockwise online-softmax attention with a `causal: bool` flag, padding masks
and an absolute-position `offset` for decode — the build's primary native
kernel (replaces the reference's flash-attn CUDA dependency, SURVEY §2.2).

Until the kernel lands, callers fall back to the jnp reference path via
NotImplementedError (gritlm_tpu.ops.attention.multi_head_attention).
"""

from __future__ import annotations

from typing import Optional

import jax


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    padding_mask: Optional[jax.Array],
    *,
    causal: bool,
    sliding_window: Optional[int] = None,
    offset: int | jax.Array = 0,
) -> jax.Array:
    raise NotImplementedError("Pallas flash attention kernel not yet implemented")
