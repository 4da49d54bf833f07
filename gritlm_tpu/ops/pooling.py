"""Sequence pooling for embeddings.

Semantics match the reference GritLM.pooling (gritlm/gritlm.py:188-218):
  - cls:           first token hidden state
  - lasttoken:     hidden state at the last position with mask==1 (robust to
                   left-pads and empty sequences via clamp-to-0)
  - mean:          masked mean over the sequence
  - weightedmean:  position-weighted mean (mask *= cumsum(mask))

All reductions accumulate in float32 regardless of input dtype (the reference
casts masks with .float(); bf16 sums over 512 tokens lose ~2 decimal digits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

POOLING_METHODS = ("cls", "lasttoken", "mean", "weightedmean")


def pool(hidden: jax.Array, mask: jax.Array, method: str = "mean") -> jax.Array:
    """hidden [B, S, D], mask [B, S] (1 = pool over, 0 = skip) → [B, D] float32."""
    hidden = hidden.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if method == "cls":
        return hidden[:, 0]
    if method == "lasttoken":
        s = mask.shape[1]
        # last index where mask == 1; 0 if the mask is empty (clamp semantics)
        rev = jnp.flip(mask, axis=1)
        last = s - jnp.argmax(rev, axis=1) - 1  # [B]
        last = jnp.clip(last, 0, None)
        picked = jnp.take_along_axis(hidden * mask[..., None], last[:, None, None], axis=1)
        return picked[:, 0]
    if method in ("mean", "weightedmean"):
        if method == "weightedmean":
            mask = mask * jnp.cumsum(mask, axis=1)
        s = jnp.sum(hidden * mask[..., None], axis=1)
        denom = jnp.sum(mask, axis=1, keepdims=True)
        return s / denom
    raise NotImplementedError(f"Unknown pooling method: {method}")


def mask_instruction(mask: jax.Array, instruction_lens: jax.Array) -> jax.Array:
    """Zero the first `instruction_lens[i]` positions of each row.

    Per-sample instruction masking so instruction tokens don't pollute the
    pooled embedding (reference gritlm/gritlm.py:144-153 at inference,
    gritlm/training/model.py:150-158 at training).
    """
    positions = jnp.arange(mask.shape[1])[None, :]
    return jnp.where(positions < instruction_lens[:, None], 0, mask)
