"""Attention entry point.

One attention function with a `causal: bool` flag + padding mask — the single
behavioral delta that makes GritLM GritLM (replaces the reference's 3k-LoC HF
fork threading `is_causal` through MistralModel.forward → DecoderLayer →
Attention, scripts/modeling_mistral_gritlm.py:936-1069).

Two implementations:
  - `mha_reference`: pure jnp (einsum + softmax) — runs anywhere, used on CPU
    test meshes and as the numerics oracle.
  - Pallas flash attention (gritlm_tpu.ops.flash_attention) — blockwise,
    TPU-only hot path; selected automatically on TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_bias(
    padding_mask: Optional[jax.Array],  # [B, Sk] 1 = attend, 0 = pad
    q_len: int,
    kv_len: int,
    *,
    causal: bool,
    sliding_window: Optional[int] = None,
    offset: int | jax.Array = 0,
    dtype=jnp.float32,
) -> Optional[jax.Array]:
    """Build an additive attention bias [B or 1, 1, Sq, Sk].

    `offset` is the absolute position of query row 0 (used during decode where
    q_len==1 but kv_len==cache length); a [B] array gives each batch row its
    own offset (serving row_offsets). Mirrors the semantics of the reference
    mask switch (scripts/modeling_mistral_gritlm.py:1005-1036): causal-4d with
    optional sliding window when `causal`, plain padding expansion otherwise.
    """
    biases = []
    if causal:
        off = jnp.asarray(offset)
        if off.ndim == 1:  # [B] per-row offsets → [B, Sq, Sk]
            q_pos = off[:, None, None] + jnp.arange(q_len)[None, :, None]
            k_pos = jnp.arange(kv_len)[None, None, :]
        else:
            q_pos = (off + jnp.arange(q_len)[:, None])[None]  # [1, Sq, 1]
            k_pos = jnp.arange(kv_len)[None, None, :]  # [1, 1, Sk]
        keep = k_pos <= q_pos
        if sliding_window is not None:
            keep &= k_pos > q_pos - sliding_window
        biases.append(jnp.where(keep, 0.0, NEG_INF)[:, None, :, :])
    if padding_mask is not None:
        pad = jnp.where(padding_mask.astype(bool), 0.0, NEG_INF)
        biases.append(pad[:, None, None, :])
    if not biases:
        return None
    out = functools.reduce(lambda a, b: a + b, biases)
    return out.astype(dtype)


def mha_reference(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, Hkv, D]
    v: jax.Array,  # [B, Sk, Hkv, D]
    bias: Optional[jax.Array],  # [B or 1, 1 or H, Sq, Sk] additive
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Grouped-query attention, fp32 softmax accumulation. Returns [B, Sq, H, D]."""
    b, sq, h, d = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    groups = h // hkv
    qg = q.reshape(b, sq, hkv, groups, d)
    # scores: [B, Hkv, G, Sq, Sk]
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        nb = bias.shape[1]
        if nb == 1:
            scores = scores + bias[:, :, None, :, :]
        else:
            scores = scores + bias.reshape(bias.shape[0], hkv, groups, *bias.shape[2:])
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
    return out.reshape(b, sq, h, d)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    padding_mask: Optional[jax.Array],
    *,
    causal: bool,
    sliding_window: Optional[int] = None,
    offset: int | jax.Array = 0,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching attention entry point. q [B,Sq,H,D], k/v [B,Sk,Hkv,D]."""
    if impl == "auto":
        backend = jax.default_backend()
        impl = "flash" if backend == "tpu" else "reference"
    if getattr(offset, "ndim", 0) == 1:
        impl = "reference"  # per-row offsets: prefill kernel is scalar-offset
    if impl == "flash":
        from gritlm_tpu.ops.flash_attention import flash_attention

        try:
            return flash_attention(
                q, k, v, padding_mask,
                causal=causal, sliding_window=sliding_window, offset=offset,
            )
        except NotImplementedError:
            impl = "reference"
    bias = make_attention_bias(
        padding_mask, q.shape[1], k.shape[1],
        causal=causal, sliding_window=sliding_window, offset=offset,
    )
    return mha_reference(q, k, v, bias)


def cached_attention(
    q: jax.Array,  # [B, Sq, H, Dh]
    k_all: jax.Array,  # [L, B, Smax, Kv*Dh] — the FULL KV cache
    v_all: jax.Array,
    kv_mask: Optional[jax.Array],  # [B, Smax] slot validity
    *,
    layer: int | jax.Array,
    offset: int | jax.Array,
    causal: bool,
    sliding_window: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,  # int8 cache, slot-minor: [L, B, Kv, Smax]
    v_scale: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Attention against one layer of a full HBM-resident KV cache.

    The decode hot path: on TPU with a small query count this runs the
    Pallas decode kernel, which streams the cache's valid slots straight
    from the full [L, B, Smax, Kv*Dh] buffer — no per-layer slice, no
    relayout, no bias materialization; int8 caches dequantize inside the
    kernel. Other geometries slice the layer and take the prefill flash
    kernel / einsum oracle."""
    B, Sq, H, Dh = q.shape
    L, _, Smax, KD = k_all.shape
    hkv = num_kv_heads if num_kv_heads is not None else KD // Dh
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "reference"
    if impl == "flash" and Sq < 128:
        from gritlm_tpu.ops.decode_attention import flash_decode

        try:
            return flash_decode(
                q, k_all, v_all, kv_mask,
                causal=causal, sliding_window=sliding_window,
                offset=offset, layer=layer, num_kv_heads=hkv,
                k_scale=k_scale, v_scale=v_scale,
            )
        except NotImplementedError:
            pass
    # prefill-with-cache / fallback: materialize this layer's slice once
    lk = jax.lax.dynamic_index_in_dim(k_all, layer, axis=0, keepdims=False)
    lv = jax.lax.dynamic_index_in_dim(v_all, layer, axis=0, keepdims=False)
    lk = lk.reshape(B, Smax, hkv, Dh)
    lv = lv.reshape(B, Smax, hkv, Dh)
    if k_scale is not None:
        # scales are slot-minor [L, B, Kv, Smax] → [B, Smax, Kv, 1]
        ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
        ks = ks.transpose(0, 2, 1)[..., None].astype(jnp.float32)
        vs = vs.transpose(0, 2, 1)[..., None].astype(jnp.float32)
        lk = (lk.astype(jnp.float32) * ks).astype(q.dtype)
        lv = (lv.astype(jnp.float32) * vs).astype(q.dtype)
    return multi_head_attention(
        q, lk, lv, kv_mask,
        causal=causal, sliding_window=sliding_window, offset=offset,
        impl=impl,
    )
