"""Pallas TPU flash attention — the build's primary native kernel.

Replaces the reference's flash-attn CUDA dependency (SURVEY §2.2 "Attention
backends": one kernel taking a `causal: bool` flag + padding masks). Blockwise
online-softmax forward in VMEM with fp32 accumulation; GQA handled by mapping
each query head onto its kv head in the BlockSpec index maps (no KV
repetition in HBM). Supports:

  - causal / bidirectional via one flag (the GritLM mode switch)
  - right/left padding via a [B, Sk] key-validity mask
  - absolute query offset (decode: q row 0 sits at cache slot `offset`)
  - sliding-window (Mistral) masking
  - causal block skipping (upper-triangle k blocks are predicated off)

Backward currently routes through a jnp recompute (custom_vjp) — numerically
identical to the reference path; a Pallas backward lands separately.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BQ = 1024
DEFAULT_BK = 1024
LANES = 128


def _fwd_kernel(
    # scalar prefetch
    offset_ref,  # [1] int32: absolute position of q row 0
    # inputs
    mask_ref,  # [1, 1, bk] int32 key validity
    q_ref,  # [1, bq, dh]
    k_ref,  # [1, bk, dh]
    v_ref,  # [1, bk, dh]
    # outputs
    o_ref,  # [1, bq, dh]
    # scratch
    m_scr,  # [bq, LANES] f32 running max (broadcast over lanes)
    l_scr,  # [bq, LANES] f32 running denom
    acc_scr,  # [bq, dh] f32 running numerator
    *,
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    bq: int,
    bk: int,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    offset = offset_ref[0]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal geometry: the whole k block is in the future → skip it entirely
    q_blk_last = offset + (iq + 1) * bq - 1  # absolute pos of last q row
    k_blk_first = ik * bk
    visible = jnp.logical_or(
        jnp.logical_not(causal), k_blk_first <= q_blk_last
    )

    # diagonal blocks (and key-padded blocks) need per-element masks; fully
    # interior causal blocks and all-valid keys take the maskless fast path
    all_keys_valid = jnp.sum(mask_ref[0, 0]) == bk
    k_blk_last = ik * bk + bk - 1
    q_blk_first = offset + iq * bq
    needs_mask = jnp.logical_not(all_keys_valid)
    if causal:
        needs_mask |= k_blk_last > q_blk_first  # diagonal straddle
        if sliding_window is not None:
            needs_mask |= k_blk_first <= q_blk_last - sliding_window

    def _update(s, p_keep):
        m_prev = m_scr[:, :1]  # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        if p_keep is not None:
            # zero masked entries so fully-masked blocks/rows contribute
            # nothing even when m_new == NEG_INF
            p = jnp.where(p_keep, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    def _scores():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        return s * scale

    @pl.when(visible & needs_mask)
    def _masked_body():
        s = _scores()
        keep = jnp.broadcast_to(mask_ref[0, 0][None, :] > 0, s.shape)
        if causal:
            q_pos = offset + iq * bq + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0
            )
            k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            keep &= k_pos <= q_pos
            if sliding_window is not None:
                keep &= k_pos > q_pos - sliding_window
        _update(jnp.where(keep, s, NEG_INF), keep)

    @pl.when(visible & jnp.logical_not(needs_mask))
    def _fast_body():
        _update(_scores(), None)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def _pad_len(n: int, b: int) -> int:
    return (n + b - 1) // b * b


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sliding_window", "bq", "bk", "num_q_heads"),
)
def _flash_fwd(
    q3: jax.Array,  # [B*H, Sq, Dh]
    k3: jax.Array,  # [B*Hkv, Sk, Dh]
    v3: jax.Array,
    mask: jax.Array,  # [B, Sk] int32
    offset: jax.Array,  # [] int32
    *,
    causal: bool,
    sliding_window: Optional[int],
    num_q_heads: int,
    bq: int,
    bk: int,
):
    BH, Sq, Dh = q3.shape
    BKV, Sk, _ = k3.shape
    H = num_q_heads
    B = BH // H
    Hkv = BKV // B
    group = H // Hkv
    scale = Dh ** -0.5
    nq = Sq // bq
    nk = Sk // bk

    grid = (BH, nq, nk)

    def q_index(bh, iq, ik, *_):
        return (bh, iq, 0)

    def kv_index(bh, iq, ik, *_):
        b = bh // H
        h = bh % H
        return (b * Hkv + h // group, ik, 0)

    def mask_index(bh, iq, ik, *_):
        return (bh // H, 0, ik)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bk), mask_index),
            pl.BlockSpec((1, bq, Dh), q_index),
            pl.BlockSpec((1, bk, Dh), kv_index),
            pl.BlockSpec((1, bk, Dh), kv_index),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), q_index),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        sliding_window=sliding_window,
        scale=scale,
        bq=bq,
        bk=bk,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Sq, Dh), q3.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        # CPU: run the same kernel in the Pallas interpreter so tests can
        # validate kernel math without TPU hardware
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([offset], jnp.int32), mask[:, None, :], q3, k3, v3)
    return out


def _reference_vjp(q, k, v, padding_mask, causal, sliding_window, offset, g):
    """Backward via the jnp reference path (recompute); exact same math."""
    from gritlm_tpu.ops.attention import make_attention_bias, mha_reference

    def f(q, k, v):
        bias = make_attention_bias(
            padding_mask, q.shape[1], k.shape[1],
            causal=causal, sliding_window=sliding_window, offset=offset,
        )
        return mha_reference(q, k, v, bias)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5)
)
def _flash_attention_core(q, k, v, padding_mask, causal, sliding_window, offset):
    return _flash_call(q, k, v, padding_mask, causal, sliding_window, offset)


def _flash_call(q, k, v, padding_mask, causal, sliding_window, offset):
    B, Sq, H, Dh = q.shape
    _, Sk, Hkv, _ = k.shape
    bq = min(DEFAULT_BQ, _pad_len(Sq, 128))
    bk = min(DEFAULT_BK, _pad_len(Sk, 128))

    sq_p = _pad_len(Sq, bq)
    sk_p = _pad_len(Sk, bk)
    qp = jnp.pad(q, ((0, 0), (0, sq_p - Sq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sk_p - Sk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sk_p - Sk), (0, 0), (0, 0)))
    maskp = jnp.pad(padding_mask.astype(jnp.int32), ((0, 0), (0, sk_p - Sk)))

    q3 = qp.transpose(0, 2, 1, 3).reshape(B * H, sq_p, Dh)
    k3 = kp.transpose(0, 2, 1, 3).reshape(B * Hkv, sk_p, Dh)
    v3 = vp.transpose(0, 2, 1, 3).reshape(B * Hkv, sk_p, Dh)

    out = _flash_fwd(
        q3, k3, v3, maskp, jnp.asarray(offset, jnp.int32),
        causal=causal, sliding_window=sliding_window,
        num_q_heads=H, bq=bq, bk=bk,
    )
    out = out.reshape(B, H, sq_p, Dh).transpose(0, 2, 1, 3)
    return out[:, :Sq]


def _core_fwd(q, k, v, padding_mask, causal, sliding_window, offset):
    out = _flash_call(q, k, v, padding_mask, causal, sliding_window, offset)
    return out, (q, k, v, padding_mask, offset)


def _core_bwd(causal, sliding_window, res, g):
    import numpy as np
    from jax import dtypes

    q, k, v, padding_mask, offset = res
    dq, dk, dv = _reference_vjp(
        q, k, v, padding_mask, causal, sliding_window, offset, g
    )
    # integer inputs take float0 cotangents
    dmask = np.zeros(padding_mask.shape, dtypes.float0)
    doff = np.zeros(offset.shape, dtypes.float0)
    return dq, dk, dv, dmask, doff


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jax.Array,  # [B, Sq, H, Dh]
    k: jax.Array,  # [B, Sk, Hkv, Dh]
    v: jax.Array,
    padding_mask: Optional[jax.Array],  # [B, Sk]; None = all valid
    *,
    causal: bool,
    sliding_window: Optional[int] = None,
    offset: int | jax.Array = 0,
) -> jax.Array:
    B, Sq, H, Dh = q.shape
    _, Sk, Hkv, _ = k.shape
    if Dh % 128 != 0:
        raise NotImplementedError(f"head_dim {Dh} not a multiple of 128")
    if Sq < 128:
        # decode / tiny-prefill: the [*, Sq, Sk] bias path is small and XLA
        # fuses it well; the flash kernel pays off on big prefill/encode
        raise NotImplementedError("short query path handled by reference impl")
    if padding_mask is None:
        padding_mask = jnp.ones((B, Sk), jnp.int32)
    return _flash_attention_core(
        q, k, v, padding_mask, causal, sliding_window, jnp.asarray(offset, jnp.int32)
    )
