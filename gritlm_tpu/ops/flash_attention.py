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

Forward AND backward are Pallas kernels; both read the model's natural
[B, S, H*Dh] activation layout directly through lane-blocked BlockSpecs, so
no [B,S,H,D]→[B*H,S,D] relayout is ever materialized on either pass.
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


# Kernels process one (batch, head, q-block[, k-block]) cell. Inputs arrive
# in the model's natural [B, S, H*Dh] layout (a free reshape of [B,S,H,Dh]);
# each cell's BlockSpec picks its head by blocking the LANE dimension
# (block index h over the last dim selects lanes [h*Dh, (h+1)*Dh)), so no
# [B,S,H,D]→[B*H,S,D] relayout is ever materialized in HBM — that relayout
# cost ~15% of encode step time. GQA maps query head h onto kv lane block
# h // group, so shared kv blocks are DMA'd per group, never repeated in HBM.


def _fwd_kernel(
    # scalar prefetch
    offset_ref,  # [1] int32: absolute position of q row 0
    # inputs
    mask_ref,  # [1, 1, bk] int32 key validity
    q_ref,  # [1, bq, Dh] — lane-block h of [B, Sq, H*Dh]
    k_ref,  # [1, bk, Dh] — lane-block h//group of [B, Sk, Hkv*Dh]
    v_ref,  # [1, bk, Dh]
    # outputs: o_ref [1, bq, Dh]; lse_ref [1, 8, bq] iff with_lse; then
    # scratch: m_scr/l_scr [bq, LANES] f32, acc_scr [bq, Dh] f32
    *refs,
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    bq: int,
    bk: int,
    with_lse: bool,
):
    if with_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        (o_ref, m_scr, l_scr, acc_scr), lse_ref = refs, None
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
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
        if lse_ref is not None:
            m = m_scr[:, :1]
            lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)  # [bq, 1]
            lse_ref[0] = jnp.broadcast_to(lse.reshape(1, bq), (8, bq))


def _fwd_kernel_single(
    offset_ref, mask_ref, q_ref, k_ref, v_ref, *refs,
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    bq: int,
    bk: int,
    with_lse: bool,
):
    """Whole-K-in-one-block specialization (nk == 1): plain stable softmax —
    no scratch state, no cross-iteration carries. This is the hot case for
    encode (Sk ≤ max bk) and measurably faster than the online path."""
    if with_lse:
        o_ref, lse_ref = refs
    else:
        (o_ref,), lse_ref = refs, None
    iq = pl.program_id(2)
    offset = offset_ref[0]

    all_keys_valid = jnp.sum(mask_ref[0, 0]) == bk
    needs_mask = jnp.logical_not(all_keys_valid)
    if causal:
        needs_mask |= (bk - 1) > offset + iq * bq
        if sliding_window is not None:
            needs_mask |= True

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bk]

    keep = jnp.broadcast_to(mask_ref[0, 0][None, :] > 0, (bq, bk))
    if causal:
        q_pos = offset + iq * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, bk), 0
        )
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        keep &= k_pos <= q_pos
        if sliding_window is not None:
            keep &= k_pos > q_pos - sliding_window
    s = jnp.where(jnp.logical_or(jnp.logical_not(needs_mask), keep), s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    p = jnp.exp(s - m)
    # rows with every key masked: m == NEG_INF → zero them out
    p = jnp.where(s > NEG_INF / 2, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    safe_l = jnp.where(l > 0, l, 1.0)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / safe_l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse.reshape(1, bq), (8, bq))


def _pad_len(n: int, b: int) -> int:
    return (n + b - 1) // b * b


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 12 * 2**20  # leave headroom under the ~16MB/core VMEM


def _pick_bq(Sq, bk, Dh):
    """Largest bq ≤ min(DEFAULT_BQ, Sq_padded) keeping double-buffered blocks
    + score transients + scratch under the VMEM budget (per-cell working set:
    q/o [bq,Dh] bf16, k/v [bk,Dh] bf16, s/p [bq,bk] f32+bf16, acc [bq,Dh] f32,
    m/l [bq,128] f32)."""
    bq = min(DEFAULT_BQ, _pad_len(Sq, 128))
    kv_bytes = 2 * (2 * bk * Dh * 2)  # k + v, double-buffered
    while bq > 128:
        qo_bytes = 2 * (2 * bq * Dh * 2)
        s_bytes = bq * bk * 6
        scr_bytes = bq * Dh * 4 + 2 * bq * LANES * 4
        if qo_bytes + kv_bytes + s_bytes + scr_bytes <= _VMEM_BUDGET:
            break
        bq //= 2
    return bq


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sliding_window", "num_q_heads", "bq", "bk",
                     "with_lse"),
)
def _flash_fwd(
    q2: jax.Array,  # [B, Sq, H*Dh] — free reshape of the natural 4D layout
    k2: jax.Array,  # [B, Sk, Hkv*Dh]
    v2: jax.Array,
    mask: jax.Array,  # [B, Sk] int32
    offset: jax.Array,  # [] int32
    *,
    causal: bool,
    sliding_window: Optional[int],
    num_q_heads: int,
    bq: int,
    bk: int,
    with_lse: bool = False,
):
    B, Sq, HD = q2.shape
    _, Sk, KD = k2.shape
    H = num_q_heads
    Dh = HD // H
    Hkv = KD // Dh
    group = H // Hkv
    scale = Dh ** -0.5
    nq, nk = Sq // bq, Sk // bk
    single = nk == 1

    # index maps get grid indices + the prefetched scalar ref; the last
    # (lane) coordinate selects the head's Dh-wide lane block
    if single:
        def q_index(b, h, iq, _s):
            return (b, iq, h)

        def kv_index(b, h, iq, _s):
            return (b, 0, h // group)

        def mask_index(b, h, iq, _s):
            return (b, 0, 0)

        def lse_index(b, h, iq, _s):
            return (b, h, iq)
    else:
        def q_index(b, h, iq, ik, _s):
            return (b, iq, h)

        def kv_index(b, h, iq, ik, _s):
            return (b, ik, h // group)

        def mask_index(b, h, iq, ik, _s):
            return (b, 0, ik)

        def lse_index(b, h, iq, ik, _s):
            return (b, h, iq)

    out_shapes = [jax.ShapeDtypeStruct((B, Sq, HD), q2.dtype)]
    out_specs = [pl.BlockSpec((1, bq, Dh), q_index)]
    if with_lse:
        # [B, H*8, Sq]: per-head 8-sublane stripes (a [.., bq, 8] block would
        # violate the (×8, ×128) minor-dims rule)
        out_shapes.append(jax.ShapeDtypeStruct((B, H * 8, Sq), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, bq), lse_index))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq) if single else (B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bk), mask_index),
            pl.BlockSpec((1, bq, Dh), q_index),
            pl.BlockSpec((1, bk, Dh), kv_index),
            pl.BlockSpec((1, bk, Dh), kv_index),
        ],
        out_specs=out_specs,
        scratch_shapes=[] if single else [
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel_single if single else _fwd_kernel,
        causal=causal, sliding_window=sliding_window,
        scale=scale, bq=bq, bk=bk, with_lse=with_lse,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "parallel") if single
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
        ),
        # CPU: run the same kernel in the Pallas interpreter so tests can
        # validate kernel math without TPU hardware
        interpret=_interpret(),
    )(jnp.asarray([offset], jnp.int32), mask[:, None, :], q2, k2, v2)
    return (res[0], res[1]) if with_lse else (res[0], None)




# ---------------------------------------------------------------------------
# Backward kernels
#
# Standard flash backward with saved lse (no online max needed):
#   p  = exp(q·kᵀ·scale − lse)          (zeroed where masked)
#   dv = pᵀ · do
#   dp = do · vᵀ
#   ds = p ∘ (dp − delta) · scale,   delta = rowsum(do ∘ out)
#   dq = ds · k       (accumulated over k blocks)
#   dk = dsᵀ · q      (accumulated over q blocks)
# dq uses grid (BH, nq, nk); dk/dv use grid (BH, nk, nq). GQA: dk/dv come out
# per *query* head and are summed over the group outside.


def _bwd_block(q, k, scale, lse, keep):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # lse [bq, 1]
    if keep is not None:
        p = jnp.where(keep, p, 0.0)
    return p


def _make_keep(mask_ref, offset, iq, ik, bq, bk, shape, causal, sliding_window):
    keep = jnp.broadcast_to(mask_ref[0, 0][None, :] > 0, shape)
    if causal:
        q_pos = offset + iq * bq + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        keep &= k_pos <= q_pos
        if sliding_window is not None:
            keep &= k_pos > q_pos - sliding_window
    return keep


def _bwd_dq_kernel(
    offset_ref, mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr,
    *, causal, sliding_window, scale, bq, bk,
):
    # grid (B, H, nq, nk); q/do/dq are lane-blocks of [B, S, H*Dh],
    # lse/delta [1, 8, bq] stripes of [B, H*8, Sq]
    iq, ik, nk = pl.program_id(2), pl.program_id(3), pl.num_programs(3)
    offset = offset_ref[0]

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    visible = jnp.logical_or(
        jnp.logical_not(causal), ik * bk <= offset + (iq + 1) * bq - 1
    )

    @pl.when(visible)
    def _body():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        lse = lse_ref[0][0:1, :].T  # [bq, 1]
        delta = delta_ref[0][0:1, :].T
        keep = _make_keep(mask_ref, offset, iq, ik, bq, bk,
                          (bq, bk), causal, sliding_window)
        p = _bwd_block(q, k, scale, lse, keep)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta) * scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    offset_ref, mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, causal, sliding_window, scale, bq, bk,
):
    # grid (B, H, nk, nq): iq is the inner (sequential) dimension; dk/dv come
    # out per *query* head (lane-block h of [B, Sk, H*Dh]) and are reduced
    # onto kv heads outside
    ik, iq, nq = pl.program_id(2), pl.program_id(3), pl.num_programs(3)
    offset = offset_ref[0]

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    visible = jnp.logical_or(
        jnp.logical_not(causal), ik * bk <= offset + (iq + 1) * bq - 1
    )

    @pl.when(visible)
    def _body():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        lse = lse_ref[0][0:1, :].T  # [bq, 1]
        delta = delta_ref[0][0:1, :].T
        keep = _make_keep(mask_ref, offset, iq, ik, bq, bk,
                          (bq, bk), causal, sliding_window)
        p = _bwd_block(q, k, scale, lse, keep)  # [bq, bk]
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, dh]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale  # [bq, bk]
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, dh]

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sliding_window", "num_q_heads", "bq", "bk"),
)
def _flash_bwd(
    q2, k2, v2, mask, offset, do2, lse, delta,
    *, causal, sliding_window, num_q_heads, bq, bk,
):
    """All tensor args in natural lane-blocked layout: q2/do2 [B, Sq, H*Dh],
    k2/v2 [B, Sk, Hkv*Dh], lse/delta [B, H*8, Sq]. Returns
    (dq [B,Sq,H*Dh], dk/dv per-query-head [B,Sk,H*Dh])."""
    B, Sq, HD = q2.shape
    _, Sk, KD = k2.shape
    H = num_q_heads
    Dh = HD // H
    Hkv = KD // Dh
    group = H // Hkv
    scale = Dh ** -0.5
    nq, nk = Sq // bq, Sk // bk

    def q_index_dq(b, h, iq, ik, _s):
        return (b, iq, h)

    def kv_index_dq(b, h, iq, ik, _s):
        return (b, ik, h // group)

    def mask_index_dq(b, h, iq, ik, _s):
        return (b, 0, ik)

    def row_index_dq(b, h, iq, ik, _s):
        return (b, h, iq)

    common = dict(causal=causal, sliding_window=sliding_window,
                  scale=scale, bq=bq, bk=bk)

    dq2 = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, bk), mask_index_dq),
                pl.BlockSpec((1, bq, Dh), q_index_dq),
                pl.BlockSpec((1, bk, Dh), kv_index_dq),
                pl.BlockSpec((1, bk, Dh), kv_index_dq),
                pl.BlockSpec((1, bq, Dh), q_index_dq),
                pl.BlockSpec((1, 8, bq), row_index_dq),
                pl.BlockSpec((1, 8, bq), row_index_dq),
            ],
            out_specs=pl.BlockSpec((1, bq, Dh), q_index_dq),
            scratch_shapes=[pltpu.VMEM((bq, Dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Sq, HD), q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(jnp.asarray([offset], jnp.int32), mask[:, None, :], q2, k2, v2, do2,
      lse, delta)

    # dk/dv: iterate q blocks innermost, one (b, h, ik) accumulator at a time
    def q_index_kv(b, h, ik, iq, _s):
        return (b, iq, h)

    def kv_index_kv(b, h, ik, iq, _s):
        return (b, ik, h // group)

    def mask_index_kv(b, h, ik, iq, _s):
        return (b, 0, ik)

    def row_index_kv(b, h, ik, iq, _s):
        return (b, h, iq)

    def out_index_kv(b, h, ik, iq, _s):
        return (b, ik, h)

    dk2, dv2 = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nk, nq),
            in_specs=[
                pl.BlockSpec((1, 1, bk), mask_index_kv),
                pl.BlockSpec((1, bq, Dh), q_index_kv),
                pl.BlockSpec((1, bk, Dh), kv_index_kv),
                pl.BlockSpec((1, bk, Dh), kv_index_kv),
                pl.BlockSpec((1, bq, Dh), q_index_kv),
                pl.BlockSpec((1, 8, bq), row_index_kv),
                pl.BlockSpec((1, 8, bq), row_index_kv),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, Dh), out_index_kv),
                pl.BlockSpec((1, bk, Dh), out_index_kv),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, Dh), jnp.float32),
                pltpu.VMEM((bk, Dh), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Sk, HD), q2.dtype),
            jax.ShapeDtypeStruct((B, Sk, HD), q2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(jnp.asarray([offset], jnp.int32), mask[:, None, :], q2, k2, v2, do2,
      lse, delta)
    return dq2, dk2, dv2

# ---------------------------------------------------------------------------
# custom_vjp wiring


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_core(q, k, v, padding_mask, causal, sliding_window, offset):
    out, _ = _flash_call(q, k, v, padding_mask, causal, sliding_window, offset,
                         with_lse=False)
    return out


def _flash_call(q, k, v, padding_mask, causal, sliding_window, offset,
                with_lse):
    B, Sq, H, Dh = q.shape
    _, Sk, Hkv, _ = k.shape
    bk = min(DEFAULT_BK, _pad_len(Sk, 128))
    bq = _pick_bq(Sq, bk, Dh)
    sq_p, sk_p = _pad_len(Sq, bq), _pad_len(Sk, bk)
    qp = jnp.pad(q, ((0, 0), (0, sq_p - Sq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sk_p - Sk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sk_p - Sk), (0, 0), (0, 0)))
    maskp = jnp.pad(padding_mask.astype(jnp.int32), ((0, 0), (0, sk_p - Sk)))
    out2, lse = _flash_fwd(
        qp.reshape(B, sq_p, H * Dh),  # free reshapes — no relayout
        kp.reshape(B, sk_p, Hkv * Dh),
        vp.reshape(B, sk_p, Hkv * Dh),
        maskp, jnp.asarray(offset, jnp.int32),
        causal=causal, sliding_window=sliding_window,
        num_q_heads=H, bq=bq, bk=bk, with_lse=with_lse,
    )
    out = out2.reshape(B, sq_p, H, Dh)[:, :Sq]
    return out, lse  # lse stays [B, H*8, sq_p] stripes for bwd


def _core_fwd(q, k, v, padding_mask, causal, sliding_window, offset):
    out, lse = _flash_call(q, k, v, padding_mask, causal, sliding_window,
                           offset, with_lse=True)
    return out, (q, k, v, padding_mask, offset, out, lse)


def _core_bwd(causal, sliding_window, res, g):
    import numpy as np
    from jax import dtypes

    q, k, v, padding_mask, offset, out, lse = res
    B, Sq, H, Dh = q.shape
    _, Sk, Hkv, _ = k.shape
    bk = min(DEFAULT_BK, _pad_len(Sk, 128))
    bq = _pick_bq(Sq, bk, Dh)
    sq_p, sk_p = _pad_len(Sq, bq), _pad_len(Sk, bk)

    def pad_s(x, total):
        return jnp.pad(x, ((0, 0), (0, total - x.shape[1])) +
                       ((0, 0),) * (x.ndim - 2))

    q2 = pad_s(q, sq_p).reshape(B, sq_p, H * Dh)
    do2 = pad_s(g, sq_p).reshape(B, sq_p, H * Dh)
    out_p = pad_s(out, sq_p)
    k2 = pad_s(k, sk_p).reshape(B, sk_p, Hkv * Dh)
    v2 = pad_s(v, sk_p).reshape(B, sk_p, Hkv * Dh)
    maskp = pad_s(padding_mask.astype(jnp.int32), sk_p)

    # delta = rowsum(do ∘ out) per head → [B, H*8, sq_p] stripes matching lse
    delta = jnp.sum(
        pad_s(g, sq_p).astype(jnp.float32) * out_p.astype(jnp.float32),
        axis=-1,
    )  # [B, sq_p, H]
    delta = jnp.broadcast_to(
        delta.transpose(0, 2, 1)[:, :, None, :], (B, H, 8, sq_p)
    ).reshape(B, H * 8, sq_p)
    # lse arrives as [B, H*8, sq_p_fwd]; re-pad to this bq's sq_p
    lse = lse[:, :, :Sq]
    lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - lse.shape[2])))

    dq2, dk2, dv2 = _flash_bwd(
        q2, k2, v2, maskp, jnp.asarray(offset, jnp.int32), do2, lse, delta,
        causal=causal, sliding_window=sliding_window,
        num_q_heads=H, bq=bq, bk=bk,
    )
    dq = dq2.reshape(B, sq_p, H, Dh)[:, :Sq].astype(q.dtype)
    # dk/dv are per query head; reduce each GQA group onto its kv head
    group = H // Hkv
    dk = dk2.reshape(B, sk_p, Hkv, group, Dh).sum(3)[:, :Sk].astype(k.dtype)
    dv = dv2.reshape(B, sk_p, Hkv, group, Dh).sum(3)[:, :Sk].astype(v.dtype)
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
    if Sq < 128:
        # decode / tiny-prefill: the [*, Sq, Sk] bias path is small and XLA
        # fuses it well; the flash kernel pays off on big prefill/encode.
        # Measured on v5e (1B-class encode, the MTEB short-sentence regime):
        # B=64 S=64 einsum path = 1653 embeds/s = 105.8k tok/s — the SAME
        # token throughput as the S=512 flash path (206 embeds/s × 512),
        # i.e. attention cost is negligible at Sq<128 and a pad-to-128
        # flash variant only wastes q-side compute (per-op: einsum 1.25ms
        # vs padded-flash 1.33ms at S=64). The 128 threshold is the kernel's
        # minimum q-block; below it the data says einsum is optimal.
        raise NotImplementedError("short query path handled by reference impl")
    if padding_mask is None:
        padding_mask = jnp.ones((B, Sk), jnp.int32)
    if Dh % 128 != 0:
        # head_dim 64/96 (Qwen2-/Llama-3.2-1B-class): zero-pad each head's
        # vector to the next 128-lane multiple. Wall-time-free on the MXU —
        # a K=64 contraction idles the same half of the systolic array the
        # zero lanes occupy, and the N=64 p·v output wastes the same output
        # lanes — while the einsum fallback this replaces materializes
        # [B,H,Sq,Sk] scores in HBM. (The prefill counterpart of the decode
        # kernel's (Kv·Dh)%128 lane packing, decode_attention.py:26-28.)
        Dp = -(-Dh // 128) * 128
        padw = ((0, 0), (0, 0), (0, 0), (0, Dp - Dh))
        # the kernel scales scores by Dp^-0.5; fold sqrt(Dp/Dh) into q so
        # the effective softmax scale stays the true Dh^-0.5
        c = (Dp / Dh) ** 0.5
        qc = (jnp.pad(q, padw).astype(jnp.float32) * c).astype(q.dtype)
        out = _flash_attention_core(
            qc, jnp.pad(k, padw), jnp.pad(v, padw), padding_mask,
            causal, sliding_window, jnp.asarray(offset, jnp.int32),
        )
        return out[..., :Dh]
    return _flash_attention_core(
        q, k, v, padding_mask, causal, sliding_window, jnp.asarray(offset, jnp.int32)
    )
