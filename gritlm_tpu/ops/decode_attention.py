"""Pallas TPU decode attention — few-query attention over a KV cache.

Closes the decode gap of ops/flash_attention.py (which requires Sq >= 128):
every autoregressive decode step (Sq == 1) and tiny cached prefill now runs
a Pallas kernel instead of materializing an einsum bias over the whole
padded cache (the reference's decode hot loop is HF generate over SDPA,
scripts/modeling_mistral_gritlm.py:1230-1258; rag/eval.py:296-302).

Decode is HBM-bandwidth-bound: the mandatory cost is streaming the valid
K/V cache slots through VMEM once. Design choices that keep us there:

  - ONE grid cell per batch row (grid = (B,)): the kernel manually streams
    the cache in [bk, Hkv*Dh] chunks — each chunk is a single fully
    contiguous DMA of the cache's natural [B, Smax, Kv*Dh] layout (a free
    reshape of [B, Smax, Kv, Dh]; the cache is never relayouted). 4-deep
    double buffering hides DMA latency behind the online-softmax update.
  - the chunk loop runs lo..n_valid_blocks where n_valid counts blocks
    containing any valid key (and lo skips blocks below a sliding window):
    decode time scales with the VALID cache length, not the padded bucket
    size — an einsum over a 16k bucket holding 3k tokens reads 5x the
    bytes; this kernel reads 1x.
  - all heads are processed in the one cell via a BLOCK-DIAGONAL q: query
    row (h, r) carries head h's q in lanes [h*Dh, (h+1)*Dh) and zeros
    elsewhere, so a single [rows, Kv*Dh] x [bk, Kv*Dh]^T MXU dot yields
    every head's scores at once (zero lanes kill cross-head terms), and
    p @ V yields every head's output in its own lane stripe. This also
    makes head_dim-64/96 models work unchanged — the only constraint is
    (Kv*Dh) % 128 == 0 (lane alignment of the cache row).
  - GQA: the `group` query heads of a kv head are extra rows of the same
    block — shared K/V is read exactly once.

Softmax is online (same update as the flash forward) with fp32 accumulation.
Validity (padding / RAG cache holes), causality against the write offset,
and sliding windows are all fused into the score mask.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 4  # DMA ring depth (AHEAD = NBUF - 1 chunks in flight)
# [rows, Kv*Dh] fp32 accumulator budget. 2 MiB caps HRP*KD at 512K —
# Mosaic's live temporaries (scores/probs/iotas/scale-repeats) scale with
# HRP and blew the 16 MiB scoped-vmem limit at HRP=1024*KD=1024 (measured
# 18.4 MiB on v5e); prefill-sized Sq falls back to the einsum path, which
# is cheap at exactly those shapes.
MAX_ACC_BYTES = 2 * 2**20
VMEM_BUDGET = 12 * 2**20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    # scalar prefetch: [B, 4] int32 per-row [offset, lo_block,
    # n_valid_blocks, layer] — per-row bounds mean each request streams
    # only ITS OWN valid cache under ragged serving traffic
    scal_ref,
    mask_ref,  # [1, 1, Smax] int32 key validity (whole row in VMEM)
    q_ref,  # [1, HRP, KD] block-diagonal queries
    k_hbm,  # [L, B, Smax, KD] FULL cache keys, HBM-resident (never copied)
    v_hbm,
    # quantized variant appends: ks_hbm/vs_hbm [L, B, Kv, Smax] bf16 scales
    *refs,
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    bk: int,
    group: int,  # query heads per kv head (GQA)
    n_kv: int,  # kv head count: rows are interleaved (rep, head) so that a
    # tile-repeat of a [Kv, bk] scale chunk lines up with the score rows
    scale_reps: int,  # HRP // Kv
    quant: bool,
):
    if quant:
        (ks_hbm, vs_hbm, o_ref,
         k_scr, v_scr, ks_scr, vs_scr, sems) = refs
    else:
        o_ref, k_scr, v_scr, sems = refs
        ks_scr = vs_scr = ks_hbm = vs_hbm = None
    b = pl.program_id(0)
    offset = scal_ref[b, 0]
    lo = scal_ref[b, 1]
    n_valid = scal_ref[b, 2]
    layer = scal_ref[b, 3]

    def dmas(slot, ik):
        out = [
            pltpu.make_async_copy(
                k_hbm.at[layer, b, pl.ds(ik * bk, bk)],
                k_scr.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, b, pl.ds(ik * bk, bk)],
                v_scr.at[slot], sems.at[slot, 1],
            ),
        ]
        if quant:
            out += [
                pltpu.make_async_copy(
                    ks_hbm.at[layer, b, :, pl.ds(ik * bk, bk)],
                    ks_scr.at[slot], sems.at[slot, 2],
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[layer, b, :, pl.ds(ik * bk, bk)],
                    vs_scr.at[slot], sems.at[slot, 3],
                ),
            ]
        return out

    o_ref[0] = jnp.zeros_like(o_ref[0])  # masked-empty rows stay finite

    @pl.when(lo < n_valid)
    def _run():
        for j in range(NBUF - 1):
            @pl.when(lo + j < n_valid)
            def _(j=j):
                slot = jax.lax.rem(lo + j, NBUF)
                for d in dmas(slot, lo + j):
                    d.start()

        q = q_ref[0]

        def body(ik, carry):
            m, l, acc = carry
            slot = jax.lax.rem(ik, NBUF)

            @pl.when(ik + NBUF - 1 < n_valid)
            def _():
                ns = jax.lax.rem(ik + NBUF - 1, NBUF)
                for d in dmas(ns, ik + NBUF - 1):
                    d.start()

            for d in dmas(slot, ik):
                d.wait()

            kb = k_scr[slot]
            if quant:
                kb = kb.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [HRP, bk]
            if quant:
                # dequant K on the score matrix: column j of head-h rows
                # scales by ks[h, j]; rows are head-interleaved so a tile
                # repeat of [Kv, bk] lines up exactly
                s = s * pltpu.repeat(
                    ks_scr[slot].astype(jnp.float32), scale_reps, axis=0
                )

            kmask = mask_ref[0, 0, pl.ds(ik * bk, bk)]
            keep = jnp.broadcast_to(kmask[None, :] > 0, s.shape)
            if causal or sliding_window is not None:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                # row = rep * n_kv + head; rep = sq * group + g
                q_pos = offset + (row // n_kv) // group
                k_pos = ik * bk + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1
                )
                if causal:
                    keep &= k_pos <= q_pos
                if sliding_window is not None:
                    keep &= k_pos > q_pos - sliding_window
            s = jnp.where(keep, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_scr[slot]
            if quant:
                # dequant V by folding vs into the probs: row r only reads
                # its own head's output lanes, so scaling p[r, k] by
                # vs[h(r), k] dequantizes exactly those lanes
                p = p * pltpu.repeat(
                    vs_scr[slot].astype(jnp.float32), scale_reps, axis=0
                )
                vb = vb.astype(jnp.bfloat16)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16 if quant else vb.dtype), vb,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        hrp, kd = q_ref.shape[1], q_ref.shape[2]
        init = (
            jnp.full((hrp, 1), NEG_INF, jnp.float32),
            jnp.zeros((hrp, 1), jnp.float32),
            jnp.zeros((hrp, kd), jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(lo, n_valid, body, init)
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sliding_window", "scale", "bk",
                     "group", "n_kv"),
)
def _decode_call(
    qbd: jax.Array,  # [B, HRP, KD] block-diagonal, head-interleaved rows
    k2: jax.Array,  # [L, B, Smax, KD] full cache
    v2: jax.Array,
    mask: jax.Array,  # [B, Smax] int32
    scalars: jax.Array,  # [B, 4] int32
    k_scale: Optional[jax.Array] = None,  # [L, B, Kv, Smax] (int8 cache)
    v_scale: Optional[jax.Array] = None,
    *,
    causal: bool,
    sliding_window: Optional[int],
    scale: float,
    bk: int,
    group: int,
    n_kv: int,
):
    B, HRP, KD = qbd.shape
    Smax = k2.shape[2]
    quant = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, 1, Smax), lambda b, s: (b, 0, 0)),
        pl.BlockSpec((1, HRP, KD), lambda b, s: (b, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((NBUF, bk, KD), k2.dtype),
        pltpu.VMEM((NBUF, bk, KD), v2.dtype),
    ]
    operands = [scalars, mask[:, None, :], qbd, k2, v2]
    if quant:
        Kv = k_scale.shape[2]
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        scratch += [
            pltpu.VMEM((NBUF, Kv, bk), k_scale.dtype),
            pltpu.VMEM((NBUF, Kv, bk), v_scale.dtype),
        ]
        operands += [k_scale, v_scale]
    scratch.append(pltpu.SemaphoreType.DMA((NBUF, 4 if quant else 2)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HRP, KD), lambda b, s: (b, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel,
        causal=causal, sliding_window=sliding_window, scale=scale,
        bk=bk, group=group, n_kv=n_kv, scale_reps=HRP // n_kv,
        quant=quant,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qbd.shape, qbd.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(*operands)


def _pick_bk(
    smax: int, kd: int, hrp: int, itemsize: int = 2, quant: bool = False
) -> Optional[int]:
    """Largest chunk length fitting the VMEM budget. Accounts for the FULL
    per-invocation footprint, not just the DMA ring: q + out (bf16) and
    the fp32 accumulator scale with HRP (large at prefill-sized Sq), and
    the score/prob matrices scale with HRP*bk. itemsize = cache dtype
    bytes (1 int8, 2 bf16, 4 fp32)."""
    fixed = hrp * kd * (2 + 2 + 4)  # q, out, accumulator
    if quant:
        fixed += NBUF * 2 * (kd // 128) * 512 * 2  # scale ring upper bound
    for bk in (512, 256, 128):
        ring = NBUF * 2 * bk * kd * itemsize
        sp = 2 * hrp * bk * 4  # score + prob matrices, fp32
        if smax % bk == 0 and fixed + ring + sp <= VMEM_BUDGET:
            return bk
    return None


def flash_decode(
    q: jax.Array,  # [B, Sq, H, Dh], Sq small
    k: jax.Array,  # [L, B, Smax, Hkv*Dh] — the FULL KV cache (HBM-resident)
    v: jax.Array,
    padding_mask: Optional[jax.Array],  # [B, Smax] slot validity; None = all
    *,
    causal: bool,
    sliding_window: Optional[int] = None,
    offset: int | jax.Array = 0,
    layer: int | jax.Array = 0,
    num_kv_heads: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,  # int8 cache: [L, B, Kv, Smax]
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Pallas decode attention over layer `layer` of the full cache. The
    cache is consumed as an unblocked HBM ref — no per-layer slice or
    relayout is ever materialized. With k_scale/v_scale the cache is int8
    (models/transformer.init_cache(quant=True)) and dequantization fuses
    into the score/prob matrices. Raises NotImplementedError for geometries
    the kernel doesn't cover (ops/attention.py falls back to the einsum
    path)."""
    B, Sq, H, Dh = q.shape
    L, _, Smax, KD = k.shape
    Hkv = num_kv_heads if num_kv_heads is not None else KD // Dh
    assert Hkv * Dh == KD, (Hkv, Dh, KD)
    group = H // Hkv
    if KD % 128 != 0:
        raise NotImplementedError(f"decode kernel: Kv*Dh = {KD} not lane-aligned")
    rows = Sq * group  # reps: one per (sq position, group member)
    # pad reps so total rows (reps * Hkv) hit an 8-sublane boundary
    t = 8 // math.gcd(Hkv, 8)
    RP = max(-(-rows // t) * t, t)
    HRP = RP * Hkv
    if HRP * KD * 4 > MAX_ACC_BYTES:
        raise NotImplementedError("decode kernel: accumulator too large")
    bk = _pick_bk(Smax, KD, HRP, itemsize=k.dtype.itemsize,
                  quant=k_scale is not None)
    if bk is None:
        raise NotImplementedError(
            f"decode kernel: Smax {Smax} has no VMEM-friendly chunking"
        )

    if padding_mask is None:
        padding_mask = jnp.ones((B, Smax), jnp.int32)
    padding_mask = padding_mask.astype(jnp.int32)

    # last chunk containing any valid key, PER ROW — under ragged serving
    # traffic each request streams only its own reserved cache, not the
    # batch max. Chunks below the sliding window are skipped via `lo`.
    # `offset` may be a scalar (lockstep decode) or [B] (serving
    # row_offsets); both reduce to the per-row scalar table.
    slot_blk = jnp.arange(Smax, dtype=jnp.int32) // bk + 1  # [Smax]
    n_valid = jnp.max(padding_mask * slot_blk[None, :], axis=1)  # [B]
    offset = jnp.broadcast_to(jnp.asarray(offset, jnp.int32), (B,))
    if causal:
        # no row attends beyond slot offset + Sq - 1
        n_valid = jnp.minimum(n_valid, (offset + Sq - 1) // bk + 1)
    if sliding_window is not None:
        lo = jnp.maximum(offset - sliding_window + 1, 0) // bk
    else:
        lo = jnp.zeros((B,), jnp.int32)
    scalars = jnp.stack([
        offset, lo.astype(jnp.int32), n_valid.astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B,)),
    ], axis=1)  # [B, 4]

    # q -> block-diagonal rows, HEAD-INTERLEAVED: row = rep * Kv + head
    # (rep = sq * group + g). Row (rep, h) holds head h's query in its own
    # Dh-lane stripe; the interleaving makes a tile-repeat of a [Kv, *]
    # scale chunk line up with the rows (int8 dequant).
    qh = q.reshape(B, Sq, Hkv, group, Dh).transpose(0, 1, 3, 2, 4)
    qh = qh.reshape(B, rows, Hkv, Dh)
    if rows < RP:
        qh = jnp.pad(qh, ((0, 0), (0, RP - rows), (0, 0), (0, 0)))
    eye = jnp.eye(Hkv, dtype=qh.dtype)
    qbd = jnp.einsum("brhd,hk->brhkd", qh, eye).reshape(B, HRP, KD)

    obd = _decode_call(
        qbd, k, v,
        padding_mask, scalars, k_scale, v_scale,
        causal=causal, sliding_window=sliding_window, scale=Dh ** -0.5,
        bk=bk, group=group, n_kv=Hkv,
    )

    # extract each head's lane stripe back out of the block-diagonal output
    o5 = obd.reshape(B, RP, Hkv, Hkv, Dh)
    oh = jnp.einsum("brhkd,hk->brhd", o5, eye.astype(jnp.float32))
    oh = oh.astype(obd.dtype)[:, :rows]
    out = oh.reshape(B, Sq, group, Hkv, Dh).transpose(0, 1, 3, 2, 4)
    return out.reshape(B, Sq, H, Dh)
