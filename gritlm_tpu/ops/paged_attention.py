"""Pallas TPU paged decode attention — serving over a shared page pool.

The dense serving pool (serving.py) reserves B × max_len cache slots even
though most requests are far shorter than max_len; a paged pool
(vLLM-style, re-designed for TPU) allocates K/V in fixed-size pages from
a shared pool, so HBM scales with the tokens actually reserved, not the
worst case. Layout:

    k_pages, v_pages : [L, n_pages, page, Kv*Dh]
    page_table       : [B, max_pages] int32 — row's logical chunk i lives
                       in physical page page_table[b, i]
    mask             : [B, max_pages*page] logical slot validity (same
                       semantics as the dense KVCache mask: holes allowed)

The kernel is the decode-attention design (ops/decode_attention.py —
block-diagonal GQA, DMA-ring streaming, fused int8 dequant) with two
serving-specific changes:

  - the chunk DMA source is INDIRECT: chunk i of row b streams from
    k_pages[layer, page_table[b, i]] — the page table rides scalar
    prefetch (SMEM), so indirection costs nothing; page size IS the
    chunk size, and a page is a single contiguous DMA.
  - the chunk loop bound is PER ROW (n_valid_pages[b], also scalar
    prefetch): each request streams only its own reserved pages. The
    dense kernel bounds every row by the batch max — under ragged
    serving traffic that reads up to the longest row's cache for every
    row; here bandwidth scales with each row's own length.

Causality is mask-bounded (the serving decode contract: the row's mask
covers exactly its written slots), so the kernel needs no causal/sliding
machinery. The reference has no serving or paging anywhere (lockstep HF
generate over dense caches, rag/eval.py:296-302).
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
NBUF = 4  # DMA ring depth
VMEM_BUDGET = 12 * 2**20
MAX_ACC_BYTES = 2 * 2**20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    layer_ref,  # [1] int32 scalar prefetch
    nvo_ref,  # [B, 2] int32 per-row (valid page count, causal offset)
    pt_ref,  # [B, maxp] int32 page table
    mask_ref,  # [1, 1, Smax] int32 logical slot validity (this row)
    q_ref,  # [1, HRP, KD] block-diagonal queries
    k_hbm,  # [L, P, page, KD] page pool, HBM-resident
    v_hbm,
    *refs,  # quant: ks_hbm/vs_hbm [L, P, Kv, page] then outputs/scratch
    scale: float,
    page: int,
    group: int,  # query heads per kv head (GQA)
    n_kv: int,
    scale_reps: int,
    quant: bool,
    causal: bool,
):
    if quant:
        (ks_hbm, vs_hbm, o_ref,
         k_scr, v_scr, ks_scr, vs_scr, sems) = refs
    else:
        o_ref, k_scr, v_scr, sems = refs
        ks_scr = vs_scr = ks_hbm = vs_hbm = None
    b = pl.program_id(0)
    layer = layer_ref[0]
    n_valid = nvo_ref[b, 0]
    offset = nvo_ref[b, 1]

    def dmas(slot, ik):
        pid = pt_ref[b, ik]
        out = [
            pltpu.make_async_copy(
                k_hbm.at[layer, pid], k_scr.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, pid], v_scr.at[slot], sems.at[slot, 1]
            ),
        ]
        if quant:
            out += [
                pltpu.make_async_copy(
                    ks_hbm.at[layer, pid], ks_scr.at[slot], sems.at[slot, 2]
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[layer, pid], vs_scr.at[slot], sems.at[slot, 3]
                ),
            ]
        return out

    o_ref[0] = jnp.zeros_like(o_ref[0])  # masked-empty rows stay finite

    @pl.when(n_valid > 0)
    def _run():
        for j in range(NBUF - 1):
            @pl.when(j < n_valid)
            def _(j=j):
                for d in dmas(j, j):
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
            ) * scale  # [HRP, page]
            if quant:
                s = s * pltpu.repeat(
                    ks_scr[slot].astype(jnp.float32), scale_reps, axis=0
                )

            kmask = mask_ref[0, 0, pl.ds(ik * page, page)]
            keep = jnp.broadcast_to(kmask[None, :] > 0, s.shape)
            if causal:
                # verify chunk (Sq > 1): q row = rep * n_kv + head with
                # rep = sq * group + g; its token sits at LOGICAL slot
                # offset + sq and may only see slots at or before it
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                q_pos = offset + (row // n_kv) // group
                k_pos = ik * page + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1
                )
                keep &= k_pos <= q_pos
            s = jnp.where(keep, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            vb = v_scr[slot]
            if quant:
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
        m, l, acc = jax.lax.fori_loop(0, n_valid, body, init)
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "page", "group", "n_kv", "causal")
)
def _paged_call(
    qbd: jax.Array,  # [B, HRP, KD]
    k_pages: jax.Array,  # [L, P, page, KD]
    v_pages: jax.Array,
    mask: jax.Array,  # [B, Smax] logical
    layer_arr: jax.Array,  # [1] int32
    nvo: jax.Array,  # [B, 2] int32 per-row (valid pages, causal offset)
    page_table: jax.Array,  # [B, maxp] int32
    k_scale: Optional[jax.Array] = None,  # [L, P, Kv, page]
    v_scale: Optional[jax.Array] = None,
    *,
    scale: float,
    page: int,
    group: int,
    n_kv: int,
    causal: bool = False,
):
    B, HRP, KD = qbd.shape
    Smax = mask.shape[1]
    quant = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, 1, Smax), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((1, HRP, KD), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((NBUF, page, KD), k_pages.dtype),
        pltpu.VMEM((NBUF, page, KD), v_pages.dtype),
    ]
    operands = [layer_arr, nvo, page_table,
                mask[:, None, :], qbd, k_pages, v_pages]
    if quant:
        Kv = k_scale.shape[2]
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        scratch += [
            pltpu.VMEM((NBUF, Kv, page), k_scale.dtype),
            pltpu.VMEM((NBUF, Kv, page), v_scale.dtype),
        ]
        operands += [k_scale, v_scale]
    scratch.append(pltpu.SemaphoreType.DMA((NBUF, 4 if quant else 2)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HRP, KD), lambda b, *_: (b, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel,
        scale=scale, page=page, group=group, n_kv=n_kv,
        scale_reps=HRP // n_kv, quant=quant, causal=causal,
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


def _gather_reference(
    q, k_pages, v_pages, page_table, mask, *, layer, num_kv_heads,
    k_scale, v_scale, causal=False, offset=0
):
    """XLA oracle / fallback: gather the rows' pages into a dense logical
    cache and run masked attention. Materializes [B, Smax, KD] per layer —
    use only for tests and geometries the kernel rejects."""
    from gritlm_tpu.ops.attention import multi_head_attention

    B, Sq, H, Dh = q.shape
    page = k_pages.shape[2]
    maxp = page_table.shape[1]
    lk = jax.lax.dynamic_index_in_dim(k_pages, layer, 0, keepdims=False)
    lv = jax.lax.dynamic_index_in_dim(v_pages, layer, 0, keepdims=False)
    pt = jnp.clip(page_table, 0, lk.shape[0] - 1)
    k = jnp.take(lk, pt.reshape(-1), axis=0).reshape(B, maxp * page, -1)
    v = jnp.take(lv, pt.reshape(-1), axis=0).reshape(B, maxp * page, -1)
    k = k.reshape(B, maxp * page, num_kv_heads, Dh)
    v = v.reshape(B, maxp * page, num_kv_heads, Dh)
    if k_scale is not None:
        ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
        # [P, Kv, page] → per-row [B, Smax, Kv, 1]
        ks = jnp.take(ks, pt.reshape(-1), axis=0).reshape(
            B, maxp, num_kv_heads, page).transpose(0, 1, 3, 2).reshape(
            B, maxp * page, num_kv_heads)[..., None]
        vs = jnp.take(vs, pt.reshape(-1), axis=0).reshape(
            B, maxp, num_kv_heads, page).transpose(0, 1, 3, 2).reshape(
            B, maxp * page, num_kv_heads)[..., None]
        k = (k.astype(jnp.float32) * ks.astype(jnp.float32)).astype(q.dtype)
        v = (v.astype(jnp.float32) * vs.astype(jnp.float32)).astype(q.dtype)
    return multi_head_attention(q, k, v, mask, causal=causal, offset=offset)


def paged_decode(
    q: jax.Array,  # [B, 1, H, Dh]
    k_pages: jax.Array,  # [L, P, page, Kv*Dh]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, maxp] int32
    mask: jax.Array,  # [B, maxp*page] logical slot validity
    *,
    layer: int | jax.Array = 0,
    num_kv_heads: Optional[int] = None,
    k_scale: Optional[jax.Array] = None,  # [L, P, Kv, page]
    v_scale: Optional[jax.Array] = None,
    causal: bool = False,
    offset: int | jax.Array = 0,  # [B] or scalar LOGICAL slot of q row 0
) -> jax.Array:
    """Decode attention over a paged pool (mask-bounded causality — the
    serving per-row contract). `causal=True` with per-row `offset` adds
    the intra-chunk causal bound for Sq > 1 speculative verify chunks:
    query j of row b sees logical slots <= offset[b] + j. Dispatches to
    the Pallas kernel where the geometry allows, else the gather
    fallback."""
    B, Sq, H, Dh = q.shape
    page = k_pages.shape[2]
    KD = k_pages.shape[3]
    Hkv = num_kv_heads if num_kv_heads is not None else KD // Dh
    group = H // Hkv
    maxp = page_table.shape[1]
    mask = mask.astype(jnp.int32)
    offset = jnp.broadcast_to(jnp.asarray(offset, jnp.int32), (B,))

    # per-row valid page count: pages at/after the last valid logical slot
    blk = jnp.arange(mask.shape[1], dtype=jnp.int32) // page + 1
    n_valid = jnp.max(mask * blk[None, :], axis=1)  # [B]
    if causal:
        # no row attends beyond logical slot offset + Sq - 1
        n_valid = jnp.minimum(n_valid, (offset + Sq - 1) // page + 1)

    rows = Sq * group
    t = 8 // math.gcd(Hkv, 8)
    RP = max(-(-rows // t) * t, t)
    HRP = RP * Hkv
    kernel_ok = (
        KD % 128 == 0
        and HRP * KD * 4 <= MAX_ACC_BYTES
        and page in (128, 256, 512)
        and (NBUF * 2 * page * KD * k_pages.dtype.itemsize
             + 2 * HRP * page * 4 + HRP * KD * 8) <= VMEM_BUDGET
    )
    if not kernel_ok:
        return _gather_reference(
            q, k_pages, v_pages, page_table, mask,
            layer=layer, num_kv_heads=Hkv,
            k_scale=k_scale, v_scale=v_scale,
            causal=causal, offset=offset,
        )

    qh = q.reshape(B, Sq, Hkv, group, Dh).transpose(0, 1, 3, 2, 4)
    qh = qh.reshape(B, rows, Hkv, Dh)
    if rows < RP:
        qh = jnp.pad(qh, ((0, 0), (0, RP - rows), (0, 0), (0, 0)))
    eye = jnp.eye(Hkv, dtype=qh.dtype)
    qbd = jnp.einsum("brhd,hk->brhkd", qh, eye).reshape(B, HRP, KD)

    obd = _paged_call(
        qbd, k_pages, v_pages, mask,
        jnp.asarray(layer, jnp.int32)[None],
        jnp.stack([n_valid.astype(jnp.int32), offset], axis=1),
        jnp.clip(page_table, 0, k_pages.shape[1] - 1).astype(jnp.int32),
        k_scale, v_scale,
        scale=Dh ** -0.5, page=page, group=group, n_kv=Hkv, causal=causal,
    )
    o5 = obd.reshape(B, RP, Hkv, Hkv, Dh)
    oh = jnp.einsum("brhkd,hk->brhd", o5, eye.astype(jnp.float32))
    oh = oh.astype(obd.dtype)[:, :rows]
    out = oh.reshape(B, Sq, group, Hkv, Dh).transpose(0, 1, 3, 2, 4)
    return out.reshape(B, Sq, H, Dh)
