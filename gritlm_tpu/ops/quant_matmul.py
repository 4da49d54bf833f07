"""Fused w4a16 matmul: packed-int4 weights dequantized in VMEM.

Decode is weight-bandwidth bound — every step streams every parameter
through HBM once (SURVEY §6; the reference's 4-bit answer is bitsandbytes
NF4 on GPU, gritlm/training/run.py:236-284). A plain XLA path would read
the packed bytes, materialize the bf16 weight in HBM, and read it back
(≥4.5 bytes/weight of traffic — worse than bf16). This kernel keeps HBM
traffic at the packed 0.5 bytes/weight: each grid step DMAs one packed
block into VMEM (Pallas double-buffers it against the MXU work), unpacks
the two nibbles with vector ops, applies the group scales, and feeds the
MXU directly.

Three design points matter on TPU (found by profiling the decode loop):

1. **Layer-stacked weights + scalar prefetch.** The decode trunk is a
   `lax.scan` over stacked per-layer params. If the kernel took a per-layer
   [K/2, N] operand, XLA would have to *materialize* the scan's
   dynamic-slice for the custom call (a full HBM copy of every weight,
   every layer, every token — measured ~650us/step of a ~3.7ms step on the
   1B bench). Instead the kernel takes the whole stacked [L, K/2, N] array
   plus the layer index as a scalar-prefetch operand; the BlockSpec
   index_map picks the layer, so blocks stream straight from the resident
   stacked buffer with zero copies (models/transformer._split_q4_leaves
   keeps these arrays out of the scan xs).

2. **Whole-x operand, contiguous half windows.** x is tiny at decode
   ([rows<=128, K] bf16); splitting it outside the kernel cost XLA
   strided-gather + layout-change fusions (~280us/step measured). The
   packing is *half-split* (low nibble = contracting row r, high nibble =
   row r + K/2, training/quant.quantize_kernel_int4) precisely so the two
   x views the split-dot needs are contiguous lane windows of the resident
   x — no de-interleave anywhere.

3. **Tile-aligned scale blocks.** Per k-block the kernel needs gbh = kbp/g
   scale rows. If gbh were < 8 (e.g. the GPU-conventional g=128 with a
   256-row block), every way of delivering those rows loses: a [gbh, nb]
   BlockSpec breaks Mosaic's sublane rule, an in-kernel sublane slice
   can't be proven 8-aligned, a re-blocked view forces an XLA retile copy
   of the stacked scales every step (~200us/step measured — the (8,128)
   tiling packs 8 group rows per tile), and a one-hot-dot row select
   serializes into the critical path (~+400us/step measured). So the
   serving group size is 32 (quant.INT4_GROUP_SIZE) and blocks are chosen
   with gbh a multiple of 8: the [L, 2, k-blocks, gbh, N] view of the
   stored scale is a free bitcast, and finer groups improve int4 quality
   as a side effect.

Layout contract (training/quant.quantize_kernel_int4): packed uint8
[K/2, N], LOW nibble = contracting row r, HIGH nibble = row r + K/2,
values offset-binary (nibble - 8 in [-8, 7]); fp32 scale [K/g, N], one per
(contracting group, output channel), group rows in unpacked-row order (lo
half then hi half). The kernel computes
y = x[:, :K/2] @ dequant(lo) + x[:, K/2:] @ dequant(hi) with the group
scale applied to the unpacked weights in fp32 before the bf16 cast — the
same rounding as the XLA reference path (dequantize_kernel_int4)."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_FORCE_KERNEL = False  # tests flip this to validate the kernel in interpret

# use the kernel only for decode-shaped row counts; prefill/encode rows are
# MXU-bound, where dequantize-once + native bf16 matmul wins
MAX_KERNEL_ROWS = 128
_KBLK_CAP = 256  # packed rows per block; bounds VMEM temps
_NBLK_CAP = 2048


def _slice_node(node: dict) -> dict:
    """Resolve a layer-stacked node ({"q4"|"q8": [L, ...], "lidx": i}) to
    the 2-D view for the XLA fallback path (the slice fuses into the
    dequant)."""
    if "lidx" in node:
        key = "q4" if "q4" in node else "q8"
        return {
            key: node[key][node["lidx"]],
            "scale": node["scale"][node["lidx"]],
        }
    return node


def _reference(x: jax.Array, node: dict) -> jax.Array:
    from gritlm_tpu.training.quant import dequantize_kernel_int4

    return x @ dequantize_kernel_int4(_slice_node(node), x.dtype)


def _reference8(x: jax.Array, node: dict) -> jax.Array:
    from gritlm_tpu.training.quant import dequantize_kernel

    return x @ dequantize_kernel(_slice_node(node), x.dtype)


def _pick_block(dim: int, align: int, cap: int):
    """Largest multiple of `align` that divides `dim`, at most `cap`."""
    best = None
    for m in range(align, min(dim, cap) + 1, align):
        if dim % m == 0:
            best = m
    if best is None and dim <= cap and dim % align == 0:
        best = dim
    return best


def _kernel(lidx_ref, x_ref, w_ref, slo_ref, shi_ref, o_ref, acc_ref,
            *, g: int, kp: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kbp, nb = w_ref.shape[1], w_ref.shape[2]
    gbh = kbp // g
    q = w_ref[0].astype(jnp.int32)  # uint8 zero-extends: [kbp, nb]
    slo = slo_ref[0, 0, 0]  # [gbh, nb] f32
    shi = shi_ref[0, 0, 0]
    lo = ((q & 0xF) - 8).reshape(gbh, g, nb)
    hi = ((q >> 4) - 8).reshape(gbh, g, nb)
    wlo = (lo * slo[:, None, :]).reshape(kbp, nb).astype(jnp.bfloat16)
    whi = (hi * shi[:, None, :]).reshape(kbp, nb).astype(jnp.bfloat16)
    xe = x_ref[:, pl.ds(k * kbp, kbp)]
    xo = x_ref[:, pl.ds(kp + k * kbp, kbp)]
    acc_ref[:] += jnp.dot(
        xe, wlo, preferred_element_type=jnp.float32
    ) + jnp.dot(xo, whi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kbp", "nb", "g", "out_dtype")
)
def _w4_call(x2, packed, scale, lidx, *, kbp, nb, g, out_dtype):
    Mp, K = x2.shape
    L, Kp, N = packed.shape
    gbh = kbp // g
    kblocks = Kp // kbp
    grid = (N // nb, kblocks)
    # Leading-dim split of the group axis. gbh is a multiple of 8 (enforced
    # by the caller's block choice), so every split boundary lands on an
    # (8,128) tile boundary of the stored [L, G, N] layout and the reshape
    # is a FREE bitcast — each block's scale rows arrive as a whole
    # dimension with no retile copy and no sublane slicing (design note 3).
    scale5 = scale.reshape(L, 2, kblocks, gbh, N)
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, kp=Kp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # x whole-resident: fetched once, sliced per block in VMEM
                pl.BlockSpec((Mp, K), lambda n, k, l: (0, 0)),
                pl.BlockSpec((1, kbp, nb), lambda n, k, l: (l[0], k, n)),
                pl.BlockSpec(
                    (1, 1, 1, gbh, nb), lambda n, k, l: (l[0], 0, k, 0, n)
                ),
                pl.BlockSpec(
                    (1, 1, 1, gbh, nb), lambda n, k, l: (l[0], 1, k, 0, n)
                ),
            ],
            out_specs=pl.BlockSpec((Mp, nb), lambda n, k, l: (0, n)),
            scratch_shapes=[pltpu.VMEM((Mp, nb), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * 2 * Kp * N,
            bytes_accessed=Kp * N + (2 * Kp // g) * N * 4
            + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(lidx, x2, packed, scale5, scale5)
    return out


_KBLK_CAP8 = 512  # int8 contracting-block cap (no nibble temps → roomier)
_MBLK_CAP8 = 256  # row-block cap: lets the kernel cover prefill row counts
# int8 row-count ceiling. Decode (M≤128) is weight-bandwidth-bound: the
# kernel reads 1 byte/weight vs the XLA dequant path's ~5 (int8 read +
# bf16 write + bf16 read of the materialized copy). Chunked-prefill row
# counts stay traffic-bound until roughly M ≈ 2·peak_flops/(5·HBM_BW)
# ≈ 600 rows on v5e — past that the native bf16 matmul is MXU-bound and
# dequant materialization amortizes, so the kernel stops paying.
MAX_KERNEL_ROWS8 = 512


def _kernel8(lidx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
    """w8a16 block matmul: int8 weight block → bf16 (EXACT: |q|≤127) feeds
    the MXU; the per-output-channel scale applies once to the fp32
    accumulator at the last k step (quantize_kernel's scale is per [1, N],
    not per k-group, so it commutes out of the contraction — unlike int4's
    grouped scales, which must weight each partial block)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = w_ref[0].astype(jnp.bfloat16)  # [kb, nb]
    acc_ref[:] += jnp.dot(x_ref[:], wq, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[0, 0][None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mb", "kb", "nb", "out_dtype"))
def _w8_call(x2, q8, scale, lidx, *, mb, kb, nb, out_dtype):
    Mp, K = x2.shape
    L, _, N = q8.shape
    grid = (Mp // mb, N // nb, K // kb)
    out = pl.pallas_call(
        _kernel8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((mb, kb), lambda m, n, k, l: (m, k)),
                pl.BlockSpec((1, kb, nb), lambda m, n, k, l: (l[0], k, n)),
                pl.BlockSpec((1, 1, nb), lambda m, n, k, l: (l[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((mb, nb), lambda m, n, k, l: (m, n)),
            scratch_shapes=[pltpu.VMEM((mb, nb), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + N * 4 + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(lidx, x2, q8, scale)
    return out


def w8a16_matmul(x: jax.Array, node: dict, out_dtype=None) -> jax.Array:
    """x [..., K] @ dequant(node) → [..., N] for int8 serving leaves.

    node = {"q8": int8 [K, N], "scale": f32 [1, N]} — or the layer-stacked
    serving form {"q8": [L, K, N], "scale": [L, 1, N], "lidx": i} from the
    decode scan. Row counts up to MAX_KERNEL_ROWS8 stream the PACKED int8
    bytes through a Pallas kernel (1 byte/weight of HBM traffic; the XLA
    path dequantizes through an HBM-materialized bf16 copy ≈5 bytes/weight)
    — that covers decode steps AND chunked-prefill blocks, both of which
    are dequant-traffic-bound. Falls back to XLA dequantize-matmul for
    encode/full-prefill row counts (MXU-bound — the copy amortizes),
    non-tiling geometries, or off-TPU.

    Numerics: int8 → bf16 is exact, the dot accumulates fp32, and the
    per-channel scale applies once at the end — at least as accurate as
    the XLA path (which rounds q*scale to bf16 per weight first)."""
    q8, scale = node["q8"], node["scale"]
    stacked = q8.ndim == 3
    *lead, K = x.shape
    Kq, N = q8.shape[-2:]
    assert K == Kq, (K, Kq)
    M = 1
    for d in lead:
        M *= d
    out_dtype = out_dtype or x.dtype

    use_kernel = (not _interpret() or _FORCE_KERNEL) and M <= MAX_KERNEL_ROWS8
    kb = nb = None
    if use_kernel:
        kb = _pick_block(K, 256, _KBLK_CAP8)
        nb = _pick_block(N, 128, _NBLK_CAP)
        use_kernel = kb is not None and nb is not None

    if not use_kernel:
        return _reference8(x, node).astype(out_dtype)

    if not stacked:
        q8, scale = q8[None], scale[None]
    lidx = jnp.asarray(node.get("lidx", 0), jnp.int32).reshape(1)
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    # pad rows to the block: decode rounds to one sublane-aligned block,
    # prefill rows to a multiple of the row-block cap
    mb = max(16, min(_MBLK_CAP8, -(-M // 16) * 16))
    Mp = -(-M // mb) * mb
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _w8_call(
        x2, q8, scale.astype(jnp.float32), lidx,
        mb=mb, kb=kb, nb=nb, out_dtype=out_dtype,
    )
    return out[:M].reshape(*lead, N)


def w4a16_matmul(x: jax.Array, node: dict, out_dtype=None) -> jax.Array:
    """x [..., K] @ dequant(node) → [..., N].

    node = {"q4": uint8 [K/2, N], "scale": f32 [K/g, N]} — or the
    layer-stacked serving form {"q4": [L, K/2, N], "scale": [L, K/g, N],
    "lidx": int32 scalar} produced by the decode scan (models/transformer
    forward attaches "lidx" instead of letting the scan slice the stack).
    Falls back to the XLA dequantize-and-matmul when the row count is
    prefill-sized, the geometry doesn't tile (tiny test models), or
    off-TPU."""
    packed, scale = node["q4"], node["scale"]
    stacked = packed.ndim == 3
    *lead, K = x.shape
    Kp, N = packed.shape[-2:]
    G = scale.shape[-2]
    assert K == 2 * Kp, (K, Kp)
    M = 1
    for d in lead:
        M *= d
    out_dtype = out_dtype or x.dtype

    use_kernel = (not _interpret() or _FORCE_KERNEL) and M <= MAX_KERNEL_ROWS
    g = (2 * Kp) // G  # unpacked rows per scale group
    kbp = nb = None
    if use_kernel:
        # block constraints: gbh = kbp/g a multiple of 8 (tile-aligned
        # scale views, design note 3) and 128-lane alignment of both x
        # half-windows → kbp mult of lcm(8g, 128), Kp mult of 128
        align = 8 * g * 128 // math.gcd(8 * g, 128)
        kbp = _pick_block(Kp, align, _KBLK_CAP) if Kp % 128 == 0 else None
        nb = _pick_block(N, 128, _NBLK_CAP)
        use_kernel = kbp is not None and nb is not None

    if not use_kernel:
        return _reference(x, node).astype(out_dtype)

    if not stacked:
        packed, scale = packed[None], scale[None]
    lidx = jnp.asarray(node.get("lidx", 0), jnp.int32).reshape(1)
    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Mp = max(16, -(-M // 16) * 16)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _w4_call(
        x2, packed, scale, lidx, kbp=kbp, nb=nb, g=g, out_dtype=out_dtype
    )
    return out[:M].reshape(*lead, N)
