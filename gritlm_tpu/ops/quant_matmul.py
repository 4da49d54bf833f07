"""Fused w4a16 matmul: packed-int4 weights dequantized in VMEM.

Decode is weight-bandwidth bound — every step streams every parameter
through HBM once (SURVEY §6; the reference's 4-bit answer is bitsandbytes
NF4 on GPU, gritlm/training/run.py:236-284). A plain XLA path would read
the packed bytes, materialize the bf16 weight in HBM, and read it back
(≥4.5 bytes/weight of traffic — worse than bf16). This kernel keeps HBM
traffic at the packed 0.5 bytes/weight: each grid step DMAs one packed
block into VMEM (Pallas double-buffers it against the MXU work), unpacks
the two nibbles with vector ops, and feeds the MXU directly.

Layout contract (training/quant.quantize_kernel_int4): packed uint8
[K/2, N], LOW nibble = contracting row 2r, HIGH nibble = row 2r+1, values
offset-binary (nibble - 8 ∈ [-8, 7]); fp32 scale [K/g, N], one per
(contracting group, output channel). The even/odd split means the kernel
never interleaves: y = x[:, 0::2] @ W_even + x[:, 1::2] @ W_odd, with the
group scale applied to the fp32 partial dot (MORE precise than scaling the
bf16 weights before the dot).
"""

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
_NBLK_CAP = 2048


def _reference(x: jax.Array, node: dict) -> jax.Array:
    from gritlm_tpu.training.quant import dequantize_kernel_int4

    return x @ dequantize_kernel_int4(node, x.dtype)


def _pick_block(dim: int, align: int, cap: int):
    """Largest multiple of `align` that divides `dim`, at most `cap`."""
    best = None
    for m in range(align, min(dim, cap) + 1, align):
        if dim % m == 0:
            best = m
    if best is None and dim <= cap and dim % align == 0:
        best = dim
    return best


def _kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref, acc_ref, *, gp: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = w_ref[:].astype(jnp.int32)  # uint8 zero-extends: [Kbp, Nb]
    lo = ((q & 0xF) - 8).astype(jnp.bfloat16)  # rows 0,2,4,… exact in bf16
    hi = ((q >> 4) - 8).astype(jnp.bfloat16)  # rows 1,3,5,…
    xe = xe_ref[:]
    xo = xo_ref[:]

    kbp = w_ref.shape[0]
    groups_per_block = kbp // gp
    base = k * groups_per_block
    acc = acc_ref[:]
    for gi in range(groups_per_block):
        sl = slice(gi * gp, (gi + 1) * gp)
        part = jnp.dot(
            xe[:, sl], lo[sl], preferred_element_type=jnp.float32
        ) + jnp.dot(xo[:, sl], hi[sl], preferred_element_type=jnp.float32)
        acc = acc + part * s_ref[pl.ds(base + gi, 1), :]
    acc_ref[:] = acc

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kbp", "nb", "gp", "out_dtype"))
def _w4_call(xe, xo, packed, scale, *, kbp, nb, gp, out_dtype):
    Mp, Kp = xe.shape
    _, N = packed.shape
    G = scale.shape[0]
    grid = (N // nb, Kp // kbp)
    out = pl.pallas_call(
        functools.partial(_kernel, gp=gp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, kbp), lambda n, k: (0, k)),
            pl.BlockSpec((Mp, kbp), lambda n, k: (0, k)),
            pl.BlockSpec((kbp, nb), lambda n, k: (k, n)),
            # all groups for this N-stripe resident (≤ K/g rows, tiny);
            # constant across k so Pallas fetches it once per stripe
            pl.BlockSpec((G, nb), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, nb), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mp, nb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * 2 * Kp * N,
            bytes_accessed=Kp * N + G * N * 4 + 2 * Mp * Kp * 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xe, xo, packed, scale)
    return out


def w4a16_matmul(x: jax.Array, node: dict, out_dtype=None) -> jax.Array:
    """x [..., K] @ dequant(node) → [..., N].

    node = {"q4": uint8 [K/2, N], "scale": f32 [K/g, N]}. Falls back to the
    XLA dequantize-and-matmul when the row count is prefill-sized, the
    geometry doesn't tile (tiny test models), or off-TPU.
    """
    packed, scale = node["q4"], node["scale"]
    *lead, K = x.shape
    Kp, N = packed.shape
    G = scale.shape[0]
    assert K == 2 * Kp, (K, Kp)
    M = 1
    for d in lead:
        M *= d
    out_dtype = out_dtype or x.dtype

    use_kernel = (not _interpret() or _FORCE_KERNEL) and M <= MAX_KERNEL_ROWS
    gp = Kp // G  # packed rows per scale group
    kbp = nb = None
    if use_kernel:
        # xe/w blocks need lane-aligned K_blkp and group-aligned splits
        align = gp * 128 // math.gcd(gp, 128) if gp else 0  # lcm(gp, 128)
        kbp = _pick_block(Kp, align, 512) if align else None
        nb = _pick_block(N, 128, _NBLK_CAP)
        use_kernel = kbp is not None and nb is not None

    if not use_kernel:
        return _reference(x, node).astype(out_dtype)

    x2 = x.reshape(M, K).astype(jnp.bfloat16)
    Mp = max(16, -(-M // 16) * 16)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _w4_call(
        x2[:, 0::2], x2[:, 1::2], packed, scale,
        kbp=kbp, nb=nb, gp=gp, out_dtype=out_dtype,
    )
    return out[:M].reshape(*lead, N)
