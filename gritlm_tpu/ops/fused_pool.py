"""Fused final-RMSNorm + masked (weighted-)mean pooling + L2 normalize.

The encode epilogue (SURVEY §7 kernels (a)): the trunk's last residual
stream is consumed exactly once here — one Pallas pass reads the pre-norm
hidden [B, S, D] from HBM and emits the pooled embedding [B, D] directly,
instead of materializing the normed [B, S, D] (rms_norm write + pool read:
two extra HBM sweeps of the largest activation in the encode step).

Semantics are exactly transformer.rms_norm followed by ops/pooling.pool
('mean' / 'weightedmean', fp32 accumulation, reference
gritlm/gritlm.py:188-218) and the encode path's L2 normalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_FORCE_KERNEL = False  # tests flip this to validate the kernel in interpret


def _reference(hidden, gamma, pool_mask, *, eps, method, normalized):
    from gritlm_tpu.models.transformer import rms_norm
    from gritlm_tpu.ops.pooling import pool

    normed = rms_norm(hidden, gamma, eps)
    emb = pool(normed, pool_mask, method)
    if normalized:
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb


def _kernel(
    mask_ref,  # [1, 1, bs] int32 pooling mask block
    x_ref,  # [1, bs, D] pre-norm hidden block
    gamma_ref,  # [1, D]
    o_ref,  # [1, 1, D] f32
    acc_scr,  # [8, D] f32 VMEM (row 0 = weighted sum)
    cnt_scr,  # [2] f32 SMEM (0 = weight sum, 1 = token count) — Mosaic
    # forbids scalar stores to VMEM; scalars live in SMEM
    *,
    eps: float,
    weighted: bool,
    normalized: bool,
):
    i = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        cnt_scr[0] = 0.0
        cnt_scr[1] = 0.0

    x = x_ref[0].astype(jnp.float32)  # [bs, D]
    g = gamma_ref[0:1].astype(jnp.float32)  # [1, D]
    xn = x * jax.lax.rsqrt(
        jnp.mean(x * x, axis=-1, keepdims=True) + eps
    ) * g
    m = mask_ref[0].astype(jnp.float32)  # [1, bs]
    if weighted:
        # global position weight = tokens-before-this-block + local cumsum
        w = m * (cnt_scr[1] + jnp.cumsum(m, axis=1))
    else:
        w = m
    acc_scr[0:1, :] += jax.lax.dot_general(
        w, xn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, D]
    cnt_scr[0] += jnp.sum(w)
    cnt_scr[1] += jnp.sum(m)

    @pl.when(i == n - 1)
    def _finish():
        denom = cnt_scr[0]
        p = acc_scr[0:1, :] / jnp.where(denom > 0, denom, 1.0)  # [1, D]
        if normalized:
            p = p / jnp.maximum(jnp.sqrt(jnp.sum(p * p)), 1e-12)
        o_ref[0] = p


@functools.partial(
    jax.jit, static_argnames=("eps", "weighted", "normalized", "bs")
)
def _fused_call(hidden, gamma, mask, *, eps, weighted, normalized, bs):
    B, S, D = hidden.shape
    n = S // bs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n),
        # mask/out carry a unit middle dim: Mosaic requires the last two
        # block dims be (×8, ×128) or equal to the array dims — (1, bs) over
        # a [B, S] array violates that; (1, 1|D over [B, 1, *] arrays don't
        in_specs=[
            pl.BlockSpec((1, 1, bs), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, bs, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, weighted=weighted,
                          normalized=normalized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(mask[:, None, :], hidden, gamma[None, :])
    return out[:, 0]


def fused_norm_mean_pool(
    hidden: jax.Array,  # [B, S, D] PRE-final-norm residual stream
    gamma: jax.Array,  # [D] final RMSNorm scale
    pool_mask: jax.Array,  # [B, S] 1 = pool over
    *,
    eps: float,
    method: str = "mean",  # mean | weightedmean
    normalized: bool = True,
) -> jax.Array:
    """≡ pool(rms_norm(hidden, gamma, eps), pool_mask, method) (+ L2
    normalize) in ONE pass over hidden. Returns [B, D] float32."""
    assert method in ("mean", "weightedmean"), method
    B, S, D = hidden.shape
    if _interpret() and not _FORCE_KERNEL:
        # non-TPU backends: same math through XLA (the interpreted kernel is
        # orders slower; tests force the kernel via _FORCE_KERNEL)
        return _reference(hidden, gamma, pool_mask, eps=eps, method=method,
                          normalized=normalized)
    if D % 128 != 0:
        # odd hidden dims (tiny test presets): same math through XLA
        return _reference(hidden, gamma, pool_mask, eps=eps, method=method,
                          normalized=normalized)
    # block the sequence; pad to a block multiple (pads carry mask 0)
    bs = min(512, -(-S // 128) * 128)
    Sp = -(-S // bs) * bs
    if Sp != S:
        hidden = jnp.pad(hidden, ((0, 0), (0, Sp - S), (0, 0)))
        pool_mask = jnp.pad(pool_mask, ((0, 0), (0, Sp - S)))
    return _fused_call(
        hidden, gamma, pool_mask.astype(jnp.int32),
        eps=eps, weighted=(method == "weightedmean"),
        normalized=normalized, bs=bs,
    )
