"""Pipeline parallelism: GPipe microbatch schedule over the `stage` mesh axis.

The reference's only "pipeline" is HF device_map=auto layer placement for
big-model inference (evaluation/eval_mteb.py:1128-1131) — sequential, one
device busy at a time. This is a real pipeline: the stacked layer pytree is
split into `stage` contiguous slices (one per device group along the mesh's
`stage` axis), the batch into M microbatches, and activations flow stage→
stage over `ppermute` inside `shard_map`. All stages compute concurrently;
the bubble is the usual (S-1)/(M+S-1). Backward comes from jax.grad through
the schedule (ppermute/scan are differentiable), so pipelined *training*
works too; activation memory is bounded with per-layer remat.

Composition: `stage` is manual (shard_map); `data` and `fsdp` are manual
too — the batch splits over (data, fsdp) like the GSPMD step's BATCH_AXES,
and each stage's layer params are ZeRO-3 storage-sharded over `fsdp`
(all-gathered once per step inside the body; the cotangent of that gather is
a reduce-scatter, so grads and optimizer state stay sharded). TP inside a
stage is not composed in v1 — use the default GSPMD path
(train.make_sharded_train_step) for tp/ep.

Embedding, final norm and the LM head run outside the pipelined region under
plain GSPMD (they are a tiny fraction of the FLOPs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.models.transformer import apply_layer_stack
from gritlm_tpu.parallel.mesh import AXIS_DATA, AXIS_FSDP, AXIS_STAGE


def layer_fsdp_dim(shape, n_fsdp: int):
    """Which dim of a stacked layer leaf [L, ...] the `fsdp` axis shards
    (ZeRO-3 storage sharding inside a pipeline stage): the first non-L dim
    divisible by the axis size, or None (replicate small leaves)."""
    if n_fsdp <= 1:
        return None
    for d in range(1, len(shape)):
        if shape[d] % n_fsdp == 0 and shape[d] >= n_fsdp:
            return d
    return None


def layer_param_pipeline_specs(layer_params, n_fsdp: int):
    """PartitionSpec tree for the stacked layer pytree under pipeline
    training: L over `stage`, plus one dim over `fsdp` when divisible."""

    def spec(leaf):
        d = layer_fsdp_dim(leaf.shape, n_fsdp)
        if d is None:
            return P(AXIS_STAGE)
        entries = [AXIS_STAGE] + [None] * (d - 1) + [AXIS_FSDP]
        return P(*entries)

    return jax.tree_util.tree_map(spec, layer_params)


def pipeline_apply_layers(
    layer_params: dict,
    x: jax.Array,  # [B, S, D] embedded inputs
    positions: jax.Array,  # [B, S]
    attention_mask: Optional[jax.Array],  # [B, S]
    cfg: ModelConfig,
    mesh: Mesh,
    *,
    causal: bool,
    n_microbatches: int,
    remat: bool = True,
    collect_router_stats: bool = False,
):
    """Run the full layer stack through the pipeline. Returns hidden [B,S,D]
    (pre-final-norm); with `collect_router_stats=True` (MoE training)
    returns (hidden, (cnt [E], prob [E])) — the load-balancing numerators
    summed over ALL layers and the GLOBAL batch (each stage accumulates
    its layer slice's stats per real microbatch tick, then a psum over
    (stage, data, fsdp) makes them global; see apply_layer_stack).
    Requires L % n_stages == 0 and (per-data-shard batch)
    % n_microbatches == 0."""
    n_stages = mesh.shape[AXIS_STAGE]
    L = jax.tree_util.tree_leaves(layer_params)[0].shape[0]
    if L % n_stages:
        raise ValueError(f"layers {L} not divisible by stages {n_stages}")
    if n_stages == 1:
        return apply_layer_stack(
            layer_params, x, positions, attention_mask, cfg,
            causal=causal, remat=remat,
            collect_router_stats=collect_router_stats,
        )

    B = x.shape[0]
    M = n_microbatches
    mask = (attention_mask if attention_mask is not None
            else jnp.ones(x.shape[:2], jnp.int32))

    # layer slices: leading L axis sharded over `stage`; ZeRO-3-style storage
    # sharding of each stage's params over `fsdp` (gathered once per step
    # inside the body — the reference's FSDP×pipeline analogue, its 8x7B
    # recipe is FSDP over 256 GPUs, train_gritlm_8x7b.sh:38-84); batch over
    # (`data`, `fsdp`) like the GSPMD step's BATCH_AXES.
    n_fsdp = mesh.shape.get(AXIS_FSDP, 1)
    lp_spec = layer_param_pipeline_specs(layer_params, n_fsdp)
    fsdp_dims = [
        layer_fsdp_dim(l.shape, n_fsdp)
        for l in jax.tree_util.tree_leaves(layer_params)
    ]
    batch_axes = (AXIS_DATA, AXIS_FSDP)
    x_spec = P(batch_axes)  # [B, S, D] → per-shard [B/(d·f), S, D]
    m_spec = P(batch_axes)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(lp_spec, x_spec, m_spec, m_spec),
        out_specs=(x_spec, (P(), P())) if collect_router_stats else x_spec,
        check_vma=False,
    )
    def run(lp_local, x_local, pos_local, mask_local):
        s = jax.lax.axis_index(AXIS_STAGE)
        if n_fsdp > 1:
            # gather each stage's full layer params over the fsdp axis once
            # per step; autodiff turns this into a reduce-scatter of the
            # grads, so grads/optimizer state stay fsdp-sharded (ZeRO)
            flat, treedef = jax.tree_util.tree_flatten(lp_local)
            flat = [
                x if d is None
                else jax.lax.all_gather(x, AXIS_FSDP, axis=d, tiled=True)
                for x, d in zip(flat, fsdp_dims)
            ]
            lp_local = jax.tree_util.tree_unflatten(treedef, flat)
        b = x_local.shape[0]
        if b % M:
            raise ValueError(f"per-shard batch {b} not divisible by "
                             f"microbatches {M}")
        mb = b // M
        xm = x_local.reshape(M, mb, *x_local.shape[1:])
        posm = pos_local.reshape(M, mb, pos_local.shape[1])
        maskm = mask_local.reshape(M, mb, mask_local.shape[1])

        def stage_compute(act, pos_mb, mask_mb):
            return apply_layer_stack(
                lp_local, act, pos_mb, mask_mb, cfg,
                causal=causal, remat=remat,
                collect_router_stats=collect_router_stats,
            )

        zeros_act = jnp.zeros_like(xm[0])
        n_ticks = M + n_stages - 1
        # GPipe schedule: at tick t, stage s works on microbatch t - s.
        # Every stage computes every tick (bubble ticks produce garbage that
        # is never written out) — uniform control flow, no data-dependent
        # branches, which is what the TPU wants.
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        E = getattr(cfg, "num_local_experts", 1) or 1
        zero_stats = (jnp.zeros((E,), jnp.float32),
                      jnp.zeros((E,), jnp.float32))

        def tick(carry, t):
            act_in, acc = carry
            mb_idx = jnp.clip(t - s, 0, M - 1)
            my_in = jnp.where(s == 0, xm[jnp.clip(t, 0, M - 1)], act_in)
            pos_mb = posm[mb_idx]
            mask_mb = maskm[mb_idx]
            y = stage_compute(my_in, pos_mb, mask_mb)
            if collect_router_stats:
                # bubble ticks compute garbage microbatches (uniform
                # control flow); gate their stats so each real microbatch
                # contributes exactly once per stage
                y, (cnt, prob) = y
                valid = ((t >= s) & (t - s <= M - 1)).astype(jnp.float32)
                acc = (acc[0] + valid * cnt, acc[1] + valid * prob)
            act_next = jax.lax.ppermute(y, AXIS_STAGE, perm)
            # last stage owns microbatch t-(S-1) when it's in range
            out_idx = t - (n_stages - 1)
            is_mine = (s == n_stages - 1) & (out_idx >= 0)
            out = jnp.where(is_mine, y, 0.0)
            return (act_next, acc), (out, jnp.where(is_mine, out_idx, M))
        # dummy first-stage feed beyond M is clipped; its output is discarded

        (_, stats_acc), (outs, idxs) = jax.lax.scan(
            tick, (zeros_act, zero_stats), jnp.arange(n_ticks)
        )
        # scatter collected outputs into [M, mb, S, D]; rows with idx == M
        # (other stages / bubble ticks) fall into a discard slot
        buf = jnp.zeros((M + 1,) + outs.shape[1:], outs.dtype)
        buf = buf.at[idxs].add(outs)
        result = buf[:M]
        # only the last stage holds real outputs → share around the ring
        result = jax.lax.psum(result, AXIS_STAGE)
        result = result.reshape(b, *x_local.shape[1:])
        if collect_router_stats:
            # per-stage layer-slice sums over the local batch shard →
            # global numerators (tokens count is computed by the caller
            # from the global mask)
            axes = (AXIS_STAGE,) + tuple(
                a for a in batch_axes if mesh.shape.get(a, 1) > 1)
            stats = jax.tree_util.tree_map(
                lambda v: jax.lax.psum(v, axes), stats_acc)
            return result, stats
        return result

    return run(layer_params, x, positions, mask)


def pipeline_forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, S]
    mesh: Mesh,
    *,
    attention_mask: Optional[jax.Array] = None,
    causal: bool = True,
    n_microbatches: int = 4,
    remat: bool = True,
    collect_router_stats: bool = False,
):
    """Trunk forward with the layer stack pipelined. Returns hidden [B,S,D]
    after the final norm (same contract as transformer.forward without
    cache/aux); with `collect_router_stats=True` returns (hidden,
    (cnt [E], prob [E])) — see pipeline_apply_layers."""
    from gritlm_tpu.models.transformer import rms_norm

    B, S = input_ids.shape
    x = jnp.take(params["embed"]["embedding"], input_ids, axis=0)
    positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    x = pipeline_apply_layers(
        params["layers"], x, positions, attention_mask, cfg, mesh,
        causal=causal, n_microbatches=n_microbatches, remat=remat,
        collect_router_stats=collect_router_stats,
    )
    stats = None
    if collect_router_stats:
        x, stats = x
    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
    return (x, stats) if collect_router_stats else x
