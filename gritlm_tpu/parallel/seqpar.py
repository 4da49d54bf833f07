"""Sequence parallelism: the trunk forward with the sequence dim sharded.

Long-document encoding is the north-star RAG workload; the reference caps at
4096 tokens on one GPU (SURVEY §5.7 — no sequence parallelism exists there).
Here a document longer than one chip's HBM/attention budget is split over a
`seq` mesh axis: embeddings, norms and MLPs are token-local so they run on
local shards untouched; attention is the exact ring algorithm
(ops/ring_attention.py) — K/V shards rotate over the ICI ring via ppermute
while each device accumulates its queries' online softmax.

Backward works through jax.grad (ppermute/scan are differentiable), so this
also enables long-context *training*; combine with per-layer remat.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.models.transformer import apply_layer_stack, rms_norm

SEQ_AXIS = "seq"


def make_seq_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A dedicated 1-D sequence mesh (long-document encode typically uses
    every chip for one document)."""
    import numpy as np

    devs = jax.devices()
    devs = devs[: n_devices or len(devs)]
    return Mesh(np.asarray(devs), (SEQ_AXIS,))


def sequence_parallel_forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, S]
    mesh: Mesh,
    *,
    attention_mask: Optional[jax.Array] = None,
    causal: bool = False,  # bidirectional is the embed-mode default
    remat: bool = True,
    collect_router_stats: bool = False,
):
    """Trunk forward (hidden after final norm) with S sharded over the mesh's
    `seq` axis. S must divide by the axis size; pad + mask otherwise.
    `collect_router_stats=True` (MoE training) additionally returns the
    global load-balancing numerators (cnt [E], prob [E]) — see
    transformer.apply_layer_stack."""
    B, S = input_ids.shape
    n_seq = mesh.shape[SEQ_AXIS]
    if S % n_seq:
        raise ValueError(f"sequence length {S} not divisible by seq axis {n_seq}")
    mask = (attention_mask if attention_mask is not None
            else jnp.ones((B, S), jnp.int32))

    p_spec = jax.tree_util.tree_map(lambda _: P(), params)
    io_spec = P(None, SEQ_AXIS)

    def run(p, ids_loc, mask_loc):
        idx = jax.lax.axis_index(SEQ_AXIS)
        s_loc = ids_loc.shape[1]
        positions = idx * s_loc + jnp.arange(s_loc)[None, :]
        positions = jnp.broadcast_to(positions, ids_loc.shape)
        x = jnp.take(p["embed"]["embedding"], ids_loc, axis=0)
        x = apply_layer_stack(
            p["layers"], x, positions, mask_loc, cfg,
            causal=causal, remat=remat, ring_axis=SEQ_AXIS,
            collect_router_stats=collect_router_stats,
        )
        stats = None
        if collect_router_stats:
            # MoE routing is token-local, so each seq shard's numerators
            # cover exactly its own tokens — psum makes them global
            x, stats = x
            stats = jax.tree_util.tree_map(
                lambda v: jax.lax.psum(v, SEQ_AXIS), stats)
        x = rms_norm(x, p["final_ln"]["scale"], cfg.rms_norm_eps)
        return (x, stats) if collect_router_stats else x

    out = shard_map(
        run, mesh=mesh,
        in_specs=(p_spec, io_spec, io_spec),
        out_specs=(io_spec, (P(), P())) if collect_router_stats else io_spec,
        check_vma=False,
    )(params, input_ids, mask)
    return out


def sequence_parallel_encode(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, S]
    mesh: Mesh,
    *,
    attention_mask: Optional[jax.Array] = None,
    pooling_mask: Optional[jax.Array] = None,
    pooling_method: str = "mean",
    normalized: bool = True,
    causal: bool = False,
) -> jax.Array:
    """Long-document embedding: sequence-parallel trunk + pooling. The pooled
    rep is tiny, so pooling runs after gathering hidden back (GSPMD inserts
    the all-gather; for mean pooling this is one [B, D] psum's worth of real
    traffic after XLA's partial-reduction optimization)."""
    from gritlm_tpu.ops.pooling import pool

    hidden = sequence_parallel_forward(
        params, cfg, input_ids, mesh,
        attention_mask=attention_mask, causal=causal,
    )
    pmask = pooling_mask if pooling_mask is not None else (
        attention_mask if attention_mask is not None
        else jnp.ones(input_ids.shape, jnp.int32)
    )
    emb = pool(hidden, pmask, pooling_method)
    if normalized:
        emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb
