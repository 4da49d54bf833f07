"""GRIT training losses.

Contrastive (InfoNCE with in-batch + cross-device negatives) and next-token
loss, matching the reference semantics (gritlm/training/model.py:25-107)
but built for SPMD:

Under pjit/GSPMD the "cross-device negatives" all_gather is implicit — the
loss is written against the *global* batch and XLA materializes each shard's
view of `scores = q @ p.T / τ` by all-gathering the sharded reps over ICI
(reference does this by hand with dist.all_gather + own-rank re-insertion to
keep gradients, model.py:49-60; differentiable by construction here).
`axis_name` is only needed on explicit shard_map paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _cross_entropy(scores: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE over rows; scores [N, M] fp32, integer targets [N]."""
    logz = jax.nn.logsumexp(scores, axis=-1)
    picked = jnp.take_along_axis(scores, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)


def contrastive_loss(
    q_reps: jax.Array,  # [Q, D] normalized query reps
    p_reps: jax.Array,  # [P, D] normalized passage reps, P = Q * group_size
    temperature: float = 0.02,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """InfoNCE: each query's positive is the first passage of its group —
    target stride P/Q (reference model.py:42-47)."""
    if axis_name is not None:
        # explicit shard_map path: gather global negatives over the mesh axis
        q_reps = _all_gather_cat(q_reps, axis_name)
        p_reps = _all_gather_cat(p_reps, axis_name)
    q = q_reps.astype(jnp.float32)
    p = p_reps.astype(jnp.float32)
    scores = (q @ p.T) / temperature  # [Q, P]
    nq, npas = scores.shape
    targets = jnp.arange(nq, dtype=jnp.int32) * (npas // nq)
    return _cross_entropy(scores, targets)


def _all_gather_cat(x: jax.Array, axis_name: str) -> jax.Array:
    g = jax.lax.all_gather(x, axis_name)  # [W, n, D]
    return g.reshape((-1,) + x.shape[1:])


def next_token_loss(
    logits: jax.Array,  # [B, S, V]
    labels: jax.Array,  # [B, S]; -100 = ignore
    loss_type: str = "mixed",
    loss_factor: float = 1.0,
) -> jax.Array:
    """Shifted CE. `mixed` = mean over non-ignored tokens (per-batch token
    weighting); `token` = sum / batch_size (global token weighting, used for
    8x7B with loss_factor 0.003). Rationale discussion: reference
    model.py:66-107."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    picked = jnp.take_along_axis(shift_logits, safe_labels[..., None], axis=-1)[..., 0]
    per_token = jnp.where(valid, logz - picked, 0.0)
    total = jnp.sum(per_token)
    if loss_type == "token":
        return (total / labels.shape[0]) * loss_factor
    if loss_type == "mixed":
        denom = jnp.maximum(jnp.sum(valid), 1)
        return (total / denom) * loss_factor
    raise ValueError(f"Invalid loss_gen_type: {loss_type}")
