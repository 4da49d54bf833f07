"""LoRA adapters for parameter-efficient GRIT training.

Counterpart of the reference's PEFT path (gritlm/training/run.py:217-284:
LoRA r=16, α=64 on q/k/v/o and the MLP projections). Functional formulation:
a parallel `lora` pytree holds {A [L, in, r], B [L, r, out]} per targeted
kernel; the effective weights W + (α/r)·A@B are materialized inside the
train step (XLA fuses the rank-r update into the surrounding matmuls), and
only the LoRA tree gets gradients/optimizer state. `merge` folds adapters
into the base weights for export — no runtime dependency on this module at
inference (QLoRA's NF4 quantization is GPU-bitsandbytes-specific; on TPU the
frozen base already sits in bf16).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def _target_leaves(params: dict, targets: Sequence[str]):
    """Yield (path_tuple, leaf) for targeted 3D kernels [L, in, out]."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            if path[-1] in targets and getattr(node, "ndim", 0) == 3:
                out.append((path, node))

    walk(params, ())
    return out


def init_lora(
    params: dict,
    key: jax.Array,
    r: int = 16,
    alpha: int = 64,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Tuple[Dict, float]:
    """Build the LoRA tree: A ~ N(0, 0.02), B = 0 (so W_eff starts == W).
    Returns (tree, scale) — scale = alpha/r stays OUT of the tree so the
    optimizer never touches it."""
    leaves = _target_leaves(params, targets)
    tree: Dict = {}
    keys = jax.random.split(key, max(len(leaves), 1))
    for (path, w), k in zip(leaves, keys):
        L, din, dout = w.shape
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "A": (jax.random.normal(k, (L, din, r), jnp.float32) * 0.02).astype(w.dtype),
            "B": jnp.zeros((L, r, dout), w.dtype),
        }
    return tree, float(alpha) / float(r)


def apply_lora(params: dict, lora: Dict, scale: float) -> dict:
    """Return params with W → W + scale·A@B on every adapted kernel."""

    def walk(p_node, l_node):
        if not isinstance(p_node, dict):
            return p_node
        out = {}
        for k, v in p_node.items():
            ln = l_node.get(k) if isinstance(l_node, dict) else None
            if isinstance(ln, dict) and "A" in ln and not isinstance(v, dict):
                delta = jnp.einsum(
                    "lir,lro->lio", ln["A"].astype(jnp.float32),
                    ln["B"].astype(jnp.float32),
                )
                out[k] = (v.astype(jnp.float32) + scale * delta).astype(v.dtype)
            elif isinstance(v, dict):
                out[k] = walk(v, ln or {})
            else:
                out[k] = v
        return out

    return walk(params, lora)


def merge(params: dict, lora: Dict, scale: float) -> dict:
    """Fold adapters into base weights (export path)."""
    return apply_lora(params, lora, scale)


def lora_train_step_fns(base_params: dict, cfg, tc, scale: float):
    """Returns (loss_fn(lora, batch) → (loss, aux), init) where only the LoRA
    tree is differentiated; base params are closed over frozen."""
    from gritlm_tpu.training.train import encode_reps, generative_loss
    from gritlm_tpu.training.losses import contrastive_loss

    frozen = jax.lax.stop_gradient(base_params)

    def loss_fn(lora, batch):
        params = apply_lora(frozen, lora, scale)
        loss_gen = jnp.zeros((), jnp.float32)
        loss_emb = jnp.zeros((), jnp.float32)
        if "generative" in batch and tc.mode in ("unified", "generative"):
            loss_gen = generative_loss(params, cfg, tc, batch["generative"])
        if "query" in batch and tc.mode in ("unified", "embedding"):
            q = encode_reps(params, cfg, tc, batch["query"])
            p = encode_reps(params, cfg, tc, batch["passage"])
            loss_emb = contrastive_loss(q, p, tc.temperature)
        return loss_gen + loss_emb, (loss_emb, loss_gen)

    return loss_fn
