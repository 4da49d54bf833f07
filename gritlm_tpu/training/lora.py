"""LoRA adapters for parameter-efficient GRIT training.

Counterpart of the reference's PEFT path (gritlm/training/run.py:217-284:
LoRA r=16, α=64 on q/k/v/o and the MLP projections). Functional formulation:
a parallel `lora` pytree holds {A [L, in, r], B [L, r, out]} per targeted
kernel; effective weights W + (α/r)·A@B are resolved lazily per layer inside
the model's layer scan (apply_lora_lazy + models/transformer._w) so no full
effective-weight copy ever exists, and only the LoRA tree gets gradients /
optimizer state. QLoRA analogue: quantize the frozen base to int8
(training/quant.py) — dequantized one layer at a time in the same scan.
`merge` folds adapters into dense base weights for export.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def _target_leaves(params: dict, targets: Sequence[str]):
    """Yield (path_tuple, leaf) for targeted 3D kernels [L, in, out]."""
    out = []

    def walk(node, path):
        if isinstance(node, dict) and "q8" in node:  # int8 base (quant.py)
            if path[-1] in targets and node["q8"].ndim == 3:
                out.append((path, node["q8"]))
        elif isinstance(node, dict):
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
        dt = jnp.bfloat16 if w.dtype == jnp.int8 else w.dtype  # int8 = quantized base
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "A": (jax.random.normal(k, (L, din, r), jnp.float32) * 0.02).astype(dt),
            "B": jnp.zeros((L, r, dout), dt),
        }
    return tree, float(alpha) / float(r)


def apply_lora_lazy(params: dict, lora: Dict, scale: float) -> dict:
    """Return params where each adapted kernel becomes a lazy-LoRA leaf
    {"w": base, "A": A, "B": scale·B} resolved per-layer inside the model's
    layer scan (models/transformer._w) — never materializes a full effective
    copy of the weights, and composes with int8-quantized bases
    (training/quant.py), giving the TPU QLoRA analogue."""

    def walk(p_node, l_node):
        if not isinstance(p_node, dict) or "q8" in p_node:
            return p_node
        out = {}
        for k, v in p_node.items():
            ln = l_node.get(k) if isinstance(l_node, dict) else None
            if isinstance(ln, dict) and "A" in ln:
                out[k] = {"w": v, "A": ln["A"],
                          "B": (ln["B"].astype(jnp.float32) * scale)}
            elif isinstance(v, dict):
                out[k] = walk(v, ln or {})
            else:
                out[k] = v
        return out

    return walk(params, lora)


def stack_adapters(
    params: dict, adapters: Sequence[Dict], scale: float
) -> dict:
    """Multi-LoRA serving (S-LoRA style): stack N adapter trees onto the
    base params as `{"w": base, "As": [L, n+1, in, r], "Bs": [L, n+1, r,
    out]}` leaves — slot 0 is the ZERO adapter (requests without an
    adapter resolve to the plain base with no conditionals), slot i+1 is
    adapters[i]. Bs are pre-scaled by alpha/r. The serving programs graft
    per-row adapter ids into these leaves (`set_adapter_ids`) and
    models/transformer._mm applies W·x + B[aid]ᵀ(A[aid]ᵀx) per batch row,
    so one pool serves any mix of fine-tunes over one set of base
    weights. All adapters must share rank and targets (one stacked shape
    per leaf). The reference's PEFT path loads ONE adapter per process
    (gritlm/training/run.py:217-284)."""

    def walk(p_node, l_nodes):
        if not isinstance(p_node, dict) or "q8" in p_node or "q4" in p_node:
            return p_node
        out = {}
        for k, v in p_node.items():
            lns = [ln.get(k) if isinstance(ln, dict) else None
                   for ln in l_nodes]
            adapted = [isinstance(ln, dict) and "A" in ln for ln in lns]
            if any(adapted) and not all(adapted):
                raise ValueError(
                    f"adapters disagree on target {k}: stacked serving "
                    "needs identical target sets"
                )
            if all(adapted) and lns:
                shapes = {(ln["A"].shape, ln["B"].shape) for ln in lns}
                if len(shapes) != 1:
                    raise ValueError(
                        f"adapter shapes differ at {k}: {shapes} — "
                        "stacked serving needs one rank per leaf"
                    )
                A0 = jnp.zeros_like(lns[0]["A"])
                B0 = jnp.zeros_like(lns[0]["B"])
                As = jnp.stack([A0] + [ln["A"] for ln in lns], axis=1)
                Bs = jnp.stack(
                    [B0] + [(ln["B"].astype(jnp.float32) * scale
                             ).astype(lns[0]["B"].dtype) for ln in lns],
                    axis=1,
                )  # [L, n+1, ...] — L leads so the layer scan slices it
                out[k] = {"w": v, "As": As, "Bs": Bs}
            elif isinstance(v, dict):
                out[k] = walk(v, [ln or {} for ln in lns])
            else:
                out[k] = v
        return out

    return walk(params, list(adapters))


def set_adapter_ids(params: dict, aid, num_layers: int) -> dict:
    """Graft per-row adapter ids [B] into every stacked-adapter leaf (as
    [L, B], layer-major, so the model's layer scan slices them alongside
    the weights). Pure tree restructure — free inside jit. No-op trees
    without stacked leaves return unchanged."""
    # host inputs broadcast on host (np view, no eager device op — the
    # serving scheduler calls this outside jit; the array rides the next
    # program dispatch instead of costing a device_put round-trip)
    xp = np if isinstance(aid, np.ndarray) else jnp
    aid_l = xp.broadcast_to(aid[None, :], (num_layers, aid.shape[0]))

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "As" in node and "w" in node:
            return {**node, "aid": aid_l}
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def apply_lora(params: dict, lora: Dict, scale: float) -> dict:
    """Return params with W → W + scale·A@B on every adapted kernel,
    materialized eagerly (export/merge path; use apply_lora_lazy in train
    steps). Quantized bases are dequantized first."""
    from gritlm_tpu.training.quant import dequantize_tree

    params = dequantize_tree(params)

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
        params = apply_lora_lazy(frozen, lora, scale)
        loss_gen = jnp.zeros((), jnp.float32)
        loss_emb = jnp.zeros((), jnp.float32)
        if "generative" in batch and tc.mode in ("unified", "generative"):
            loss_gen, _ = generative_loss(params, cfg, tc, batch["generative"])
        if "query" in batch and tc.mode in ("unified", "embedding"):
            q = encode_reps(params, cfg, tc, batch["query"])
            p = encode_reps(params, cfg, tc, batch["passage"])
            loss_emb = contrastive_loss(q, p, tc.temperature)
        return loss_gen + loss_emb, (loss_emb, loss_gen)

    return loss_fn


def make_lora_train_state(
    mesh, cfg, tc, base_params: dict, r: int = 16, alpha: int = 64,
    quantize: bool = False, seed: int = 0,
):
    """Build the LoRA/QLoRA training setup over a mesh: frozen (optionally
    int8) base replicated on devices, LoRA tree + Adam state trained,
    batch sharded over (data, fsdp). Returns (run_step, state) where state is
    a train.TrainState whose `params` IS the lora tree (so CheckpointManager
    and the run loop work unchanged); run_step closes over the frozen base.

    Counterpart of the reference's PEFT branch (run.py:217-284) — but on TPU
    the int8 base + per-layer dequant inside the scan is what bitsandbytes
    NF4 paging is for on GPU."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gritlm_tpu.parallel.mesh import BATCH_AXES
    from gritlm_tpu.training.quant import quantize_tree
    from gritlm_tpu.training.train import TrainState, make_optimizer

    if quantize:
        base_params = quantize_tree(base_params)
    replicated = NamedSharding(mesh, P())
    base_params = jax.device_put(
        base_params,
        jax.tree_util.tree_map(lambda _: replicated, base_params),
    )
    lora, scale = init_lora(base_params, jax.random.PRNGKey(seed),
                            r=r, alpha=alpha)
    lora = jax.device_put(
        lora, jax.tree_util.tree_map(lambda _: replicated, lora)
    )
    loss_fn = lora_train_step_fns(base_params, cfg, tc, scale)
    opt = make_optimizer(tc)
    opt_state = opt.init(lora)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), replicated),
        params=lora,
        opt_state=jax.device_put(
            opt_state, jax.tree_util.tree_map(lambda _: replicated, opt_state)
        ),
    )
    batch_ns = NamedSharding(mesh, P(BATCH_AXES))

    @jax.jit
    def step_fn(state, batch):
        from gritlm_tpu.training.train import StepMetrics

        (loss, (loss_emb, loss_gen)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        import optax as _optax

        gnorm = _optax.global_norm(grads)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_lora = _optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, new_lora, new_opt),
            StepMetrics(loss, loss_emb, loss_gen, gnorm),
        )

    def run(state, batch):
        batch = jax.device_put(
            batch, jax.tree_util.tree_map(lambda _: batch_ns, batch)
        )
        return step_fn(state, batch)

    return run, state, base_params, scale
