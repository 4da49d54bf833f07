"""GRIT joint training: unified contrastive + next-token loss with
scan-based GradCache, GSPMD-sharded.

Replaces the reference's GradCacheTrainer fork (864 LoC of HF Trainer
surgery, gritlm/training/gradcache_trainer.py) and the vendored torch
GradCache with ~1 jitted function:

  - Full-batch path: loss = contrastive(q, p) + next_token(gen); one
    value_and_grad. Cross-device negatives are implicit under GSPMD
    (see losses.py).
  - GradCache path (big contrastive batches): the three stages of the
    vendored cachex JAX design (GradCache/src/grad_cache/cachex/) —
    (1) chunked no-grad encode via lax.map, (2) loss grad wrt reps,
    (3) chunked replay accumulating param grads of the surrogate
    sum(encode(chunk) · rep_grad) — all inside one jit. No RNG replay
    (RandContext) is needed: JAX PRNG keys make the replay exact for free
    (SURVEY §5.2).

Generative loss runs first, matching the reference ordering note
(gradcache_trainer.py:549-551: emb contains the all-reduce).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.models.transformer import (
    forward,
    forward_lm,
    lm_head_kernel,
    load_balancing_loss,
)
from gritlm_tpu.ops.pooling import mask_instruction, pool
from gritlm_tpu.training.losses import (
    contrastive_loss,
    fused_next_token_loss,
    next_token_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    mode: str = "unified"  # unified | embedding | generative
    pooling_method: str = "mean"
    normalized: bool = True
    attn: str = "bbcc"
    temperature: float = 0.02
    loss_gen_type: str = "mixed"
    loss_gen_factor: float = 1.0
    # GradCache: number of chunks the emb batch is split into (1 = off)
    gc_chunks: int = 1
    # stop-gradient variants (reference emb_q_only / emb_p_only flags)
    q_grad: bool = True
    p_grad: bool = True
    # optimizer
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    max_grad_norm: float = 1.0
    remat: bool = True
    # None = full recompute (min memory); "dots" keeps matmul outputs
    # (~6% faster when activations fit)
    remat_policy: str = None
    # fuse the LM head into the next-token loss (vocab-chunked online
    # logsumexp, losses.fused_next_token_loss): never materializes the
    # [T, vocab] logits. Same semantics; slightly *more* accurate (fp32 MXU
    # accumulation). This is a MEMORY feature, not a speed one — measured on
    # v5e it is ~1% slower at 32k vocab/16L and ~11% slower at 152k vocab/8L
    # (the bwd recomputes each chunk's logits, one extra head-matmul pass).
    # Enable when the [T, vocab] logits (e.g. Qwen2's 152k vocab x long
    # generative batches) would otherwise OOM; logit memory drops to one
    # [T, 8192] block.
    fused_ce: bool = False
    router_aux_coef: Optional[float] = None  # None → cfg.router_aux_loss_coef

    @property
    def embed_causal(self) -> bool:
        return self.attn[:2] != "bb"


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


class StepMetrics(NamedTuple):
    loss: jax.Array
    loss_emb: jax.Array
    loss_gen: jax.Array
    grad_norm: jax.Array
    # GShard MoE capacity-overflow fraction this step (0.0 for dense / exact
    # capacity); visible in run.py's metrics log
    moe_dropped_frac: jax.Array = 0.0


# ---------------------------------------------------------------------------
# Encode / loss pieces


def encode_reps(
    params, cfg: ModelConfig, tc: TrainConfig, feat: Dict[str, jax.Array],
    return_drop: bool = False,
):
    """features → pooled (optionally normalized) reps [B, D]; instruction
    tokens are attended but excluded from pooling (reference
    gritlm/training/model.py:134-165). With return_drop, also returns the
    MoE capacity-overflow fraction of this forward (embedding-branch drops
    are otherwise invisible in the metrics)."""
    hidden, _, aux = forward(
        params, cfg, feat["input_ids"],
        attention_mask=feat["attention_mask"],
        causal=tc.embed_causal,
        remat=tc.remat, remat_policy=tc.remat_policy,
        output_router_logits=cfg.is_moe and return_drop,
    )
    pmask = feat["attention_mask"]
    if "instruction_lens" in feat:
        pmask = mask_instruction(pmask, feat["instruction_lens"])
    reps = pool(hidden, pmask, tc.pooling_method)
    if "projection" in params:
        # trainable projection head on the pooled rep (reference
        # GritLMTrainModel.encode, gritlm/training/model.py:147-148)
        pr = params["projection"]
        reps = reps @ pr["kernel"].astype(reps.dtype) + pr["bias"].astype(reps.dtype)
    if tc.normalized:
        reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12)
    if return_drop:
        return reps, aux.get("moe_dropped_frac", jnp.zeros((), jnp.float32))
    return reps


def generative_loss(
    params, cfg: ModelConfig, tc: TrainConfig, gen: Dict[str, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (loss, moe_dropped_frac) — the drop fraction is 0 for dense
    models and quantifies GShard capacity overflow for MoE (the reference
    never drops; tracking it makes EP training quality measurable)."""
    if tc.fused_ce:
        hidden, _, aux = forward(
            params, cfg, gen["input_ids"],
            attention_mask=gen["attention_mask"], causal=True,
            remat=tc.remat, remat_policy=tc.remat_policy,
            output_router_logits=cfg.is_moe,
        )
        loss = fused_next_token_loss(
            hidden, lm_head_kernel(params, cfg, hidden.dtype), gen["labels"],
            tc.loss_gen_type, tc.loss_gen_factor,
        )
    else:
        logits, _, aux = forward_lm(
            params, cfg, gen["input_ids"],
            attention_mask=gen["attention_mask"], causal=True,
            remat=tc.remat, remat_policy=tc.remat_policy,
            output_router_logits=cfg.is_moe,
        )
        loss = next_token_loss(
            logits, gen["labels"], tc.loss_gen_type, tc.loss_gen_factor
        )
    dropped = aux.get("moe_dropped_frac", jnp.zeros((), jnp.float32))
    if cfg.is_moe:
        coef = tc.router_aux_coef if tc.router_aux_coef is not None else cfg.router_aux_loss_coef
        loss = loss + coef * load_balancing_loss(
            aux["router_logits"], cfg, gen["attention_mask"]
        )
    return loss, dropped


def _router_aux_from_stats(stats, cfg: ModelConfig, mask) -> jax.Array:
    """load_balancing_loss from the pre-summed (cnt [E], prob [E])
    numerators that the PP/SP trunks return (apply_layer_stack
    collect_router_stats): Σ_e cnt_e·prob_e·E/(tokens·L)² — identical to
    load_balancing_loss(router_logits, cfg, mask) since both numerators
    are summed over all layers before the product (the HF-Mixtral
    concatenate-layers normalization)."""
    cnt, prob = stats
    denom = jnp.maximum(jnp.sum(mask), 1.0) * cfg.num_hidden_layers
    return jnp.sum((cnt / denom) * (prob / denom)) * cfg.num_local_experts


# ---------------------------------------------------------------------------
# GradCache as scan (cachex design, reference …/grad_cache/cachex/)


def _chunk(tree, n: int):
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:]), tree
    )


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_zeros_like(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def gradcache_emb_grads(
    params, cfg: ModelConfig, tc: TrainConfig,
    query: Dict[str, jax.Array], passage: Dict[str, jax.Array],
    encode_fn=None,
) -> Tuple[jax.Array, Any, jax.Array]:
    """Returns (loss_emb, param grads of loss_emb, moe_dropped_frac) using
    chunked fwd/replay.

    `encode_fn(params, feat) -> reps` defaults to the GSPMD encode_reps; the
    pipeline/seqpar train steps pass their own trunk (the scan-GradCache is
    mesh-agnostic — chunking happens on the batch dim, which every schedule
    shards or replicates consistently across chunks)."""
    default_encode = encode_fn is None
    if default_encode:
        encode_fn = lambda p, feat: encode_reps(p, cfg, tc, feat)
    n = tc.gc_chunks
    q_chunks = _chunk(query, n)
    p_chunks = _chunk(passage, n)

    # stage 1: no-grad chunked encode (tracking MoE drops when this is the
    # default MoE encoder — the embedding branch drops tokens too)
    track_drop = default_encode and cfg.is_moe

    def enc_q(feat):
        if track_drop:
            return encode_reps(params, cfg, tc, feat, return_drop=True)
        return encode_fn(params, feat), jnp.zeros((), jnp.float32)

    q_reps, q_drops = jax.lax.map(enc_q, q_chunks)  # [n, b, D], [n]
    p_reps, p_drops = jax.lax.map(enc_q, p_chunks)
    dropped = jnp.mean(jnp.concatenate([q_drops, p_drops]))
    q_reps = jax.lax.stop_gradient(q_reps.reshape((-1, q_reps.shape[-1])))
    p_reps = jax.lax.stop_gradient(p_reps.reshape((-1, p_reps.shape[-1])))

    # stage 2: loss + grads wrt reps only (cheap)
    def rep_loss(qr, pr):
        return contrastive_loss(qr, pr, tc.temperature)

    loss_emb, (dq, dp) = jax.value_and_grad(rep_loss, argnums=(0, 1))(q_reps, p_reps)
    if not tc.q_grad:
        dq = jnp.zeros_like(dq)
    if not tc.p_grad:
        dp = jnp.zeros_like(dp)
    dq_chunks = dq.reshape((n, -1) + dq.shape[1:])
    dp_chunks = dp.reshape((n, -1) + dp.shape[1:])

    # stage 3: replay each chunk, backprop the surrogate dot(reps, cached grad)
    def replay(acc, chunk_and_grad):
        feat, drep = chunk_and_grad

        def surrogate(p):
            reps = encode_fn(p, feat)
            return jnp.sum(reps * drep)

        g = jax.grad(surrogate)(params)
        return _tree_add(acc, g), None

    zeros = _tree_zeros_like(params)
    grads, _ = jax.lax.scan(replay, zeros, (q_chunks, dq_chunks))
    grads, _ = jax.lax.scan(replay, grads, (p_chunks, dp_chunks))
    return loss_emb, grads, dropped


# ---------------------------------------------------------------------------
# Train step


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    warmup = max(int(tc.total_steps * tc.warmup_ratio), 1)
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, tc.learning_rate, warmup),
            optax.linear_schedule(tc.learning_rate, 0.0, max(tc.total_steps - warmup, 1)),
        ],
        [warmup],
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=tc.weight_decay),
    )


def init_train_state(params, tc: TrainConfig) -> TrainState:
    opt = make_optimizer(tc)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=opt.init(params)
    )


def train_step(
    state: TrainState,
    batch: Dict[str, Dict[str, jax.Array]],
    cfg: ModelConfig,
    tc: TrainConfig,
) -> Tuple[TrainState, StepMetrics]:
    """One step over a *global* batch dict with optional 'query'/'passage'/
    'generative' sub-batches. Pure function of (state, batch) — pjit it with
    sharded params + batch."""
    opt = make_optimizer(tc)
    has_emb = "query" in batch and tc.mode in ("unified", "embedding")
    has_gen = "generative" in batch and tc.mode in ("unified", "generative")
    use_gc = has_emb and tc.gc_chunks > 1

    def full_loss(params):
        loss_gen = jnp.zeros((), jnp.float32)
        loss_emb = jnp.zeros((), jnp.float32)
        dropped = jnp.zeros((), jnp.float32)
        if has_gen:  # gen first (reference ordering, gradcache_trainer.py:549)
            loss_gen, dropped = generative_loss(params, cfg, tc, batch["generative"])
        if has_emb and not use_gc:
            if cfg.is_moe:
                q, dq = encode_reps(params, cfg, tc, batch["query"],
                                    return_drop=True)
                p, dp = encode_reps(params, cfg, tc, batch["passage"],
                                    return_drop=True)
                n_fwd = 3.0 if has_gen else 2.0
                dropped = (dropped * (n_fwd - 2.0) + dq + dp) / n_fwd
            else:
                q = encode_reps(params, cfg, tc, batch["query"])
                p = encode_reps(params, cfg, tc, batch["passage"])
            if not tc.q_grad:
                q = jax.lax.stop_gradient(q)
            if not tc.p_grad:
                p = jax.lax.stop_gradient(p)
            loss_emb = contrastive_loss(q, p, tc.temperature)
        return loss_gen + loss_emb, (loss_emb, loss_gen, dropped)

    (loss, (loss_emb, loss_gen, dropped)), grads = jax.value_and_grad(
        full_loss, has_aux=True
    )(state.params)

    if use_gc:
        loss_emb_gc, emb_grads, gc_drop = gradcache_emb_grads(
            state.params, cfg, tc, batch["query"], batch["passage"]
        )
        grads = _tree_add(grads, emb_grads)
        loss_emb = loss_emb_gc
        loss = loss + loss_emb_gc
        if cfg.is_moe:
            n_fwd = 3.0 if has_gen else 2.0
            dropped = (dropped * (n_fwd - 2.0) + 2.0 * gc_drop) / n_fwd

    gnorm = optax.global_norm(grads)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(state.step + 1, new_params, new_opt)
    return new_state, StepMetrics(loss, loss_emb, loss_gen, gnorm,
                                  jax.lax.stop_gradient(dropped))


def make_sharded_train_step(mesh, cfg: ModelConfig, tc: TrainConfig):
    """jit train_step over the mesh: params/opt sharded per rules, batch on
    (data, fsdp). Returns (step_fn, shard_state_fn)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gritlm_tpu.parallel.sharding import param_partition_specs

    opt = make_optimizer(tc)

    def _opt_state_shardings(params, pspecs):
        """Sharding tree for opt.init output: mu/nu sub-trees mirror the param
        partition specs (ZeRO: optimizer state sharded like params), every
        other leaf (step counters) replicated."""
        shapes = jax.eval_shape(opt.init, jax.eval_shape(lambda: params))

        def lookup(path):
            for i, k in enumerate(path):
                if getattr(k, "name", None) in ("mu", "nu"):
                    node = pspecs
                    try:
                        for kk in path[i + 1 :]:
                            node = node[kk.key]
                    except (KeyError, TypeError, AttributeError):
                        return P()
                    return node if isinstance(node, P) else P()
            return P()

        flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
        shardings = [NamedSharding(mesh, lookup(path)) for path, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, shardings)

    def shard_state(state: TrainState) -> TrainState:
        """NOTE: the returned state may alias the input's buffers (device_put
        reuses shards it can), and step_fn donates its state — don't keep
        using the pre-shard arrays after the first step."""
        pspecs = param_partition_specs(state.params)
        pshard = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), pspecs,
            is_leaf=lambda x: isinstance(x, P),
        )
        params = jax.device_put(state.params, pshard)
        opt_shardings = _opt_state_shardings(params, pspecs)
        opt_state = jax.jit(opt.init, out_shardings=opt_shardings)(params)
        return TrainState(jax.device_put(state.step, NamedSharding(mesh, P())),
                          params, opt_state)

    batch_ns = NamedSharding(mesh, P(("data", "fsdp")))

    @functools.partial(jax.jit, static_argnames=("cfg", "tc"), donate_argnums=(0,))
    def step_fn(state, batch, cfg, tc):
        return train_step(state, batch, cfg, tc)

    def run(state, batch):
        batch = jax.device_put(batch, jax.tree_util.tree_map(lambda _: batch_ns, batch))
        return step_fn(state, batch, cfg, tc)

    return run, shard_state


# ---------------------------------------------------------------------------
# Pipeline-parallel and sequence-parallel training steps
#
# The GSPMD step above covers dp/fsdp/tp/ep. These two cover the manual
# shard_map axes: GPipe stages over `stage` (parallel/pipeline.py) and ring-
# attention sequence sharding over `seq` (parallel/seqpar.py) — both absent
# in the reference (SURVEY §2.8 PP/SP rows). Backward is plain autodiff
# through the schedules (ppermute/scan are differentiable).


def _apply_updates(opt, state, grads, loss, loss_emb, loss_gen):
    gnorm = optax.global_norm(grads)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        TrainState(state.step + 1, new_params, new_opt),
        StepMetrics(loss, loss_emb, loss_gen, gnorm),
    )


def make_pipeline_train_step(
    mesh, cfg: ModelConfig, tc: TrainConfig, n_microbatches: int = 2
):
    """Train step with the layer stack pipelined over the mesh's `stage`
    axis (GPipe microbatches), the batch split over (`data`, `fsdp`), and
    each stage's layer params + optimizer state ZeRO-3-sharded over `fsdp`
    (parallel/pipeline.py). GradCache composes: gc_chunks > 1 runs the
    scan-GradCache with the pipelined trunk as its encoder — the reference's
    FSDP × GradCache recipe (train_gritlm_8x7b.sh:38-84) plus pipelining it
    never had. The embedding/head are replicated (tiny). MoE composes:
    each stage accumulates its layer slice's router load-balancing
    numerators per microbatch and a psum makes them global — the aux loss
    matches the GSPMD step exactly (use moe_impl dense/dropless inside
    stages; gshard capacity would be per-microbatch)."""
    import functools as _ft

    if cfg.is_moe and cfg.moe_impl == "gshard":
        raise NotImplementedError(
            "moe_impl='gshard' under pipeline parallelism: expert capacity "
            "C = ceil(k*T/E*cf) would be computed per-microbatch, so token "
            "dropping (and the loss) diverges from the GSPMD step. Use "
            "moe_impl='dense' or 'dropless' inside pipeline stages."
        )

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gritlm_tpu.models.transformer import logits_from_hidden
    from gritlm_tpu.parallel.mesh import AXIS_DATA, AXIS_FSDP
    from gritlm_tpu.parallel.pipeline import (
        layer_param_pipeline_specs,
        pipeline_forward,
    )

    opt = make_optimizer(tc)
    n_fsdp = mesh.shape.get(AXIS_FSDP, 1)

    def trunk(params, feat, causal, collect=False):
        return pipeline_forward(
            params, cfg, feat["input_ids"], mesh,
            attention_mask=feat["attention_mask"], causal=causal,
            n_microbatches=n_microbatches, remat=tc.remat,
            collect_router_stats=collect,
        )

    def encode(params, feat):
        hidden = trunk(params, feat, tc.embed_causal)
        pmask = feat["attention_mask"]
        if "instruction_lens" in feat:
            pmask = mask_instruction(pmask, feat["instruction_lens"])
        reps = pool(hidden, pmask, tc.pooling_method)
        if tc.normalized:
            reps = reps / jnp.clip(
                jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12
            )
        return reps

    def full_loss(params, batch, with_emb):
        loss_gen = jnp.zeros((), jnp.float32)
        loss_emb = jnp.zeros((), jnp.float32)
        if "generative" in batch and tc.mode in ("unified", "generative"):
            gen = batch["generative"]
            if cfg.is_moe:
                hidden, stats = trunk(params, gen, True, collect=True)
            else:
                hidden = trunk(params, gen, True)
            logits = logits_from_hidden(params, cfg, hidden)
            loss_gen = next_token_loss(
                logits, gen["labels"], tc.loss_gen_type, tc.loss_gen_factor
            )
            if cfg.is_moe:
                # same router aux loss as the GSPMD step (generative_loss)
                coef = (tc.router_aux_coef if tc.router_aux_coef is not None
                        else cfg.router_aux_loss_coef)
                loss_gen = loss_gen + coef * _router_aux_from_stats(
                    stats, cfg, gen["attention_mask"])
        if with_emb and "query" in batch and tc.mode in ("unified", "embedding"):
            q = encode(params, batch["query"])
            p = encode(params, batch["passage"])
            loss_emb = contrastive_loss(q, p, tc.temperature)
        return loss_gen + loss_emb, (loss_emb, loss_gen)

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        use_gc = tc.gc_chunks > 1 and "query" in batch and (
            tc.mode in ("unified", "embedding")
        )
        (loss, (le, lg)), grads = jax.value_and_grad(
            full_loss, has_aux=True
        )(state.params, batch, not use_gc)
        if use_gc:
            le, emb_grads, _ = gradcache_emb_grads(
                state.params, cfg, tc, batch["query"], batch["passage"],
                encode_fn=encode,
            )
            grads = _tree_add(grads, emb_grads)
            loss = loss + le
        return _apply_updates(opt, state, grads, loss, le, lg)

    repl_ns = NamedSharding(mesh, P())
    batch_ns = NamedSharding(mesh, P((AXIS_DATA, AXIS_FSDP)))

    def _param_shardings(params):
        layer_specs = layer_param_pipeline_specs(params["layers"], n_fsdp)
        return {
            k: (
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s), layer_specs,
                    is_leaf=lambda x: isinstance(x, P),
                )
                if k == "layers"
                else jax.tree_util.tree_map(lambda _: repl_ns, v)
            )
            for k, v in params.items()
        }

    def shard_state(state: TrainState) -> TrainState:
        pshard = _param_shardings(state.params)
        params = jax.device_put(state.params, pshard)

        def lookup(path):
            for i, kk in enumerate(path):
                if getattr(kk, "name", None) in ("mu", "nu"):
                    node = pshard
                    try:
                        for p2 in path[i + 1:]:
                            node = node[p2.key]
                    except (KeyError, TypeError, AttributeError):
                        return repl_ns
                    return node if isinstance(node, NamedSharding) else repl_ns
            return repl_ns

        shapes = jax.eval_shape(opt.init, jax.eval_shape(lambda: params))
        flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
        opt_shardings = jax.tree_util.tree_unflatten(
            treedef, [lookup(path) for path, _ in flat]
        )
        opt_state = jax.jit(opt.init, out_shardings=opt_shardings)(params)
        return TrainState(jax.device_put(state.step, repl_ns), params, opt_state)

    def run(state, batch):
        batch = jax.device_put(
            batch, jax.tree_util.tree_map(lambda _: batch_ns, batch)
        )
        return step_fn(state, batch)

    return run, shard_state


def make_seqpar_train_step(mesh, cfg: ModelConfig, tc: TrainConfig):
    """Train step with sequences sharded over the mesh's `seq` axis (exact
    ring attention). The long-context training mode: activation memory per
    chip scales with S / n_seq, and GradCache composes (gc_chunks > 1 chunks
    the batch dim while each chunk's sequences stay ring-sharded) so huge
    contrastive batches of long documents fit. Params and optimizer state
    are replicated (combine with FSDP later if the model itself doesn't
    fit). All batch sequences must divide the seq axis size. MoE composes
    with moe_impl dense/dropless (router stats psum over the ring makes the
    aux loss global); gshard is rejected — its expert capacity would be
    computed per-sequence-shard and token dropping would diverge from the
    GSPMD step."""
    import functools as _ft

    if cfg.is_moe and cfg.moe_impl == "gshard":
        raise NotImplementedError(
            "moe_impl='gshard' under sequence parallelism: expert capacity "
            "C = ceil(k*T/E*cf) would be computed per-seq-shard, so token "
            "dropping (and the loss) diverges from the GSPMD step. Use "
            "moe_impl='dense' or 'dropless'."
        )

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gritlm_tpu.models.transformer import logits_from_hidden
    from gritlm_tpu.parallel.seqpar import (
        SEQ_AXIS,
        sequence_parallel_forward,
    )

    opt = make_optimizer(tc)

    def encode(params, feat):
        hidden = sequence_parallel_forward(
            params, cfg, feat["input_ids"], mesh,
            attention_mask=feat["attention_mask"], causal=tc.embed_causal,
            remat=tc.remat,
        )
        pmask = feat["attention_mask"]
        if "instruction_lens" in feat:
            pmask = mask_instruction(pmask, feat["instruction_lens"])
        reps = pool(hidden, pmask, tc.pooling_method)
        if tc.normalized:
            reps = reps / jnp.clip(
                jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12
            )
        return reps

    def full_loss(params, batch, with_emb):
        loss_gen = jnp.zeros((), jnp.float32)
        loss_emb = jnp.zeros((), jnp.float32)
        if "generative" in batch and tc.mode in ("unified", "generative"):
            gen = batch["generative"]
            out = sequence_parallel_forward(
                params, cfg, gen["input_ids"], mesh,
                attention_mask=gen["attention_mask"], causal=True,
                remat=tc.remat, collect_router_stats=cfg.is_moe,
            )
            hidden, stats = out if cfg.is_moe else (out, None)
            # logits stay S-sharded under GSPMD; the shifted CE reduces them
            logits = logits_from_hidden(params, cfg, hidden)
            loss_gen = next_token_loss(
                logits, gen["labels"], tc.loss_gen_type, tc.loss_gen_factor
            )
            if cfg.is_moe:
                # same router aux loss as the GSPMD step (generative_loss)
                coef = (tc.router_aux_coef if tc.router_aux_coef is not None
                        else cfg.router_aux_loss_coef)
                loss_gen = loss_gen + coef * _router_aux_from_stats(
                    stats, cfg, gen["attention_mask"])
        if with_emb and "query" in batch and tc.mode in ("unified", "embedding"):
            q = encode(params, batch["query"])
            p = encode(params, batch["passage"])
            loss_emb = contrastive_loss(q, p, tc.temperature)
        return loss_gen + loss_emb, (loss_emb, loss_gen)

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        use_gc = tc.gc_chunks > 1 and "query" in batch and (
            tc.mode in ("unified", "embedding")
        )
        (loss, (le, lg)), grads = jax.value_and_grad(
            full_loss, has_aux=True
        )(state.params, batch, not use_gc)
        if use_gc:
            # GradCache over a seq-sharded trunk: chunking splits the batch
            # dim; the `seq` axis sharding is untouched chunk to chunk
            le, emb_grads, _ = gradcache_emb_grads(
                state.params, cfg, tc, batch["query"], batch["passage"],
                encode_fn=encode,
            )
            grads = _tree_add(grads, emb_grads)
            loss = loss + le
        return _apply_updates(opt, state, grads, loss, le, lg)

    repl_ns = NamedSharding(mesh, P())
    seq_ns = NamedSharding(mesh, P(None, SEQ_AXIS))

    def shard_state(state: TrainState) -> TrainState:
        return jax.device_put(state, repl_ns)

    def run(state, batch):
        batch = jax.device_put(
            batch, jax.tree_util.tree_map(
                lambda x: seq_ns if x.ndim == 2 and x.shape[1] > 1 else repl_ns,
                batch,
            )
        )
        return step_fn(state, batch)

    return run, shard_state
