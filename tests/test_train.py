import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.tokenizer import ByteTokenizer
from gritlm_tpu.training.data import GritCollator, GritDataset
from gritlm_tpu.training.train import (
    TrainConfig,
    encode_reps,
    gradcache_emb_grads,
    init_train_state,
    train_step,
)
from gritlm_tpu.training.losses import contrastive_loss


def _toy_batch(bs=4, group=2, qlen=32, plen=32, glen=48):
    tok = ByteTokenizer()
    coll = GritCollator(tok, query_max_len=qlen, passage_max_len=plen,
                        generative_max_len=glen)
    feats = []
    for i in range(bs):
        q = ("find it", f"query number {i}")
        ps = [("find it", f"matching passage {i}")] + [
            ("find it", f"junk {i} {j}") for j in range(group - 1)
        ]
        g = [f"what is {i}?", f"it is {i}"]
        feats.append((q, ps, g))
    return coll(feats)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = _toy_batch()
    return cfg, params, batch


def test_gradcache_matches_full_batch(setup):
    """The scan-GradCache must produce the same loss and (near-)identical
    grads as the straight full-batch contrastive backward — the reference
    asserts the analogous equality in split_emb mode
    (gradcache_trainer.py:604)."""
    cfg, params, batch = setup
    tc = TrainConfig(mode="embedding", gc_chunks=1, remat=False, temperature=0.5)

    def full_loss(p):
        q = encode_reps(p, cfg, tc, batch["query"])
        pp = encode_reps(p, cfg, tc, batch["passage"])
        return contrastive_loss(q, pp, tc.temperature)

    loss_full, grads_full = jax.value_and_grad(full_loss)(params)

    tc_gc = TrainConfig(mode="embedding", gc_chunks=2, remat=False, temperature=0.5)
    loss_gc, grads_gc, gc_drop = gradcache_emb_grads(
        params, cfg, tc_gc, batch["query"], batch["passage"]
    )
    assert float(gc_drop) == 0.0  # dense model never drops
    np.testing.assert_allclose(float(loss_gc), float(loss_full), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves(grads_full)
    flat_g = jax.tree_util.tree_leaves(grads_gc)
    for a, b in zip(flat_f, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)


def test_train_step_unified_runs_and_reports(setup):
    cfg, params, batch = setup
    tc = TrainConfig(mode="unified", total_steps=10, remat=True)
    state = init_train_state(params, tc)
    state, m = train_step(state, jax.tree_util.tree_map(jnp.asarray, batch), cfg, tc)
    assert int(state.step) == 1
    for v in (m.loss, m.loss_emb, m.loss_gen, m.grad_norm):
        assert np.isfinite(float(v))
    assert float(m.loss_emb) > 0 and float(m.loss_gen) > 0


def test_overfit_tiny(setup):
    """A few steps on a fixed batch must reduce both losses (optimizer,
    losses and grads are wired correctly end-to-end)."""
    cfg, params, batch = setup
    tc = TrainConfig(mode="unified", total_steps=30, learning_rate=3e-3,
                     warmup_ratio=0.0, remat=False, temperature=0.1)
    state = init_train_state(params, tc)
    jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
    step = jax.jit(train_step, static_argnames=("cfg", "tc"))
    _, m0 = step(state, jbatch, cfg, tc)
    for _ in range(12):
        state, m = step(state, jbatch, cfg, tc)
    assert float(m.loss_emb) < float(m0.loss_emb)
    assert float(m.loss_gen) < float(m0.loss_gen)


def test_stop_gradient_flags(setup):
    cfg, params, batch = setup
    tc = TrainConfig(mode="embedding", q_grad=False, p_grad=True, remat=False)

    def loss_fn(p, tc):
        q = encode_reps(p, cfg, tc, batch["query"])
        pp = encode_reps(p, cfg, tc, batch["passage"])
        q = jax.lax.stop_gradient(q) if not tc.q_grad else q
        pp = jax.lax.stop_gradient(pp) if not tc.p_grad else pp
        return contrastive_loss(q, pp, tc.temperature)

    g_qonly = jax.grad(loss_fn)(params, TrainConfig(mode="embedding", p_grad=False, remat=False))
    g_ponly = jax.grad(loss_fn)(params, tc)
    # different stop-grad sides → different grads
    a = jax.tree_util.tree_leaves(g_qonly)[3]
    b = jax.tree_util.tree_leaves(g_ponly)[3]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sharded_train_step_8dev(setup):
    """Full unified step pjit-compiled over a (2 data, 2 fsdp, 2 model) mesh
    of 8 virtual CPU devices — validates every sharding rule executes."""
    cfg, params, batch = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gritlm_tpu.parallel import MeshConfig, make_mesh
    from gritlm_tpu.training.train import make_sharded_train_step

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2, expert=1))
    tc = TrainConfig(mode="unified", total_steps=10, remat=True)
    state = init_train_state(params, tc)
    run, shard_state = make_sharded_train_step(mesh, cfg, tc)
    state = shard_state(state)
    state, m = run(state, batch)
    assert np.isfinite(float(m.loss))
    assert int(state.step) == 1


def test_projection_head_trains_and_roundtrips(tmp_path, setup):
    """Trainable projection head (reference ModelArguments.projection,
    gritlm/training/model.py:147-148): gets gradients, survives HF export,
    and from_pretrained applies it at encode time."""
    from gritlm_tpu.gritlm import GritLM
    from gritlm_tpu.models.loader import load_checkpoint, save_checkpoint

    cfg, _, batch = setup
    # fresh params: the sharded-step test above donates its state, and
    # device_put may alias the module fixture's buffers into it
    params = init_params(cfg, jax.random.PRNGKey(0))
    kp = jax.random.PRNGKey(9)
    params["projection"] = {
        "kernel": jax.random.normal(kp, (cfg.hidden_size, 32), jnp.float32) * 0.1,
        "bias": jnp.zeros((32,), jnp.float32),
    }
    tc = TrainConfig(mode="embedding", total_steps=4, learning_rate=1e-2,
                     warmup_ratio=0.0)
    state = init_train_state(params, tc)
    step = jax.jit(lambda s, b: train_step(s, b, cfg, tc))
    state2, m = step(state, batch)
    state2, m = step(state2, batch)  # step 1 is lr-warmup (lr=0)
    assert np.isfinite(float(m.loss))
    # projection actually moved (i.e. got gradients)
    assert not np.allclose(
        np.asarray(state2.params["projection"]["kernel"]),
        np.asarray(params["projection"]["kernel"]),
    )

    save_checkpoint(str(tmp_path), cfg, jax.device_get(state2.params))
    cfg2, params2 = load_checkpoint(str(tmp_path))
    assert "projection" in params2
    np.testing.assert_allclose(
        np.asarray(params2["projection"]["kernel"], np.float32),
        np.asarray(state2.params["projection"]["kernel"], np.float32),
        rtol=1e-6,
    )
    m2 = GritLM(cfg2, params=params2, mode="embedding")
    emb = m2.encode(["projected embedding"])
    assert emb.shape == (1, 32)
