"""MoE execution paths: dense-gated vs GShard capacity dispatch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mixtral
from gritlm_tpu.models import forward, init_params


def _inputs(cfg, b=2, s=16):
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    mask = jnp.ones((b, s), jnp.int32)
    return ids, mask


def test_gshard_matches_dense_at_full_capacity():
    """capacity_factor = E/k ⇒ no token ever drops ⇒ bit-comparable output."""
    cfg_d = tiny_mixtral()
    cfg_g = dataclasses.replace(
        cfg_d, moe_impl="gshard",
        capacity_factor=float(cfg_d.num_local_experts) / cfg_d.num_experts_per_tok,
    )
    params = init_params(cfg_d, jax.random.PRNGKey(0))
    ids, mask = _inputs(cfg_d)
    hd, _, auxd = forward(params, cfg_d, ids, attention_mask=mask, causal=True,
                          output_router_logits=True)
    hg, _, auxg = forward(params, cfg_g, ids, attention_mask=mask, causal=True,
                          output_router_logits=True)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(hg), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(auxd["router_logits"]), np.asarray(auxg["router_logits"]),
        atol=1e-6,
    )


def test_gshard_low_capacity_drops_but_runs():
    cfg = dataclasses.replace(tiny_mixtral(), moe_impl="gshard",
                              capacity_factor=0.5)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, mask = _inputs(cfg)
    h, _, _ = forward(params, cfg, ids, attention_mask=mask, causal=True)
    assert np.isfinite(np.asarray(h)).all()


def test_gshard_grads_flow():
    cfg = dataclasses.replace(tiny_mixtral(), moe_impl="gshard")
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, mask = _inputs(cfg, b=1, s=8)

    def loss(p):
        h, _, _ = forward(p, cfg, ids, attention_mask=mask, causal=True)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    gm = g["layers"]["moe"]
    for name in ("router", "gate", "up", "down"):
        assert float(jnp.abs(gm[name]).max()) > 0, name


def test_gshard_on_expert_mesh():
    """Full train step with gshard MoE sharded over a 2-way expert axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gritlm_tpu.parallel import MeshConfig, make_mesh
    from gritlm_tpu.training.train import (
        TrainConfig, init_train_state, make_sharded_train_step,
    )
    from tests.test_train import _toy_batch

    cfg = dataclasses.replace(tiny_mixtral(), moe_impl="gshard")
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=1, expert=2))
    tc = TrainConfig(mode="unified", total_steps=4, remat=True)
    state = init_train_state(init_params(cfg, jax.random.PRNGKey(0)), tc)
    run, shard_state = make_sharded_train_step(mesh, cfg, tc)
    state = shard_state(state)
    state, m = run(state, _toy_batch())
    assert np.isfinite(float(m.loss))


def test_aux_loss_allones_mask_matches_unmasked(cfg_moe):
    """The padded aux-loss branch with an all-ones mask must equal the
    unpadded branch (HF Mixtral normalization, modeling_mixtral_gritlm.py:
    116-151) — regression for an extra E/k factor."""
    from gritlm_tpu.models.transformer import load_balancing_loss

    L, T, E = 2, 12, cfg_moe.num_local_experts
    logits = jax.random.normal(jax.random.PRNGKey(0), (L, T, E))
    mask = jnp.ones((3, 4), jnp.int32)  # B*S = T
    a = float(load_balancing_loss(logits, cfg_moe))
    b = float(load_balancing_loss(logits, cfg_moe, mask))
    np.testing.assert_allclose(a, b, rtol=1e-6)
