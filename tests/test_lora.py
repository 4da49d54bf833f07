import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import forward_lm, init_params
from gritlm_tpu.training.lora import (
    apply_lora,
    init_lora,
    lora_train_step_fns,
    merge,
)
from gritlm_tpu.training.train import TrainConfig


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    lora, scale = init_lora(params, jax.random.PRNGKey(1), r=4, alpha=8)
    return cfg, params, lora, scale


def test_identity_at_init(setup):
    """B=0 ⇒ adapted model == base model exactly."""
    cfg, params, lora, scale = setup
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, cfg.vocab_size)
    l0, _, _ = forward_lm(params, cfg, ids, causal=True)
    l1, _, _ = forward_lm(apply_lora(params, lora, scale), cfg, ids, causal=True)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)


def test_targets_and_shapes(setup):
    cfg, params, lora, scale = setup
    at = lora["layers"]["attn"]
    assert set(at) == {"wq", "wk", "wv", "wo"}
    assert at["wq"]["A"].shape == (cfg.num_hidden_layers, cfg.hidden_size, 4)
    assert "mlp" in lora["layers"]
    assert "embed" not in lora  # embeddings not targeted
    n_lora = sum(x.size for x in jax.tree_util.tree_leaves(lora))
    n_full = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_lora < 0.25 * n_full


def test_lora_training_moves_only_adapters(setup):
    cfg, params, lora, scale = setup
    from tests.test_train import _toy_batch

    batch = jax.tree_util.tree_map(jnp.asarray, _toy_batch())
    tc = TrainConfig(mode="unified", remat=False, temperature=0.1)
    loss_fn = lora_train_step_fns(params, cfg, tc, scale)
    opt = optax.adam(1e-2)
    opt_state = opt.init(lora)

    @jax.jit
    def step(lora, opt_state):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(lora, batch)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(lora, upd), opt_state, loss

    l0 = None
    cur = lora
    for i in range(8):
        cur, opt_state, loss = step(cur, opt_state)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0  # adapters learn
    # B moved away from zero
    assert float(jnp.abs(cur["layers"]["attn"]["wq"]["B"]).max()) > 0

    # merged export shifts the base weights
    merged = merge(params, cur, scale)
    assert not np.allclose(
        np.asarray(merged["layers"]["attn"]["wq"][0]),
        np.asarray(params["layers"]["attn"]["wq"][0]),
    )
