"""Int8 frozen-base (QLoRA-analogue) tests: quantization fidelity, forward
through quantized weights, lazy LoRA, and QLoRA training end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import forward_lm, init_params
from gritlm_tpu.models.transformer import forward
from gritlm_tpu.training.lora import (
    apply_lora,
    apply_lora_lazy,
    init_lora,
    lora_train_step_fns,
)
from gritlm_tpu.training.quant import (
    dequantize_tree,
    quantize_kernel,
    quantize_tree,
    quantized_bytes,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_mistral()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 16), jnp.float32) * 0.05
    node = quantize_kernel(w)
    assert node["q8"].dtype == jnp.int8
    deq = np.asarray(node["q8"], np.float32) * np.asarray(node["scale"])
    # per-channel absmax int8: max error <= scale/2 = absmax/254
    absmax = np.max(np.abs(np.asarray(w)), axis=-2, keepdims=True)
    assert np.all(np.abs(deq - np.asarray(w)) <= absmax / 254 + 1e-8)


def test_quantized_forward_close(cfg, params):
    qparams = quantize_tree(params)
    assert quantized_bytes(qparams) < quantized_bytes(params)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size)
    h_ref, _, _ = forward(params, cfg, ids, causal=True)
    h_q, _, _ = forward(qparams, cfg, ids, causal=True)
    # int8 weights → small relative drift, same structure
    ref = np.asarray(h_ref, np.float32)
    got = np.asarray(h_q, np.float32)
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(got - ref) / denom) < 0.05


def test_dequantize_tree_roundtrip(cfg, params):
    qparams = quantize_tree(params)
    back = dequantize_tree(qparams, jnp.float32)
    w0 = np.asarray(params["layers"]["attn"]["wq"], np.float32)
    w1 = np.asarray(back["layers"]["attn"]["wq"], np.float32)
    assert np.max(np.abs(w0 - w1)) < np.max(np.abs(w0)) / 100


def test_lazy_lora_matches_eager(cfg, params):
    lora, scale = init_lora(params, jax.random.PRNGKey(3), r=4)
    # give B nonzero values so the delta actually matters
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 3 else x, lora
    )
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 10), 0, cfg.vocab_size)
    eager = apply_lora(params, lora, scale)
    lazy = apply_lora_lazy(params, lora, scale)
    l_e, _, _ = forward_lm(eager, cfg, ids, causal=True)
    l_l, _, _ = forward_lm(lazy, cfg, ids, causal=True)
    np.testing.assert_allclose(np.asarray(l_e, np.float32),
                               np.asarray(l_l, np.float32), atol=2e-4)


def test_qlora_train_step(cfg, params):
    """int8 base + LoRA: loss decreases over steps, only LoRA has grads."""
    import optax

    from gritlm_tpu.training.train import TrainConfig

    qparams = quantize_tree(params)
    lora, scale = init_lora(qparams, jax.random.PRNGKey(5), r=4)
    tc = TrainConfig(mode="generative", total_steps=4)
    loss_fn = lora_train_step_fns(qparams, cfg, tc, scale)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    batch = {"generative": {
        "input_ids": ids,
        "attention_mask": jnp.ones((2, 16), jnp.int32),
        "labels": ids,
    }}
    opt = optax.adam(1e-2)
    opt_state = opt.init(lora)

    @jax.jit
    def step(lora, opt_state):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora, batch)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(lora, updates), opt_state, loss

    losses = []
    for _ in range(4):
        lora, opt_state, loss = step(lora, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_qlora_merge_export(cfg, params):
    """merge(quantized base, lora) → dense params that run forward_lm."""
    qparams = quantize_tree(params)
    lora, scale = init_lora(qparams, jax.random.PRNGKey(6), r=4)
    merged = apply_lora(qparams, lora, scale)
    assert merged["layers"]["attn"]["wq"].dtype != jnp.int8
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 8), 0, cfg.vocab_size)
    logits, _, _ = forward_lm(merged, cfg, ids, causal=True)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


def test_host_quantized_init_tree_matches(cfg):
    """bench.py's synthesized w8a16 host init must be tree-identical
    (paths, shapes, dtypes) to the real quantize_for_serving(init_params)
    output — it stands in for the 7B cell's params, so any structural
    drift would silently bench a different model."""
    import sys

    sys.path.insert(0, ".")
    from bench import _init_params_quantized_host

    from gritlm_tpu.models import init_params
    from gritlm_tpu.training.quant import quantize_for_serving

    real = quantize_for_serving(
        init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)
    )
    fake = _init_params_quantized_host(cfg)

    def spec(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {
            jax.tree_util.keystr(path): (tuple(leaf.shape), str(leaf.dtype))
            for path, leaf in flat
        }
    assert spec(fake) == spec(real)
    # and the synthesized model must run finite through the full trunk
    from gritlm_tpu.models.transformer import forward_lm

    params = jax.tree_util.tree_map(jnp.asarray, fake)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0,
                             cfg.vocab_size)
    logits, _, _ = forward_lm(params, cfg, ids, causal=True)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))
