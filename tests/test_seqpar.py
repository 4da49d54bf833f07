"""Sequence-parallel trunk tests: ring-attention forward over a seq-sharded
mesh must match the plain forward exactly, both modes, plus gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.models.transformer import forward
from gritlm_tpu.ops.pooling import pool
from gritlm_tpu.parallel.seqpar import (
    make_seq_mesh,
    sequence_parallel_encode,
    sequence_parallel_forward,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_mistral()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, jax.random.PRNGKey(0), with_lm_head=False)


def _inputs(cfg, B=2, S=32, seed=1):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32).at[0, S - 5:].set(0)
    return ids, mask


@pytest.mark.parametrize("causal", [False, True])
def test_seqpar_matches_forward(cfg, params, causal):
    mesh = make_seq_mesh(8)
    ids, mask = _inputs(cfg)
    ref, _, _ = forward(params, cfg, ids, attention_mask=mask, causal=causal)
    got = jax.jit(
        lambda p, i, m: sequence_parallel_forward(
            p, cfg, i, mesh, attention_mask=m, causal=causal
        )
    )(params, ids, mask)
    # padded rows attend nothing in the ring path; compare valid positions
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(ref)[valid], rtol=3e-5, atol=3e-5
    )


def test_seqpar_encode_matches(cfg, params):
    mesh = make_seq_mesh(8)
    ids, mask = _inputs(cfg, seed=3)
    ref, _, _ = forward(params, cfg, ids, attention_mask=mask, causal=False)
    ref_emb = pool(ref, mask, "mean")
    ref_emb = ref_emb / jnp.linalg.norm(ref_emb, axis=-1, keepdims=True)
    emb = sequence_parallel_encode(params, cfg, ids, mesh,
                                   attention_mask=mask)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               rtol=3e-5, atol=3e-5)


def test_seqpar_gradients(cfg, params):
    mesh = make_seq_mesh(4)
    ids, mask = _inputs(cfg, B=1, S=16, seed=5)

    def loss_sp(p):
        h = sequence_parallel_forward(p, cfg, ids, mesh,
                                      attention_mask=mask, causal=True)
        return jnp.sum((h.astype(jnp.float32) * np.asarray(mask)[..., None]) ** 2)

    def loss_ref(p):
        h, _, _ = forward(p, cfg, ids, attention_mask=mask, causal=True)
        return jnp.sum((h.astype(jnp.float32) * np.asarray(mask)[..., None]) ** 2)

    g1 = jax.jit(jax.grad(loss_sp))(params)
    g2 = jax.jit(jax.grad(loss_ref))(params)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v in jax.tree_util.tree_leaves_with_path(g1):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[ks]),
                                   rtol=5e-4, atol=5e-4, err_msg=ks)


def test_seqpar_rejects_bad_split(cfg, params):
    mesh = make_seq_mesh(8)
    ids = jnp.zeros((1, 12), jnp.int32)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sequence_parallel_forward(params, cfg, ids, mesh)
