"""Ring attention (sequence parallel) vs the full-attention oracle on a
virtual device ring."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gritlm_tpu.ops.attention import make_attention_bias, mha_reference
from gritlm_tpu.ops.ring_attention import ring_attention


def _run_ring(q, k, v, mask, causal, n_dev=4):
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("seq",))
    fn = shard_map(
        functools.partial(ring_attention, causal=causal, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    return jax.jit(fn)(q, k, v, mask)


@pytest.mark.parametrize("causal", [False, True])
def test_matches_full_attention(causal):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(0)
    B, S, H, Hkv, Dh = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, Dh)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[1, 50:] = 0  # padding inside the last shard
    mask = jnp.asarray(mask)

    out_ring = _run_ring(q, k, v, mask, causal)
    bias = make_attention_bias(mask, S, S, causal=causal)
    out_full = mha_reference(q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_full), atol=2e-5
    )


def test_masked_whole_shard():
    """An entirely-padded kv shard must not poison the merge."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(1)
    B, S, H, Hkv, Dh = 1, 32, 2, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, Dh)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, 24:] = 0  # final shard (of 4 x 8) fully masked
    mask = jnp.asarray(mask)
    out_ring = _run_ring(q, k, v, mask, causal=False)
    bias = make_attention_bias(mask, S, S, causal=False)
    out_full = mha_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full), atol=2e-5)


def test_ring_flash_inner_path():
    """Shards big enough for the Pallas inner kernel (Dh=128, S/P>=128) must
    match the reference attention, both modes."""
    import numpy as np

    from gritlm_tpu.ops.attention import make_attention_bias, mha_reference

    B, S, H, Hkv, Dh, P_ = 1, 512, 4, 2, 128, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, Dh), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, Dh), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, Dh), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32).at[:, 480:].set(0)
    mesh = Mesh(np.asarray(jax.devices()[:P_]), ("sp",))
    for causal in (False, True):
        fn = shard_map(
            lambda q, k, v, m: ring_attention(
                q, k, v, m, causal=causal, axis_name="sp"
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
            check_vma=False,
        )
        got = jax.jit(fn)(q, k, v, mask)
        ref = mha_reference(q, k, v, make_attention_bias(mask, S, S, causal=causal))
        valid = np.asarray(mask[0], bool)
        np.testing.assert_allclose(
            np.asarray(got)[:, valid], np.asarray(ref)[:, valid],
            rtol=2e-3, atol=2e-3,
        )
