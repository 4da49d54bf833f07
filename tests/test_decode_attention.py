"""Decode-attention kernel vs the einsum oracle.

Covers the geometries the decode hot path actually sees (cached_attention
dispatch for Sq < 128): single-token decode over a padded cache, few-token
cached prefill, RAG caches with interior pad holes (concatenated segment
caches, reference rag/eval.py:237-295), sliding windows, GQA groups,
head_dim-64 (block-diagonal lanes), and layer indexing into the full
[L, B, Smax, Kv*Dh] cache buffer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.ops.attention import make_attention_bias, mha_reference
from gritlm_tpu.ops.decode_attention import flash_decode


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


def _mk_cache(key, L, B, Smax, hkv, dh):
    k1, k2 = jax.random.split(key)
    return (
        _rand(k1, (L, B, Smax, hkv * dh)),
        _rand(k2, (L, B, Smax, hkv * dh)),
    )


def _oracle(q, k_all, v_all, mask, *, layer, causal, sliding_window=None,
            offset=0):
    B, Sq, H, Dh = q.shape
    L, _, Smax, KD = k_all.shape
    hkv = KD // Dh
    k = k_all[layer].reshape(B, Smax, hkv, Dh)
    v = v_all[layer].reshape(B, Smax, hkv, Dh)
    bias = make_attention_bias(
        mask, Sq, Smax,
        causal=causal, sliding_window=sliding_window, offset=offset,
    )
    return mha_reference(q, k, v, bias)


def _check(q, k_all, v_all, mask, *, layer=0, causal, sliding_window=None,
           offset=0, tol=2e-3):
    got = flash_decode(
        q, k_all, v_all, mask, causal=causal, sliding_window=sliding_window,
        offset=offset, layer=layer,
    )
    want = _oracle(
        q, k_all, v_all, mask, layer=layer, causal=causal,
        sliding_window=sliding_window, offset=offset,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=tol, rtol=tol
    )


@pytest.mark.parametrize("h,hkv,dh", [(4, 2, 128), (8, 8, 128), (4, 1, 256)])
def test_single_token_decode(h, hkv, dh):
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    B, Smax, length = 2, 256, 70
    q = _rand(keys[0], (B, 1, h, dh))
    k_all, v_all = _mk_cache(keys[1], 2, B, Smax, hkv, dh)
    mask = (jnp.arange(Smax)[None, :] < length).astype(jnp.int32)
    mask = jnp.broadcast_to(mask, (B, Smax))
    _check(q, k_all, v_all, mask, layer=1, causal=True, offset=length - 1)


def test_multi_token_cached_prefill():
    """Sq > 1 with a cache: within-step causality against the write offset."""
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    B, Sq, Smax, H, Hkv, Dh = 2, 7, 384, 4, 2, 128
    offset = 100
    q = _rand(keys[0], (B, Sq, H, Dh))
    k_all, v_all = _mk_cache(keys[1], 1, B, Smax, Hkv, Dh)
    mask = (jnp.arange(Smax)[None, :] < offset + Sq).astype(jnp.int32)
    mask = jnp.broadcast_to(mask, (B, Smax))
    _check(q, k_all, v_all, mask, causal=True, offset=offset)


def test_interior_pad_holes():
    """RAG concatenated caches leave masked holes inside the slot range."""
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    B, Smax, H, Hkv, Dh = 2, 512, 4, 2, 128
    q = _rand(keys[0], (B, 1, H, Dh))
    k_all, v_all = _mk_cache(keys[1], 1, B, Smax, Hkv, Dh)
    mask = (jax.random.uniform(keys[2], (B, Smax)) > 0.4).astype(jnp.int32)
    mask = mask.at[:, 300:].set(0)  # tail fully invalid (skipped blocks)
    _check(q, k_all, v_all, mask, causal=True, offset=299)


def test_bidirectional_and_window():
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    B, Smax, H, Hkv, Dh = 1, 256, 4, 4, 128
    q = _rand(keys[0], (B, 3, H, Dh))
    k_all, v_all = _mk_cache(keys[1], 1, B, Smax, Hkv, Dh)
    mask = (jnp.arange(Smax)[None, :] < 200).astype(jnp.int32)
    _check(q, k_all, v_all, mask, causal=False)
    _check(q, k_all, v_all, mask, causal=True, sliding_window=64, offset=197)


@pytest.mark.parametrize("h,hkv", [(8, 2), (4, 4)])
def test_head_dim_64_block_diagonal(h, hkv):
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    B, Smax, Dh, length = 2, 256, 64, 130
    q = _rand(keys[0], (B, 1, h, Dh))
    k_all, v_all = _mk_cache(keys[1], 1, B, Smax, hkv, Dh)
    mask = (jnp.arange(Smax)[None, :] < length).astype(jnp.int32)
    mask = jnp.broadcast_to(mask, (B, Smax))
    _check(q, k_all, v_all, mask, causal=True, offset=length - 1)
    _check(q, k_all, v_all, mask, causal=False)


def test_empty_mask_is_finite():
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    B, Smax, H, Hkv, Dh = 1, 128, 2, 2, 128
    q = _rand(keys[0], (B, 1, H, Dh))
    k_all, v_all = _mk_cache(keys[1], 1, B, Smax, Hkv, Dh)
    mask = jnp.zeros((B, Smax), jnp.int32)
    out = flash_decode(q, k_all, v_all, mask, causal=True, offset=0)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unsupported_geometries_raise():
    q = jnp.zeros((1, 1, 2, 80))
    kv = jnp.zeros((1, 1, 128, 2 * 80))  # Kv*Dh = 160: not lane-aligned
    with pytest.raises(NotImplementedError):
        flash_decode(q, kv, kv, None, causal=True)
    q = jnp.zeros((1, 1, 3, 64))
    kv = jnp.zeros((1, 1, 128, 3 * 64))  # 192 lanes: not lane-aligned
    with pytest.raises(NotImplementedError):
        flash_decode(q, kv, kv, None, causal=True)


def test_traced_layer_and_offset():
    """layer/offset as traced scalars (how the layer scan calls it)."""
    keys = jax.random.split(jax.random.PRNGKey(6), 2)
    B, Smax, H, Hkv, Dh, L = 2, 256, 4, 2, 128, 3
    q = _rand(keys[0], (B, 1, H, Dh))
    k_all, v_all = _mk_cache(keys[1], L, B, Smax, Hkv, Dh)
    mask = jnp.broadcast_to(
        (jnp.arange(Smax)[None, :] < 99).astype(jnp.int32), (B, Smax)
    )

    @jax.jit
    def run(layer, offset):
        return flash_decode(
            q, k_all, v_all, mask, causal=True, offset=offset, layer=layer
        )

    for layer in range(L):
        got = run(jnp.asarray(layer), jnp.asarray(98))
        want = _oracle(
            q, k_all, v_all, mask, layer=layer, causal=True, offset=98
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3
        )


def test_cached_attention_dispatch():
    """cached_attention(impl auto→reference on CPU) ≡ flash_decode path."""
    from gritlm_tpu.ops.attention import cached_attention

    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    B, Smax, H, Hkv, Dh = 2, 256, 4, 2, 128
    q = _rand(keys[0], (B, 1, H, Dh))
    k_all, v_all = _mk_cache(keys[1], 2, B, Smax, Hkv, Dh)
    mask = jnp.broadcast_to(
        (jnp.arange(Smax)[None, :] < 99).astype(jnp.int32), (B, Smax)
    )
    got = cached_attention(
        q, k_all, v_all, mask, layer=1, offset=98, causal=True, impl="flash"
    )
    want = cached_attention(
        q, k_all, v_all, mask, layer=1, offset=98, causal=True,
        impl="reference",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3
    )


def test_per_row_offsets_causal_chunk():
    """Vector offsets (serving speculative verify): each row's Sq-token
    chunk is causally bounded at its OWN offset, and streaming is bounded
    by each row's own valid slots."""
    key = jax.random.PRNGKey(9)
    L, B, Smax, hkv, dh, H, Sq = 2, 3, 512, 2, 128, 4, 4
    k_all, v_all = _mk_cache(key, L, B, Smax, hkv, dh)
    q = _rand(jax.random.fold_in(key, 1), (B, Sq, H, dh))
    offs = jnp.asarray([5, 130, 257], jnp.int32)
    mask = np.zeros((B, Smax), np.int32)
    for b, o in enumerate([5, 130, 257]):
        mask[b, : o + Sq] = 1
    mask = jnp.asarray(mask)
    for layer in range(L):
        got = flash_decode(
            q, k_all, v_all, mask, causal=True, offset=offs, layer=layer,
        )
        want = _oracle(
            q, k_all, v_all, mask, layer=layer, causal=True, offset=offs,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3
        )
