"""Per-row cache offsets (`forward(row_offsets=...)`): the continuous-
batching decode step, where every batch slot holds an independent request
at an independent length. Reference has no serving engine (its decode is
lockstep HF generate, gritlm/gritlm.py:262-296); this is the TPU-native
extension that keeps decode batches full under ragged request arrival.

Pins: a batched per-row-offset step is row-for-row identical to running
each request alone through the scalar-offset path — logits, written KV
slots, and kv_mask — for both bf16 and int8 caches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.models.transformer import forward, init_cache

SMAX = 16
LENS = [3, 7, 5]  # ragged per-slot occupancies


def _per_row_oracle(cfg, params, prompts, next_ids, quant):
    """Each request alone: scalar-offset prefill + one decode step."""
    outs = []
    for prompt, nid in zip(prompts, next_ids):
        cache = init_cache(cfg, 1, SMAX, quant=quant)
        _, cache, _ = forward(
            params, cfg, jnp.asarray(prompt)[None, :], cache=cache
        )
        h, cache, _ = forward(
            params, cfg, jnp.asarray([[nid]]), cache=cache
        )
        outs.append((np.asarray(h[0, 0]), cache))
    return outs


@pytest.mark.parametrize("quant", [False, True])
def test_row_offsets_decode_matches_per_row(quant):
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, cfg.vocab_size, size=n).tolist() for n in LENS]
    next_ids = rng.integers(1, cfg.vocab_size, size=len(LENS)).tolist()

    oracle = _per_row_oracle(cfg, params, prompts, next_ids, quant)

    # batched cache: stack each request's prefilled row into one B-cache
    B = len(LENS)
    cache = init_cache(cfg, B, SMAX, quant=quant)
    k = np.array(cache.k)
    v = np.array(cache.v)
    mask = np.array(cache.mask)
    ks = None if cache.k_scale is None else np.array(cache.k_scale)
    vs = None if cache.v_scale is None else np.array(cache.v_scale)
    for i, (_, row_cache) in enumerate(oracle):
        n = LENS[i]
        k[:, i, :n] = np.asarray(row_cache.k)[:, 0, :n]
        v[:, i, :n] = np.asarray(row_cache.v)[:, 0, :n]
        mask[i, :n] = np.asarray(row_cache.mask)[0, :n]
        if quant:
            ks[:, i, :, :n] = np.asarray(row_cache.k_scale)[:, 0, :, :n]
            vs[:, i, :, :n] = np.asarray(row_cache.v_scale)[:, 0, :, :n]
    cache = cache._replace(
        k=jnp.asarray(k), v=jnp.asarray(v), mask=jnp.asarray(mask),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
    )

    offs = jnp.asarray(LENS, jnp.int32)
    ids = jnp.asarray(next_ids, jnp.int32)[:, None]
    h, new_cache, _ = forward(
        params, cfg, ids, cache=cache, row_offsets=offs
    )

    tol = 2e-2 if quant else 2e-5
    for i, (h_ref, row_cache) in enumerate(oracle):
        np.testing.assert_allclose(
            np.asarray(h[i, 0]), h_ref, atol=tol, rtol=tol,
            err_msg=f"row {i} hidden mismatch",
        )
        n = LENS[i]
        # the step's K/V landed at THIS row's offset, identically to the
        # scalar path's write for the same request
        np.testing.assert_allclose(
            np.asarray(new_cache.k)[:, i, n],
            np.asarray(row_cache.k)[:, 0, n],
            atol=tol, rtol=tol, err_msg=f"row {i} K slot",
        )
        np.testing.assert_allclose(
            np.asarray(new_cache.v)[:, i, n],
            np.asarray(row_cache.v)[:, 0, n],
            atol=tol, rtol=tol, err_msg=f"row {i} V slot",
        )
        got_mask = np.asarray(new_cache.mask)[i]
        assert got_mask[: n + 1].all() and not got_mask[n + 1 :].any()


@pytest.mark.parametrize("quant", [False, True])
def test_row_offsets_multi_token_chunk_matches_per_row(quant):
    """S > 1 per-row chunks (the speculative verify step): each row appends
    S tokens at its OWN offset with causal attention inside the chunk —
    hidden states and written slots row-for-row identical to feeding the
    same S tokens through the scalar-offset path alone."""
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    S = 3
    prompts = [rng.integers(1, cfg.vocab_size, size=n).tolist() for n in LENS]
    chunks = rng.integers(1, cfg.vocab_size, size=(len(LENS), S))

    oracle = []
    for prompt, ch in zip(prompts, chunks):
        cache = init_cache(cfg, 1, SMAX, quant=quant)
        _, cache, _ = forward(
            params, cfg, jnp.asarray(prompt)[None, :], cache=cache
        )
        h, cache, _ = forward(
            params, cfg, jnp.asarray(ch)[None, :], cache=cache
        )
        oracle.append((np.asarray(h[0]), cache))

    B = len(LENS)
    cache = init_cache(cfg, B, SMAX, quant=quant)
    k = np.array(cache.k); v = np.array(cache.v); mask = np.array(cache.mask)
    ks = None if cache.k_scale is None else np.array(cache.k_scale)
    vs = None if cache.v_scale is None else np.array(cache.v_scale)
    for i, (_, row_cache) in enumerate(oracle):
        n = LENS[i]
        k[:, i, :n] = np.asarray(row_cache.k)[:, 0, :n]
        v[:, i, :n] = np.asarray(row_cache.v)[:, 0, :n]
        mask[i, :n] = 1
        if quant:
            ks[:, i, :, :n] = np.asarray(row_cache.k_scale)[:, 0, :, :n]
            vs[:, i, :, :n] = np.asarray(row_cache.v_scale)[:, 0, :, :n]
    cache = cache._replace(
        k=jnp.asarray(k), v=jnp.asarray(v), mask=jnp.asarray(mask),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
    )

    offs = jnp.asarray(LENS, jnp.int32)
    h, new_cache, _ = forward(
        params, cfg, jnp.asarray(chunks, jnp.int32), cache=cache,
        row_offsets=offs,
    )

    tol = 3e-2 if quant else 2e-5
    for i, (h_ref, row_cache) in enumerate(oracle):
        n = LENS[i]
        np.testing.assert_allclose(
            np.asarray(h[i]), h_ref, atol=tol, rtol=tol,
            err_msg=f"row {i} chunk hidden mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(new_cache.k)[:, i, n:n + S],
            np.asarray(row_cache.k)[:, 0, n:n + S],
            atol=tol, rtol=tol, err_msg=f"row {i} K window",
        )
        got_mask = np.asarray(new_cache.mask)[i]
        assert got_mask[: n + S].all() and not got_mask[n + S:].any()
