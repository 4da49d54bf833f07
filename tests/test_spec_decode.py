"""Prompt-lookup speculative decoding == plain greedy decode, token-exact.

Speculation must never change the text: rejected proposals are replaced by
the model's own argmax, so for any prompt (repetitive or adversarially
random) the output equals generate.generate(temperature=0.0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.generate import generate, make_cache_for_prompt
from gritlm_tpu.models import init_params
from gritlm_tpu.spec_decode import (
    _lookup_proposals,
    generate_speculative,
    spec_cache_extra,
)

CFG = tiny_mistral()
PARAMS = init_params(CFG, jax.random.PRNGKey(7), with_lm_head=True)
EOS = 2


def _greedy(ids, mask, max_new):
    cache = make_cache_for_prompt(CFG, ids.shape[0], ids.shape[1], max_new)
    return generate(
        PARAMS, CFG, ids, mask, cache, jax.random.PRNGKey(0),
        max_new_tokens=max_new, temperature=0.0, eos_id=EOS, pad_id=EOS,
    )


def _spec(ids, mask, max_new, ngram=3, k=7):
    cache = make_cache_for_prompt(
        CFG, ids.shape[0], ids.shape[1], max_new,
        extra=spec_cache_extra(max_new, k, ids.shape[0]),
    )
    return generate_speculative(
        PARAMS, CFG, ids, mask, cache,
        max_new_tokens=max_new, ngram=ngram, k=k, eos_id=EOS, pad_id=EOS,
    )


def _assert_match(ids, mask, max_new, **kw):
    ref = _greedy(ids, mask, max_new)
    got = _spec(ids, mask, max_new, **kw)
    np.testing.assert_array_equal(
        np.asarray(got.num_valid), np.asarray(ref.num_valid)
    )
    # compare only the valid prefix of each row (pad tail may differ in id)
    for r in range(ids.shape[0]):
        n = int(ref.num_valid[r])
        np.testing.assert_array_equal(
            np.asarray(got.tokens[r, :n]), np.asarray(ref.tokens[r, :n])
        )


def test_lookup_proposals_basic():
    # history: ... 5 6 7 9 5 6 7 — trailing ngram (5,6,7) matched at pos 1
    hist = jnp.asarray([[4, 5, 6, 7, 9, 5, 6, 7, 0, 0]])
    out = _lookup_proposals(hist, jnp.asarray([8]), ngram=3, k=3, pad_id=0)
    # tokens after the match at pos 1..3 are 9, 5, 6
    np.testing.assert_array_equal(np.asarray(out[0]), [9, 5, 6])


def test_lookup_no_match_gives_pad():
    hist = jnp.asarray([[1, 2, 3, 4, 5, 6, 0, 0]])
    out = _lookup_proposals(hist, jnp.asarray([6]), ngram=3, k=4, pad_id=99)
    np.testing.assert_array_equal(np.asarray(out[0]), [99] * 4)


def test_lookup_excludes_trailing_ngram_itself():
    # only occurrence of the trailing ngram is the tail itself -> no match
    hist = jnp.asarray([[9, 9, 1, 2, 3, 0]])
    out = _lookup_proposals(hist, jnp.asarray([5]), ngram=3, k=2, pad_id=0)
    np.testing.assert_array_equal(np.asarray(out[0]), [0, 0])


def test_spec_matches_greedy_single_row():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, CFG.vocab_size, (1, 24)), jnp.int32)
    _assert_match(ids, jnp.ones_like(ids), max_new=12)


def test_spec_matches_greedy_repetitive_prompt():
    # heavy repetition -> proposals actually get accepted; parity must hold
    base = np.array([7, 8, 9, 10, 11, 12], np.int32)
    row = np.concatenate([base] * 5)[None, :]
    ids = jnp.asarray(row)
    _assert_match(ids, jnp.ones_like(ids), max_new=16, ngram=2, k=4)


def test_spec_matches_greedy_ragged_batch():
    rng = np.random.default_rng(1)
    B, S = 3, 20
    ids = rng.integers(4, CFG.vocab_size, (B, S)).astype(np.int32)
    lens = np.array([20, 11, 5])
    mask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
    ids = np.where(mask > 0, ids, 0)
    # make row 1 repetitive so acceptance diverges across rows
    ids[1, :11] = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
    _assert_match(jnp.asarray(ids), jnp.asarray(mask), max_new=10, ngram=2, k=3)


@pytest.mark.parametrize("k,ngram", [(1, 2), (7, 4)])
def test_spec_matches_greedy_k_ngram_sweep(k, ngram):
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(4, CFG.vocab_size, (2, 16)), jnp.int32)
    _assert_match(ids, jnp.ones_like(ids), max_new=8, ngram=ngram, k=k)


def test_spec_from_prefilled_cache():
    """RAG continuation: doc KV prefilled, then prompt + spec decode."""
    rng = np.random.default_rng(3)
    doc = jnp.asarray(rng.integers(4, CFG.vocab_size, (1, 16)), jnp.int32)
    q = jnp.asarray(rng.integers(4, CFG.vocab_size, (1, 8)), jnp.int32)
    max_new, k = 8, 3
    from gritlm_tpu.models.transformer import forward

    def run(fn, extra):
        cache = make_cache_for_prompt(CFG, 1, 16 + 8, max_new, extra=extra)
        _, cache, _ = forward(
            PARAMS, CFG, doc, attention_mask=jnp.ones_like(doc),
            causal=True, cache=cache,
        )
        return fn(cache)

    ref = run(
        lambda c: generate(
            PARAMS, CFG, q, jnp.ones_like(q), c, jax.random.PRNGKey(0),
            max_new_tokens=max_new, temperature=0.0, eos_id=EOS, pad_id=EOS,
        ),
        extra=0,
    )
    got = run(
        lambda c: generate_speculative(
            PARAMS, CFG, q, jnp.ones_like(q), c,
            max_new_tokens=max_new, k=k, eos_id=EOS, pad_id=EOS,
        ),
        extra=spec_cache_extra(max_new, k, 1),
    )
    n = int(ref.num_valid[0])
    assert int(got.num_valid[0]) == n
    np.testing.assert_array_equal(
        np.asarray(got.tokens[0, :n]), np.asarray(ref.tokens[0, :n])
    )


def test_spec_cache_mask_stays_consistent():
    """After spec decode, per-row valid-slot count == prompt + emitted
    (holes are masked off, never counted)."""
    base = np.array([7, 8, 9, 10, 11, 12], np.int32)
    ids = jnp.asarray(np.concatenate([base] * 4)[None, :])
    mask = jnp.ones_like(ids)
    out = _spec(ids, mask, max_new=12, ngram=2, k=4)
    valid_slots = int(jnp.sum(out.cache.mask))
    # the final emitted token's KV is never written (same as the plain
    # decode loop: a token's KV lands when the *next* step forwards it)
    assert valid_slots == ids.shape[1] + int(out.num_valid[0]) - 1
