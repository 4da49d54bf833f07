"""Prompt-lookup speculative decoding (greedy, draft-model-free).

Serving-latency feature beyond the reference (which decodes strictly one
token per forward via HF generate, rag/eval.py:296-302): propose the next
`k` tokens by matching the trailing n-gram of the generated text against the
prompt/history, then verify all k+1 in ONE forward. On TPU the verify step
costs nearly the same as a 1-token decode step — decode is HBM-bound on
streaming the KV cache, and a [B, k+1] query chunk streams exactly the same
cache bytes — so every accepted proposal is an almost-free extra token.
RAG answers quote their grounding documents heavily, which is the ideal
case for prompt lookup (acceptance rates of 50-90% on extractive answers).

Output parity: token-for-token identical to `generate.generate` with
temperature=0.0 (greedy). Rejected proposals are discarded and the model's
own argmax is emitted instead, so speculation changes latency, never text.
Pinned by tests/test_spec_decode.py against the plain decode loop.

Cache layout: the verify chunk is written at the scalar slot frontier
(`cache.length`); rows that accept fewer proposals than the step's maximum
leave masked-off junk slots behind ("holes"), exactly like right-padded
ragged prefill already does (generate.py:10-12). B=1 decoding is hole-free.
Callers size the cache with `spec_cache_extra` slack for the B>1 worst case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.generate import GenerateResult, _prompt_positions
from gritlm_tpu.models.transformer import (
    KVCache,
    forward,
    logits_from_hidden,
)


def spec_cache_extra(max_new_tokens: int, k: int, batch: int) -> int:
    """Slot slack to add when sizing a cache for speculative decoding.

    B=1 needs only the verify chunk's scratch (k slots past the last
    accepted token). B>1 additionally pays for holes: each step advances
    the frontier by the *fastest* row's acceptance while slower rows leave
    masked slots behind — worst case max_new_tokens*k extra, but
    max_new_tokens slack covers every observed workload; truncation when
    slots run out is handled (the loop stops early, tokens stay valid).
    """
    return k if batch == 1 else max_new_tokens + k


def _lookup_proposals(
    history: jax.Array,  # [B, H] token history (prompt + generated), dense
    hist_len: jax.Array,  # [B] valid length per row
    ngram: int,
    k: int,
    pad_id: int,
) -> jax.Array:
    """For each row: find the most recent earlier occurrence of the trailing
    `ngram` tokens and return the k tokens that followed it ([B, k]).
    No-match rows get pad_id proposals (verification rejects them)."""
    B, H = history.shape
    pos = jnp.arange(H)

    def row(hist, hlen):
        tail = jax.lax.dynamic_slice(
            hist, (jnp.clip(hlen - ngram, 0),), (ngram,)
        )  # [ngram]
        # windows[p] == hist[p : p + ngram] — compare all at once
        match = jnp.ones((H,), bool)
        for t in range(ngram):
            match &= jnp.roll(hist, -t) == tail[t]
        # window must end before the trailing ngram itself and fit in bounds
        match &= pos + ngram <= hlen - ngram
        p = jnp.max(jnp.where(match, pos, -1))  # most recent match
        idx = p + ngram + jnp.arange(k)
        prop = jnp.where(
            (p >= 0) & (idx < hlen), hist[jnp.clip(idx, 0, H - 1)], pad_id
        )
        return prop

    return jax.vmap(row)(history, hist_len)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "ngram", "k", "eos_id", "pad_id"),
)
def generate_speculative(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, S] right-padded prompt
    attention_mask: jax.Array,  # [B, S]
    cache: KVCache,  # pre-sized (and possibly pre-filled) cache
    *,
    max_new_tokens: int = 16,
    ngram: int = 3,
    k: int = 7,
    eos_id: int = 2,
    pad_id: int = 2,
) -> GenerateResult:
    """Greedy decode with prompt-lookup speculation; same contract as
    generate.generate(temperature=0.0). History for n-gram matching covers
    the prompt plus everything generated (not cache-continuation text —
    pass docs in the prompt, or accept lookup only over the visible part)."""
    B, S = input_ids.shape
    Smax = cache.max_len

    # ---- prefill (identical to generate.generate)
    prev_valid = jnp.sum(cache.mask, axis=1)
    positions = _prompt_positions(prev_valid, attention_mask)
    hidden, cache, _ = forward(
        params, cfg, input_ids,
        attention_mask=attention_mask, causal=True,
        positions=positions, cache=cache,
    )
    last_idx = jnp.argmax(
        jnp.where(attention_mask > 0, jnp.arange(S)[None, :], -1), axis=1
    )
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]
    logits = logits_from_hidden(params, cfg, last_hidden[:, None, :])[:, 0]
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # ---- dense history: prompt tokens compacted left + generated tokens.
    # Prompt rows are right-padded; pad holes would break n-gram matching,
    # so compact each row's valid tokens to the front.
    Hbuf = S + max_new_tokens
    order = jnp.argsort(attention_mask == 0, axis=1, stable=True)  # valid first
    compact = jnp.take_along_axis(input_ids, order, axis=1)
    history = jnp.pad(compact, ((0, 0), (0, Hbuf - S)), constant_values=pad_id)
    hist_len = jnp.sum(attention_mask, axis=1)
    history = history.at[jnp.arange(B), hist_len].set(tok0)
    hist_len = hist_len + 1

    out = jnp.full((B, max_new_tokens), pad_id, jnp.int32)
    out = out.at[:, 0].set(tok0)
    out_len = jnp.ones((B,), jnp.int32)
    done0 = tok0 == eos_id
    # a row emitting its max_new_tokens'th token is also finished
    done0 = done0 | (out_len >= max_new_tokens)

    def cond(carry):
        cache, history, hist_len, out, out_len, last_tok, done, steps = carry
        frontier = cache.length
        return jnp.logical_not(jnp.all(done)) & (frontier + k + 1 <= Smax)

    def body(carry):
        cache, history, hist_len, out, out_len, last_tok, done, steps = carry
        frontier = cache.length
        active = jnp.logical_not(done)

        proposals = _lookup_proposals(history, hist_len, ngram, k, pad_id)
        chunk = jnp.concatenate([last_tok[:, None], proposals], axis=1)  # [B, k+1]
        chunk_mask = jnp.broadcast_to(
            active[:, None].astype(jnp.int32), (B, k + 1)
        )
        pos = jnp.sum(cache.mask, axis=1)[:, None] + jnp.arange(k + 1)[None, :]
        hidden, cache, _ = forward(
            params, cfg, chunk,
            attention_mask=chunk_mask, causal=True,
            positions=pos, cache=cache,
        )
        greedy = jnp.argmax(
            logits_from_hidden(params, cfg, hidden), axis=-1
        ).astype(jnp.int32)  # [B, k+1]; greedy[:, i] = model token after chunk[:, :i+1]

        # longest accepted prefix of the proposals
        ok = proposals == greedy[:, :k]  # [B, k]
        a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)  # [B]
        # emitted tokens this step: accepted proposals then the bonus token
        emit_tok = jnp.concatenate(
            [proposals, jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        bonus = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
        emit_tok = jnp.where(
            jnp.arange(k + 1)[None, :] == a[:, None], bonus[:, None], emit_tok
        )  # [B, k+1]: first a are accepted proposals, position a is the bonus
        n_emit = a + 1

        # truncate at EOS and at the per-row token budget
        is_eos = emit_tok == eos_id
        before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(jnp.int32)
        upto_eos = jnp.sum((before == 0).astype(jnp.int32), axis=1)  # incl. first EOS
        n_emit = jnp.minimum(n_emit, upto_eos)
        n_emit = jnp.minimum(n_emit, max_new_tokens - out_len)
        n_emit = jnp.where(active, n_emit, 0)
        hit_eos = jnp.any(
            is_eos & (jnp.arange(k + 1)[None, :] < n_emit[:, None]), axis=1
        )

        # cache slot validity: slot 0 (last_tok) + one per emitted proposal
        n_slots = jnp.where(active, 1 + jnp.minimum(a, n_emit), 0)
        slot_idx = jnp.arange(k + 1)[None, :]
        new_mask_bits = (slot_idx < n_slots[:, None]).astype(cache.mask.dtype)
        mask = jax.lax.dynamic_update_slice(
            cache.mask, new_mask_bits, (0, frontier)
        )
        adv = jnp.max(jnp.where(active, n_slots, 0))
        cache = cache._replace(mask=mask, length=frontier + adv)

        # scatter emitted tokens into out / history at per-row offsets
        j = jnp.arange(k + 1)[None, :]
        valid_emit = j < n_emit[:, None]
        out_pos = jnp.where(valid_emit, out_len[:, None] + j, max_new_tokens)
        out = out.at[jnp.arange(B)[:, None], out_pos].set(
            emit_tok, mode="drop"
        )
        hist_pos = jnp.where(valid_emit, hist_len[:, None] + j, Hbuf)
        history = history.at[jnp.arange(B)[:, None], hist_pos].set(
            emit_tok, mode="drop"
        )
        out_len = out_len + n_emit
        hist_len = hist_len + n_emit
        last_tok = jnp.where(
            n_emit > 0,
            jnp.take_along_axis(
                emit_tok, jnp.maximum(n_emit - 1, 0)[:, None], axis=1
            )[:, 0],
            last_tok,
        )
        done = done | hit_eos | (out_len >= max_new_tokens)
        return (cache, history, hist_len, out, out_len, last_tok, done,
                steps + 1)

    carry = (cache, history, hist_len, out, out_len, tok0, done0,
             jnp.zeros((), jnp.int32))
    cache, history, hist_len, out, out_len, _, _, steps = jax.lax.while_loop(
        cond, body, carry
    )
    return GenerateResult(
        tokens=out, num_valid=out_len, cache=cache, spec_steps=steps
    )
