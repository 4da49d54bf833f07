"""Jitted autoregressive generation with a static-shape KV cache.

TPU-native replacement for the reference's HF `model.generate` usage
(gritlm/gritlm.py:34, rag/eval.py:296-302): prefill + `lax.scan` decode loop,
compiled once per (batch, prompt-bucket, max_new_tokens) shape. Supports
starting from a pre-filled cache (RAG doc/query cache reuse — the cache is
just already-written KV slots + a slot-validity mask, so the reference's
per-layer torch.cat of cached K/V becomes slot concatenation for free).

Positions are computed from the running per-row valid-token count (the
analogue of HF's position_ids = cumsum(attention_mask) - 1), so right-padded
prompts and concatenated caches with pad holes decode correctly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.models.transformer import (
    KVCache,
    forward,
    init_cache,
    logits_from_hidden,
)


class GenerateResult(NamedTuple):
    tokens: jax.Array  # [B, max_new_tokens] generated ids (pad after eos)
    num_valid: jax.Array  # [B] count of tokens up to & including eos
    cache: KVCache
    # speculative decoding only: number of verify steps taken (acceptance
    # rate = (sum(num_valid) - B) / (B * spec_steps) proposals/step)
    spec_steps: Optional[jax.Array] = None


def _prompt_positions(prev_valid: jax.Array, step_mask: jax.Array) -> jax.Array:
    """prev_valid [B] (valid tokens already in cache), step_mask [B, S] →
    positions [B, S] continuing each row's token count across pad holes."""
    cum = jnp.cumsum(step_mask, axis=1) - 1
    return prev_valid[:, None] + jnp.clip(cum, 0, None)


def _sample(
    logits: jax.Array, key, temperature: float, top_k: int, top_p: float = 1.0
) -> jax.Array:
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        top_vals, _ = jax.lax.top_k(logits, top_k)
        kth = top_vals[..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        logits = nucleus_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1)


def nucleus_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Top-p: mask everything outside the smallest prefix of the sorted
    distribution with cumulative mass ≥ top_p (the top token always
    survives). fp32 throughout: a bf16 cumsum over a 32k-152k vocab
    misplaces the cutoff by hundreds of tokens."""
    lf = logits.astype(jnp.float32)
    sort = jnp.sort(lf, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sort, axis=-1), axis=-1)
    cut = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1)  # [B]
    kth = jnp.take_along_axis(sort, cut[..., None], axis=-1)
    return jnp.where(lf < kth, -jnp.inf, logits)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "min_new_tokens", "temperature", "top_k",
        "top_p", "eos_id", "pad_id",
    ),
)
def generate(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, S] right- or left-padded prompt
    attention_mask: jax.Array,  # [B, S]
    cache: KVCache,  # pre-sized (and possibly pre-filled) cache
    key: jax.Array,
    *,
    max_new_tokens: int = 16,
    min_new_tokens: int = 0,  # suppress EOS for the first N tokens
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,  # static, like temperature/top_k: one compiled
    # program per sampling config (sampling params are per-deployment
    # constants here, not per-request knobs)
    eos_id: int = 2,
    pad_id: int = 2,
) -> GenerateResult:
    B, S = input_ids.shape

    # ---- prefill
    prev_valid = jnp.sum(cache.mask, axis=1)  # [B]
    positions = _prompt_positions(prev_valid, attention_mask)
    hidden, cache, _ = forward(
        params, cfg, input_ids,
        attention_mask=attention_mask, causal=True,
        positions=positions, cache=cache,
    )
    # logits only at each row's last valid prompt token (avoid [B,S,V])
    last_idx = jnp.argmax(
        jnp.where(attention_mask > 0, jnp.arange(S)[None, :], -1), axis=1
    )
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]
    logits = logits_from_hidden(params, cfg, last_hidden[:, None, :])[:, 0]

    key, k0 = jax.random.split(key)
    if min_new_tokens >= 1:  # EOS suppressed until min_new_tokens emitted
        logits = logits.at[:, eos_id].set(-jnp.inf)
    tok0 = _sample(logits, k0, temperature, top_k, top_p)
    done0 = tok0 == eos_id

    def step(carry, i):
        cache, tok, done, key = carry
        step_mask = jnp.logical_not(done).astype(jnp.int32)[:, None]
        pos = jnp.sum(cache.mask, axis=1)[:, None]
        hidden, cache, _ = forward(
            params, cfg, tok[:, None],
            attention_mask=step_mask, causal=True,
            positions=pos, cache=cache,
        )
        logits = logits_from_hidden(params, cfg, hidden)[:, 0]
        key, k = jax.random.split(key)
        # i = index of the token being sampled; -inf + 0.0 keeps the add
        # a no-op once past min_new_tokens
        logits = logits.at[:, eos_id].add(
            jnp.where(i < min_new_tokens, -jnp.inf, 0.0)
        )
        nxt = _sample(logits, k, temperature, top_k, top_p)
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        return (cache, nxt, done, key), nxt

    if max_new_tokens > 1:
        (cache, _, _, _), rest = jax.lax.scan(
            step, (cache, tok0, done0, key), jnp.arange(1, max_new_tokens)
        )
        tokens = jnp.concatenate([tok0[:, None], rest.T], axis=1)
    else:
        tokens = tok0[:, None]

    is_eos = tokens == eos_id
    seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
    valid = (seen_eos == 0) | (is_eos & (seen_eos == 1))
    tokens = jnp.where(valid, tokens, pad_id)
    return GenerateResult(tokens=tokens, num_valid=jnp.sum(valid, axis=1), cache=cache)


def align_cache_len(n: int) -> int:
    """Slot-count alignment: 128 below 1k, else the flash k-block size
    (1024) — a cache whose Smax is already a k-block multiple is consumed
    by both the prefill flash kernel and the decode kernel without any
    re-padding copy (padding a long cache costs a full cache rewrite per
    layer per call)."""
    if n <= 1024:
        return ((n + 127) // 128) * 128
    return ((n + 1023) // 1024) * 1024


def make_cache_for_prompt(
    cfg: ModelConfig, batch: int, prompt_len: int, max_new_tokens: int,
    extra: int = 0, dtype=None, quant: bool = False,
) -> KVCache:
    total = align_cache_len(prompt_len + max_new_tokens + extra)
    return init_cache(cfg, batch, total, dtype=dtype, quant=quant)


def concat_caches(
    a: KVCache, b: KVCache, total_len: Optional[int] = None
) -> KVCache:
    """Concatenate two caches along the sequence-slot axis — the TPU analogue
    of the reference's per-layer torch.cat((k1,k2), dim=seq) for querydoc /
    docquery RAG modes (rag/eval.py:245-260). Slots beyond each cache's
    `length` are dropped so the result stays dense in slot space.

    `total_len` sizes the output buffer directly (empty masked slots at the
    tail) so a follow-up pad_cache_to is a no-op — one materialization of
    the combined cache instead of two, which matters when two 8k-doc caches
    meet a 16GB chip."""
    la, lb = int(a.length), int(b.length)
    assert a.quantized == b.quantized, "cannot concat int8 with bf16 caches"
    pad = max(0, (total_len or 0) - (la + lb))

    def cat(xa, xb, axis: int):
        parts = [
            jax.lax.slice_in_dim(xa, 0, la, axis=axis),
            jax.lax.slice_in_dim(xb, 0, lb, axis=axis),
        ]
        if pad:
            shape = list(xa.shape)
            shape[axis] = pad
            parts.append(jnp.zeros(shape, xa.dtype))
        return jnp.concatenate(parts, axis=axis)

    scales = {}
    if a.quantized:
        # scales are slot-minor [L, B, Kv, Smax]
        scales = dict(
            k_scale=cat(a.k_scale, b.k_scale, 3),
            v_scale=cat(a.v_scale, b.v_scale, 3),
        )
    return KVCache(
        k=cat(a.k, b.k, 2),
        v=cat(a.v, b.v, 2),
        mask=cat(a.mask, b.mask, 1),
        length=a.length + b.length,
        **scales,
    )


def pad_cache_to(cache: KVCache, total_len: int) -> KVCache:
    """Grow the slot axis with empty (masked-out) slots up to total_len."""
    cur = cache.k.shape[2]
    if cur >= total_len:
        return cache
    pad = total_len - cur
    zk = jnp.zeros(cache.k.shape[:2] + (pad,) + cache.k.shape[3:], cache.k.dtype)
    scales = {}
    if cache.quantized:
        zs = jnp.zeros(cache.k_scale.shape[:3] + (pad,), cache.k_scale.dtype)
        scales = dict(
            k_scale=jnp.concatenate([cache.k_scale, zs], axis=3),
            v_scale=jnp.concatenate([cache.v_scale, zs], axis=3),
        )
    return KVCache(
        k=jnp.concatenate([cache.k, zk], axis=2),
        v=jnp.concatenate([cache.v, zk], axis=2),
        mask=jnp.concatenate(
            [cache.mask, jnp.zeros((cache.mask.shape[0], pad), cache.mask.dtype)],
            axis=1,
        ),
        length=cache.length,
        **scales,
    )
