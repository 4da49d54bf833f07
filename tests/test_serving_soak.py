"""Serving soak (VERDICT r3 next-7): ONE randomized 500-request scenario
with every engine feature enabled at once — paged pool + speculative
verify + chunked prefill + multi-adapter LoRA + shared-prefix doc
continuations + embedding requests + random priorities + cancels at every
lifecycle stage + page-pool pressure to the admission limit. The 41
feature tests each pin one mechanism; this pins the COMPOSITION under
churn: every surviving generation must match its solo lockstep oracle
(on its adapter's merged weights, with its doc prefix), every embedding
must match the dense embed-only pool bitwise, and the engine must end
drained with all non-prefix pages back in the free list."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.generate import generate, make_cache_for_prompt
from gritlm_tpu.models import init_params
from gritlm_tpu.models.transformer import forward, init_cache
from gritlm_tpu.serving import EmbedRequest, Request, ServingEngine

pytestmark = pytest.mark.slow

N_REQUESTS = 500
PAGE = 8
MAX_LEN = 64
DOC_TOKENS = 24  # 3 pages, pinned once, shared by every prefix request
# few distinct shapes keep oracle jit-compiles bounded
PROMPT_LENS = (5, 9, 14)
EMBED_LENS = (6, 11)
MAX_NEWS = (4, 8)


def _oracle(cfg, params, ids, max_new):
    arr = jnp.asarray(ids, jnp.int32)[None, :]
    cache = make_cache_for_prompt(cfg, 1, len(ids), max_new)
    res = generate(
        params, cfg, arr, jnp.ones_like(arr), cache, jax.random.PRNGKey(0),
        max_new_tokens=max_new, temperature=0.0, eos_id=2, pad_id=2,
    )
    return np.asarray(res.tokens[0, : int(res.num_valid[0])]).tolist()


def test_soak_500_requests_full_composition():
    from tests.test_serving import _rand_adapter
    from gritlm_tpu.training.lora import merge

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    scale = 2.0
    adapters = {"a": _rand_adapter(params, jax.random.PRNGKey(11)),
                "b": _rand_adapter(params, jax.random.PRNGKey(12))}
    merged = {None: params,
              "a": merge(params, adapters["a"], scale),
              "b": merge(params, adapters["b"], scale)}

    rng = np.random.default_rng(1234)

    # the hot document, precomputed once (doc-store entry format)
    doc = rng.integers(3, cfg.vocab_size, DOC_TOKENS).tolist()
    dc = init_cache(cfg, 1, DOC_TOKENS)
    _, dc, _ = forward(params, cfg, jnp.asarray(doc, jnp.int32)[None, :],
                       causal=True, cache=dc)
    entry = (np.asarray(dc.k[:, 0]), np.asarray(dc.v[:, 0]), DOC_TOKENS,
             None, None)
    del dc

    # pool sized for pressure: 4 slots × 8 pages/slot = 32 worst case, but
    # only 12 free after the prefix pin — admission must repeatedly wait
    pool_pages = 16
    eng = ServingEngine(
        cfg, params, max_batch=4, max_len=MAX_LEN, chunk_size=2,
        prompt_buckets=(16, 32), prefill_chunk=8,
        paged=True, page_size=PAGE, pool_pages=pool_pages,
        speculative=True, spec_ngram=2, spec_k=3,
        adapters=adapters, lora_scale=scale,
    )
    eng.register_prefix("doc", entry)
    free_after_pin = len(eng._free_pages)

    # --- build the randomized workload -----------------------------------
    reqs, cancel_ids = [], []
    kinds = rng.choice(
        ["plain", "prefix", "embed"], size=N_REQUESTS, p=[0.6, 0.2, 0.2]
    )
    for i, kind in enumerate(kinds):
        rid = f"s{i}"
        if kind == "embed":
            n = int(rng.choice(EMBED_LENS))
            reqs.append(EmbedRequest(
                input_ids=rng.integers(3, cfg.vocab_size, n).tolist(),
                instr_len=int(rng.integers(0, 3)), request_id=rid,
            ))
            continue
        n = int(rng.choice(PROMPT_LENS))
        ids = rng.integers(3, cfg.vocab_size, n).tolist()
        # prefix rows stay on the base model: the shared doc pages hold
        # BASE-params KV (pinned once), so an adapter row continuing them
        # would mix weight sets — not the oracle's full-prompt semantics
        adapter = (None if kind == "prefix"
                   else [None, "a", "b"][int(rng.integers(0, 3))])
        r = Request(
            input_ids=ids, max_new_tokens=int(rng.choice(MAX_NEWS)),
            request_id=rid, priority=int(rng.integers(0, 3)),
            adapter=adapter,
        )
        if kind == "prefix":
            r.prefix = "doc"
            r.hist_ids = doc  # seed the speculation corpus with doc text
        reqs.append(r)
        if rng.random() < 0.08:
            cancel_ids.append(rid)

    # --- drive: submit everything, cancel at random points under churn ---
    for r in reqs:
        if isinstance(r, EmbedRequest):
            eng.submit_embed(r)
        else:
            eng.submit(r)
    # a third of the cancels land immediately (queued), the rest fire at
    # random points of the drain loop (pending prefills / in-flight rows)
    cancel_at = {}
    for j, rid in enumerate(cancel_ids):
        cancel_at.setdefault(int(rng.integers(0, 400)) if j % 3 else 0,
                             []).append(rid)
    step = 0
    for rid in cancel_at.get(0, []):
        eng.cancel(rid)
    while (eng.queue or eng.slots or eng._pending
           or eng._prev is not None or eng.embed_queue
           or eng._prev_embed is not None):
        eng.step()
        step += 1
        for rid in cancel_at.get(step, []):
            eng.cancel(rid)

    done = {c.request_id: c for c in eng.finished}
    embs = {c.request_id: c.embedding for c in eng.take_embeddings()}

    # --- engine fully drained, every page back (prefix pin excluded) -----
    assert not eng.queue and not eng.slots and not eng._pending
    assert len(eng._free_pages) == free_after_pin, (
        len(eng._free_pages), free_after_pin)

    # --- every request accounted for, parity for every survivor ---------
    cancelled = set()
    n_checked_gen = n_checked_emb = 0
    emb_oracle = ServingEngine(cfg, params, max_batch=4, max_len=MAX_LEN,
                               prompt_buckets=(16, 32))
    emb_reqs = [r for r in reqs if isinstance(r, EmbedRequest)]
    emb_oracle.run(list(emb_reqs))
    emb_want = {c.request_id: c.embedding
                for c in emb_oracle.take_embeddings()}

    oracle_cache: dict = {}
    for r in reqs:
        rid = r.request_id
        if isinstance(r, EmbedRequest):
            assert rid in embs, rid
            np.testing.assert_array_equal(embs[rid], emb_want[rid])
            n_checked_emb += 1
            continue
        assert rid in done, rid
        c = done[rid]
        if c.finish_reason == "cancelled":
            cancelled.add(rid)
            assert rid in cancel_ids
            assert len(c.token_ids) < r.max_new_tokens
            continue
        full = (doc + r.input_ids) if r.prefix else r.input_ids
        key = (tuple(full), r.max_new_tokens, r.adapter)
        if key not in oracle_cache:
            oracle_cache[key] = _oracle(
                cfg, merged[r.adapter], full, r.max_new_tokens)
        assert c.token_ids == oracle_cache[key], (
            rid, r.adapter, bool(r.prefix))
        n_checked_gen += 1

    # cancels that raced completion are fine; most must have landed
    assert len(cancelled) >= len(cancel_ids) // 2, (
        len(cancelled), len(cancel_ids))
    assert n_checked_gen >= 300 and n_checked_emb >= 60, (
        n_checked_gen, n_checked_emb)
