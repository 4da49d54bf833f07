"""Hot-document serving: zero-copy prefix sharing vs per-request doc upload.

Workload: Q concurrent queries all continuing the SAME long document (the
"hot doc" RAG pattern — one popular page, many questions). Baselines:

  doc_cache — the host doc-cache path (dense pool): every admission group
              STACKS the document's [L, w, Kv*Dh] host cache once per row
              and uploads it (the reference's doc-cache generate does the
              same per batch, rag/eval.py:237-302) — host→device traffic
              scales with Q.
  prefix    — paged pool + register_prefix: the document is pinned into
              shared pool pages ONCE; every request's page table simply
              references those pages (zero-copy, device-side gather into
              the continuation prefill). Upload cost is one doc, period.

Usage: python scripts/exp_prefix_serving.py [--queries 32] [--doc_tokens 3000]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--doc_tokens", type=int, default=3000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max_new", type=int, default=32)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speculative", action="store_true",
                    help="add a prefix+speculation run (lookup corpus "
                    "seeded with the doc's tokens)")
    ap.add_argument("--workload", choices=("random", "repetitive"),
                    default="random",
                    help="repetitive doc = 32-token motif tiled (the "
                    "extractive case speculation targets)")
    args = ap.parse_args()

    from __graft_entry__ import _bench_config
    from gritlm_tpu.models import init_params
    from gritlm_tpu.models.transformer import forward, init_cache
    from gritlm_tpu.serving import Request, ServingEngine

    cfg = _bench_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)
    rng = np.random.default_rng(args.seed)

    if args.workload == "repetitive":
        motif = rng.integers(3, cfg.vocab_size, 32)
        doc = np.tile(motif, args.doc_tokens // 32 + 1)[
            : args.doc_tokens].tolist()
    else:
        doc = rng.integers(3, cfg.vocab_size, size=args.doc_tokens).tolist()
    prompts = [rng.integers(3, cfg.vocab_size, size=int(n)).tolist()
               for n in rng.integers(16, 120, args.queries)]

    # precompute the doc cache once (host-resident store entry format)
    t0 = time.perf_counter()
    arr = jnp.asarray(doc, jnp.int32)[None, :]
    cache = init_cache(cfg, 1, len(doc), quant=args.kv_quant)
    _, cache, _ = forward(params, cfg, arr, causal=True, cache=cache)
    entry = (
        np.asarray(cache.k[:, 0]), np.asarray(cache.v[:, 0]), len(doc),
        np.asarray(cache.k_scale[:, 0]) if args.kv_quant else None,
        np.asarray(cache.v_scale[:, 0]) if args.kv_quant else None,
    )
    print(f"doc precompute: {time.perf_counter()-t0:.2f}s "
          f"({args.doc_tokens} tokens, "
          f"{entry[0].nbytes * 2 / 2**20:.0f} MB host cache)")

    B = args.slots
    page = 256
    dbucket = -(-args.doc_tokens // page) * page
    max_len = dbucket + 256 + args.max_new + page  # doc + prompt + new
    max_len = -(-max_len // page) * page
    # the doc_cache path buckets the DOC length too (dense continuation
    # prefill), so the bucket list must cover it; page-aligned for paged
    buckets = (256, dbucket)

    def run_doc_cache():
        eng = ServingEngine(
            cfg, params, max_batch=B, max_len=max_len, eos_id=-1,
            kv_quant=args.kv_quant, chunk_size=16, prompt_buckets=buckets,
        )
        reqs = [Request(input_ids=p, max_new_tokens=args.max_new,
                        request_id=str(i), doc_cache=entry)
                for i, p in enumerate(prompts)]
        done = eng.run(reqs)
        return sum(len(c.token_ids) for c in done)

    def run_prefix(speculative=False):
        spec_kw = (dict(speculative=True, spec_ngram=3, spec_k=7)
                   if speculative else {})
        eng = ServingEngine(
            cfg, params, max_batch=B, max_len=max_len, eos_id=-1,
            kv_quant=args.kv_quant, chunk_size=16, prompt_buckets=buckets,
            paged=True, page_size=page,
            pool_pages=B * (max_len // page) + (dbucket // page) + 1,
            **spec_kw,
        )
        eng.register_prefix("doc", entry)
        reqs = [Request(input_ids=p, max_new_tokens=args.max_new,
                        request_id=str(i), prefix="doc",
                        hist_ids=doc if speculative else None)
                for i, p in enumerate(prompts)]
        done = eng.run(reqs)
        return sum(len(c.token_ids) for c in done)

    runs = [("doc_cache", run_doc_cache), ("prefix", run_prefix)]
    if args.speculative:
        runs.append(("prefix+spec", lambda: run_prefix(speculative=True)))
    for name, fn in runs:
        toks = fn()  # warmup: compiles + first uploads
        t0 = time.perf_counter()
        toks = fn()
        dt = time.perf_counter() - t0
        print(f"{name:>9}: {toks} tokens in {dt:.2f}s = {toks/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
