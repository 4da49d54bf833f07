"""Continuous RAG serving vs lockstep doc-cache answering (real TPU).

Workload: 24 queries against a corpus of ragged documents (250-3000
tokens). Both paths reuse the SAME precomputed host doc-cache store:
  lockstep — RAGEngine.answer_batch(mode=DOC) in arrival-order batches of
             B: every batch pads its stacked doc caches to the widest doc
             and decodes until the batch completes (the reference's only
             mode, rag/eval.py:199-302, already batched here)
  serve    — RAGEngine.serve: continuous batching, each request at its own
             doc bucket, slots freed per completion

Usage: python scripts/exp_rag_serving.py [--queries 24] [--slots 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=24)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max_new", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from __graft_entry__ import _bench_config
    from gritlm_tpu.gritlm import GritLM
    from gritlm_tpu.rag import CacheMode, RAGEngine

    rng = np.random.default_rng(args.seed)
    # ragged documents: ByteTokenizer → chars ≈ tokens
    dlens = rng.integers(250, 3000, 16)
    docs = [
        {"title": "", "text": "".join(
            rng.choice(list("abcdefgh ijklmnop"), size=int(n)))}
        for n in dlens
    ]
    queries = [f"what does document {i} say about item {i}?"
               for i in range(args.queries)]

    model = GritLM(_bench_config(), mode="unified", attn="bbcc", seed=0)
    eng = RAGEngine(model, max_new_tokens=args.max_new,
                    encode_max_length=4096)
    t0 = time.perf_counter()
    eng.build_index(docs, batch_size=8, cache_docs=True)
    print(f"build+cache: {time.perf_counter()-t0:.1f}s "
          f"(doc lens {dlens.min()}-{dlens.max()})")

    B = args.slots

    def lockstep():
        out = []
        for i in range(0, len(queries), B):
            out += eng.answer_batch(queries[i:i + B], mode=CacheMode.DOC)
        return out

    def serve():
        return eng.serve(
            queries, slots=B, pool_max_len=4096,
            prompt_buckets=(128, 256, 512, 1024, 2048, 3072),
        )

    for name, fn in (("lockstep", lockstep), ("serve", serve)):
        fn()  # warmup compiles
        t0 = time.perf_counter()
        res = fn()
        dt = time.perf_counter() - t0
        toks = args.queries * args.max_new  # eos unlikely w/ random weights
        print(f"{name}: {dt:.2f}s  ({toks/dt:.1f} tok/s, "
              f"{dt/args.queries*1e3:.0f} ms/query)")


if __name__ == "__main__":
    main()
