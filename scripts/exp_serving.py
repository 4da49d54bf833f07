"""Continuous batching vs lockstep batching on ragged traffic (real TPU).

Workload: N requests with ragged prompt (200-1500) and output (16-128)
lengths, arrival all-at-once. Baselines:
  lockstep  — requests grouped into arrival-order batches of B; each batch
              decodes until its LAST row finishes (the reference's only
              mode: HF generate over a padded batch, rag/eval.py:296-302)
  engine    — ServingEngine with B slots (per-row completion frees the
              slot immediately for the next request)

Usage: python scripts/exp_serving.py [--requests 32] [--slots 8]
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
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--paged", action="store_true",
                    help="shared page pool instead of the dense slot pool")
    ap.add_argument("--pool_pages", type=int, default=None,
                    help="paged pool size (default: dense-equivalent)")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from __graft_entry__ import _bench_config
    from gritlm_tpu.generate import generate, make_cache_for_prompt
    from gritlm_tpu.models import init_params
    from gritlm_tpu.serving import Request, ServingEngine

    cfg = _bench_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)
    rng = np.random.default_rng(args.seed)

    B = args.slots
    plens = rng.integers(200, 1500, args.requests)
    nnews = rng.integers(16, 128, args.requests)
    reqs = [
        Request(
            input_ids=rng.integers(3, cfg.vocab_size, size=int(n)).tolist(),
            max_new_tokens=int(m),
            request_id=str(i),
        )
        for i, (n, m) in enumerate(zip(plens, nnews))
    ]
    max_len = 2048

    # ---- lockstep baseline: batches of B, padded to the batch max -----
    def lockstep():
        total_new = 0
        eos_id = -1  # random weights: disable EOS so output lens are exact
        for i in range(0, len(reqs), B):
            batch = reqs[i : i + B]
            bs = len(batch)
            pmax = max(len(r.input_ids) for r in batch)
            nmax = max(r.max_new_tokens for r in batch)
            ids = np.zeros((bs, pmax), np.int32)
            mask = np.zeros((bs, pmax), np.int32)
            for j, r in enumerate(batch):
                ids[j, : len(r.input_ids)] = r.input_ids
                mask[j, : len(r.input_ids)] = 1
            cache = make_cache_for_prompt(cfg, bs, pmax, nmax)
            res = generate(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask), cache,
                jax.random.PRNGKey(0), max_new_tokens=nmax,
                temperature=0.0, eos_id=eos_id, pad_id=0,
            )
            jax.device_get(res.tokens[0, 0])
            # only the per-request requested tokens count as useful work
            total_new += sum(r.max_new_tokens for r in batch)
        return total_new

    # warmup compiles (one batch shape per group — same as timed run)
    t0 = time.perf_counter()
    lock_tokens = lockstep()
    lock_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lock_tokens = lockstep()
    lock_s = time.perf_counter() - t0

    # ---- continuous batching engine -----------------------------------
    paged_kw = {}
    if args.paged:
        # page-aligned buckets; pool sized to the traffic's real reserve
        # (dense would burn B x max_len regardless)
        paged_kw = dict(paged=True, page_size=256,
                        pool_pages=args.pool_pages)

    def engine_run():
        eng = ServingEngine(
            cfg, params, max_batch=B, max_len=max_len,
            kv_quant=args.kv_quant, eos_id=-1, chunk_size=args.chunk,
            prompt_buckets=(256, 512, 1024, 1536), **paged_kw,
        )
        done = eng.run(list(reqs))
        return sum(len(c.token_ids) for c in done), eng._steps

    eng_tokens, _ = engine_run()  # warmup (compiles prefill buckets + step)
    t0 = time.perf_counter()
    eng_tokens, steps = engine_run()
    eng_s = time.perf_counter() - t0

    print(f"requests={args.requests} slots={B} "
          f"prompts 200-1500, new 16-128, kv_quant={args.kv_quant} "
          f"paged={args.paged}")
    print(f"lockstep: {lock_tokens} tokens in {lock_s:.2f}s "
          f"= {lock_tokens/lock_s:.1f} tok/s")
    print(f"engine:   {eng_tokens} tokens in {eng_s:.2f}s "
          f"= {eng_tokens/eng_s:.1f} tok/s  ({steps} steps, "
          f"{eng_tokens/steps:.2f} useful tokens/step)")
    print(f"speedup: {(eng_tokens/eng_s)/(lock_tokens/lock_s):.2f}x")


if __name__ == "__main__":
    main()
