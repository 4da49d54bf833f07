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
    ap.add_argument("--speculative", action="store_true",
                    help="prompt-lookup speculative pool (greedy-only); "
                    "also reports the plain engine on the same traffic")
    ap.add_argument("--spec_k", type=int, default=7)
    ap.add_argument("--spec_ngram", type=int, default=3)
    ap.add_argument("--workload", choices=("random", "repetitive"),
                    default="random",
                    help="repetitive = 32-token motif tiled per prompt "
                    "(the extractive-RAG-like case speculation targets)")
    ap.add_argument("--new_lo", type=int, default=16)
    ap.add_argument("--new_hi", type=int, default=128)
    ap.add_argument("--prefill_chunk", type=int, default=None,
                    help="also run the engine with chunked (stall-free) "
                    "prefill and report per-step time stats — the stall "
                    "a monolithic prefill inserts between decode chunks")
    ap.add_argument("--embed", type=int, default=0,
                    help="unified pool: also submit N embedding requests "
                    "(ragged 200-1500 tokens) alongside the generation "
                    "traffic; reports mixed-pool wall vs sequential "
                    "generate-then-encode, and in-flight embed latency")
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
    nnews = rng.integers(args.new_lo, args.new_hi, args.requests)

    def prompt_ids(n):
        if args.workload == "repetitive":
            motif = rng.integers(3, cfg.vocab_size, 32)
            return np.tile(motif, n // 32 + 1)[:n].tolist()
        return rng.integers(3, cfg.vocab_size, size=n).tolist()

    reqs = [
        Request(input_ids=prompt_ids(int(n)), max_new_tokens=int(m),
                request_id=str(i))
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

    def engine_run(speculative=False, prefill_chunk=None, want_steps=False):
        spec_kw = {}
        if speculative:
            spec_kw = dict(speculative=True, spec_k=args.spec_k,
                           spec_ngram=args.spec_ngram)
        eng = ServingEngine(
            cfg, params, max_batch=B, max_len=max_len,
            kv_quant=args.kv_quant, eos_id=-1, chunk_size=args.chunk,
            prompt_buckets=(256, 512, 1024, 1536), **paged_kw, **spec_kw,
            prefill_chunk=prefill_chunk,
        )
        if want_steps:
            # per-step wall times: each step dispatches one decode chunk,
            # so a long monolithic prefill shows up as a step-time spike
            # (= the time-between-tokens stall in-flight rows see)
            for r in reqs:
                eng.submit(r)
            durs = []
            while eng.queue or eng.slots or eng._pending or \
                    eng._prev is not None:
                t0 = time.perf_counter()
                eng.step()
                durs.append(time.perf_counter() - t0)
            done = eng.finished
            return sum(len(c.token_ids) for c in done), eng._steps, durs
        done = eng.run(list(reqs))
        return sum(len(c.token_ids) for c in done), eng._steps

    eng_tokens, _ = engine_run()  # warmup (compiles prefill buckets + step)
    t0 = time.perf_counter()
    eng_tokens, steps = engine_run()
    eng_s = time.perf_counter() - t0

    print(f"requests={args.requests} slots={B} "
          f"prompts 200-1500, new {args.new_lo}-{args.new_hi}, "
          f"kv_quant={args.kv_quant} "
          f"paged={args.paged} workload={args.workload}")
    print(f"lockstep: {lock_tokens} tokens in {lock_s:.2f}s "
          f"= {lock_tokens/lock_s:.1f} tok/s")
    print(f"engine:   {eng_tokens} tokens in {eng_s:.2f}s "
          f"= {eng_tokens/eng_s:.1f} tok/s  ({steps} steps, "
          f"{eng_tokens/steps:.2f} useful tokens/step)")
    print(f"speedup: {(eng_tokens/eng_s)/(lock_tokens/lock_s):.2f}x")

    if args.speculative:
        spec_tokens, _ = engine_run(speculative=True)  # warmup
        t0 = time.perf_counter()
        spec_tokens, spec_steps = engine_run(speculative=True)
        spec_s = time.perf_counter() - t0
        print(f"spec:     {spec_tokens} tokens in {spec_s:.2f}s "
              f"= {spec_tokens/spec_s:.1f} tok/s  ({spec_steps} verify "
              f"iters, {spec_tokens/spec_steps:.2f} useful tokens/iter)")
        print(f"spec vs engine: {(spec_tokens/spec_s)/(eng_tokens/eng_s):.2f}x")

    if args.embed:
        # Unified serving: the same pool embeds while it decodes. The
        # interesting numbers: (a) total wall for the mixed workload vs
        # running generation then an embed-only pool sequentially (device
        # time should be conserved — interleaving costs ~nothing), and
        # (b) when embed results ARRIVE: mid-flight (bounded by one
        # decode chunk + one embed forward) instead of after the whole
        # generation run drains.
        from gritlm_tpu.serving import EmbedRequest

        elens = rng.integers(200, 1500, args.embed)
        embeds = [
            EmbedRequest(input_ids=prompt_ids(int(n)), instr_len=8,
                         request_id=f"emb{i}")
            for i, n in enumerate(elens)
        ]

        def unified_run(gen, emb):
            arrive = {}
            t_start = [0.0]
            eng = ServingEngine(
                cfg, params, max_batch=B, max_len=max_len,
                kv_quant=args.kv_quant, eos_id=-1, chunk_size=args.chunk,
                prompt_buckets=(256, 512, 1024, 1536), **paged_kw,
                on_embedding=lambda rid, v: arrive.__setitem__(
                    rid, time.perf_counter() - t_start[0]),
            )
            for r in gen:
                eng.submit(r)
            for e in emb:
                eng.submit_embed(e)
            t_start[0] = time.perf_counter()
            eng.run()
            wall = time.perf_counter() - t_start[0]
            toks = sum(len(c.token_ids) for c in eng.finished)
            return toks, wall, np.sort(np.asarray(list(arrive.values())))

        unified_run(reqs, embeds)  # warmup (embed-bucket compiles)
        toks_m, wall_m, lat_m = unified_run(reqs, embeds)
        _, wall_e, lat_e = unified_run([], embeds)  # embed-only pool
        seq = eng_s + wall_e
        print(f"unified:  {toks_m} gen tokens + {args.embed} embeddings "
              f"in {wall_m:.2f}s (sequential gen+encode = {seq:.2f}s, "
              f"{seq/wall_m:.2f}x)")
        print(f"          embed arrival p50 {lat_m[len(lat_m)//2]:.2f}s / "
              f"max {lat_m[-1]:.2f}s mid-flight vs "
              f"{eng_s + lat_e[len(lat_e)//2]:.2f}s sequential")

    if args.prefill_chunk is not None:
        # The stall scenario chunked prefill exists for: a steadily
        # decoding pool (short prompts, long outputs, small decode chunks
        # for low per-token latency) hit by LONG-prompt arrivals
        # mid-flight. A monolithic bucket prefill inserts its whole
        # forward between two decode chunks — every in-flight request's
        # time-between-tokens spikes by it; chunking bounds the insert.
        def stall_run(pc):
            eng = ServingEngine(
                cfg, params, max_batch=B, max_len=max_len,
                eos_id=-1, chunk_size=4,
                prompt_buckets=(256, 512, 1024, 1536), prefill_chunk=pc,
            )
            srng = np.random.default_rng(11)
            base = [Request(
                input_ids=srng.integers(3, cfg.vocab_size, 64).tolist(),
                max_new_tokens=192, request_id=f"base{i}")
                for i in range(B - 1)]
            longs = [Request(
                input_ids=srng.integers(3, cfg.vocab_size, 1500).tolist(),
                max_new_tokens=16, request_id=f"long{i}")
                for i in range(4)]
            for r in base:
                eng.submit(r)
            for _ in range(6):  # pool warm and decoding
                eng.step()
            durs = []
            arrivals = list(longs)
            i = 0
            while (eng.queue or eng.slots or eng._pending
                   or eng._prev is not None or arrivals):
                if arrivals and i % 8 == 0:
                    eng.submit(arrivals.pop(0))
                t0 = time.perf_counter()
                eng.step()
                durs.append(time.perf_counter() - t0)
                i += 1
            return durs

        def stall_stats(durs):
            d = np.sort(np.asarray(durs)) * 1e3
            return (f"steps={len(d)} p50={d[len(d)//2]:.0f}ms "
                    f"p95={d[int(len(d)*0.95)]:.0f}ms max={d[-1]:.0f}ms")

        for label, pc in (("monolithic", None),
                          ("chunked", args.prefill_chunk)):
            stall_run(pc)  # warmup compiles
            durs = stall_run(pc)
            print(f"{label:>10} prefill: decode-step gaps "
                  f"{stall_stats(durs)}")


if __name__ == "__main__":
    main()
