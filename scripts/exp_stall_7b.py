"""Chunked-prefill stall measurement at 7B scale (one v5e, w8a16+int8KV).

The scenario chunked prefill exists for: a pool of requests steadily
decoding with small chunks (low per-token latency) when LONG prompts
arrive mid-flight. A monolithic bucket prefill inserts its ENTIRE
forward between two decode chunks; at 7B a 1536-token prefill costs
hundreds of ms while a 4-step decode chunk costs ~65 ms — every
in-flight request's time-between-tokens spikes by the difference.
`prefill_chunk` streams the arrival in fixed chunks instead, bounding
the insert. (At 1B through the remote tunnel the stall is smaller than
dispatch overhead, so this effect only shows at scale —
exp_serving.py --prefill_chunk documents that null result honestly.)

Run: python scripts/exp_stall_7b.py [--prefill_chunk 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    os.makedirs("/tmp/gritlm_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/gritlm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import numpy as np

    from gritlm_tpu.config import mistral_7b
    from gritlm_tpu.models import init_params
    from gritlm_tpu.serving import Request, ServingEngine
    from gritlm_tpu.training.quant import quantize_for_serving

    ap = argparse.ArgumentParser()
    ap.add_argument("--prefill_chunk", type=int, default=256)
    ap.add_argument("--slots", type=int, default=8)
    args = ap.parse_args()

    cfg = dataclasses.replace(mistral_7b(), sliding_window=4096)
    t0 = time.time()
    cache_file = "/tmp/gritlm_7b_w8_params.npz"
    cpu = jax.devices("cpu")[0]
    if os.path.exists(cache_file):
        # single-core host: random-init + quantize of 7B takes ~1h, so
        # reruns load the flattened quantized tree from disk instead
        import jax.numpy as jnp

        blob = np.load(cache_file)
        from gritlm_tpu.models import init_params as _ip  # treedef source
        with jax.default_device(cpu):
            sample = jax.eval_shape(
                lambda k: _ip(cfg, k, with_lm_head=True),
                jax.random.PRNGKey(0))
            from gritlm_tpu.training.quant import quantize_for_serving as q
            sample = jax.eval_shape(q, sample)
            leaves, treedef = jax.tree_util.tree_flatten(sample)
            params = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(blob[str(i)])
                          for i in range(len(leaves))])
        print(f"7B quantized params loaded: {time.time()-t0:.0f}s",
              flush=True)
    else:
        with jax.default_device(cpu):
            params = init_params(cfg, jax.random.PRNGKey(0),
                                 with_lm_head=True)
            params = quantize_for_serving(params)
        leaves = jax.tree_util.tree_leaves(params)
        np.savez(cache_file,
                 **{str(i): np.asarray(x) for i, x in enumerate(leaves)})
        print(f"7B init+quantize on host: {time.time()-t0:.0f}s (cached)",
              flush=True)

    B = args.slots

    def stall_run(pc):
        eng = ServingEngine(
            cfg, params, max_batch=B, max_len=2048, eos_id=-1,
            kv_quant=True, chunk_size=4, prompt_buckets=(256, 1536),
            prefill_chunk=pc,
        )
        rng = np.random.default_rng(11)
        base = [Request(
            input_ids=rng.integers(3, cfg.vocab_size, 64).tolist(),
            max_new_tokens=160, request_id=f"base{i}")
            for i in range(B - 1)]
        longs = [Request(
            input_ids=rng.integers(3, cfg.vocab_size, 1500).tolist(),
            max_new_tokens=8, request_id=f"long{i}")
            for i in range(3)]
        for r in base:
            eng.submit(r)
        for _ in range(6):  # pool warm and decoding
            eng.step()
        durs = []
        arrivals = list(longs)
        i = 0
        while (eng.queue or eng.slots or eng._pending
               or eng._prev is not None or arrivals):
            if arrivals and i % 10 == 0:
                eng.submit(arrivals.pop(0))
            t0 = time.perf_counter()
            eng.step()
            durs.append(time.perf_counter() - t0)
            i += 1
        return durs

    def stats(durs):
        d = np.sort(np.asarray(durs)) * 1e3
        return (f"steps={len(d)} p50={d[len(d)//2]:.0f}ms "
                f"p95={d[int(len(d)*0.95)]:.0f}ms max={d[-1]:.0f}ms")

    for label, pc in (("monolithic", None), ("chunked", args.prefill_chunk)):
        stall_run(pc)  # warmup compiles
        durs = stall_run(pc)
        print(f"{label:>10} prefill (7B): decode-step gaps {stats(durs)}",
              flush=True)


if __name__ == "__main__":
    main()
