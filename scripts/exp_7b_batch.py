"""7B serving slot-count scaling on one 16 GB v5e (round 5).

BENCH r5 seed: serving_tokens_per_sec_7b = 165.7 at max_batch=8, while the
batch-8 decode step itself sustains 488 tok/s (16.4 ms/step) — serving is
prefill- and occupancy-limited. Decode at 7B w8a16 is weight-bandwidth-bound
(~7 GB int8 weights vs ~1 GB int8 KV per step), so doubling the slot count
should nearly double decode throughput for ~1 GB more KV pool:

  int8 KV bytes = B * 2048 * 32L * (8 kv * 128) * 2(k+v) = B * 134 MB
  B=8 → 1.07 GB, B=16 → 2.15 GB, B=24 → 3.2 GB; weights ≈ 7.2 GB → all fit.

This experiment inits 7B once (host-side, ~2 min) and measures the ragged24
serving workload at max_batch ∈ {8, 16, 24}, plus the batch-16 decode step
time, to pick the bench_7b() production config.

Run: python scripts/exp_7b_batch.py
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from bench import _median_serving_passes, _ragged_requests, bench_decode
    from gritlm_tpu.config import mistral_7b
    from gritlm_tpu.models import init_params
    from gritlm_tpu.serving import ServingEngine
    from gritlm_tpu.training.quant import quantize_for_serving

    cfg = dataclasses.replace(mistral_7b(), sliding_window=4096)
    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)
        params = quantize_for_serving(params)
        params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    print(f"init+quantize+transfer {time.perf_counter()-t0:.0f}s", flush=True)

    for mb in (8, 16, 24):
        try:
            eng = ServingEngine(
                cfg, params, max_batch=mb, max_len=2048, eos_id=-1,
                kv_quant=True, chunk_size=16,
                prompt_buckets=(512, 1024, 1536),
            )
            tok_s = _median_serving_passes(eng, _ragged_requests(cfg))
            print(f"max_batch={mb}: serving {tok_s:.1f} tok/s", flush=True)
            del eng
        except Exception as e:  # OOM guard: report and continue
            print(f"max_batch={mb}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    dec = bench_decode(cfg, params, quant=True)
    print(f"decode step (batch 8, 4k bucket): {dec:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
