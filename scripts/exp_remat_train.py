"""One-off experiment: train-step throughput vs remat policy on the real TPU.

Usage:  python -u scripts/exp_remat_train.py > /tmp/exp_remat.log 2>&1

Runs bench.py's exact unified train step (same shapes, same ratchet metric)
under each remat policy and prints tokens/s.  OOM on a policy is caught and
reported — the point is to find the fastest policy that fits one v5e (16GB).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    os.makedirs("/tmp/gritlm_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/gritlm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from __graft_entry__ import _bench_config
    from bench import TR_QB, TR_QS, TR_PB, TR_PS, TR_GB, TR_GS, _sync
    from gritlm_tpu.models import init_params
    from gritlm_tpu.training.train import TrainConfig, init_train_state, train_step

    cfg = _bench_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)

    rng = np.random.default_rng(2)

    def feat(b, s, instr=8):
        return {
            "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32),
            "attention_mask": jnp.ones((b, s), jnp.int32),
            "instruction_lens": jnp.full((b,), instr, jnp.int32),
        }

    gen_ids = rng.integers(0, cfg.vocab_size, (TR_GB, TR_GS))
    labels = np.where(rng.uniform(size=(TR_GB, TR_GS)) < 0.75, gen_ids, -100).astype(np.int32)
    batch = {
        "query": feat(TR_QB, TR_QS),
        "passage": feat(TR_PB, TR_PS),
        "generative": {
            "input_ids": jnp.asarray(gen_ids, jnp.int32),
            "attention_mask": jnp.ones((TR_GB, TR_GS), jnp.int32),
            "labels": jnp.asarray(labels),
        },
    }
    tokens_per_step = TR_QB * TR_QS + TR_PB * TR_PS + TR_GB * TR_GS

    variants = [
        ("full-recompute (current)", dict(remat=True, remat_policy=None)),
        ("dots_saveable", dict(remat=True, remat_policy="dots")),
        ("dots_no_batch", dict(remat=True, remat_policy="dots_no_batch")),
        ("no-remat", dict(remat=False)),
        ("dnb+fused_ce", dict(remat=True, remat_policy="dots_no_batch",
                              fused_ce=True)),
        ("dnb+unfused_ce", dict(remat=True, remat_policy="dots_no_batch",
                                fused_ce=False)),
    ]
    if len(sys.argv) > 1:
        keep = sys.argv[1:]
        variants = [v for v in variants if any(k in v[0] for k in keep)]
    for name, kw in variants:
        tc = TrainConfig(mode="unified", total_steps=100, **kw)
        try:
            # the step donates its state: give each variant its own copy of
            # the params so donation can't delete the shared originals
            own = jax.jit(lambda p: jax.tree.map(jnp.copy, p))(params)
            state = init_train_state(own, tc)
            step = jax.jit(lambda s, b: train_step(s, b, cfg, tc), donate_argnums=(0,))
            for _ in range(2):
                state, m = step(state, batch)
            _sync(m.loss)
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                state, m = step(state, batch)
            _sync(m.loss)
            dt = time.perf_counter() - t0
            print(f"{name:28s} {tokens_per_step * n / dt:10.1f} tok/s   "
                  f"({dt / n * 1e3:.1f} ms/step)", flush=True)
            del state, step
        except Exception as e:  # noqa: BLE001 — OOM/compile failure is a data point
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
