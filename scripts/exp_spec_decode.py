"""Speculative vs plain decode on the real TPU at the bench decode shape.

Usage: python -u scripts/exp_spec_decode.py > /tmp/exp_spec.log 2>&1

Times 256 new tokens after a 3k-token prompt (bench.py's decode protocol)
for the plain scan loop vs prompt-lookup speculation, B=1 and B=8, on both
a random prompt (worst case: ~0 acceptance, measures pure verify overhead)
and a highly repetitive prompt (the extractive-RAG-like case). Reports
effective ms/token, verify steps, and acceptance.
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
    from bench import _sync
    from gritlm_tpu.generate import generate, make_cache_for_prompt
    from gritlm_tpu.models import init_params
    from gritlm_tpu.spec_decode import generate_speculative, spec_cache_extra

    cfg = _bench_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)
    S, NEW = 3000, 256
    NGRAM, K = 3, 7
    rng = np.random.default_rng(1)

    def prompts(B, kind):
        if kind == "random":
            ids = rng.integers(4, cfg.vocab_size, (B, S))
        else:  # repetitive: 32-token motif tiled across the prompt
            motif = rng.integers(4, cfg.vocab_size, (B, 32))
            ids = np.tile(motif, (1, S // 32 + 1))[:, :S]
        return jnp.asarray(ids, jnp.int32), jnp.ones((B, S), jnp.int32)

    def run_plain(B, kind):
        ids, mask = prompts(B, kind)
        cache = make_cache_for_prompt(cfg, B, S, NEW)
        def go():
            return generate(
                params, cfg, ids, mask, cache, jax.random.PRNGKey(0),
                max_new_tokens=NEW, temperature=0.0, eos_id=-1, pad_id=0,
            )
        r = go(); _sync(r.tokens)  # compile+warm
        t0 = time.perf_counter()
        r = go(); _sync(r.tokens)
        dt = time.perf_counter() - t0
        return dt / NEW * 1e3, int(np.sum(np.asarray(r.num_valid)))

    def run_spec(B, kind):
        ids, mask = prompts(B, kind)
        cache = make_cache_for_prompt(
            cfg, B, S, NEW, extra=spec_cache_extra(NEW, K, B)
        )
        def go():
            return generate_speculative(
                params, cfg, ids, mask, cache,
                max_new_tokens=NEW, ngram=NGRAM, k=K, eos_id=-1, pad_id=0,
            )
        r = go(); _sync(r.tokens)
        t0 = time.perf_counter()
        r = go(); _sync(r.tokens)
        dt = time.perf_counter() - t0
        nv = np.asarray(r.num_valid)
        steps = int(r.spec_steps)
        tok = int(np.sum(nv))
        acc = (tok - B) / max(B * steps, 1)
        return dt / (tok / B) * 1e3, steps, acc, tok

    for kind in ("random", "repetitive"):
        for B in (1, 8):
            p_ms, p_tok = run_plain(B, kind)
            s_ms, steps, acc, s_tok = run_spec(B, kind)
            print(
                f"{kind:11s} B={B}: plain {p_ms:6.2f} ms/tok | spec "
                f"{s_ms:6.2f} ms/tok ({steps} verify steps, "
                f"{acc:.2f} props/step accepted, {s_tok} toks) "
                f"speedup x{p_ms / s_ms:.2f}",
                flush=True,
            )


main()
