"""Benchmark: GritLM embedding throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the encode hot path (bidirectional trunk forward + masked mean
pool + normalize) — the workload behind MTEB/BEIR corpus encoding and RAG
index build (reference hot loop: gritlm/gritlm.py:92-176 over SDPA attention;
SURVEY §3.1). The reference publishes no embeds/sec (BASELINE.md), so
vs_baseline compares against a fixed reference point: an 8x A100 DataParallel
encoder is roughly compute-bound at ~BATCH*seq tokens/step; we report raw
embeds/sec/chip and vs_baseline=value/RECORD where RECORD is the best value
this repo has recorded (BENCH_RECORD.json), so the metric tracks regressions
across rounds. First run sets the record → vs_baseline 1.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

RECORD_FILE = os.path.join(os.path.dirname(__file__), "BENCH_RECORD.json")

B = 32  # sequences per step
S = 512  # tokens per sequence (reference encode default max_length=512)
STEPS = 10
WARMUP = 2


def main() -> None:
    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/gritlm_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/gritlm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _bench_config
    from gritlm_tpu.models import init_params
    from gritlm_tpu.models.transformer import forward
    from gritlm_tpu.ops.pooling import mask_instruction, pool

    cfg = _bench_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=False)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    instr_lens = jnp.full((B,), 12, jnp.int32)

    @jax.jit
    def encode_step(params, input_ids, attention_mask, instruction_lens):
        hidden, _, _ = forward(
            params, cfg, input_ids, attention_mask=attention_mask, causal=False
        )
        pmask = mask_instruction(attention_mask, instruction_lens)
        emb = pool(hidden, pmask, "mean")
        return emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    def sync(x):
        # block_until_ready is a no-op through the axon tunnel; a small
        # device→host transfer is the reliable fence
        return np.asarray(jax.device_get(x[0:1, 0:1]))

    for _ in range(WARMUP):
        sync(encode_step(params, ids, mask, instr_lens))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = encode_step(params, ids, mask, instr_lens)
    sync(out)
    dt = time.perf_counter() - t0

    embeds_per_sec = B * STEPS / dt

    record = None
    if os.path.exists(RECORD_FILE):
        try:
            with open(RECORD_FILE) as f:
                record = json.load(f).get("embeds_per_sec")
        except Exception:
            record = None
    vs = embeds_per_sec / record if record else 1.0
    if record is None or embeds_per_sec > record:
        with open(RECORD_FILE, "w") as f:
            json.dump(
                {
                    "embeds_per_sec": embeds_per_sec,
                    "config": "1B-class bf16",
                    "batch": B,
                    "seq": S,
                    "backend": jax.default_backend(),
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": "embeds_per_sec_per_chip_seq512_1b_bf16",
                "value": round(embeds_per_sec, 2),
                "unit": "embeds/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
