"""Benchmark: the three GritLM hot paths on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Regression-gates all three hot paths (VERDICT r1 §weak-5):
  1. encode    — bidirectional trunk forward + masked mean pool + normalize
                 (MTEB/BEIR corpus encoding, RAG index build; reference hot
                 loop gritlm/gritlm.py:92-176, SURVEY §3.1)
  2. decode    — autoregressive generation over a 4k KV-cache bucket with
                 3000 valid slots (the long-document RAG answer path;
                 reference rag/eval.py:296-302 over HF generate)
  3. train     — one unified GRIT step (contrastive + next-token, remat)
                 (reference GradCacheTrainer step, SURVEY §3.2)

The reference publishes none of these as throughput numbers (BASELINE.md),
so vs_baseline tracks THIS repo's best recorded value per metric
(BENCH_RECORD.json): the headline value/vs_baseline is the encode metric
(continuity with round 1); "extra" carries the other two with their own
records. First run records → vs 1.0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

RECORD_FILE = os.path.join(os.path.dirname(__file__), "BENCH_RECORD.json")

# encode shape: reference encode default max_length=512 (gritlm.py:97)
ENC_B, ENC_S, ENC_STEPS, ENC_WARMUP = 32, 512, 10, 2
# decode shape: 4k bucket, 3k-token context, 64 new tokens, batch 8
DEC_B, DEC_BUCKET, DEC_PROMPT, DEC_STEPS = 8, 4096, 3000, 64
# train shape: unified step — 8 queries (256) + 16 passages (512) + 8 gen (512)
TR_QB, TR_QS, TR_PB, TR_PS, TR_GB, TR_GS = 8, 256, 16, 512, 8, 512
TR_STEPS, TR_WARMUP = 5, 2


def _sync(x):
    """block_until_ready is a no-op through the axon tunnel; a small
    device→host transfer is the reliable fence."""
    import jax

    return np.asarray(jax.device_get(x.ravel()[0:1]))


def bench_encode(cfg, params, b=ENC_B, s=ENC_S, instr=12):
    import jax
    import jax.numpy as jnp

    from gritlm_tpu.models.transformer import forward
    from gritlm_tpu.ops.fused_pool import fused_norm_mean_pool
    from gritlm_tpu.ops.pooling import mask_instruction

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    instr_lens = jnp.full((b,), instr, jnp.int32)

    @jax.jit
    def encode_step(params, input_ids, attention_mask, instruction_lens):
        # the product encode path (gritlm._encode_step): trunk without final
        # norm + fused norm/mean-pool/normalize epilogue
        hidden, _, _ = forward(
            params, cfg, input_ids, attention_mask=attention_mask,
            causal=False, final_norm=False,
        )
        pmask = mask_instruction(attention_mask, instruction_lens)
        return fused_norm_mean_pool(
            hidden, params["final_ln"]["scale"], pmask,
            eps=cfg.rms_norm_eps, method="mean", normalized=True,
        )

    for _ in range(ENC_WARMUP):
        _sync(encode_step(params, ids, mask, instr_lens))
    t0 = time.perf_counter()
    for _ in range(ENC_STEPS):
        out = encode_step(params, ids, mask, instr_lens)
    _sync(out)
    return b * ENC_STEPS / (time.perf_counter() - t0)


def bench_decode(cfg, params, quant: bool = False, weight_quant: int = 0):
    import jax
    import jax.numpy as jnp

    from gritlm_tpu.models.transformer import (
        forward,
        init_cache,
        logits_from_hidden,
    )

    if weight_quant:
        from gritlm_tpu.training.quant import quantize_for_serving

        params = quantize_for_serving(params, bits=weight_quant)
    rng = np.random.default_rng(1)
    cache = init_cache(cfg, DEC_B, DEC_BUCKET, quant=quant)
    pids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (DEC_B, DEC_PROMPT)), jnp.int32
    )
    pmask = jnp.ones((DEC_B, DEC_PROMPT), jnp.int32)

    @jax.jit
    def prefill(params, ids, mask, cache):
        _, c, _ = forward(
            params, cfg, ids, attention_mask=mask, causal=True, cache=cache
        )
        return c

    @jax.jit
    def decode(params, tok, cache):
        def body(carry, _):
            tok, cache = carry
            h, cache, _ = forward(params, cfg, tok[:, None], causal=True,
                                  cache=cache)
            logits = logits_from_hidden(params, cfg, h)[:, 0]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, cache), None
        (tok, cache), _ = jax.lax.scan(
            body, (tok, cache), None, length=DEC_STEPS
        )
        return tok

    c = prefill(params, pids, pmask, cache)
    tok0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (DEC_B,)), jnp.int32)
    _sync(decode(params, tok0, c))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = decode(params, tok0, c)
    _sync(out)
    return (time.perf_counter() - t0) / (reps * DEC_STEPS) * 1e3  # ms/token


def bench_spec_decode(cfg, params):
    """Prompt-lookup speculative decoding ms/token: 3k-token repetitive
    prompt (32-token motif tiled — the extractive-RAG-like case where
    answers quote the context), B=1 latency protocol, 256 new tokens.
    Worst-case (incompressible random text) overhead is ~0 (measured 1.02x
    at B=1, scripts/exp_spec_decode.py); this metric tracks the win side."""
    import jax
    import jax.numpy as jnp

    from gritlm_tpu.generate import make_cache_for_prompt
    from gritlm_tpu.spec_decode import generate_speculative, spec_cache_extra

    B, S, NEW, NGRAM, K = 1, 3000, 256, 3, 7
    rng = np.random.default_rng(3)
    motif = rng.integers(4, cfg.vocab_size, (B, 32))
    ids = jnp.asarray(np.tile(motif, (1, S // 32 + 1))[:, :S], jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    cache = make_cache_for_prompt(
        cfg, B, S, NEW, extra=spec_cache_extra(NEW, K, B)
    )

    def go():
        return generate_speculative(
            params, cfg, ids, mask, cache,
            max_new_tokens=NEW, ngram=NGRAM, k=K, eos_id=-1, pad_id=0,
        )

    r = go()
    _sync(r.tokens)
    t0 = time.perf_counter()
    r = go()
    _sync(r.tokens)
    dt = time.perf_counter() - t0
    return dt / int(r.num_valid[0]) * 1e3


def _ragged_requests(cfg, n=24, seed=5, out_lo=16, out_hi=128):
    from gritlm_tpu.serving import Request

    rng = np.random.default_rng(seed)
    plens = rng.integers(300, 1500, n)
    nnews = rng.integers(out_lo, out_hi, n)
    return [
        Request(
            input_ids=rng.integers(3, cfg.vocab_size, size=int(p)).tolist(),
            max_new_tokens=int(m), request_id=str(i),
        )
        for i, (p, m) in enumerate(zip(plens, nnews))
    ]


def _median_serving_passes(eng, reqs, passes=3):
    """One warmup pass (compiles + pool allocation) then `passes` measured
    passes through the SAME engine; returns the median tok/s. VERDICT r3
    weak-2: rebuilding the engine inside the timed closure made the metric
    noisy enough to hide regressions — the engine drains fully in run(), so
    reuse is free and the median de-noises the tunnel."""
    eng.run(list(reqs))  # warmup
    rates = []
    for _ in range(passes):
        t0 = time.perf_counter()
        done = eng.run(list(reqs))  # requests are read-only to the engine
        rates.append(
            sum(len(c.token_ids) for c in done)
            / (time.perf_counter() - t0)
        )
    return float(np.median(rates))


def bench_serving(cfg, params):
    """Continuous-batching serving throughput (tok/s) on a fixed ragged
    workload: 24 requests, prompts 300-1500, outputs 16-128, 8 slots —
    the traffic shape the reference's lockstep HF-generate path handles
    worst (measured 1.27x over lockstep batching on v5e,
    scripts/exp_serving.py). Median of 3 passes over one engine."""
    from gritlm_tpu.serving import ServingEngine

    eng = ServingEngine(
        cfg, params, max_batch=8, max_len=2048, eos_id=-1,
        chunk_size=16, prompt_buckets=(512, 1024, 1536),
    )
    return _median_serving_passes(eng, _ragged_requests(cfg))


def bench_paged_serving(cfg, params):
    """Paged-pool serving throughput (tok/s) on the same ragged workload:
    page-table-indirect KV (ops/paged_attention.py) removes the per-slot
    max_len reservation, so the pool admits more aggressively under mixed
    lengths (measured 1231 vs 939 tok/s lockstep on v5e, docs/ROUND3.md).
    Ratcheted so the paged kernel can't silently regress (r3 weak-3)."""
    from gritlm_tpu.serving import ServingEngine

    eng = ServingEngine(
        cfg, params, max_batch=8, max_len=2048, eos_id=-1,
        chunk_size=16, prompt_buckets=(512, 1024, 1536),
        paged=True, page_size=256,
    )
    return _median_serving_passes(eng, _ragged_requests(cfg))


def bench_prefix_serving(cfg, params):
    """Hot-document prefix-sharing throughput (tok/s): 24 queries against
    ONE shared 3000-token document pinned into pool pages once
    (register_prefix); every request's page table references the shared
    pages zero-copy. The RAG pattern the reference serves by re-uploading
    the doc KV per batch (rag/eval.py:237-302). Ratchets the full
    prefix-continuation path: page pin, continuation prefill gather,
    paged decode."""
    import jax
    import jax.numpy as jnp

    from gritlm_tpu.models.transformer import forward, init_cache
    from gritlm_tpu.serving import Request, ServingEngine

    rng = np.random.default_rng(11)
    doc_tokens = 3000
    doc = rng.integers(3, cfg.vocab_size, size=doc_tokens).tolist()
    cache = init_cache(cfg, 1, doc_tokens)
    _, cache, _ = forward(
        params, cfg, jnp.asarray(doc, jnp.int32)[None, :], causal=True,
        cache=cache,
    )
    entry = (np.asarray(cache.k[:, 0]), np.asarray(cache.v[:, 0]),
             doc_tokens, None, None)
    del cache

    page = 256
    dbucket = -(-doc_tokens // page) * page
    max_len = -(-(dbucket + 256 + 32 + page) // page) * page
    B = 8
    eng = ServingEngine(
        cfg, params, max_batch=B, max_len=max_len, eos_id=-1,
        chunk_size=16, prompt_buckets=(256, dbucket),
        paged=True, page_size=page,
        pool_pages=B * (max_len // page) + (dbucket // page) + 1,
    )
    eng.register_prefix("doc", entry)
    reqs = [
        Request(
            input_ids=rng.integers(3, cfg.vocab_size, size=int(n)).tolist(),
            max_new_tokens=32, request_id=str(i), prefix="doc",
        )
        for i, n in enumerate(rng.integers(16, 120, 24))
    ]
    return _median_serving_passes(eng, reqs)


def bench_embed_serving(cfg, params):
    """Unified-serving embedding throughput (embeds/s): 96 ragged
    EmbedRequests (128-512 tokens, instruction-masked) through the
    serving pool — the GritLM thesis, served (embeddings and generation
    share one engine and one jitted encode program; reference
    gritlm/gritlm.py:92-176 vs :262-296 can only run them as separate
    batch scripts). Upper bound is the offline encoder; the pool adds
    bucket grouping + scheduling. Ratcheted so unified serving can't
    silently regress."""
    from gritlm_tpu.serving import EmbedRequest, ServingEngine

    rng = np.random.default_rng(17)
    reqs = [
        EmbedRequest(
            input_ids=rng.integers(3, cfg.vocab_size, size=int(n)).tolist(),
            instr_len=8, request_id=str(i),
        )
        for i, n in enumerate(rng.integers(128, 512, 96))
    ]
    eng = ServingEngine(
        cfg, params, max_batch=8, max_len=2048, eos_id=-1,
        prompt_buckets=(256, 512), embed_batch=32,
    )

    def one_pass():
        eng.run(list(reqs))
        return eng.take_embeddings()

    one_pass()  # warmup/compile
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = one_pass()
        rates.append(len(out) / (time.perf_counter() - t0))
    return float(np.median(rates))


def bench_spec_serving(cfg, params):
    """Speculative serving throughput (tok/s): the prompt-lookup verify
    pool on compressible traffic — 24 requests whose prompts tile a
    32-token motif (the extractive-RAG shape), outputs 64-192, 8 slots.
    Measured v5e: 1857 vs 1533 tok/s plain engine at the decode-heavy
    cell (scripts/exp_serving.py --speculative --workload repetitive)."""
    from gritlm_tpu.serving import Request, ServingEngine

    rng = np.random.default_rng(7)
    plens = rng.integers(300, 1500, 24)
    nnews = rng.integers(64, 192, 24)
    reqs = []
    for i, (n, m) in enumerate(zip(plens, nnews)):
        motif = rng.integers(3, cfg.vocab_size, 32)
        ids = np.tile(motif, int(n) // 32 + 1)[: int(n)].tolist()
        reqs.append(Request(input_ids=ids, max_new_tokens=int(m),
                            request_id=str(i)))

    eng = ServingEngine(
        cfg, params, max_batch=8, max_len=2048, eos_id=-1,
        chunk_size=16, prompt_buckets=(512, 1024, 1536),
        speculative=True, spec_ngram=3, spec_k=7,
    )
    return _median_serving_passes(eng, reqs)


def _moe_bench_config(moe_impl: str = "auto"):
    """v5e-fitting Mixtral-shaped config (VERDICT r3 next-3): 8 experts ×
    ~88M/layer × 12 layers ≈ 1.1B total params (top-2 ⇒ ~0.35B active per
    token), bf16 ≈ 2.2GB HBM — the MoE analogue of _bench_config. Routing
    semantics: reference scripts/modeling_mixtral_gritlm.py:843-882."""
    from gritlm_tpu.config import ModelConfig

    return ModelConfig(
        vocab_size=32000,
        hidden_size=1024,
        intermediate_size=3584,
        num_hidden_layers=12,
        num_attention_heads=16,
        num_key_value_heads=8,
        num_local_experts=8,
        num_experts_per_tok=2,
        model_type="mixtral",
        dtype="bfloat16",
        moe_impl=moe_impl,
    )


def bench_search(n_docs=1_000_000, dim=1024, k=100, n_queries=256):
    """Flat-index search: synthetic 1M × 1024 bf16 corpus (2 GB HBM),
    k=100, exact mode — the RAG retrieval hot path (reference
    rag/index.py:101-141 does per-rank matmul+topk over NCCL).

    Returns (device_qps, sync_qps):
      device_qps — R=8 query blocks scanned inside ONE jitted program
        (one dispatch + one device_get for 2048 queries), so the
        per-call tunnel round-trip (~10-30 ms, host-load-dependent) is
        amortized 8x and the number tracks on-device kernel time. This
        is the RATCHETED metric (VERDICT r4 weak-1: the synchronous
        protocol was ~90% tunnel overhead — a real 2x kernel win was
        invisible and the record moved with round-trip conditions).
      sync_qps — one synchronous search(256 queries) call end-to-end,
        the interactive-caller latency view. Informational (reported,
        not ratcheted: it measures the tunnel, not the kernel)."""
    import jax
    import jax.numpy as jnp

    from gritlm_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(13)
    idx = FlatIndex(dim, n_docs)
    block = min(125_000, n_docs)
    for a in range(0, n_docs, block):
        emb = rng.standard_normal((block, dim), dtype=np.float32)
        idx.add(emb / np.linalg.norm(emb, axis=1, keepdims=True))
    queries = rng.standard_normal((n_queries, dim), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    idx.search(queries, k)  # warmup/compile
    times = []
    for _ in range(5):  # median of 5: the call is tunnel-dispatch-bound
        t0 = time.perf_counter()
        idx.search(queries, k)
        times.append(time.perf_counter() - t0)
    sync_qps = n_queries / float(np.median(times))

    # device-time protocol: R distinct blocks through the SAME search
    # program under one lax.scan — compute dominates, tunnel amortized
    R = 8
    if idx._search_fn is None:
        idx._search_fn, _ = idx._make_search()
    kern, nd = idx._search_fn, np.int32(idx.n_docs)
    qs = rng.standard_normal((R, n_queries, dim), dtype=np.float32)
    qs /= np.linalg.norm(qs, axis=2, keepdims=True)
    qs = jnp.asarray(qs)

    @jax.jit
    def burst(emb, qs):
        def body(_, q):
            return 0, kern(emb, q, nd, k=k, mode="exact")
        _, (v, i) = jax.lax.scan(body, 0, qs)
        return v, i

    _sync(burst(idx.embeddings, qs)[0])  # warmup/compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = burst(idx.embeddings, qs)
        _sync(out[0])
        times.append(time.perf_counter() - t0)
    del idx
    return R * n_queries / float(np.median(times)), sync_qps


def bench_rag_p50(cfg, params, n_docs=24, n_queries=24, new_tokens=16):
    """End-to-end RAG answer latency, p50 ms/query (VERDICT r4 next-7 —
    completes BASELINE.json's 'QPS + p50 RAG latency' metric triple; the
    reference publishes its >60% caching win at rag/eval.py:341-366 +
    README.md:46). Protocol: hot FlatIndex over a fixed-length synthetic
    corpus with doc KV caches precomputed at build (cache_docs=True), then
    `n_queries` single-query answer() calls in doc-cache mode at fixed
    query length, 16 new tokens, p50 of per-call seconds.

    Returns (p50_doccache_ms, p50_prompt_ms). The doc-cache number is the
    RATCHETED cell (lower is better); the prompt-mode number (query+doc
    re-prefilled inline, no cache — the reference's no-cache baseline) is
    informational: their ratio restates the caching win on TPU."""
    from gritlm_tpu import GritLM
    from gritlm_tpu.rag.engine import CacheMode, RAGEngine

    model = GritLM(cfg, params, mode="unified", attn="bbcc")
    rng = np.random.default_rng(23)
    # byte tokenizer: chars == tokens, so fixed char counts pin the encode
    # and prefill bucket shapes across calls (no stray recompiles)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    def text(n):
        return "".join(rng.choice(letters, n))
    passages = [{"title": text(16), "text": text(220)} for _ in range(n_docs)]
    queries = [text(48) for _ in range(n_queries)]

    eng = RAGEngine(model, max_new_tokens=new_tokens, encode_max_length=512)
    eng.build_index(passages, cache_docs=True)
    for q in queries[:3]:  # warmup: compiles encode/search/prefill/decode
        eng.answer(q, mode=CacheMode.DOC)
    lat_doc = [
        eng.answer(q, mode=CacheMode.DOC).seconds * 1e3 for q in queries
    ]
    for q in queries[:2]:
        eng.answer(q, mode=CacheMode.PROMPT_QUERY_DOC)
    lat_prompt = [
        eng.answer(q, mode=CacheMode.PROMPT_QUERY_DOC).seconds * 1e3
        for q in queries
    ]
    return float(np.median(lat_doc)), float(np.median(lat_prompt))


def _init_params_quantized_host(cfg, seed=0):
    """Random w8a16 serving params synthesized directly in numpy — tree-
    identical (paths/shapes/dtypes) to quantize_for_serving(init_params(cfg))
    (pinned by tests/test_quant.py::test_host_quantized_init_tree_matches)
    but ~6x faster on the single-core host: the 7B cell's fp32 init +
    quantize path took ~9.5 min of every bench run, and decode bandwidth /
    encode FLOPs don't depend on weight values. int8 values are uniform in
    [-127, 127] with per-channel scales of 0.02/127 (the dequantized
    magnitude matches init_params' normal(0.02), keeping activations
    finite through 32 layers)."""
    assert not cfg.is_moe, "7B bench config is dense"
    rng = np.random.default_rng(seed)
    L, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    H, Kv, Dh, V = (cfg.num_attention_heads, cfg.num_key_value_heads,
                    cfg.head_dim_, cfg.vocab_size)
    dt = np.dtype(cfg.jnp_dtype)  # ml_dtypes registers bfloat16 with numpy

    def q8(*shape):
        return {
            "q8": rng.integers(-127, 128, shape, dtype=np.int8),
            "scale": np.full((*shape[:-2], 1, shape[-1]), 0.02 / 127,
                             np.float32),
        }

    def bf(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02
                ).astype(dt)

    attn = {
        "wq": q8(L, D, H * Dh), "wk": q8(L, D, Kv * Dh),
        "wv": q8(L, D, Kv * Dh), "wo": q8(L, H * Dh, D),
    }
    if cfg.attention_bias:
        attn["bq"] = np.zeros((L, H * Dh), dt)
        attn["bk"] = np.zeros((L, Kv * Dh), dt)
        attn["bv"] = np.zeros((L, Kv * Dh), dt)
    params = {
        "embed": {"embedding": bf(V, D)},
        "layers": {
            "ln1": {"scale": np.ones((L, D), dt)},
            "attn": attn,
            "ln2": {"scale": np.ones((L, D), dt)},
            "mlp": {"gate": q8(L, D, F), "up": q8(L, D, F),
                    "down": q8(L, F, D)},
        },
        "final_ln": {"scale": np.ones((D,), dt)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": q8(D, V)}
    return params


def bench_7b():
    """Reference-flagship-scale cells on ONE v5e via int8 (VERDICT r4
    weak-3/next-3): GritLM-7B geometry (Mistral-7B, sliding window 4096;
    /root/reference/scripts/training/train_gritlm_7b.sh, README.md:283).
    bf16 7B cannot fit a 16GB chip (14.5GB weights + 3GB cache); w8a16 +
    int8-KV fits (~9.6GB). Weights are random — decode bandwidth and
    encode FLOPs do not depend on weight values. Host-init+quantize
    (~2 min, once per bench run) then three recorded cells: int8 decode
    ms/token, ragged24 continuous-batching serving tok/s, and w8a16
    bidirectional encode embeds/s — the first embedding number at the
    reference's scale. Returns None when the backend can't hold it
    (CPU smoke runs / small-HBM chips), keeping the driver run safe."""
    import jax

    if jax.default_backend() == "cpu":
        return None
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    limit = stats.get("bytes_limit")
    if limit is not None and limit < 12 * 2**30:
        return None

    import dataclasses

    from gritlm_tpu.config import mistral_7b

    cfg = dataclasses.replace(mistral_7b(), sliding_window=4096)
    # synthesized w8a16 params in host numpy (quantizing on-device would
    # need bf16 and int8 resident simultaneously; the real init+quantize
    # path took ~9.5 min/run on this host)
    params = _init_params_quantized_host(cfg)
    params = jax.device_put(params, dev)
    jax.block_until_ready(params)

    decode_ms = bench_decode(cfg, params, quant=True)
    embeds_per_sec = bench_encode(cfg, params, b=16, s=512)

    from gritlm_tpu.serving import ServingEngine

    eng = ServingEngine(
        cfg, params, max_batch=8, max_len=2048, eos_id=-1,
        kv_quant=True, chunk_size=16, prompt_buckets=(512, 1024, 1536),
    )
    tok_s = _median_serving_passes(eng, _ragged_requests(cfg))
    del eng, params
    return decode_ms, tok_s, embeds_per_sec


def bench_train(cfg, params):
    import jax
    import jax.numpy as jnp

    from gritlm_tpu.training.train import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    rng = np.random.default_rng(2)

    def feat(b, s, instr=8):
        return {
            "input_ids": jnp.asarray(
                rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32
            ),
            "attention_mask": jnp.ones((b, s), jnp.int32),
            "instruction_lens": jnp.full((b,), instr, jnp.int32),
        }

    gen_ids = rng.integers(0, cfg.vocab_size, (TR_GB, TR_GS))
    labels = np.where(
        rng.uniform(size=(TR_GB, TR_GS)) < 0.75, gen_ids, -100
    ).astype(np.int32)
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

    # remat policy measured on v5e (scripts/exp_remat_train.py): full
    # recompute 23.7k tok/s, dots_no_batch 25.1k tok/s (+6%), no-remat OOMs.
    # dots_no_batch saves the per-layer weights-only dot results and fits
    # alongside the 1B optimizer state; it is the production 1B-class config.
    tc = TrainConfig(mode="unified", total_steps=100, remat=True,
                     remat_policy="dots_no_batch")
    state = init_train_state(params, tc)
    step = jax.jit(lambda s, b: train_step(s, b, cfg, tc), donate_argnums=(0,))

    for _ in range(TR_WARMUP):
        state, m = step(state, batch)
    _sync(m.loss)
    t0 = time.perf_counter()
    for _ in range(TR_STEPS):
        state, m = step(state, batch)
    _sync(m.loss)
    return tokens_per_step * TR_STEPS / (time.perf_counter() - t0)


def main() -> None:
    import jax

    # cache dir keyed by host CPU flags: the 7B cell compiles host-side
    # (default_device(cpu)) programs whose XLA:CPU AOT results embed
    # machine features — loading entries compiled on a different host
    # type SIGILLs (see tests/conftest.py, same scheme)
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except Exception:
        flags = "unknown"
    cache = ("/tmp/gritlm_tpu_jax_cache_"
             + hashlib.sha1(flags.encode()).hexdigest()[:10])
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _bench_config
    from gritlm_tpu.models import init_params

    cfg = _bench_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)

    embeds_per_sec = bench_encode(cfg, params)
    # short-prompt encode cell (VERDICT r3 next-8): B=32, S=64 — the MTEB
    # short-sentence regime rides the einsum fallback (flash needs Sq>=128);
    # measured at full token-throughput parity with the flash path, this
    # cell pins that the dispatch threshold stays optimal
    short_embeds_per_sec = bench_encode(cfg, params, b=32, s=64, instr=4)
    decode_ms = bench_decode(cfg, params)
    decode_ms_q8 = bench_decode(cfg, params, quant=True)
    decode_ms_w8 = bench_decode(cfg, params, quant=True, weight_quant=8)
    decode_ms_w4 = bench_decode(cfg, params, quant=True, weight_quant=4)
    spec_ms = bench_spec_decode(cfg, params)
    serving_tok_s = bench_serving(cfg, params)
    paged_serving_tok_s = bench_paged_serving(cfg, params)
    prefix_serving_tok_s = bench_prefix_serving(cfg, params)
    spec_serving_tok_s = bench_spec_serving(cfg, params)
    embed_serving_eps = bench_embed_serving(cfg, params)
    # rag runs BEFORE train: bench_train's jitted step donates the train
    # state, whose leaves alias these params — they are deleted afterwards
    rag_p50_ms, rag_p50_prompt_ms = bench_rag_p50(cfg, params)
    train_tok_s = bench_train(cfg, params)
    del params  # free the dense 1B before the MoE model comes up

    moe_cfg = _moe_bench_config()
    moe_params = init_params(moe_cfg, jax.random.PRNGKey(1),
                             with_lm_head=True)
    moe_embeds_per_sec = bench_encode(moe_cfg, moe_params)
    moe_decode_ms = bench_decode(moe_cfg, moe_params)
    # MoE continuous-batching serving on the same ragged workload as the
    # dense cell (VERDICT r3 next-3 "ideally moe serving"): the router +
    # expert dispatch ride the decode chunk like any other layer
    moe_serving_tok_s = bench_serving(moe_cfg, moe_params)
    del moe_params

    search_device_qps, search_sync_qps = bench_search()
    r7b = bench_7b()  # last: ~9.6GB HBM + a ~2-min host init, None on CPU

    record = {}
    if os.path.exists(RECORD_FILE):
        try:
            with open(RECORD_FILE) as f:
                record = json.load(f)
        except Exception:
            record = {}

    def ratchet(key, value, higher_is_better=True):
        best = record.get(key)
        vs = 1.0
        if best:
            vs = value / best if higher_is_better else best / value
        if best is None or (value > best if higher_is_better else value < best):
            record[key] = value
        return round(vs, 4)

    # (record_key, short_key, full_metric_name, value, unit, higher_better)
    # short_key appears on the single printed line (driver captures only
    # ~2000 bytes — round 4's verbose line overflowed it, VERDICT r4 weak-2);
    # the full name/unit/record live in BENCH_DETAIL.json next to this file.
    cells = [
        ("short_embeds_per_sec", "enc_s64",
         "short_encode_embeds_per_sec_b32_seq64_1b_bf16",
         short_embeds_per_sec, "embeds/s", True),
        ("decode_ms_per_token", "dec",
         "decode_ms_per_token_4k_cache_b8_1b_bf16", decode_ms, "ms/tok",
         False),
        ("decode_ms_per_token_int8kv", "dec_i8kv",
         "decode_ms_per_token_4k_cache_b8_1b_int8kv", decode_ms_q8,
         "ms/tok", False),
        ("decode_ms_per_token_int8w_int8kv", "dec_i8w",
         "decode_ms_per_token_4k_cache_b8_1b_int8w_int8kv", decode_ms_w8,
         "ms/tok", False),
        ("decode_ms_per_token_int4w_int8kv", "dec_i4w",
         "decode_ms_per_token_4k_cache_b8_1b_int4w_int8kv", decode_ms_w4,
         "ms/tok", False),
        ("spec_decode_ms_per_token", "dec_spec",
         "spec_decode_ms_per_token_3kctx_b1_1b_bf16", spec_ms, "ms/tok",
         False),
        ("serving_tokens_per_sec", "srv",
         "serving_tokens_per_sec_ragged24_b8_1b_bf16", serving_tok_s,
         "tok/s", True),
        ("paged_serving_tokens_per_sec", "srv_paged",
         "paged_serving_tokens_per_sec_ragged24_b8_1b_bf16",
         paged_serving_tok_s, "tok/s", True),
        ("prefix_serving_tokens_per_sec", "srv_prefix",
         "prefix_serving_tokens_per_sec_hotdoc3k_b8_1b_bf16",
         prefix_serving_tok_s, "tok/s", True),
        ("spec_serving_tokens_per_sec", "srv_spec",
         "spec_serving_tokens_per_sec_rep24_b8_1b_bf16", spec_serving_tok_s,
         "tok/s", True),
        ("embed_serving_embeds_per_sec", "srv_embed",
         "embed_serving_embeds_per_sec_ragged96_1b_bf16", embed_serving_eps,
         "embeds/s", True),
        ("train_tokens_per_sec", "train",
         "train_tokens_per_sec_unified_1b_bf16", train_tok_s, "tok/s", True),
        ("moe_embeds_per_sec", "moe_enc",
         "moe_embeds_per_sec_seq512_8x88m_top2_bf16", moe_embeds_per_sec,
         "embeds/s", True),
        ("moe_decode_ms_per_token", "moe_dec",
         "moe_decode_ms_per_token_4k_cache_b8_8x88m_bf16", moe_decode_ms,
         "ms/tok", False),
        ("moe_serving_tokens_per_sec", "moe_srv",
         "moe_serving_tokens_per_sec_ragged24_b8_8x88m_bf16",
         moe_serving_tok_s, "tok/s", True),
        ("search_device_qps", "search_dev",
         "search_device_qps_1m_1024d_k100_bf16_burst8", search_device_qps,
         "queries/s", True),
        ("rag_p50_ms_doccache", "rag_p50",
         "rag_p50_ms_doccache_16new_1b_bf16", rag_p50_ms, "ms", False),
    ]
    if r7b is not None:
        decode_ms_7b, serving_tok_s_7b, embeds_per_sec_7b = r7b
        cells += [
            ("decode_ms_per_token_7b", "dec7b",
             "decode_ms_per_token_4k_cache_b8_7b_int8w_int8kv",
             decode_ms_7b, "ms/tok", False),
            ("serving_tokens_per_sec_7b", "srv7b",
             "serving_tokens_per_sec_ragged24_b8_7b_int8w_int8kv",
             serving_tok_s_7b, "tok/s", True),
            ("embeds_per_sec_7b", "enc7b",
             "embeds_per_sec_b16_seq512_7b_int8w", embeds_per_sec_7b,
             "embeds/s", True),
        ]

    extra = {}
    detail = []
    for rkey, skey, full, value, unit, hib in cells:
        vs = ratchet(rkey, value, higher_is_better=hib)
        extra[skey] = [round(value, 3 if value < 100 else 1), vs]
        detail.append({"metric": full, "value": round(value, 4),
                       "unit": unit, "vs_baseline": vs,
                       "record": record[rkey]})

    # informational (not ratcheted): synchronous single-call search — this
    # measures the host/tunnel round-trip, not the kernel (VERDICT r4
    # weak-1); the retired ratchet key is dropped from the record
    record.pop("search_qps", None)
    extra["search_sync"] = [round(search_sync_qps, 1), None]
    detail.append({"metric": "search_sync_qps_1m_1024d_k100_bf16",
                   "value": round(search_sync_qps, 1), "unit": "queries/s",
                   "vs_baseline": None,
                   "note": "informational; tunnel-dominated, not ratcheted"})
    # informational: the no-cache RAG baseline (query+doc re-prefilled
    # inline) — the doccache/prompt ratio restates the reference's >60%
    # caching win (rag/eval.py:341-366) on TPU
    extra["rag_p50_nocache"] = [round(rag_p50_prompt_ms, 1), None]
    detail.append({"metric": "rag_p50_ms_promptmode_16new_1b_bf16",
                   "value": round(rag_p50_prompt_ms, 1), "unit": "ms",
                   "vs_baseline": None,
                   "note": "informational no-cache baseline for rag_p50"})

    vs_enc = ratchet("embeds_per_sec", embeds_per_sec)
    record.update({
        "config": "1B-class bf16",
        "backend": jax.default_backend(),
        "shapes": {
            "encode": [ENC_B, ENC_S],
            "decode": [DEC_B, DEC_BUCKET, DEC_PROMPT],
            "train": [TR_QB, TR_QS, TR_PB, TR_PS, TR_GB, TR_GS],
        },
    })
    with open(RECORD_FILE, "w") as f:
        json.dump(record, f, indent=1)
    with open(os.path.join(os.path.dirname(__file__),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump({"headline": {
            "metric": "embeds_per_sec_per_chip_seq512_1b_bf16",
            "value": round(embeds_per_sec, 2), "unit": "embeds/s",
            "vs_baseline": vs_enc}, "cells": detail}, f, indent=1)

    line = json.dumps({
        "metric": "embeds_per_sec_per_chip_seq512_1b_bf16",
        "value": round(embeds_per_sec, 2),
        "unit": "embeds/s",
        "vs_baseline": vs_enc,
        "extra": {"cells[value,vs_record]": extra,
                  "detail": "BENCH_DETAIL.json"},
    }, separators=(",", ":"))
    # the driver's capture window is 2000 bytes; an overflowing line parses
    # as null and the whole round's perf record loses structure
    assert len(line) <= 1800, f"bench line {len(line)}B > 1800B budget"
    print(line)


if __name__ == "__main__":
    main()
