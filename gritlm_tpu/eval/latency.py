"""RAG latency harness.

Reproduces the reference's latency benchmark protocol (scripts/raglatency.sh
sweep grid + rag/eval.py:341-366 JSON schema): synthetic queries/docs of
fixed token lengths, per-mode timing with cache-precompute time excluded,
results keyed "qlen-dlen-maxtoks-device".
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

SWEEP_LENGTHS = (250, 500, 1000, 2000, 4000)
SWEEP_MODES = ("prompt_query_doc", "query", "doc", "querydoc", "docquery")


def synthetic_text(tokenizer, n_tokens: int) -> str:
    """A string that tokenizes to ~n_tokens (reference uses '<s>'*N docs,
    rag/index.py:208-214; any fixed repeated token works)."""
    unit = "lorem "
    per = max(tokenizer.tokenize_len(unit, add_special_tokens=False), 1)
    return unit * (n_tokens // per)


def measure_latency(
    engine,  # RAGEngine with a built index of synthetic docs
    query: str,
    mode: str,
    n_queries: int = 8,
    max_new_tokens: int = 16,
    warmup: int = 1,
) -> Dict[str, float]:
    times: List[float] = []
    for i in range(warmup + n_queries):
        r = engine.answer(query, mode=mode, max_new_tokens=max_new_tokens)
        if i >= warmup:
            times.append(r.seconds)
    return {
        "avg": float(np.mean(times)),
        "std": float(np.std(times)),
        "total": float(np.sum(times)),
        "n": n_queries,
    }


def run_sweep(
    model,
    lengths: Sequence[int] = SWEEP_LENGTHS,
    modes: Sequence[str] = SWEEP_MODES,
    max_new_tokens: int = 16,
    n_queries: int = 4,
    n_docs: int = 16,
    out_file: Optional[str] = None,
    device: Optional[str] = None,
) -> Dict[str, dict]:
    """Full qlen×dlen×mode grid on synthetic data. Key schema matches the
    reference latency JSONs: '{qlen}-{dlen}-{maxtoks}-{device}'."""
    import jax

    from gritlm_tpu.rag import RAGEngine

    device = device or jax.default_backend()
    results: Dict[str, dict] = {}
    for dlen in lengths:
        engine = RAGEngine(model, max_new_tokens=max_new_tokens,
                           encode_max_length=max(dlen + 64, 128))
        docs = [
            {"title": "", "text": synthetic_text(model.tokenizer, dlen)}
            for _ in range(n_docs)
        ]
        engine.build_index(docs, batch_size=min(n_docs, 8))
        for qlen in lengths:
            query = synthetic_text(model.tokenizer, qlen)
            for mode in modes:
                stats = measure_latency(
                    engine, query, mode,
                    n_queries=n_queries, max_new_tokens=max_new_tokens,
                )
                key = f"{qlen}-{dlen}-{max_new_tokens}-{device}-{mode}"
                results[key] = stats
                if out_file:
                    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
                    with open(out_file, "w") as f:
                        json.dump(results, f, indent=1)
    return results
