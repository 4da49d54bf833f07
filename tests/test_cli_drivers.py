"""One-command eval/RAG CLI drivers (reference evaluation/eval_mteb.py:1081
and rag/eval.py:375 counterparts) + the build-time doc-cache store."""

import json
import os

import numpy as np
import pytest

from gritlm_tpu import GritLM
from gritlm_tpu.config import tiny_mistral


def _write_rag_fixtures(tmp_path):
    passages = tmp_path / "passages.jsonl"
    rows = [
        {"id": i, "title": f"topic {i}",
         "text": f"The capital of country {i} is city {i}."}
        for i in range(6)
    ]
    passages.write_text("\n".join(json.dumps(r) for r in rows))
    qa = tmp_path / "qa.jsonl"
    qrows = [
        {"question": f"What is the capital of country {i}?",
         "answers": [f"city {i}"]}
        for i in range(3)
    ]
    qa.write_text("\n".join(json.dumps(r) for r in qrows))
    return str(passages), str(qa)


@pytest.mark.parametrize("cache", [None, "doc", "querydoc"])
def test_rag_eval_cli(tmp_path, cache):
    from gritlm_tpu.rag.eval import main

    passages, qa = _write_rag_fixtures(tmp_path)
    args = [
        "--model_preset", "tiny_mistral",
        "--passages", passages, "--eval_data", qa,
        "--max_new_tokens", "4", "--per_gpu_batch_size", "3",
        "--save_dir", str(tmp_path / "out"), "--embedbs", "4",
    ]
    if cache:
        args += ["--cache", cache]
    res = main(args)
    (tag, metrics), = res.items()
    assert metrics["n"] == 3
    assert 0.0 <= metrics["exact_match"] <= 1.0
    assert len(metrics["predictions"]) == 3
    out = tmp_path / "out" / f"{tag}-metrics.json"
    assert out.exists()


def test_rag_eval_cli_latency(tmp_path):
    from gritlm_tpu.rag.eval import main

    res = main([
        "--model_preset", "tiny_mistral", "--latency",
        "--customq", "16", "--customd", "32", "--cache", "doc",
        "--max_new_tokens", "2", "--n_latency_queries", "2",
        "--latency_reps", "2", "--save_dir", str(tmp_path),
    ])
    (tag, stats), = res.items()
    assert stats["n"] == 2 and stats["batch"] == 2 and stats["avg"] > 0
    latency_file = tmp_path / f"{tag}-latency.json"
    data = json.loads(latency_file.read_text())
    import jax

    key = f"16-32-2-{jax.default_backend()}"
    assert key in data  # reference key schema {q}-{d}-{maxtoks}-{device}

    # second invocation must skip (results exist)
    res2 = main([
        "--model_preset", "tiny_mistral", "--latency",
        "--customq", "16", "--customd", "32", "--cache", "doc",
        "--max_new_tokens", "2", "--save_dir", str(tmp_path),
    ])
    assert res2 == {}


def test_doc_cache_store_matches_on_the_fly(tmp_path):
    """Answers produced from the build-time host cache store must equal the
    on-the-fly doc-cache encode path (same tokens in, same cache content)."""
    from gritlm_tpu.rag.engine import CacheMode, RAGEngine

    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc")
    docs = [
        {"title": f"t{i}", "text": f"Document body number {i}."}
        for i in range(5)
    ]
    queries = ["What is in document 2?", "Tell me about number 4."]

    e1 = RAGEngine(model, max_new_tokens=4, encode_max_length=128)
    e1.build_index(docs, batch_size=4, cache_docs=False)
    r1 = e1.answer_batch(queries, mode=CacheMode.DOC)

    e2 = RAGEngine(model, max_new_tokens=4, encode_max_length=128)
    e2.build_index(docs, batch_size=4, cache_docs=True, cache_batch_size=2)
    assert len(e2._doc_store) == 5
    r2 = e2.answer_batch(queries, mode=CacheMode.DOC)

    for a, b in zip(r1, r2):
        assert a.answer == b.answer
        assert a.passages == b.passages


def _write_beir_task(root, name):
    d = root / name
    d.mkdir(parents=True)
    corpus = [
        {"_id": f"d{i}", "title": f"doc {i}",
         "text": f"This passage explains subject {i} in detail."}
        for i in range(8)
    ]
    (d / "corpus.jsonl").write_text(
        "\n".join(json.dumps(r) for r in corpus))
    queries = [
        {"_id": f"q{i}", "text": f"Find the passage about subject {i}."}
        for i in range(4)
    ]
    (d / "queries.jsonl").write_text(
        "\n".join(json.dumps(r) for r in queries))
    (d / "qrels.tsv").write_text(
        "query-id\tcorpus-id\tscore\n"
        + "\n".join(f"q{i}\td{i}\t1" for i in range(4)))


def test_mteb_cli_offline(tmp_path):
    from gritlm_tpu.eval.mteb import main

    _write_beir_task(tmp_path / "data", "ToyRetrieval")
    out = tmp_path / "results"
    res = main([
        "--model_preset", "tiny_mistral",
        "--task_names", "ToyRetrieval",
        "--local_data_dir", str(tmp_path / "data"),
        "--output_folder", str(out),
        "--batch_size", "4", "--max_length", "64",
    ])
    m = res["ToyRetrieval"]
    assert "ndcg_at_10" in m and 0.0 <= m["ndcg_at_10"] <= 1.0
    saved = json.loads((out / "ToyRetrieval.json").read_text())
    assert saved["metrics"] == pytest.approx(m)

    # skip-if-exists on rerun
    res2 = main([
        "--model_preset", "tiny_mistral",
        "--task_names", "ToyRetrieval",
        "--local_data_dir", str(tmp_path / "data"),
        "--output_folder", str(out),
    ])
    assert res2 == {}


def test_mteb_cli_requires_mteb_online(tmp_path):
    """Without --local_data_dir the CLI goes through run_mteb, which raises a
    clear ImportError when the mteb package is absent (this env)."""
    from gritlm_tpu.eval.mteb import main

    try:
        import mteb  # noqa: F401

        pytest.skip("mteb installed — online path would download datasets")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="mteb"):
        main([
            "--model_preset", "tiny_mistral",
            "--task_names", "SciFact",
            "--output_folder", str(tmp_path),
        ])


def test_mteb_cli_offline_rerank(tmp_path):
    """VERDICT r2 item 9: --rerank_top_k wires the generative yes-logit
    reranker into the offline retrieval path and reports BOTH metric sets
    (reference AbsTaskRetrieval.py:276-345)."""
    from gritlm_tpu.eval.mteb import main

    _write_beir_task(tmp_path / "data", "ToyRetrieval")
    out = tmp_path / "results"
    res = main([
        "--model_preset", "tiny_mistral",
        "--task_names", "ToyRetrieval",
        "--local_data_dir", str(tmp_path / "data"),
        "--output_folder", str(out),
        "--batch_size", "4", "--max_length", "64",
        "--rerank_top_k", "3",
        "--rerank_cache_dir", str(tmp_path / "rrcache"),
    ])
    m = res["ToyRetrieval"]
    assert "ndcg_at_10" in m and "rerank_ndcg_at_10" in m
    assert 0.0 <= m["rerank_ndcg_at_10"] <= 1.0
    # per-query yes-score cache was written
    cache_files = list((tmp_path / "rrcache" / "ToyRetrieval").glob("*.json"))
    assert len(cache_files) == 4


def test_serve_cli(tmp_path):
    """python -m gritlm_tpu.serve: a mixed JSONL request file (generation,
    sampled generation, embedding) through the continuous-batching pool;
    completions land in finish order, embeddings are unit-norm."""
    from gritlm_tpu.serve import main

    reqs = tmp_path / "reqs.jsonl"
    rows = [
        {"id": "g0", "prompt": "<s><|user|>\nHi\n<|assistant|>\n",
         "max_new_tokens": 6},
        {"id": "g1", "prompt": "<s>hello there", "max_new_tokens": 4,
         "temperature": 0.7, "seed": 3},
        {"id": "e0", "type": "embed", "text": "a passage to embed",
         "instruction": "<|user|>\nRepresent this\n<|embed|>\n"},
    ]
    reqs.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "done.jsonl"
    summary = main([
        "--model_preset", "tiny_mistral",
        "--requests", str(reqs), "--out", str(out),
        "--slots", "2", "--max_len", "128",
        "--prompt_buckets", "64", "--chunk_size", "2",
    ])
    assert summary["completions"] == 2 and summary["embeddings"] == 1
    got = {json.loads(ln)["id"]: json.loads(ln)
           for ln in out.read_text().splitlines()}
    assert set(got) == {"g0", "g1", "e0"}
    assert got["g0"]["finish_reason"] in ("eos", "length")
    assert 1 <= len(got["g0"]["token_ids"]) <= 6
    assert isinstance(got["g0"]["text"], str)
    emb = np.asarray(got["e0"]["embedding"])
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)
