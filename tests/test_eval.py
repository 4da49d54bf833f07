import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.eval.mteb_adapter import (
    DEFAULT_INSTRUCTIONS,
    QUICK_EVAL,
    MTEBEncoder,
    format_instruction,
)
from gritlm_tpu.eval.retrieval import evaluate_retrieval, retrieval_metrics
from gritlm_tpu.gritlm import GritLM


def test_retrieval_metrics_hand_computed():
    qrels = {"q1": {"d1": 1, "d2": 1}, "q2": {"d3": 1}}
    results = {
        "q1": {"d1": 0.9, "dX": 0.8, "d2": 0.7},  # rel at ranks 1 and 3
        "q2": {"dY": 0.9, "d3": 0.8},  # rel at rank 2
    }
    m = retrieval_metrics(results, qrels, k_values=(1, 3))
    assert m["ndcg_at_1"] == pytest.approx(0.5)
    assert m["recall_at_1"] == pytest.approx((0.5 + 0.0) / 2)
    assert m["mrr_at_3"] == pytest.approx((1.0 + 0.5) / 2)
    # q1 AP@3 = (1/1 + 2/3)/2 ; q2 AP@3 = (1/2)/1
    assert m["map_at_3"] == pytest.approx(((1 + 2 / 3) / 2 + 0.5) / 2, abs=1e-4)


def test_retrieval_metrics_perfect():
    qrels = {"q": {"d0": 1}}
    results = {"q": {"d0": 1.0, "d1": 0.5}}
    m = retrieval_metrics(results, qrels, k_values=(1,))
    assert m["ndcg_at_1"] == 1.0 and m["mrr_at_1"] == 1.0


def test_format_instruction_variants():
    assert format_instruction("do x", "gritlm") == "<|user|>\ndo x\n<|embed|>\n"
    assert format_instruction("", "gritlm") == "<|embed|>\n"
    assert "[INST]" in format_instruction("do x", "mistral")
    with pytest.raises(ValueError):
        format_instruction("x", "nope")


def test_quick_eval_spans_task_types():
    assert len(QUICK_EVAL) == 12
    for t in QUICK_EVAL:
        assert t in DEFAULT_INSTRUCTIONS


@pytest.fixture(scope="module")
def model():
    return GritLM(tiny_mistral(), mode="unified", seed=0)


def test_evaluate_retrieval_end_to_end(model):
    # self-retrieval: each query IS its positive doc text → must rank first
    corpus = {f"d{i}": {"title": "", "text": f"unique document {i} flamingo"}
              for i in range(12)}
    queries = {f"q{i}": f"unique document {i} flamingo" for i in range(4)}
    qrels = {f"q{i}": {f"d{i}": 1} for i in range(4)}
    m = evaluate_retrieval(model, corpus, queries, qrels,
                           top_k=10, k_values=(1, 10), max_length=64)
    assert m["ndcg_at_1"] == 1.0  # identical text → cosine 1.0
    assert m["recall_at_10"] == 1.0


def test_mteb_encoder_binds_instructions(model):
    enc = MTEBEncoder(model, {"query": "find docs", "corpus": ""}, batch_size=4,
                      max_length=64)
    q = enc.encode_queries(["hello"])
    c = enc.encode_corpus([{"title": "t", "text": "hello"}])
    assert q.shape == c.shape == (1, model.config.hidden_size)
    assert not np.allclose(q, c, atol=1e-4)  # instruction changes the query side


def test_reranker_reorders(model):
    from gritlm_tpu.eval.rerank import GenerativeReranker

    rr = GenerativeReranker(model, max_length=64, batch_size=4)
    queries = {"q": "which doc mentions zebras?"}
    corpus = {f"d{i}": {"title": "", "text": f"doc {i} about zebras"} for i in range(5)}
    results = {"q": {f"d{i}": 1.0 - 0.1 * i for i in range(5)}}
    out = rr.rerank(queries, corpus, results, depth=3)
    assert set(out["q"]) == set(results["q"])
    # head (reranked) scores all above the untouched tail
    tail_max = max(out["q"]["d3"], out["q"]["d4"])
    for d in ("d0", "d1", "d2"):
        assert out["q"][d] > tail_max


def test_instruction_sets_complete():
    """The shipped instruction data covers all 56 English MTEB tasks for the
    e5 (GritLM default) and medi2 sets (reference eval_mteb.py:10-839)."""
    from gritlm_tpu.eval.aggregate import TASK_TO_TYPE
    from gritlm_tpu.eval.mteb_adapter import load_instruction_set, load_instructions

    for set_name in ("e5", "medi2"):
        table = load_instruction_set(set_name)
        missing = [t for t in TASK_TO_TYPE if t not in table]
        assert not missing, f"{set_name} missing {missing}"
    e5 = load_instruction_set("e5")
    assert isinstance(e5["SciFact"], dict) and "query" in e5["SciFact"]
    # CQADupstack subforums inherit the parent instruction
    assert e5["CQADupstackAndroidRetrieval"] == e5["CQADupstackRetrieval"]
    merged = load_instructions(instruction_set="medi2")
    assert "SciFact" in merged

    import pytest as _pytest
    with _pytest.raises(ValueError):
        load_instruction_set("nope")


def test_few_shot_injection():
    from gritlm_tpu.eval.mteb_adapter import apply_few_shot, load_instruction_set

    e5 = load_instruction_set("e5")
    instr = apply_few_shot(e5["ArguAna"], "ArguAna", "e5")
    assert isinstance(instr, dict)
    assert instr["query"] != e5["ArguAna"]["query"]
    assert "For example given" in instr["query"]
    # non-retrieval task: plain string append
    instr2 = apply_few_shot(e5["Banking77Classification"],
                            "Banking77Classification", "e5")
    assert isinstance(instr2, str) and len(instr2) > len(e5["Banking77Classification"])
    # unknown task: unchanged
    assert apply_few_shot("base", "NotATask", "e5") == "base"


def test_rerank_templates():
    from gritlm_tpu.eval.rerank import DEFAULT_TEMPLATE, load_rerank_template

    t = load_rerank_template("SciFact")
    assert "{query}" in t and "{title} {text}" in t and "yes" in t
    t.format(query="q", title="t", text="x")  # all slots resolvable
    assert load_rerank_template("NotATask") == DEFAULT_TEMPLATE
