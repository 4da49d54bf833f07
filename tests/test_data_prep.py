"""Data-prep contract tests (reference scripts/prepare_datasets/*,
reformat_*.py, check_*.py; SURVEY §2.6)."""

import json

import numpy as np
import pytest

from gritlm_tpu.data_prep import (
    check_decontamination,
    dataset_length_stats,
    mine_hard_negatives,
    reformat_chat,
    reformat_pairs,
    validate_embedding_row,
    validate_file,
    validate_generative_row,
)


def test_validate_embedding_row():
    assert validate_embedding_row(
        {"query": "q", "pos": ["p"], "neg": []}) == []
    assert validate_embedding_row(
        {"query": ["i", "q"], "pos": [["i", "p"]], "neg": ["n"]}) == []
    assert validate_embedding_row({"query": 3, "pos": ["p"], "neg": []})
    assert validate_embedding_row({"query": "q", "pos": [], "neg": []})
    assert validate_embedding_row({"query": "q", "pos": "p", "neg": []})


def test_validate_generative_row():
    assert validate_generative_row({"text": "plain"}) == []
    assert validate_generative_row({"text": ["u", "a", "u2", "a2"]}) == []
    assert validate_generative_row({"text": ["u", "a", "dangling"]})
    assert validate_generative_row({"text": []})
    assert validate_generative_row({"text": [1, 2]})


def test_validate_file(tmp_path):
    f = tmp_path / "emb.jsonl"
    f.write_text(json.dumps({"query": "q", "pos": ["p"], "neg": ["n"]}) + "\n"
                 + json.dumps({"text": "oops mixed"}) + "\n")
    rep = validate_file(str(f))
    assert rep["kind"] == "embedding" and not rep["valid"]
    assert any("mixed" in e for e in rep["errors"])

    g = tmp_path / "gen.jsonl"
    g.write_text(json.dumps({"text": ["u", "a"]}) + "\n")
    rep = validate_file(str(g))
    assert rep["valid"] and rep["kind"] == "generative" and rep["rows"] == 1


def test_reformat_pairs():
    rows = [{"query": "q", "pos": "p", "neg": ["n1", "n2"]}]
    out = list(reformat_pairs(rows, query_instruction="QI"))
    assert out == [{"query": ["QI", "q"], "pos": ["p"], "neg": ["n1", "n2"]}]
    assert validate_embedding_row(out[0]) == []


def test_reformat_chat():
    rows = [{"messages": [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "dangling"},
    ]}]
    out = list(reformat_chat(rows))
    assert out == [{"text": ["hi", "hello"]}]
    assert validate_generative_row(out[0]) == []


def test_length_stats(tmp_path):
    f = tmp_path / "d.jsonl"
    f.write_text(json.dumps({"text": "abcd"}) + "\n"
                 + json.dumps({"text": ["ab", "cd"]}) + "\n")
    s = dataset_length_stats(str(f))
    assert s["chars"]["n"] == 2 and s["chars"]["max"] == 5  # "ab cd"


def test_decontamination():
    train = ["the quick brown fox jumps over the lazy dog today",
             "completely unrelated text about jax sharding and meshes ok"]
    evals = ["quick brown fox jumps over the lazy dog today indeed"]
    hits = check_decontamination(train, evals, n=4, threshold=0.3)
    assert hits and hits[0][0] == 0
    assert not check_decontamination(train[1:], evals, n=4, threshold=0.3)


class _FakeModel:
    """Deterministic embedding stub: hashes text into a direction so nearest
    neighbours are stable; avoids a real forward in this unit test."""

    def encode(self, texts, instruction=None, batch_size=None, max_length=None):
        rng_rows = []
        for t in texts:
            rng = np.random.default_rng(abs(hash(t)) % (2**31))
            v = rng.standard_normal(8)
            rng_rows.append(v / np.linalg.norm(v))
        return np.asarray(rng_rows, np.float32)


def test_mine_hard_negatives():
    rows = [{"query": f"q{i}", "pos": [f"p{i}"], "neg": []} for i in range(6)]
    out = mine_hard_negatives(_FakeModel(), rows, k=3)
    for i, r in enumerate(out):
        assert len(r["neg"]) == 3
        assert f"p{i}" not in r["neg"]          # own positive excluded
        assert all(n.startswith("p") for n in r["neg"])
    # skip_top drops the closest negative
    out2 = mine_hard_negatives(_FakeModel(), rows, k=2, skip_top=1)
    assert out[0]["neg"][1:3] == out2[0]["neg"]
