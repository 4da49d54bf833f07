"""MTEB aggregation tests (reference scripts/merge_cqadupstack.py + mteb_to_tex.py)."""

import json
import os

from gritlm_tpu.eval.aggregate import (
    CQADUPSTACK_SUBFORUMS,
    collect_scores,
    main_score,
    merge_cqadupstack,
    summarize,
    to_latex,
    to_markdown,
)


def test_main_score_shapes():
    assert main_score("SciFact", {"test": {"ndcg_at_10": 0.71}}) == 0.71
    assert main_score("STS12", {"test": {"cos_sim": {"spearman": 0.8}}}) == 0.8
    # language-keyed nesting
    assert main_score("STS17", {"test": {"en-en": {"cos_sim": {"spearman": 0.9}}}}) == 0.9
    assert main_score("Banking77Classification",
                      {"test": {"accuracy": 0.86}}) == 0.86
    assert main_score("TwitterSemEval2015",
                      {"test": {"cos_sim": {"ap": 0.7}}}) == 0.7
    assert main_score("SciFact", {"weird": {}}) is None


def test_merge_cqadupstack(tmp_path):
    for i, t in enumerate(CQADUPSTACK_SUBFORUMS):
        with open(tmp_path / f"{t}.json", "w") as f:
            json.dump({"test": {"ndcg_at_10": 0.1 * (i % 3), "evaluation_time": 2.0},
                       "mteb_dataset_name": t}, f)
    merged = merge_cqadupstack(str(tmp_path))
    assert merged is not None
    expect = sum(0.1 * (i % 3) for i in range(12)) / 12
    assert abs(merged["test"]["ndcg_at_10"] - expect) < 1e-9
    assert merged["test"]["evaluation_time"] == 24.0
    assert merged["mteb_dataset_name"] == "CQADupstackRetrieval"
    assert os.path.exists(tmp_path / "CQADupstackRetrieval.json")
    # incomplete set → no merge
    os.remove(tmp_path / f"{CQADUPSTACK_SUBFORUMS[0]}.json")
    os.remove(tmp_path / "CQADupstackRetrieval.json")
    assert merge_cqadupstack(str(tmp_path)) is None


def test_collect_and_summarize(tmp_path):
    with open(tmp_path / "SciFact.json", "w") as f:
        json.dump({"test": {"ndcg_at_10": 0.7}}, f)
    with open(tmp_path / "BIOSSES.json", "w") as f:
        json.dump({"test": {"cos_sim": {"spearman": 0.8}}}, f)
    with open(tmp_path / "NotATask.json", "w") as f:
        json.dump({"test": {"x": 1}}, f)
    scores = collect_scores(str(tmp_path))
    assert scores == {"SciFact": 70.0, "BIOSSES": 80.0}
    s = summarize(scores)
    assert s["Retrieval"][0] == 70.0 and s["Retrieval"][1:] == (1, 15)
    assert s["Average"] == (75.0, 2, 56)
    md = to_markdown(s, "m")
    assert "| Retrieval | 70.00 | 1/15 |" in md
    tex = to_latex({"my_model": s})
    assert r"my\_model" in tex and r"\toprule" in tex


def test_lmeval_table_and_alpaca_median(tmp_path):
    import json
    from gritlm_tpu.eval.aggregate import alpaca_median_length, lmeval_table

    r = {"results": {"arc_easy": {"acc": 0.75, "acc_norm": 0.8},
                     "boolq": {"acc": 0.6}}}
    p = tmp_path / "rank_eval.json"
    p.write_text(json.dumps(r))
    tex = lmeval_table({"m7": str(p)})
    assert "ARC-E & 75.0" in tex and "BoolQ & 60.0" in tex
    assert "Average & 67.5" in tex

    out = tmp_path / "alpaca.json"
    out.write_text("\n".join(json.dumps({"output": "x" * n})
                             for n in (3, 10, 5)))
    assert alpaca_median_length(str(out)) == 5
