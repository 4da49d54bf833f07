"""RAG task plugin + corpus loading tests (reference rag/tasks/*, rag/index.py:147-218)."""

import json

import pytest

from gritlm_tpu.rag.corpus import (
    limit_passages,
    load_passages,
    passage_text,
    synthetic_passages,
)
from gritlm_tpu.rag.tasks import (
    batch_iterator,
    data_iterator,
    filter_results_by_id,
    get_task,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path)


def test_qa_task_process_and_eval():
    task = get_task("qa")
    ex = task.process({"question": "who?", "answers": ["Ada Lovelace", "Ada"]})
    assert ex["query"] == "who?"
    assert ex["target"] in ("Ada Lovelace", "Ada")
    assert ex["passages"] == [{"title": "", "text": ""}]
    m = task.evaluation("the answer is Ada", ["Ada Lovelace", "Ada"])
    assert m["exact_match"] == 0.0
    assert m["match"] == 1.0
    assert 0 < m["f1"] <= 1.0


def test_base_task_requires_fields():
    task = get_task("base")
    with pytest.raises(ValueError):
        task.process({"query": "q"})
    ex = task.process({"query": "q", "target": "t"})
    assert ex["passages"]


def test_unknown_task():
    with pytest.raises(ValueError):
        get_task("nope")


def test_data_iterator_sharding(tmp_path):
    f = _write_jsonl(tmp_path / "d.jsonl", [{"i": i} for i in range(10)])
    all_rows = list(data_iterator(f))
    assert [r["i"] for r in all_rows] == list(range(10))
    shard0 = [r["i"] for r in data_iterator(f, shard_rank=0, shard_count=3)]
    shard1 = [r["i"] for r in data_iterator(f, shard_rank=1, shard_count=3)]
    shard2 = [r["i"] for r in data_iterator(f, shard_rank=2, shard_count=3)]
    assert sorted(shard0 + shard1 + shard2) == list(range(10))
    assert not (set(shard0) & set(shard1))


def test_data_iterator_repeat_small(tmp_path):
    f = _write_jsonl(tmp_path / "one.jsonl", [{"i": 0}])
    # 1 example, 4 shards: re-reads until every shard has seen >= 1 example
    got = list(data_iterator(f, shard_rank=3, shard_count=4,
                             repeat_if_less_than_shard_count=True))
    assert len(got) == 1


def test_batch_iterator():
    rows = [{"q": f"q{i}", "a": i} for i in range(5)]
    batches = list(batch_iterator(iter(rows), batch_size=2))
    assert [b["__size__"] for b in batches] == [2, 2, 1]
    assert batches[0]["q"] == ["q0", "q1"]
    assert list(batch_iterator(iter(rows), batch_size=2, drop_last=True))[-1]["__size__"] == 2


def test_filter_results_by_id():
    passages = [[{"id": "a"}, {"id": "b"}, {"id": "c"}]]
    scores = [[3.0, 2.0, 1.0]]
    p, s = filter_results_by_id([{"id": "b"}], passages, scores, topk=2)
    assert [x["id"] for x in p[0]] == ["a", "c"]
    assert s[0] == [3.0, 1.0]
    # too few after filtering → violator re-appended
    p, s = filter_results_by_id([{"id": "b"}], passages, scores, topk=3)
    assert [x["id"] for x in p[0]] == ["a", "c", "b"]
    # no metadata → passthrough top-k
    p, s = filter_results_by_id(None, passages, scores, topk=1)
    assert [x["id"] for x in p[0]] == ["a"]


def test_load_passages(tmp_path):
    f = _write_jsonl(tmp_path / "p.jsonl", [
        {"id": 0, "title": "T", "section": "S", "text": "body"},
        {"id": 1, "title": "U", "text": "more"},
        {"id": 2, "title": "V", "section": "", "text": "x"},
    ])
    ps = load_passages(f)
    assert ps[0]["title"] == "T: S"          # title+section merge
    assert ps[1]["title"] == "U"
    assert ps[2]["title"] == "V"             # empty section not merged
    assert passage_text(ps[0]) == "T: S body"
    assert len(load_passages(f, maxload=2)) == 2
    sh = load_passages(f, shard_rank=1, shard_count=2)
    assert [p["id"] for p in sh] == [1]
    assert [p["id"] for p in limit_passages(ps, limit=2, limit_start=1)] == [1]


def test_synthetic_passages(tmp_path):
    ps = synthetic_passages(8)
    assert len(ps) == 1 and "lorem" in ps[0]["text"]
    f = tmp_path / "doc.txt"
    f.write_text("custom doc body")
    assert synthetic_passages(str(f))[0]["text"] == "custom doc body"


def test_prepare_nq(tmp_path):
    from gritlm_tpu.rag.prepare_qa import prepare_nq

    orig = tmp_path / "orig"
    orig.mkdir()
    _write_jsonl(orig / "NQ-open.train.jsonl",
                 [{"question": f"q{i}", "answer": [f"a{i}"]} for i in range(10)])
    _write_jsonl(orig / "NQ-open.dev.jsonl",
                 [{"question": "qd", "answer": ["ad", "ad2"]}])
    counts = prepare_nq(str(orig), str(tmp_path / "out"),
                        dev_fraction_from_train=3, fewshot_seed=0, fewshot_k=4)
    assert counts == {"train": 7, "dev": 3, "test": 1, "train.4-shot": 4}
    row = json.loads((tmp_path / "out" / "test.jsonl").read_text().strip())
    assert row == {"question": "qd", "answers": ["ad", "ad2"]}
    # output feeds straight into the QA task
    task = get_task("qa")
    ex = task.process(row)
    assert ex["query"] == "qd"


def test_prepare_triviaqa(tmp_path):
    from gritlm_tpu.rag.prepare_qa import prepare_triviaqa

    d = tmp_path / "orig" / "triviaqa-unfiltered"
    d.mkdir(parents=True)
    mk = lambda i: {"Question": f"tq{i}", "Answer": {"Aliases": [f"x{i}", f"y{i}"]}}
    (d / "unfiltered-web-train.json").write_text(
        json.dumps({"Data": [mk(i) for i in range(6)]}))
    (d / "unfiltered-web-dev.json").write_text(
        json.dumps({"Data": [mk(10)]}))
    idx = tmp_path / "idx"
    idx.mkdir()
    (idx / "TQA.train.idx.json").write_text("[0, 2, 4]")
    (idx / "TQA.dev.idx.json").write_text("[1]")
    (idx / "TQA.test.idx.json").write_text("[0]")
    counts = prepare_triviaqa(str(tmp_path / "orig"), str(tmp_path / "out"),
                              index_dir=str(idx))
    assert counts == {"train": 3, "dev": 1, "test": 1}
    test_row = json.loads((tmp_path / "out" / "test.jsonl").read_text().strip())
    assert test_row["question"] == "tq10" and test_row["answers"] == ["x10", "y10"]
