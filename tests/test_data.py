import json

import numpy as np
import pytest

from gritlm_tpu.tokenizer import ByteTokenizer
from gritlm_tpu.training import templates as T
from gritlm_tpu.training.data import (
    GritCollator,
    GritDataset,
    batch_iterator,
    homogeneous_batches,
    load_train_dirs,
)


def make_emb_rows(n, tag):
    return [
        {
            "query": [f"instr {tag}", f"query {tag} {i}"],
            "pos": [[f"instr {tag}", f"positive {tag} {i}"]],
            "neg": [[f"instr {tag}", f"negative {tag} {i} {j}"] for j in range(3)],
        }
        for i in range(n)
    ]


def make_gen_rows(n, tag):
    return [
        {"text": [f"question {tag} {i}", f"answer {tag} {i}"]} for i in range(n)
    ]


@pytest.fixture
def toy_dirs(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "emb_a.jsonl").write_text(
        "\n".join(json.dumps(r) for r in make_emb_rows(20, "a"))
    )
    (d / "emb_b.jsonl").write_text(
        "\n".join(json.dumps(r) for r in make_emb_rows(12, "b"))
    )
    (d / "gen.jsonl").write_text(
        "\n".join(json.dumps(r) for r in make_gen_rows(16, "g"))
    )
    return str(d)


def test_load_and_split(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    assert len(emb_sets) == 2 and len(gen_sets) == 1
    assert len(emb_sets[0]) == 20 and len(gen_sets[0]) == 16


def test_dataset_unified_pairing(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    ds = GritDataset(emb_sets, gen_sets, mode="unified", train_group_size=3, seed=0)
    assert len(ds) == 32  # max(32 emb, 16 gen)
    q, ps, g = ds[0]
    assert q[1].startswith("query")
    assert len(ps) == 3  # 1 pos + 2 negs
    assert ps[0][1].startswith("positive")
    # out-of-range generative index redraws randomly instead of crashing
    q2, _, g2 = ds[31]
    assert g2 is not None


def test_dataset_neg_oversampling(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    ds = GritDataset(emb_sets, gen_sets, mode="embedding", train_group_size=8, seed=0)
    _, ps, _ = ds[0]
    assert len(ps) == 8  # 3 negs cycled up to 7


def test_templates_embed():
    full, prefix = T.format_embed(("Retrieve docs", "the text"))
    assert full == "<s><|user|>\nRetrieve docs\n<|embed|>\nthe text"
    assert full.startswith(prefix)
    full2, prefix2 = T.format_embed(("", "plain"))
    assert full2 == "<s><|embed|>\nplain"


def test_templates_generative_multiturn():
    full, segs = T.format_generative(["q1", "a1", "q2", "a2"])
    assert full == (
        "<s><|user|>\nq1\n<|assistant|>\na1</s>\n<|user|>\nq2\n<|assistant|>\na2</s>"
    )
    assert "".join(s for s, _ in segs) == full
    assert [l for _, l in segs] == [False, True, False, True]


def test_collator_shapes_and_masking(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    ds = GritDataset(emb_sets, gen_sets, mode="unified", train_group_size=2, seed=0)
    coll = GritCollator(
        ByteTokenizer(), query_max_len=64, passage_max_len=96, generative_max_len=128
    )
    batch = coll([ds[i] for i in range(4)])
    assert batch["query"]["input_ids"].shape == (4, 64)  # static widths
    assert batch["passage"]["input_ids"].shape == (8, 96)
    assert batch["generative"]["input_ids"].shape == (4, 128)
    # instruction tokens precede the text and are masked for pooling
    il = batch["query"]["instruction_lens"]
    assert (il > 0).all()
    # labels: user turn masked, assistant turn supervised, pads -100
    lab = batch["generative"]["labels"]
    ids = batch["generative"]["input_ids"]
    mask = batch["generative"]["attention_mask"]
    tok = ByteTokenizer()
    for i in range(4):
        n = int(mask[i].sum())
        assert (lab[i, :n] == -100).any() and (lab[i, :n] != -100).any()
        assert (lab[i, n:] == -100).all()
        sup = lab[i][lab[i] != -100]
        # supervised tokens are exactly the assistant answer + </s>
        text = tok.decode(sup, skip_special_tokens=True)
        assert text.startswith("answer")


def test_collator_prefixlm(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    ds = GritDataset(emb_sets, gen_sets, mode="generative", seed=0)
    coll = GritCollator(ByteTokenizer(), generative_max_len=128, prefixlm=True)
    multi = [(None, None, ["q1", "a1", "q2", "a2"])]
    batch = coll(multi)
    lab = batch["generative"]["labels"][0]
    sup = lab[lab != -100]
    text = ByteTokenizer().decode(sup)
    assert text == "a2"  # only the final assistant utterance is supervised


def test_collator_take_nth(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    ds = GritDataset(emb_sets, gen_sets, mode="unified", seed=0)
    coll = GritCollator(ByteTokenizer(), query_max_len=64, passage_max_len=64,
                        generative_max_len=64, take_nth=2)
    batch = coll([ds[i] for i in range(4)])
    assert batch["generative"]["input_ids"].shape[0] == 2
    assert batch["query"]["input_ids"].shape[0] == 4


def test_homogeneous_batches():
    rng = np.random.default_rng(0)
    batches = list(homogeneous_batches([10, 15, 5], 4, rng))
    # 2 + 3 + 1 full single-set + (2+3+1 leftover = 6 → 1 mixed)
    assert len(batches) == 7
    offs = [(0, 10), (10, 25), (25, 30)]
    single = 0
    for b in batches:
        srcs = {next(i for i, (lo, hi) in enumerate(offs) if lo <= x < hi) for x in b}
        single += len(srcs) == 1
    assert single >= 6  # all but the mixed leftover batch
    all_idx = [x for b in batches for x in b]
    assert len(all_idx) == len(set(all_idx))  # no duplicates


def test_batch_iterator_end_to_end(toy_dirs):
    emb_sets, gen_sets = load_train_dirs([toy_dirs])
    ds = GritDataset(emb_sets, gen_sets, mode="unified", seed=0)
    coll = GritCollator(ByteTokenizer(), query_max_len=64, passage_max_len=64,
                        generative_max_len=64)
    batches = list(batch_iterator(ds, coll, 4, seed=0))
    assert len(batches) >= 7
    for b in batches:
        assert b["query"]["input_ids"].shape == (4, 64)


def test_unified_sampler_covers_generative_tail(toy_dirs):
    """When the generative corpus is larger than the embedding corpus, the
    batch iterator must still sample generative rows past the embedding
    range (regression: the tail was silently dropped)."""
    from gritlm_tpu.tokenizer import ByteTokenizer
    from gritlm_tpu.training.data import (
        GritCollator,
        GritDataset,
        batch_iterator,
    )

    emb = [[{"query": f"q{i}", "pos": [f"p{i}"], "neg": [f"n{i}"]}
            for i in range(4)]]
    gen = [[{"text": [f"user {i}", f"assistant {i}"]} for i in range(16)]]
    ds = GritDataset(emb, gen, mode="unified", train_group_size=2)
    assert len(ds) == 16
    coll = GritCollator(ByteTokenizer(), query_max_len=16, passage_max_len=16,
                        generative_max_len=32)
    n = sum(
        b["generative"]["input_ids"].shape[0]
        for b in batch_iterator(ds, coll, batch_size=4, seed=0)
    )
    assert n == 16  # all generative rows seen once per epoch
