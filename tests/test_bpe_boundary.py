"""BPE boundary-merge exactness: instruction masking and -100 label masks.

The reference assumes tokenize(instruction) is a token-prefix of
tokenize(instruction + text) (gritlm/gritlm.py:144-153) and asserts the same
in its collator (gritlm/training/data.py:262-266). The hand-crafted BPE
fixture (tests/tok_fixtures.py) has merges spanning the "\n"-terminated
template glue, so that assumption breaks — these tests pin the
detect-and-correct contract: masks stay token-exact anyway.
"""

import numpy as np
import pytest

from gritlm_tpu.tokenizer import instruction_token_lens, prefix_token_len
from gritlm_tpu.training import templates as T
from gritlm_tpu.training.data import GritCollator
from tok_fixtures import make_bpe_tokenizer


@pytest.fixture(scope="module")
def bpe():
    return make_bpe_tokenizer()


def test_fixture_breaks_prefix_assumption(bpe):
    """Guard: the BPE fixture really does merge across the template boundary
    (otherwise the tests below wouldn't exercise the correction)."""
    prefix = T.embed_prefix("Retrieve relevant passages.")
    full = prefix + "Bitcoin is money."
    pi = bpe._encode_one(prefix, False)
    fi = bpe._encode_one(full, False)
    assert fi[: len(pi)] != pi, "fixture no longer spans the boundary"
    k = prefix_token_len(bpe, prefix, fi)
    assert k == len(pi) - 1  # divergence exactly at the boundary token


def test_prefix_token_len_exact_decomposition(bpe):
    """Corrected length k splits the token stream so decode(ids[:k]) is a
    string-prefix of the instruction and decode(ids[k:]) carries the entire
    payload text (nothing embedded is lost to the mask)."""
    prefix = T.embed_prefix("Retrieve relevant passages.")
    for text in ["Bitcoin is money.", "What is a TPU?", "short", "Generative tuning."]:
        fi = bpe._encode_one(prefix + text, False)
        k = prefix_token_len(bpe, prefix, fi)
        head = bpe.decode(fi[:k], skip_special_tokens=False)
        tail = bpe.decode(fi[k:], skip_special_tokens=False)
        assert head + tail == prefix + text
        assert prefix.startswith(head)
        assert tail.endswith(text)  # full payload survives the mask


def test_instruction_token_lens_batch(bpe):
    """Batched detect-and-correct: rows whose text triggers a boundary merge
    get the shortened length; rows that don't keep len(tokenize(instr))."""
    instr = T.gritlm_instruction("Given a query, retrieve the passage")
    # 'Bitcoin' merges with the trailing '\n' ("\nB" in the merge table);
    # 'quartz' (lowercase q) does not
    texts = ["Bitcoin is money.", "quartz is a mineral."]
    enc = bpe([instr + t for t in texts], max_length=128)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    lens = instruction_token_lens(bpe, instr, ids, mask, add_special_tokens=True)
    pref = bpe._encode_one(instr, True)
    assert lens[0] == len(pref) - 1  # corrected
    assert lens[1] == len(pref)  # prefix assumption held
    # masked region decodes to a pure instruction prefix in both rows
    for i, t in enumerate(texts):
        head = bpe.decode(list(ids[i, : lens[i]]), skip_special_tokens=True)
        assert instr.startswith(head)
        n = int(mask[i].sum())
        tail = bpe.decode(list(ids[i, lens[i]:n]), skip_special_tokens=True)
        assert tail.endswith(t)


def test_collator_embed_instruction_lens_exact(bpe):
    """GritCollator's instruction_lens are token-exact under boundary merges:
    the masked head is a string-prefix of the template prefix, and the
    pooled tail still contains the full text to embed."""
    coll = GritCollator(tokenizer=bpe, query_max_len=64, passage_max_len=64)
    samples = [
        ("Retrieve relevant passages.", "Bitcoin is a currency."),
        ("Retrieve relevant passages.", "quartz crystals"),
        "The plain sample has no instruction.",  # str → EMBED_BOS-only prefix
    ]
    feats = [(s, [s], None) for s in samples]
    batch = coll(feats)
    q = batch["query"]
    for i, s in enumerate(samples):
        prompt, prefix = T.format_embed(s)
        n = int(q["attention_mask"][i].sum())
        plen = int(q["instruction_lens"][i])
        head = bpe.decode(list(q["input_ids"][i, :plen]), skip_special_tokens=False)
        tail = bpe.decode(list(q["input_ids"][i, plen:n]), skip_special_tokens=False)
        assert head + tail == prompt[: len(head) + len(tail)]
        assert prefix.startswith(head)
        # the whole payload text is inside the pooled (unmasked) region
        text = prompt[len(prefix):]
        assert tail.endswith(text)


def test_collator_generative_labels_exact(bpe):
    """-100 label masks are token-exact under a boundary merge: ids equal the
    whole-string tokenization (inference consistency), loss tokens decode to
    the assistant answer (+eos, + at most the straddled template glue), and
    no assistant content is ever masked out."""
    coll = GritCollator(tokenizer=bpe, generative_max_len=128)
    # ASSISTANT_BOS ends with "\n" and the answer starts with 'B' → "\nB"
    # straddles the user/assistant boundary
    turns = ["What is money?", "Bitcoin is one answer.",
             "And gold?", "Gold too."]
    batch = coll([(None, None, turns)])["generative"]
    ids, mask, labels = batch["input_ids"][0], batch["attention_mask"][0], batch["labels"][0]
    n = int(mask.sum())

    full, segments = T.format_generative(turns)
    assert list(ids[:n]) == bpe._encode_one(full, False)  # == inference stream

    loss_ids = [int(i) for i, l in zip(ids[:n], labels[:n]) if l != -100]
    masked_ids = [int(i) for i, l in zip(ids[:n], labels[:n]) if l == -100]
    loss_txt = bpe.decode(loss_ids, skip_special_tokens=False)
    masked_txt = bpe.decode(masked_ids, skip_special_tokens=False)
    # every assistant answer fully carries loss (modulo the straddled glue
    # char, which ATTACHES to the answer rather than removing from it)
    for ans in (turns[1], turns[3]):
        assert ans + T.ASSISTANT_EOS in loss_txt
    # no user content leaks into the loss: strip the answers and the
    # straddled glue newlines; nothing of the user turns may remain
    rest = loss_txt
    for ans in (turns[1], turns[3]):
        rest = rest.replace(ans + T.ASSISTANT_EOS, "")
    assert rest.strip("\n") == ""
    # and the masked side is exactly the template+user glue minus that
    for ut in (turns[0], turns[2]):
        assert ut in masked_txt
    # labels equal ids wherever set
    sel = labels[:n] != -100
    np.testing.assert_array_equal(labels[:n][sel], ids[:n][sel])
    # pads are -100
    assert (labels[n:] == -100).all()


def test_labels_match_byte_semantics_when_no_merge(bpe):
    """When no boundary merge fires (lowercase answer start), the whole-
    string alignment reproduces the plain segment-concat labeling."""
    coll = GritCollator(tokenizer=bpe, generative_max_len=128)
    turns = ["what is money?", "it is a medium of exchange."]
    batch = coll([(None, None, turns)])["generative"]
    ids, mask, labels = batch["input_ids"][0], batch["attention_mask"][0], batch["labels"][0]
    n = int(mask.sum())
    _, segments = T.format_generative(turns)
    exp_ids, exp_labels = [], []
    for seg, is_loss in segments:
        si = bpe._encode_one(seg, False)
        exp_ids.extend(si)
        exp_labels.extend(si if is_loss else [-100] * len(si))
    assert list(ids[:n]) == exp_ids
    assert list(labels[:n]) == exp_labels
