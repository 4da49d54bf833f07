"""Tokenizer fixtures for parity tests.

`make_tokenizer("bpe")` builds a small hand-crafted BPE (via the installed
`tokenizers` library — no network, no vocab files) whose merge table is
deliberately adversarial: it contains merges that span the GritLM template
boundaries (EMBED_BOS/ASSISTANT_BOS end with "\n"; we merge that "\n" with
capital text openers). This breaks the reference's instruction-prefix
assumption (tokenize(instr) being a token-prefix of tokenize(instr+text),
reference gritlm/gritlm.py:144-153, gritlm/training/data.py:262-266) and so
exercises the detect-and-correct path in gritlm_tpu.tokenizer.
"""

from gritlm_tpu.tokenizer import ByteTokenizer, HFTokenizer

# printable ASCII + newline covers every string the tests use
_ALPHABET = ["\n"] + [chr(c) for c in range(0x20, 0x7F)]

# (a, b) merge pairs, priority = list order. Merged tokens referenced by a
# later merge must be produced by an earlier one.
_MERGES = [
    # multi-char template fragments (instruction tokenizes to >1-char tokens)
    ("<", "|"), ("|", ">"),
    ("u", "s"), ("us", "e"), ("use", "r"),
    ("e", "m"), ("em", "b"), ("emb", "e"), ("embe", "d"),
    ("a", "s"), ("as", "s"), ("i", "s"), ("ass", "is"), ("assis", "t"),
    # BOUNDARY-SPANNING merges: the template glue ends with "\n"; these fuse
    # that trailing newline with a capital first letter of the payload text
    ("\n", "B"), ("\n", "G"), ("\n", "W"), ("\n", "A"),
    ("\n", "T"), ("\n", "P"), ("\n", "H"), ("\n", "R"),
    # ordinary in-text merges so real words compress too
    ("t", "h"), ("th", "e"), ("i", "n"), ("o", "n"), ("a", "n"),
    ("e", "r"), ("o", "r"), ("r", "e"), ("a", "t"), ("e", "n"),
    (" ", "the"), ("in", "g"),
]


def make_bpe_tokenizer() -> HFTokenizer:
    from tokenizers import Tokenizer, decoders, models

    vocab = {}
    for ch in _ALPHABET:
        vocab[ch] = len(vocab)
    for a, b in _MERGES:
        assert a in vocab and b in vocab, (a, b)
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=list(_MERGES)))
    # added tokens match atomically in raw text, so the literal "<s>"/"</s>"
    # in the GritLM templates map to bos/eos ids like ByteTokenizer does
    tok.add_special_tokens(["<s>", "</s>"])
    tok.decoder = decoders.Fuse()
    return HFTokenizer(
        tok,
        bos_token_id=tok.token_to_id("<s>"),
        eos_token_id=tok.token_to_id("</s>"),
        pad_token_id=None,  # pad falls back to eos
    )


def make_tokenizer(kind: str):
    if kind == "byte":
        return ByteTokenizer()
    if kind == "bpe":
        return make_bpe_tokenizer()
    raise ValueError(kind)
