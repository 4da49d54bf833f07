import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.gritlm import GritLM
from gritlm_tpu.rag import CacheMode, RAGEngine
from gritlm_tpu.rag.metrics import (
    evaluate_answers,
    exact_match_score,
    f1_score,
    match_score,
    normalize_answer,
)


def test_normalize():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("A cat") == "cat"


def test_em_match_f1():
    assert exact_match_score("Paris", ["paris", "London"]) == 1.0
    assert exact_match_score("in Paris", ["Paris"]) == 0.0
    assert match_score("the answer is Paris.", ["Paris"]) == 1.0
    assert f1_score("Paris France", ["Paris"]) == pytest.approx(2 / 3)
    m = evaluate_answers(["Paris", "dog"], [["Paris"], ["cat"]])
    assert m["exact_match"] == 50.0 and m["f1"] == 50.0


@pytest.fixture(scope="module")
def engine():
    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    eng = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    passages = [
        {"title": "geo", "text": f"fact number {i} about place {i}"} for i in range(8)
    ]
    eng.build_index(passages, batch_size=4)
    return eng


@pytest.mark.parametrize(
    "mode",
    [
        CacheMode.NO_RETRIEVAL,
        CacheMode.PROMPT_QUERY_DOC,
        CacheMode.PROMPT_DOC_QUERY,
        CacheMode.QUERY,
        CacheMode.DOC,
        CacheMode.QUERYDOC,
        CacheMode.DOCQUERY,
    ],
)
def test_all_rag_modes_run(engine, mode):
    r = engine.answer("what is fact number 3?", mode=mode)
    assert isinstance(r.answer, str)
    assert r.seconds > 0
    if mode != CacheMode.NO_RETRIEVAL:
        assert len(r.passages) == 1


def test_doc_cache_reused(engine):
    engine._doc_cache.clear()
    engine.answer("what is fact number 2?", mode=CacheMode.DOC)
    n_after_first = len(engine._doc_cache)
    engine.answer("what is fact number 2?", mode=CacheMode.DOC)
    assert len(engine._doc_cache) == n_after_first  # cache hit, no re-encode


def test_evaluate_schema(engine):
    m = engine.evaluate(
        ["q one", "q two"], [["gold"], ["gold"]], mode=CacheMode.NO_RETRIEVAL
    )
    for key in ("exact_match", "match", "f1", "avg_seconds", "std_seconds",
                "total_seconds", "n", "predictions"):
        assert key in m
    assert m["n"] == 2


def test_answer_batch_matches_single(engine):
    """Batched answering must produce the same answers as the per-query path
    in every cache mode."""
    queries = ["what is the first doc about?", "tell me about topic two"]
    for mode in ("no_retrieval", "prompt_query_doc", "prompt_doc_query",
                 "query", "doc", "docquery", "querydoc"):
        batch = engine.answer_batch(queries, mode=mode, max_new_tokens=4)
        singles = [engine.answer(q, mode=mode, max_new_tokens=4)
                   for q in queries]
        assert len(batch) == 2
        for b, s in zip(batch, singles):
            assert b.answer == s.answer, mode
            if mode != "no_retrieval":
                assert [p.get("text") for p in b.passages] == \
                       [p.get("text") for p in s.passages], mode


def test_evaluate_batched(engine):
    m = engine.evaluate(
        ["q one?", "q two?"], [["nothing"], ["nothing"]],
        mode="prompt_query_doc", max_new_tokens=4, batch_size=2,
    )
    assert m["n"] == 2 and len(m["predictions"]) == 2


def test_rag_engine_multichip_end_to_end():
    """Full RAG serving over a virtual mesh: sharded params, sharded encode,
    mesh-sharded flat index, sharded generation — answers must match the
    single-device engine exactly (greedy decode, same weights)."""
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    docs = [
        {"title": f"t{i}", "text": f"Document body number {i} talks about "
                                   f"topic {i % 3}."}
        for i in range(9)
    ]
    queries = ["what is topic 1?", "tell me about number 4.",
               "document zero?"]

    m_one = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    e_one = RAGEngine(m_one, max_new_tokens=4, encode_max_length=64)
    e_one.build_index(docs, batch_size=4, cache_docs=True)

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m_mesh = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                    mesh=mesh)
    e_mesh = RAGEngine(m_mesh, max_new_tokens=4, encode_max_length=64)
    e_mesh.build_index(docs, batch_size=4, mesh=mesh, cache_docs=True)

    for mode in (CacheMode.PROMPT_QUERY_DOC, CacheMode.DOC):
        r1 = e_one.answer_batch(list(queries), mode=mode)
        r2 = e_mesh.answer_batch(list(queries), mode=mode)
        assert [r.answer for r in r1] == [r.answer for r in r2], mode
        assert [r.passages for r in r1] == [r.passages for r in r2], mode


def test_rebuild_invalidates_doc_caches():
    """build_index on a new corpus must drop every doc-id-keyed cache: a
    stale per-doc / stacked cache from the old corpus must never be served
    for the new corpus's doc ids (review finding)."""
    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc")
    eng = RAGEngine(model, max_new_tokens=4, encode_max_length=64)

    corpus_a = [{"title": "", "text": f"alpha document {i}"} for i in range(4)]
    eng.build_index(corpus_a, batch_size=4, cache_docs=True)
    ra = eng.answer_batch(["alpha?"], mode=CacheMode.DOC)
    assert eng._doc_store  # populated for corpus A

    corpus_b = [{"title": "", "text": f"beta passage {i}"} for i in range(4)]
    eng.build_index(corpus_b, batch_size=4, cache_docs=False)
    assert not eng._doc_store and not eng._doc_cache
    assert eng._stacked_last is None
    rb = eng.answer_batch(["beta?"], mode=CacheMode.DOC)
    # the served passage comes from corpus B, and the on-the-fly encode was
    # for that passage (no stale A-cache could exist)
    assert "beta" in rb[0].passages[0]["text"]

    # reference (independent engine) on corpus B must agree exactly
    eng2 = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    eng2.build_index(corpus_b, batch_size=4, cache_docs=False)
    rb2 = eng2.answer_batch(["beta?"], mode=CacheMode.DOC)
    assert rb[0].answer == rb2[0].answer


def test_doc_store_persistence_load_then_serve(tmp_path):
    """VERDICT r2 item 7: the doc-cache store persists alongside the index
    and a fresh engine serves doc-cache modes WITHOUT ever re-encoding the
    corpus (build-once semantics of the reference's doc_map,
    rag/eval.py:124-150). The loaded path must produce identical answers."""
    from gritlm_tpu.index.flat import FlatIndex

    docs = [{"title": f"t{i}", "text": f"stored doc {i} about item {i}"}
            for i in range(6)]
    queries = ["what is item 2?", "stored doc 5?"]

    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    eng = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    eng.build_index(docs, batch_size=4, cache_docs=True)
    gold = [r.answer for r in eng.answer_batch(list(queries),
                                               mode=CacheMode.DOC)]
    eng.index.save(str(tmp_path / "idx"))
    eng.save_doc_store(str(tmp_path / "idx" / "doc_store.npz"))

    eng2 = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    eng2.index = FlatIndex.load(str(tmp_path / "idx"))
    n = eng2.load_doc_store(str(tmp_path / "idx" / "doc_store.npz"))
    assert n == len(docs)

    # serving must never encode with KV capture again (query encodes in DOC
    # mode don't capture a cache; any get_cache=True call means a corpus
    # re-encode happened)
    orig_encode = eng2.model.encode

    def guarded_encode(*a, **kw):
        assert not kw.get("get_cache"), "corpus cache was re-encoded"
        return orig_encode(*a, **kw)

    eng2.model.encode = guarded_encode
    try:
        got = [r.answer for r in eng2.answer_batch(list(queries),
                                                   mode=CacheMode.DOC)]
    finally:
        eng2.model.encode = orig_encode
    assert got == gold


@pytest.mark.parametrize("kv_quant", [False, True])
def test_device_pool_matches_host_fetch(kv_quant):
    """The device-resident doc-cache pool (jitted gather, no per-call KV
    re-upload) must be value-identical to the host stack+device_put path:
    same k/v/mask/scales on every valid slot, same answers in all three
    doc-cache modes — including ragged doc widths and int8 stores."""
    import jax

    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                   kv_quant=kv_quant)
    docs = [{"title": f"t{i}", "text": "doc " + "word " * (3 + 5 * i)}
            for i in range(5)]  # ragged widths
    queries = ["what is doc 1?", "tell me about doc 4"]

    pooled = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    pooled.build_index(docs, batch_size=4, cache_docs=True)
    assert pooled._device_pool.get(False) is not None  # pinned at build

    host = RAGEngine(model, max_new_tokens=4, encode_max_length=64,
                     doc_pool_bytes=0)  # forces the host fetch path
    host.index = pooled.index
    host._doc_store = pooled._doc_store
    host._device_pool = {}

    ids = [0, 3, 1]
    a = pooled._fetch_doc_caches(ids, False)
    b = host._fetch_doc_caches(ids, False)
    assert host._device_pool[False] is None  # over budget → not pinned
    Wb = b.k.shape[2]  # host stacks to the batch max; pool to the corpus max
    np.testing.assert_array_equal(np.asarray(a.mask)[:, :Wb], np.asarray(b.mask))
    assert not np.asarray(a.mask)[:, Wb:].any()
    for i in range(len(ids)):
        w = int(np.asarray(b.mask)[i].sum())
        np.testing.assert_array_equal(
            np.asarray(a.k[:, i, :w]), np.asarray(b.k[:, i, :w]))
        np.testing.assert_array_equal(
            np.asarray(a.v[:, i, :w]), np.asarray(b.v[:, i, :w]))
        if kv_quant:
            np.testing.assert_array_equal(
                np.asarray(a.k_scale[:, i, :, :w]),
                np.asarray(b.k_scale[:, i, :, :w]))
            np.testing.assert_array_equal(
                np.asarray(a.v_scale[:, i, :, :w]),
                np.asarray(b.v_scale[:, i, :, :w]))

    for mode in (CacheMode.DOC, CacheMode.QUERYDOC, CacheMode.DOCQUERY):
        if mode == CacheMode.QUERYDOC:
            pooled.precompute_all_doc_caches(after_query=True)
            host._doc_store = pooled._doc_store
            host._device_pool = {}
        got = [r.answer for r in pooled.answer_batch(list(queries), mode=mode)]
        want = [r.answer for r in host.answer_batch(list(queries), mode=mode)]
        assert got == want, mode


def test_device_pool_invalidated_when_store_grows():
    """New store entries (serve() on unseen docs) must drop the pinned pool
    so fetches never serve stale rows."""
    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    eng = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    docs = [{"title": "", "text": f"growing doc {i}"} for i in range(4)]
    eng.build_index(docs, batch_size=4)  # no cache_docs
    eng._ensure_doc_entries([0, 1])
    c = eng._fetch_doc_caches([0, 1], False)  # lazily pins a 2-doc pool
    assert c is not None and eng._device_pool.get(False) is not None
    assert len(eng._device_pool[False][0]) == 2
    eng._ensure_doc_entries([2, 3])  # store grows → pool dropped
    c = eng._fetch_doc_caches([0, 3], False)  # re-pins over all 4 docs
    assert c is not None and len(eng._device_pool[False][0]) == 4


def test_doc_store_roundtrip_int8(tmp_path):
    """Quantized (int8 KV) doc stores round-trip bit-exactly."""
    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                   kv_quant=True)
    eng = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    docs = [{"title": "", "text": f"quantized doc {i}"} for i in range(3)]
    eng.build_index(docs, batch_size=4, cache_docs=True)
    path = str(tmp_path / "store.npz")
    eng.save_doc_store(path)
    eng2 = RAGEngine(model, max_new_tokens=4, encode_max_length=64)
    eng2.index = eng.index
    assert eng2.load_doc_store(path) == len(eng._doc_store)
    for key, (k, v, w, ks, vs) in eng._doc_store.items():
        k2, v2, w2, ks2, vs2 = eng2._doc_store[key]
        assert w2 == w
        np.testing.assert_array_equal(k2, k)
        np.testing.assert_array_equal(v2, v)
        assert (ks is None) == (ks2 is None)
        if ks is not None:
            np.testing.assert_array_equal(ks2, ks)
            np.testing.assert_array_equal(vs2, vs)


@pytest.mark.parametrize(
    "mode", [CacheMode.PROMPT_QUERY_DOC, CacheMode.DOCQUERY, CacheMode.DOC]
)
def test_speculative_answers_match_plain(engine, mode):
    """speculative=True must produce byte-identical (greedy) answers in
    every cache mode, including concat-cache continuation."""
    eng_spec = RAGEngine(
        engine.model, index=engine.index, max_new_tokens=8,
        encode_max_length=64, speculative=True, spec_k=3, spec_ngram=2,
    )
    eng_plain = RAGEngine(
        engine.model, index=engine.index, max_new_tokens=8,
        encode_max_length=64,
    )
    qs = ["what is fact number 3?", "tell me about place 5"]
    a_spec = [r.answer for r in eng_spec.answer_batch(qs, mode=mode)]
    a_plain = [r.answer for r in eng_plain.answer_batch(qs, mode=mode)]
    assert a_spec == a_plain


def test_speculative_rejects_min_new_tokens():
    model = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    with pytest.raises(ValueError, match="greedy-only"):
        RAGEngine(model, min_new_tokens=2, speculative=True)


def test_speculative_multichip_matches_single_device():
    """Speculative decoding under a sharded mesh (rows over data x fsdp)
    must equal the single-device speculative answers — the while_loop +
    per-row scatter path has to compile and stay exact under GSPMD."""
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    docs = [
        {"title": f"t{i}", "text": f"Repeated fact {i} repeated fact {i}."}
        for i in range(6)
    ]
    queries = ["repeated fact 2?", "what about 5?"]

    m_one = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    e_one = RAGEngine(m_one, max_new_tokens=6, encode_max_length=64,
                      speculative=True, spec_k=3, spec_ngram=2)
    e_one.build_index(docs, batch_size=4)

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m_mesh = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                    mesh=mesh)
    e_mesh = RAGEngine(m_mesh, max_new_tokens=6, encode_max_length=64,
                       speculative=True, spec_k=3, spec_ngram=2)
    e_mesh.build_index(docs, batch_size=4, mesh=mesh)

    for mode in (CacheMode.PROMPT_QUERY_DOC, CacheMode.DOC):
        r1 = e_one.answer_batch(list(queries), mode=mode)
        r2 = e_mesh.answer_batch(list(queries), mode=mode)
        assert [r.answer for r in r1] == [r.answer for r in r2], mode

    # paged serving over the SAME mesh (the full composition: retrieved
    # doc caches pinned into shared pool pages, page table sharded over
    # the batch axes, pool replicated, kernel under shard_map) — answers
    # must equal the single-device lockstep doc-cache mode
    e_one.precompute_all_doc_caches(batch_size=4)
    e_mesh._doc_store = e_one._doc_store  # identical caches, bf16-safe
    lockstep = [r.answer for r in e_one.answer_batch(
        list(queries), mode=CacheMode.DOC)]
    kw = dict(max_new_tokens=6, slots=8, chunk_size=2, pool_max_len=512,
              prompt_buckets=(64, 128, 256), paged=True, page_size=16)
    served = e_mesh.serve(list(queries), **kw)
    assert [r.answer for r in served] == lockstep
    spec = e_mesh.serve(list(queries), speculative=True, spec_ngram=2,
                        spec_k=3, **kw)
    assert [r.answer for r in spec] == lockstep


def test_serve_matches_lockstep_doc_mode(engine):
    """Continuous-batching RAG serving (RAGEngine.serve): same doc-store
    caches and positions accounting as answer_batch(mode=DOC), so greedy
    answers must be byte-identical — scheduling is the only difference."""
    eng = RAGEngine(engine.model, index=engine.index, max_new_tokens=4,
                    encode_max_length=64)  # own store; shared fixture stays clean
    eng.precompute_all_doc_caches(batch_size=4)
    qs = ["what is fact number 2?", "tell me about place 5",
          "what is fact number 7?"]
    lockstep = [r.answer
                for r in eng.answer_batch(qs, mode=CacheMode.DOC,
                                          max_new_tokens=6)]
    served = eng.serve(qs, max_new_tokens=6, slots=2, chunk_size=2,
                       pool_max_len=512, prompt_buckets=(64, 128, 256))
    assert [r.answer for r in served] == lockstep
    assert all(r.passages and r.scores for r in served)
    # speculative serving pool (lookup corpus seeded with each passage's
    # tokens): greedy answers must stay byte-identical
    spec = eng.serve(qs, max_new_tokens=6, slots=2, chunk_size=2,
                     pool_max_len=512, prompt_buckets=(64, 128, 256),
                     speculative=True, spec_ngram=2, spec_k=3)
    assert [r.answer for r in spec] == lockstep
    # paged pool: each retrieved doc pins into shared pages once
    # (zero-copy across queries hitting the same doc) — same answers
    pg = eng.serve(qs, max_new_tokens=6, slots=2, chunk_size=2,
                   pool_max_len=512, prompt_buckets=(64, 128, 256),
                   paged=True, page_size=16)
    assert [r.answer for r in pg] == lockstep


def test_serve_encodes_missing_docs_once(engine):
    """serve() on an engine built WITHOUT cache_docs precomputes only the
    hit docs into the store, then reuses them."""
    eng = RAGEngine(engine.model, index=engine.index, max_new_tokens=4,
                    encode_max_length=64)
    assert not eng._doc_store
    qs = ["what is fact number 1?"]
    eng.serve(qs, max_new_tokens=4, slots=1, pool_max_len=512,
              prompt_buckets=(64, 128, 256))
    n_after = len(eng._doc_store)
    assert n_after >= 1
    eng.serve(qs, max_new_tokens=4, slots=1, pool_max_len=512,
              prompt_buckets=(64, 128, 256))
    assert len(eng._doc_store) == n_after


def test_serve_sampling_deterministic(engine):
    """serve(temperature>0): per-query key chains make sampled RAG answers
    deterministic in the seed (and reproducible across pool layouts)."""
    eng = RAGEngine(engine.model, index=engine.index, max_new_tokens=4,
                    encode_max_length=64)
    eng.precompute_all_doc_caches(batch_size=4)
    qs = ["what is fact number 2?", "tell me about place 5"]
    kw = dict(max_new_tokens=6, pool_max_len=512,
              prompt_buckets=(64, 128, 256), temperature=0.8, top_p=0.9,
              seed=123)
    a = [r.answer for r in eng.serve(qs, slots=2, chunk_size=2, **kw)]
    b = [r.answer for r in eng.serve(qs, slots=1, chunk_size=4, **kw)]
    assert a == b
