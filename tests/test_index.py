import jax
import numpy as np
import pytest

from gritlm_tpu.index import FlatIndex


def _random_unit(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_exact_topk_matches_numpy():
    docs = _random_unit(500, 64, 0)
    queries = _random_unit(7, 64, 1)
    idx = FlatIndex(64, 500, dtype=np.float32)
    idx.add(docs, [{"id": i} for i in range(500)])
    scores, ids = idx.search(queries, k=10)
    ref = queries @ docs.T
    ref_ids = np.argsort(-ref, axis=1)[:, :10]
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(scores, np.take_along_axis(ref, ref_ids, 1), atol=1e-5)


def test_bf16_storage_close_to_exact():
    docs = _random_unit(300, 32, 2)
    queries = _random_unit(5, 32, 3)
    idx = FlatIndex(32, 300)  # bf16 default
    idx.add(docs)
    _, ids = idx.search(queries, k=5)
    ref_ids = np.argsort(-(queries @ docs.T), axis=1)[:, :5]
    # top-1 must agree despite bf16 storage
    np.testing.assert_array_equal(ids[:, 0], ref_ids[:, 0])


def test_incremental_add_and_padding():
    docs = _random_unit(100, 16, 4)
    idx = FlatIndex(16, 100, pad_to=64)  # capacity rounds to 128
    idx.add(docs[:30])
    idx.add(docs[30:])
    assert idx.n_docs == 100 and idx.capacity == 128
    q = docs[:3]
    _, ids = idx.search(q, k=1)
    np.testing.assert_array_equal(ids[:, 0], [0, 1, 2])  # self-retrieval


def test_overflow_raises():
    idx = FlatIndex(8, 10, pad_to=8)
    with pytest.raises(ValueError):
        idx.add(_random_unit(32, 8))


def test_search_passages():
    docs = _random_unit(50, 16, 5)
    idx = FlatIndex(16, 50, dtype=np.float32)
    idx.add(docs, [{"text": f"doc {i}", "title": f"t{i}"} for i in range(50)])
    docs_out, scores = idx.search_passages(docs[:2], k=3)
    assert docs_out[0][0]["text"] == "doc 0"
    assert docs_out[1][0]["text"] == "doc 1"
    assert scores.shape == (2, 3)


def test_save_load_roundtrip(tmp_path):
    docs = _random_unit(60, 16, 6)
    idx = FlatIndex(16, 60, dtype=np.float32)
    idx.add(docs, [{"text": f"d{i}"} for i in range(60)])
    idx.save(str(tmp_path), total_shards=4)
    idx2 = FlatIndex.load(str(tmp_path), dtype=np.float32)
    assert idx2.n_docs == 60 and len(idx2.passages) == 60
    s1, i1 = idx.search(docs[:4], k=5)
    s2, i2 = idx2.search(docs[:4], k=5)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_index_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
    docs = _random_unit(512, 32, 7)
    idx = FlatIndex(32, 512, mesh=mesh, dtype=np.float32, pad_to=512)
    idx.add(docs)
    queries = _random_unit(9, 32, 8)
    scores, ids = idx.search(queries, k=7)
    ref_ids = np.argsort(-(queries @ docs.T), axis=1)[:, :7]
    np.testing.assert_array_equal(ids, ref_ids)


def test_segment_pruned_exact_matches_global_topk():
    """Corpora wider than 2k segments take the segment-pruned exact path
    (k largest-max segments provably cover the top-k, incl. the -inf
    capacity padding); results must be identical to a global sort."""
    idx = FlatIndex(16, 640, dtype=np.float32, pad_to=64)
    idx.EXACT_SEGMENT = 16  # force pruning (640/16 = 40 segs > 2*10)
    docs = _random_unit(600, 16, 11)
    idx.add(docs)
    queries = _random_unit(7, 16, 12)
    scores, ids = idx.search(queries, k=10, mode="exact")
    ref = np.argsort(-(queries @ docs.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ids, ref)
    np.testing.assert_allclose(
        scores, np.take_along_axis(queries @ docs.T, ref, axis=1), atol=1e-5
    )


def test_pallas_fused_search_interpret_parity():
    """The fused Pallas scores+segmax pass (TPU pass-1) must match the
    einsum path exactly — run here in interpret mode on CPU. Covers the
    n_docs validity mask inside the kernel (n_docs < capacity tail) and
    the transposed segmax layout."""
    dim, cap = 128, 2048  # capacity % PALLAS_TILE_N == 0
    docs = _random_unit(1900, dim, 31)  # ragged tail: 148 masked rows
    queries = _random_unit(16, dim, 32)  # Q % 8 == 0

    ref = FlatIndex(dim, cap, dtype=np.float32)
    ref.add(docs)
    rs, ri = ref.search(queries, k=10, mode="exact")

    idx = FlatIndex(dim, cap, dtype=np.float32)
    idx.add(docs)
    idx._search_fn, _ = idx._make_search(interpret_pallas=True)
    ps, pi = idx.search(queries, k=10, mode="exact")

    np.testing.assert_allclose(ps, rs, atol=1e-5)
    np.testing.assert_array_equal(pi, ri)


def test_pruned_path_non_multiple_capacity():
    """pad_to=64 with capacity not a multiple of EXACT_SEGMENT must still
    take the pruned path (score row padded with -inf to the next SEG
    multiple), not the global-sort fallback — ADVICE r4: at 1M docs the
    fallback is ~minutes. Parity vs numpy over the ragged tail."""
    idx = FlatIndex(16, 570, dtype=np.float32, pad_to=64)  # capacity 576
    idx.EXACT_SEGMENT = 33  # 576 % 33 = 15: exercises the -inf pad branch
    docs = _random_unit(570, 16, 21)
    idx.add(docs)
    queries = _random_unit(5, 16, 22)
    scores, ids = idx.search(queries, k=8, mode="exact")
    ref = np.argsort(-(queries @ docs.T), axis=1)[:, :8]
    np.testing.assert_array_equal(ids, ref)
    np.testing.assert_allclose(
        scores, np.take_along_axis(queries @ docs.T, ref, axis=1), atol=1e-5
    )
