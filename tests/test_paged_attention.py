"""Paged decode attention (ops/paged_attention.py) and the paged cache
path through the transformer (models/transformer.PagedKVCache).

Oracle: the same logical K/V laid out densely. Paging (arbitrary physical
page placement via the page table) must be invisible to attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gritlm_tpu.ops.attention import multi_head_attention
from gritlm_tpu.ops.paged_attention import paged_decode


def _paged_from_logical(k_log, v_log, page, rng, quant=False):
    """Chop logical [L, B, Smax, KD] K/V into pages scattered across a
    shuffled physical pool; returns (k_pages, v_pages, page_table,
    k_scale, v_scale). Quant: int8 values with per-(page, head, slot)
    scales built from the logical bf16."""
    L, B, Smax, KD = k_log.shape
    maxp = Smax // page
    n_pages = B * maxp + 3  # a few spare pages stay garbage
    perm = rng.permutation(n_pages)[: B * maxp]
    pt = perm.reshape(B, maxp).astype(np.int32)
    k_pages = rng.normal(size=(L, n_pages, page, KD)).astype(k_log.dtype)
    v_pages = rng.normal(size=(L, n_pages, page, KD)).astype(v_log.dtype)
    for b in range(B):
        for i in range(maxp):
            k_pages[:, pt[b, i]] = k_log[:, b, i * page:(i + 1) * page]
            v_pages[:, pt[b, i]] = v_log[:, b, i * page:(i + 1) * page]
    return k_pages, v_pages, pt


@pytest.mark.parametrize("dh,kv,h", [(16, 2, 4), (64, 2, 4)])
def test_paged_matches_dense_logical(dh, kv, h):
    """paged_decode == masked dense attention over the logical cache.
    dh=16 (KD=32) exercises the gather fallback; dh=64 (KD=128) the
    Pallas kernel (interpret mode on CPU)."""
    L, B, Smax, page = 3, 4, 64, 16 if dh == 16 else 32
    # kernel path needs page in (128, 256, 512) — on CPU interpret any
    # page works through the fallback; force the kernel-legal geometry
    # only when lanes align
    if dh * kv >= 128:
        Smax, page = 512, 128
    KD = kv * dh
    rng = np.random.default_rng(0)
    k_log = rng.normal(size=(L, B, Smax, KD)).astype(np.float32)
    v_log = rng.normal(size=(L, B, Smax, KD)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, h, dh)), jnp.float32)
    # ragged valid lengths incl. a hole (continuation-style)
    mask = np.zeros((B, Smax), np.int32)
    lens = [5, Smax, page + 3, 1]
    for b, n in enumerate(lens):
        mask[b, :n] = 1
    mask[1, 7:9] = 0  # holes must be ignored exactly

    k_pages, v_pages, pt = _paged_from_logical(k_log, v_log, page, rng)
    layer = 1
    got = paged_decode(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(pt),
        jnp.asarray(mask), layer=layer, num_kv_heads=kv,
    )
    want = multi_head_attention(
        q,
        jnp.asarray(k_log[layer]).reshape(B, Smax, kv, dh),
        jnp.asarray(v_log[layer]).reshape(B, Smax, kv, dh),
        jnp.asarray(mask), causal=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_paged_forward_matches_dense_forward():
    """A decode step through forward() with a PagedKVCache must produce
    the same hidden states and append the same K/V as the dense per-row
    path, for bf16 and int8 pools."""
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.models import init_params
    from gritlm_tpu.models.transformer import (
        PagedKVCache,
        forward,
        init_cache,
        init_paged_cache,
    )

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    B, Smax, page = 3, 32, 8
    maxp = Smax // page
    rng = np.random.default_rng(1)

    for quant in (False, True):
        dense = init_cache(cfg, B, Smax, quant=quant)
        # prefill dense rows with ragged prompts
        lens = [5, 11, 2]
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, 16)), jnp.int32)
        m = np.zeros((B, 16), np.int32)
        for b, n in enumerate(lens):
            m[b, :n] = 1
        _, dense, _ = forward(
            params, cfg, ids, attention_mask=jnp.asarray(m),
            causal=True, cache=dense,
        )
        # build the paged pool holding the same logical content: row b's
        # logical chunk i → shuffled physical page
        n_pages = B * maxp + 2
        perm = rng.permutation(n_pages)[: B * maxp].reshape(B, maxp)
        paged = init_paged_cache(
            cfg, B, Smax, n_pages, page=page, quant=quant
        )
        k_p, v_p = np.array(paged.k), np.array(paged.v)
        ks_p = np.array(paged.k_scale) if quant else None
        vs_p = np.array(paged.v_scale) if quant else None
        dk, dv = np.asarray(dense.k), np.asarray(dense.v)
        for b in range(B):
            for i in range(maxp):
                sl = slice(i * page, (i + 1) * page)
                k_p[:, perm[b, i]] = dk[:, b, sl]
                v_p[:, perm[b, i]] = dv[:, b, sl]
                if quant:
                    ks_p[:, perm[b, i]] = np.asarray(dense.k_scale)[:, b, :, sl]
                    vs_p[:, perm[b, i]] = np.asarray(dense.v_scale)[:, b, :, sl]
        paged = PagedKVCache(
            k=jnp.asarray(k_p), v=jnp.asarray(v_p),
            mask=dense.mask, length=jnp.zeros((), jnp.int32),
            page_table=jnp.asarray(perm.astype(np.int32)),
            k_scale=jnp.asarray(ks_p) if quant else None,
            v_scale=jnp.asarray(vs_p) if quant else None,
        )

        tok = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, 1)), jnp.int32)
        offs = jnp.asarray(lens, jnp.int32)
        hd, dense2, _ = forward(
            params, cfg, tok, causal=True, cache=dense, row_offsets=offs,
        )
        hp, paged2, _ = forward(
            params, cfg, tok, causal=True, cache=paged, row_offsets=offs,
        )
        np.testing.assert_allclose(
            np.asarray(hd, np.float32), np.asarray(hp, np.float32),
            atol=2e-2, rtol=2e-2, err_msg=f"quant={quant}",
        )
        # the appended K/V landed in the right page at the right offset
        np.testing.assert_array_equal(
            np.asarray(dense2.mask), np.asarray(paged2.mask)
        )
        for b, n in enumerate(lens):
            pid = perm[b, n // page]
            np.testing.assert_allclose(
                np.asarray(paged2.k)[:, pid, n % page],
                np.asarray(dense2.k)[:, b, n],
                atol=1e-6, err_msg=f"quant={quant} row={b}",
            )


def test_paged_rejects_prefill():
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.models import init_params
    from gritlm_tpu.models.transformer import forward, init_paged_cache

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    cache = init_paged_cache(cfg, 2, 16, 4, page=8)
    with pytest.raises(ValueError, match="decode-only"):
        forward(params, cfg, jnp.zeros((2, 4), jnp.int32), cache=cache)


def test_paged_causal_chunk_per_row_offsets():
    """Sq > 1 verify chunks over the page pool: query j of row b sees
    logical slots <= offset[b] + j (plus the row's mask bound) — matches
    the dense oracle with the same per-row causal bias. Runs both the
    Pallas kernel geometry (KD=128) and the gather fallback (KD=32)."""
    for dh, kv, h in [(64, 2, 4), (16, 2, 4)]:
        KD = kv * dh
        Smax, page = (512, 128) if KD >= 128 else (64, 16)
        L, B, Sq = 2, 3, 4
        rng = np.random.default_rng(7)
        k_log = rng.normal(size=(L, B, Smax, KD)).astype(np.float32)
        v_log = rng.normal(size=(L, B, Smax, KD)).astype(np.float32)
        q = jnp.asarray(rng.normal(size=(B, Sq, h, dh)), jnp.float32)
        offs = np.asarray([5, Smax - Sq, page + 3], np.int32)
        mask = np.zeros((B, Smax), np.int32)
        for b, o in enumerate(offs):
            mask[b, : o + Sq] = 1
        k_pages, v_pages, pt = _paged_from_logical(k_log, v_log, page, rng)
        layer = 1
        got = paged_decode(
            q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(pt),
            jnp.asarray(mask), layer=layer, num_kv_heads=kv,
            causal=True, offset=jnp.asarray(offs),
        )
        want = multi_head_attention(
            q,
            jnp.asarray(k_log[layer]).reshape(B, Smax, kv, dh),
            jnp.asarray(v_log[layer]).reshape(B, Smax, kv, dh),
            jnp.asarray(mask), causal=True, offset=jnp.asarray(offs),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2,
            err_msg=f"dh={dh}",
        )


def test_paged_kernel_under_shard_map():
    """Multi-chip paged serving's kernel contract: paged_decode inside
    shard_map over the batch axes (rows/page-table/mask sharded, page
    pool replicated) is bit-identical to the single-call kernel — the
    Pallas kernel geometry (KD=128, page=128), not the gather fallback.
    This is the per-shard program transformer.forward(shard_rows=) runs
    for ServingEngine(paged=True, mesh=...)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from gritlm_tpu.parallel import MeshConfig, make_mesh

    B, h, kv, dh, page, n_pages, maxp, L = 8, 8, 2, 64, 128, 16, 4, 2
    KD = kv * dh
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, h, dh)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((L, n_pages, page, KD)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, n_pages, page, KD)), jnp.float32)
    pt = jnp.asarray(rng.integers(1, n_pages, (B, maxp)), jnp.int32)
    lens = rng.integers(1, maxp * page, (B,))
    mask = jnp.asarray(
        (np.arange(maxp * page)[None, :] < lens[:, None]).astype(np.int32))
    ref = paged_decode(q, kp, vp, pt, mask, layer=1, num_kv_heads=kv)

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    axes = ("data", "fsdp")

    def local(q, kp, vp, pt, m, l, off):
        return paged_decode(q, kp, vp, pt, m, layer=l[0], num_kv_heads=kv,
                            causal=False, offset=off)

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(axes), P(), P(), P(axes), P(axes), P(), P(axes)),
        out_specs=P(axes), check_vma=False)
    out = jax.jit(f)(q, kp, vp, pt, mask, jnp.asarray([1], jnp.int32),
                     jnp.zeros((B,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # causal verify-chunk path (S > 1, per-row offsets) — the meshed
    # SPECULATIVE pool's kernel shape
    S = 3
    q2 = jnp.asarray(rng.standard_normal((B, S, h, dh)), jnp.float32)
    off = jnp.asarray(np.minimum(lens - 1, maxp * page - S), jnp.int32)
    ref2 = paged_decode(q2, kp, vp, pt, mask, layer=0, num_kv_heads=kv,
                        causal=True, offset=off)

    def local2(q, kp, vp, pt, m, l, off):
        return paged_decode(q, kp, vp, pt, m, layer=l[0], num_kv_heads=kv,
                            causal=True, offset=off)

    f2 = shard_map(
        local2, mesh=mesh,
        in_specs=(P(axes), P(), P(), P(axes), P(axes), P(), P(axes)),
        out_specs=P(axes), check_vma=False)
    out2 = jax.jit(f2)(q2, kp, vp, pt, mask, jnp.asarray([0], jnp.int32),
                       off)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))
