"""Flat-index search roofline experiment (VERDICT r3 next-5, r4 next-1).

Protocol (r5): every variant is timed by scanning R=8 distinct query
blocks inside ONE jitted program — one dispatch + one tiny fetch — so the
per-dispatch tunnel round-trip (~25-45 ms through the axon runtime,
host-load-dependent; separate dispatches do NOT overlap through it) is
amortized 8x and the number tracks on-device kernel time. The older
"burst of in-flight dispatches" protocol still carried the full
per-dispatch constant and understated every kernel by ~3x.

Variants:
  matmul       — scores GEMM + row-sum consumer (no top-k; the FLOPs floor)
  exact        — GEMM + where(n_docs) + segment-pruned exact top-k
                 (the XLA fallback path in index/flat.py)
  pallas       — the fused Pallas pass-1 (scores+mask+segmax in one corpus
                 sweep, index/flat.py _pallas_scores_segmax) + the same
                 pruned tail. The production TPU path.
  approx       — GEMM + lax.approx_max_k (recall 0.95, exact re-sort)
  global       — GEMM + global lax.top_k (naive; minutes at 1M — --global)

Measured v5e (N=1,000,448 = the real FlatIndex capacity for 1M docs,
D=1024 bf16, Q=256, k=100), scan protocol:
  matmul ~7.4 ms; XLA exact 18.7 ms (13.7k qps); PALLAS exact 13.3 ms
  (19.3k qps, values bit-identical); approx ~7.8 ms (recall 0.95).
Component deltas (separate runs): +2.4 ms where() mask, +2.5 ms segmax
re-read (both folded into the Pallas sweep), +3 ms candidate gather,
+2.2 ms final top_k at SEG=256 (~1.1 ms at SEG=128).
approx_max_k(recall_target=1.0) is value-exact but measured 84 ms — the
hardware PartialReduce path degenerates at exactness; discarded.

Usage: python scripts/exp_search.py [--n 1000000] [--q 256] [--k 100]
       [--global] [--seg-sweep]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--global", dest="global_", action="store_true",
                    help="also time the naive global lax.top_k (minutes)")
    ap.add_argument("--seg-sweep", action="store_true",
                    help="time the pallas variant at SEG in {256,128,64,32}"
                         " (kernel constraint: TILE_N/SEG >= 8 sublanes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from gritlm_tpu.index.flat import FlatIndex

    D, Q, K, R = args.d, args.q, args.k, args.reps
    # real FlatIndex shape: capacity rounds up to pad_to=1024
    N = -(-args.n // 1024) * 1024
    rng = np.random.default_rng(13)
    nb = 8
    blk = rng.standard_normal((N // nb, D), dtype=np.float32).astype(
        ml_dtypes.bfloat16)
    corpus = jnp.concatenate([jnp.asarray(blk)] * nb, axis=0)
    corpus.block_until_ready()
    qs = jnp.asarray(rng.standard_normal((R, Q, D), dtype=np.float32)
                     .astype(ml_dtypes.bfloat16))
    n_docs = jnp.int32(args.n)

    idx = FlatIndex.__new__(FlatIndex)  # timing-only shell for the kernels
    idx.mesh = None
    idx.recall_target = 0.95

    SEG = FlatIndex.EXACT_SEGMENT
    ns = N // SEG

    def scores(e, qq):
        s = jnp.einsum("qd,nd->qn", qq, e,
                       preferred_element_type=jnp.float32)
        valid = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) < n_docs
        return jnp.where(valid, s, -jnp.inf)

    def v_matmul(e, qq):
        return jnp.einsum("qd,nd->qn", qq, e,
                          preferred_element_type=jnp.float32).sum(axis=1)

    def pruned_tail(s, segmax, SEG):
        Qn = s.shape[0]
        _, segidx = jax.lax.top_k(segmax, K)
        cand = jnp.take_along_axis(
            s.reshape(Qn, -1, SEG), segidx[:, :, None], axis=1)
        v, ii = jax.lax.top_k(cand.reshape(Qn, K * SEG), K)
        ids = jnp.take_along_axis(segidx, ii // SEG, axis=1) * SEG + ii % SEG
        return v, ids

    def v_exact(e, qq):
        s = scores(e, qq)
        v, _ = pruned_tail(s, s.reshape(Q, ns, SEG).max(axis=2), SEG)
        return v.sum(axis=1)

    def v_pallas(e, qq, seg=None):
        seg = seg or FlatIndex.PALLAS_SEGMENT
        idx.PALLAS_SEGMENT = seg  # instance attr shadows the class default
        s, segmax_t = FlatIndex._pallas_scores_segmax(idx, qq, e, n_docs)
        v, _ = pruned_tail(s, segmax_t.T, seg)
        return v.sum(axis=1)

    def v_approx(e, qq):
        v, _ = jax.lax.approx_max_k(scores(e, qq), K, recall_target=0.95,
                                    aggregate_to_topk=True)
        return v.sum(axis=1)

    def v_global(e, qq):
        v, _ = jax.lax.top_k(scores(e, qq), K)
        return v.sum(axis=1)

    def scan_time(f, reps=3):
        @jax.jit
        def run(e, qs):
            def body(_, qq):
                return 0, f(e, qq)
            _, out = jax.lax.scan(body, 0, qs)
            return out
        np.asarray(jax.device_get(run(corpus, qs).ravel()[0:1]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o = run(corpus, qs)
            np.asarray(jax.device_get(o.ravel()[0:1]))
            ts.append((time.perf_counter() - t0) / R * 1e3)
        return float(np.median(ts))

    gb = corpus.nbytes / 2**30
    tf = 2 * Q * N * D / 1e12
    print(f"N={N} D={D} Q={Q} k={K}  corpus {gb:.2f} GB  "
          f"roofline read {gb / 0.82 * 1e3 / 1e3:.2f} ms / matmul "
          f"{tf / 0.197:.2f} ms @197TFps")
    variants = [("matmul", v_matmul), ("exact(xla)", v_exact),
                ("approx", v_approx)]
    if jax.default_backend() == "tpu" and N % FlatIndex.PALLAS_TILE_N == 0 \
            and Q % 8 == 0:
        if args.seg_sweep:
            import functools
            for sg in (128, 64, 32):  # SEG=256 -> ns_blk=4 < 8 sublanes
                variants.insert(2, (f"pallas seg={sg}",
                                    functools.partial(v_pallas, seg=sg)))
        else:
            variants.insert(2, ("exact(pallas)", v_pallas))
    if args.global_:
        variants.append(("global", v_global))
    for name, f in variants:
        ms = scan_time(f)
        print(f"{name:13s}: {ms:7.2f} ms  = {Q / ms * 1e3:8.0f} qps   "
              f"({gb / ms * 1e3:6.0f} GB/s effective)")


if __name__ == "__main__":
    main()
