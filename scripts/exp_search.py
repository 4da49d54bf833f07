"""Flat-index search roofline experiment (VERDICT r3 next-5).

Burst-dispatches every variant (N sync points amortized over `reps`
in-flight programs) because a synchronous device_get round-trip through
the axon tunnel costs ~1 ms — comparable to the kernel itself — and
under host CPU load can inflate to ~30 ms, silently dominating any
per-call measurement. Run this with the machine otherwise idle.

Variants:
  matmul      — scores GEMM only, fused row-sum consumer (no top-k)
  exact       — GEMM + segment-pruned exact top-k (index search_mode=
                "exact": k largest-max segments provably cover the top-k)
  approx      — GEMM + lax.approx_max_k(k)   (index search_mode="approx",
                recall_target 0.95, exact re-sort over survivors)
  global      — GEMM + global lax.top_k (the naive exact path; minutes at
                1M docs — run with --global only when you mean it)

Measured v5e (N=1M, D=1024, Q=256, k=100): per-dispatch tunnel overhead
is ~25 ms (an 8k^3 matmul runs at 330 TF/s inside a fori_loop but a
single dispatched call reads ~30 ms), so all numbers here carry that
constant; matmul ~28 ms, exact(pruned) ~35 ms, approx ~28 ms, while the
old per-64k-chunk lax.top_k exact path cost ~345 ms — the sort network
was ~30x the pruned cost.

Usage: python scripts/exp_search.py [--n 1000000] [--q 256] [--k 100]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    N, D, Q, K = args.n, args.d, args.q, args.k
    rng = np.random.default_rng(13)
    nb = 8
    blk = rng.standard_normal((N // nb, D), dtype=np.float32).astype(
        ml_dtypes.bfloat16)
    corpus = jnp.concatenate([jnp.asarray(blk)] * nb, axis=0)
    corpus.block_until_ready()
    q = jnp.asarray(rng.standard_normal((Q, D), dtype=np.float32).astype(
        ml_dtypes.bfloat16))

    def burst(f, reps=args.reps):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(f(corpus, q))[0]))
        t0 = time.perf_counter()
        outs = [f(corpus, q) for _ in range(reps)]
        for o in outs:
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]))
        return (time.perf_counter() - t0) / reps * 1e3

    def scores(e, qq):
        return jnp.einsum("qd,nd->qn", qq, e,
                          preferred_element_type=jnp.float32)

    SEG = 256
    Np = -(-N // SEG) * SEG

    def exact_pruned(e, qq):
        # the FlatIndex exact path (index/flat.py EXACT_SEGMENT proof)
        s = scores(e, qq)
        if Np != N:
            s = jnp.pad(s, ((0, 0), (0, Np - N)), constant_values=-jnp.inf)
        seg = s.reshape(Q, Np // SEG, SEG)
        _, segidx = jax.lax.top_k(seg.max(axis=2), K)
        cand = jnp.take_along_axis(seg, segidx[:, :, None], axis=1)
        v, ii = jax.lax.top_k(cand.reshape(Q, K * SEG), K)
        return v, jnp.take_along_axis(segidx, ii // SEG, axis=1) * SEG + ii % SEG

    mm = jax.jit(lambda e, qq: scores(e, qq).sum(axis=1))
    ex = jax.jit(exact_pruned)
    ap_ = jax.jit(lambda e, qq: jax.lax.approx_max_k(
        scores(e, qq), K, recall_target=0.95, aggregate_to_topk=True))
    gl = jax.jit(lambda e, qq: jax.lax.top_k(scores(e, qq), K))

    gb = corpus.nbytes / 2**30
    roof_ms = gb / 0.82 * 1.0  # 820 GB/s HBM
    tf = 2 * Q * N * D / 1e12
    print(f"N={N} D={D} Q={Q} k={K}  corpus {gb:.2f} GB  "
          f"roofline read {roof_ms:.2f} ms / matmul {tf / 0.197:.2f} ms "
          f"@197TFps")
    variants = [("matmul", mm), ("exact", ex), ("approx", ap_)]
    if args.global_:
        variants.append(("global", gl))
    for name, f in variants:
        ms = burst(f)
        print(f"{name:7s}: {ms:7.2f} ms  = {Q / ms * 1e3:8.0f} qps   "
              f"({gb / ms * 1e3:6.0f} GB/s effective)")


if __name__ == "__main__":
    main()
