"""A/B the dropless MoE combine: scatter-add vs inverse-permutation gather.

The current dropless combine does out.at[tok].add(ys * w) — an XLA
scatter over T*k rows. TPU scatters serialize badly. The alternative:
invert the argsort permutation, gather rows back into (token, choice)
order, and combine with a small einsum (gathers are fast on TPU).

Also times the full per-layer stack (router/sort/gather/ragged_dot x3/
combine) piecewise at encode shape to localize the MoE MFU gap
(VERDICT r4 weak-4). Burst protocol; run on an idle host.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np

def main():
    import jax
    import jax.numpy as jnp

    B, S, D, F, E, k = 32, 512, 1024, 3584, 8, 2
    T = B * S
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((E, D, F)) * 0.02, jnp.bfloat16)
    wu = jnp.asarray(rng.standard_normal((E, D, F)) * 0.02, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((E, F, D)) * 0.02, jnp.bfloat16)
    wr = jnp.asarray(rng.standard_normal((D, E)) * 0.02, jnp.bfloat16)

    def route(x):
        logits = (x @ wr).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_w, top_idx = jax.lax.top_k(probs, k)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        return top_w, top_idx

    def experts(xs, gs):
        h = jax.lax.ragged_dot(xs, wg, gs)
        u = jax.lax.ragged_dot(xs, wu, gs)
        return jax.lax.ragged_dot(jax.nn.silu(h) * u, wd, gs)

    def moe_scatter(x):
        top_w, top_idx = route(x)
        flat_e = top_idx.reshape(-1)
        order = jnp.argsort(flat_e)
        tok = order // k
        xs = jnp.take(x, tok, axis=0)
        gs = jnp.bincount(flat_e, length=E)
        ys = experts(xs, gs)
        w_flat = jnp.take(top_w.reshape(-1), order).astype(jnp.float32)
        out = jnp.zeros((T, D), jnp.float32).at[tok].add(
            ys.astype(jnp.float32) * w_flat[:, None])
        return out.astype(x.dtype)

    def moe_gather(x):
        top_w, top_idx = route(x)
        flat_e = top_idx.reshape(-1)
        order = jnp.argsort(flat_e)
        tok = order // k
        xs = jnp.take(x, tok, axis=0)
        gs = jnp.bincount(flat_e, length=E)
        ys = experts(xs, gs)
        inv = jnp.argsort(order)
        ys_tok = jnp.take(ys, inv, axis=0).reshape(T, k, D)
        out = jnp.einsum("tkd,tk->td", ys_tok.astype(jnp.float32),
                         top_w.astype(jnp.float32))
        return out.astype(x.dtype)

    # piecewise: where does the time go?
    def router_only(x):
        top_w, top_idx = route(x)
        return (top_w.sum() + top_idx.sum()).reshape(1).repeat(8)

    def big_matmul_bound(x):
        # single unbatched matmul at the same total FLOPs/3
        return (jnp.concatenate([x, x], 0) @ wg[0]).astype(jnp.float32).sum(axis=0)

    def sort_gather(x):
        top_w, top_idx = route(x)
        flat_e = top_idx.reshape(-1)
        order = jnp.argsort(flat_e)
        xs = jnp.take(x, order // k, axis=0)
        return xs.astype(jnp.float32).sum(axis=0)

    def through_experts(x):
        top_w, top_idx = route(x)
        flat_e = top_idx.reshape(-1)
        order = jnp.argsort(flat_e)
        xs = jnp.take(x, order // k, axis=0)
        gs = jnp.bincount(flat_e, length=E)
        return experts(xs, gs).astype(jnp.float32).sum(axis=0)

    def dense_matmul_bound(x):
        # pure-MXU reference: same FLOPs as top-2 experts if T'=T*k/E per
        # expert were perfectly balanced — batched dense [E, Tk/E, D]
        xs = jnp.concatenate([x, x], axis=0).reshape(E, T * k // E, D)
        h = jnp.einsum("etd,edf->etf", xs, wg)
        u = jnp.einsum("etd,edf->etf", xs, wu)
        return jnp.einsum("etf,efd->etd", jax.nn.silu(h) * u, wd).astype(jnp.float32).sum(axis=(0, 1))

    fns = [("big_matmul/3", big_matmul_bound),
           ("router", router_only), ("sort+gather", sort_gather),
           ("thru_experts", through_experts),
           ("full_scatter", moe_scatter), ("full_gather", moe_gather),
           ("dense_flops_bound", dense_matmul_bound)]

    # parity first
    a = jax.device_get(jax.jit(moe_scatter)(x))
    b = jax.device_get(jax.jit(moe_gather)(x))
    print("combine parity:", np.allclose(np.asarray(a, np.float32),
                                         np.asarray(b, np.float32),
                                         atol=2e-2, rtol=2e-2),
          float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))))

    R = 8
    xs_many = jnp.asarray(rng.standard_normal((R, T, D)), jnp.bfloat16)

    def burst(f, reps=3):
        @jax.jit
        def run(xs_many):
            def body(_, xi):
                return 0, f(xi).ravel()[:8]
            _, out = jax.lax.scan(body, 0, xs_many)
            return out
        np.asarray(jax.device_get(run(xs_many).ravel()[0:1]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            o = run(xs_many)
            np.asarray(jax.device_get(o.ravel()[0:1]))
            ts.append((time.perf_counter() - t0) / R * 1e3)
        return float(np.median(ts))

    flops = 3 * 2 * T * k * D * F
    for name, f in fns:
        ms = burst(f)
        print(f"{name:18s}: {ms:7.2f} ms   ({flops/ms/1e9:6.1f} TF/s vs 197 peak)")

if __name__ == "__main__":
    main()
