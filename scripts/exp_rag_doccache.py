"""Where does the RAG doc-cache p50 go? (round 5)

BENCH r5 trial: doc-cache answer() p50 = 840 ms vs prompt-mode 179 ms —
the caching mode is 4.7x SLOWER, inverting the reference's >60% caching
win (/root/reference/rag/eval.py:341-366). Hypothesis: the per-call
host->device transfer of the stacked doc KV cache (engine._fetch_doc_caches:
numpy stack + device_put of [L,1,W,KD] k and v, ~17 MB at 1B geometry)
dominates through the remote-tunnel runtime, exactly like every other
per-dispatch cost this repo has measured (BENCH notes, serving host-typed
args).

This experiment times each component of a DOC-mode answer() on the real
TPU: query encode, index search, host-store fetch+device_put, and the
continuation generate — then times the same fetch from a DEVICE-resident
stacked pool (one jitted gather, ids ride the dispatch) to validate the
fix before it lands in rag/engine.py.

Run: python scripts/exp_rag_doccache.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _bench_config
    from gritlm_tpu import GritLM
    from gritlm_tpu.models import init_params
    from gritlm_tpu.rag.engine import CacheMode, RAGEngine

    cfg = _bench_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    model = GritLM(cfg, params, mode="unified", attn="bbcc")

    rng = np.random.default_rng(23)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))

    def text(n):
        return "".join(rng.choice(letters, n))

    n_docs, n_queries = 24, 24
    passages = [{"title": text(16), "text": text(220)} for _ in range(n_docs)]
    queries = [text(48) for _ in range(n_queries)]

    eng = RAGEngine(model, max_new_tokens=16, encode_max_length=512)
    eng.build_index(passages, cache_docs=True)
    for q in queries[:3]:
        eng.answer(q, mode=CacheMode.DOC)

    # ---- component timing of the DOC path ----------------------------
    def med(f, reps=12):
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            f(i)
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    # (1) query encode + search (device-resident emb, one id round trip)
    def enc_search(i):
        q_emb = model.encode_queries(
            [queries[i % n_queries]], instruction="", max_length=512,
            convert_to_tensor=True,
        )
        eng.index.search(q_emb, k=1)

    t_encsearch = med(enc_search)

    # (2) host-store fetch + device_put (the suspected cost)
    doc_ids = list(range(n_docs))

    def fetch_host(i):
        c = eng._fetch_doc_caches([doc_ids[i % n_docs]], False)
        np.asarray(jax.device_get(c.mask[0, 0:1]))  # fence

    t_fetch_host = med(fetch_host)
    c0 = eng._fetch_doc_caches([0], False)
    nbytes = c0.k.nbytes + c0.v.nbytes
    print(f"fetch payload k+v = {nbytes/1e6:.1f} MB "
          f"-> host fetch {t_fetch_host:.1f} ms "
          f"= {nbytes/1e6/(t_fetch_host/1e3):.0f} MB/s effective")

    # (3) the continuation generate given an already-device cache
    prompts = ["\n" + f"Query: {queries[0]}\nAnswer:"]

    def gen_only(i):
        eng.model.generate(
            prompts, cache=c0, max_new_tokens=16, add_special_tokens=False
        )

    t_gen = med(gen_only, reps=8)

    # (4) full answer() for reference
    def full(i):
        eng.answer(queries[i % n_queries], mode=CacheMode.DOC)

    t_full = med(full, reps=8)

    def full_prompt(i):
        eng.answer(queries[i % n_queries], mode=CacheMode.PROMPT_QUERY_DOC)

    for i in range(2):
        full_prompt(i)
    t_full_prompt = med(full_prompt, reps=8)

    print(f"encode+search {t_encsearch:.1f} ms | host-store fetch "
          f"{t_fetch_host:.1f} ms | generate(cont) {t_gen:.1f} ms | "
          f"full DOC answer {t_full:.1f} ms | full PROMPT answer "
          f"{t_full_prompt:.1f} ms")

    # ---- device-resident pool prototype -------------------------------
    # Stack every doc cache into one [L, N, Wmax, KD] device buffer at
    # build time; per call, gather the retrieved rows with a jitted take
    # (ids ride the dispatch as host numpy).
    entries = [eng._doc_store[(d, False)] for d in doc_ids]
    L, _, KD = entries[0][0].shape
    Wmax = max(e[2] for e in entries)
    N = len(entries)
    k_pool = np.zeros((L, N, Wmax, KD), entries[0][0].dtype)
    v_pool = np.zeros_like(k_pool)
    widths = np.zeros((N,), np.int32)
    for i, (ki, vi, w, _, _) in enumerate(entries):
        k_pool[:, i, :w] = ki
        v_pool[:, i, :w] = vi
        widths[i] = w
    k_pool = jax.device_put(k_pool)
    v_pool = jax.device_put(v_pool)
    print(f"device pool = {k_pool.nbytes*2/1e6:.0f} MB for {N} docs")

    @jax.jit
    def gather(kp, vp, ids, w):
        k = jnp.take(kp, ids, axis=1)
        v = jnp.take(vp, ids, axis=1)
        mask = (jnp.arange(kp.shape[2])[None, :] < w[:, None]).astype(
            jnp.int32
        )
        return k, v, mask

    def fetch_dev(i):
        ids = np.asarray([doc_ids[i % n_docs]], np.int32)
        w = widths[ids]
        k, v, m = gather(k_pool, v_pool, ids, w)
        np.asarray(jax.device_get(m[0, 0:1]))  # fence

    fetch_dev(0)
    t_fetch_dev = med(fetch_dev)
    print(f"device-pool fetch {t_fetch_dev:.1f} ms "
          f"(vs host {t_fetch_host:.1f} ms)")


if __name__ == "__main__":
    main()
