"""Decoder-only transformer (Mistral / Mixtral family) as pure functions.

TPU-first redesign of the reference's forked HF modeling files
(scripts/modeling_mistral_gritlm.py, scripts/modeling_mixtral_gritlm.py):
the 3k-LoC `is_causal` threading collapses to a single `causal: bool`
argument on `forward`. Params are a pytree with layers **stacked on a
leading axis** so the layer loop is a `jax.lax.scan` (fast compiles,
sharding rules written once against the stacked arrays).

Layout (shapes; L = layers, D = hidden, F = ffn, H = heads, Kv = kv heads,
Dh = head dim, V = vocab, E = experts):
  params = {
    "embed":   {"embedding": [V, D]},
    "layers": {
      "ln1": {"scale": [L, D]},
      "attn": {"wq": [L, D, H*Dh], "wk": [L, D, Kv*Dh], "wv": [L, D, Kv*Dh],
               "wo": [L, H*Dh, D]},
      "ln2": {"scale": [L, D]},
      # dense:  "mlp": {"gate": [L, D, F], "up": [L, D, F], "down": [L, F, D]}
      # moe:    "moe": {"router": [L, D, E], "gate": [L, E, D, F],
      #                 "up": [L, E, D, F], "down": [L, E, F, D]}
    },
    "final_ln": {"scale": [D]},
    "lm_head": {"kernel": [D, V]}    # optional (embedding-only ckpts omit it)
  }
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gritlm_tpu.config import ModelConfig
from gritlm_tpu.ops.attention import cached_attention, multi_head_attention

# ---------------------------------------------------------------------------
# Param init


def init_params(cfg: ModelConfig, key: jax.Array, with_lm_head: bool = True):
    """Random init (normal/0.02) with the layer axis stacked. Tests + tiny smoke
    runs use this; real checkpoints come from models/loader.py."""
    L, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    H, Kv, Dh, V = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim_,
        cfg.vocab_size,
    )
    dt = cfg.jnp_dtype
    keys = iter(jax.random.split(key, 16))

    def norm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dt)

    attn = {
        "wq": norm(next(keys), (L, D, H * Dh)),
        "wk": norm(next(keys), (L, D, Kv * Dh)),
        "wv": norm(next(keys), (L, D, Kv * Dh)),
        "wo": norm(next(keys), (L, H * Dh, D)),
    }
    if cfg.attention_bias:
        attn["bq"] = jnp.zeros((L, H * Dh), dt)
        attn["bk"] = jnp.zeros((L, Kv * Dh), dt)
        attn["bv"] = jnp.zeros((L, Kv * Dh), dt)
    layers = {
        "ln1": {"scale": jnp.ones((L, D), dt)},
        "attn": attn,
        "ln2": {"scale": jnp.ones((L, D), dt)},
    }
    if cfg.is_moe:
        E = cfg.num_local_experts
        layers["moe"] = {
            "router": norm(next(keys), (L, D, E)),
            "gate": norm(next(keys), (L, E, D, F)),
            "up": norm(next(keys), (L, E, D, F)),
            "down": norm(next(keys), (L, E, F, D)),
        }
    else:
        layers["mlp"] = {
            "gate": norm(next(keys), (L, D, F)),
            "up": norm(next(keys), (L, D, F)),
            "down": norm(next(keys), (L, F, D)),
        }
    params = {
        "embed": {"embedding": norm(next(keys), (V, D))},
        "layers": layers,
        "final_ln": {"scale": jnp.ones((D,), dt)},
    }
    if with_lm_head:
        if cfg.tie_word_embeddings:
            pass  # lm head = embed.T at apply time
        else:
            params["lm_head"] = {"kernel": norm(next(keys), (D, V))}
    return params


# ---------------------------------------------------------------------------
# Building blocks


def _w(node, dtype=None):
    """Resolve a kernel leaf to a dense array. Understands two wrapper
    conventions so quantized-base and LoRA training cost one transient layer:
      {"q8", "scale"}        int8 frozen base (training/quant.py) —
                             dequantized HERE, inside the layer scan, so only
                             one layer's bf16 weights exist at a time
      {"w", "A", "B"}        lazy LoRA (training/lora.apply_lora_lazy):
                             W_eff = resolve(w) + A @ B (B pre-scaled)
    Plain arrays pass through untouched."""
    if isinstance(node, dict):
        if "q8" in node:
            from gritlm_tpu.ops.quant_matmul import _slice_node

            n = _slice_node(node)  # resolves layer-stacked serving leaves
            out = n["q8"].astype(jnp.float32) * n["scale"]
            return out.astype(dtype or jnp.bfloat16)
        if "q4" in node:
            from gritlm_tpu.ops.quant_matmul import _slice_node
            from gritlm_tpu.training.quant import dequantize_kernel_int4

            return dequantize_kernel_int4(
                _slice_node(node), dtype or jnp.bfloat16
            )
        if "A" in node:
            base = _w(node["w"], dtype)
            delta = jnp.matmul(
                node["A"].astype(jnp.float32), node["B"].astype(jnp.float32)
            )
            return (base.astype(jnp.float32) + delta).astype(base.dtype)
    return node


def _mm(x: jax.Array, node) -> jax.Array:
    """x @ kernel-leaf. int4 serving leaves route through the fused Pallas
    w4a16 matmul (ops/quant_matmul) when the row count is decode-shaped, so
    HBM streams only packed nibbles (0.5 bytes/weight); every other leaf
    kind materializes one layer's bf16 weights via _w.

    Stacked multi-adapter leaves ({"w", "As" [n, in, r], "Bs" [n, r, out],
    "aid" [B]} — training/lora.stack_adapters + set_adapter_ids) add each
    batch row's OWN adapter's low-rank delta: one pool serves any mix of
    LoRA fine-tunes over shared base weights (serving.py). The gathered
    per-row factors are tiny ([B, D, r]), so the delta costs two thin
    einsums on top of the shared base matmul."""
    if isinstance(node, dict) and "As" in node:
        y = _mm(x, node["w"])
        if "aid" not in node:
            raise ValueError(
                "stacked-adapter leaf reached _mm without adapter ids — "
                "call lora.set_adapter_ids(params, aid, L) first"
            )
        if x.ndim != 3:
            raise NotImplementedError(
                "multi-adapter leaves need [B, S, D] activations "
                "(dense serving paths only)"
            )
        A = jnp.take(node["As"], node["aid"], axis=0)  # [B, in, r]
        Bm = jnp.take(node["Bs"], node["aid"], axis=0)  # [B, r, out]
        xr = jnp.einsum("bsd,bdr->bsr", x.astype(jnp.float32),
                        A.astype(jnp.float32))
        delta = jnp.einsum("bsr,bro->bso", xr, Bm.astype(jnp.float32))
        return y + delta.astype(y.dtype)
    if isinstance(node, dict) and "q4" in node:
        from gritlm_tpu.ops.quant_matmul import w4a16_matmul

        return w4a16_matmul(x, node)
    if isinstance(node, dict) and "q8" in node:
        from gritlm_tpu.ops.quant_matmul import w8a16_matmul

        return w8a16_matmul(x, node)
    return x @ _w(node, x.dtype)


def _split_q4_leaves(layers: dict):
    """Partition the stacked layer tree for the layer scan: quantized
    serving leaves ({"q4"|"q8","scale"} dicts) are *removed* from the scan xs and
    returned separately, still layer-stacked. Scanning them as xs would
    dynamic-slice the packed weights per layer — and because the consumer
    is a Pallas custom call, XLA must MATERIALIZE that slice (a full HBM
    copy of every weight, every layer, every decode step; measured ~650us
    of a ~3.7ms step on the 1B bench). The kernel instead takes the whole
    stacked array plus the layer index (scalar prefetch) and streams
    blocks straight out of the resident buffer.

    Returns (xs_tree, stacked) where xs_tree has None at the extracted
    positions and stacked maps key-paths to the stacked q4 nodes."""
    stacked = {}

    def walk(node, path):
        if isinstance(node, dict):
            if ("q4" in node or "q8" in node) and "scale" in node:
                stacked[path] = node
                return None
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    xs = walk(layers, ())
    return xs, stacked


def _merge_q4_leaves(lp: dict, stacked: dict, lidx) -> dict:
    """Re-insert the stacked q4 nodes into a per-layer slice of the scan xs,
    tagging each with this iteration's layer index for the kernel."""
    for path, node in stacked.items():
        d = lp
        for k in path[:-1]:
            d = d[k]
        d[path[-1]] = {**node, "lidx": lidx}
    return lp


def _remat(layer_fn, policy):
    """jax.checkpoint with a named policy: None = full recompute (min memory),
    'dots' = keep matmul outputs, recompute elementwise only (~6% faster
    train step when activations fit), 'dots_no_batch' likewise minus
    batched dots."""
    policies = {
        None: None,
        "full": None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    return jax.checkpoint(layer_fn, policy=policies[policy])


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    # HF Mistral casts back to input dtype *before* the scale multiply
    return x.astype(dt) * scale.astype(dt)


def _rope_freqs(dh: int, theta: float, scaling=None) -> jax.Array:
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    if scaling is None:
        return inv
    typ, factor, lo, hi, orig = scaling
    if typ == "linear":
        return inv / factor
    # llama3 NTK-by-parts (HF _compute_llama3_parameters): long wavelengths
    # scale by 1/factor, short ones stay, smooth blend between
    low_wl = orig / lo
    high_wl = orig / hi
    wl = 2.0 * jnp.pi / inv
    smooth = (orig / wl - lo) / (hi - lo)
    mid = (1.0 - smooth) * inv / factor + smooth * inv
    return jnp.where(wl > low_wl, inv / factor,
                     jnp.where(wl < high_wl, inv, mid))


def apply_rope(
    x: jax.Array, positions: jax.Array, theta: float, scaling=None
) -> jax.Array:
    """HF half-rotation convention: rotate_half([a, b]) = [-b, a] with the split
    at Dh/2 (matches modeling_mistral rotate_half so HF weights are portable).
    x [B, S, H, Dh], positions [B, S]. `scaling` is cfg.rope_scaling_
    (linear / llama3)."""
    dh = x.shape[-1]
    freqs = _rope_freqs(dh, theta, scaling)  # [Dh/2]
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, S, Dh/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, Dh/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : dh // 2], x[..., dh // 2 :]
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([x1f * cos - x2f * sin, x2f * cos + x1f * sin], axis=-1)
    return out.astype(x.dtype)


class KVCache(NamedTuple):
    """Static-shape KV cache. k/v: [L, B, Smax, Kv*Dh] — the head axis is
    flattened into lanes so decode attention can DMA rows straight out of
    the full HBM buffer (ops/decode_attention.py) and the per-layer append
    is a single dynamic_update_slice that XLA performs in place (no
    stacked-ys copies of the cache per decode step). mask: [B, Smax] marks
    valid key slots (lets RAG concatenate right-padded segment caches, cf.
    reference rag/eval.py:237-295); length: scalar int32 write pointer.

    Optional int8 quantization (init_cache(..., quant=True)): k/v stored
    int8 with per-(layer, row, kv-head, slot) bf16 absmax scales in
    k_scale/v_scale [L, B, Kv, Smax] (slot-minor so the decode kernel can
    DMA a [Kv, bk] scale chunk alongside each K/V chunk). Halves the HBM
    bytes decode must stream per step (the dominant long-context decode
    cost) and doubles cache capacity; dequantization fuses into the decode
    kernel's score/prob matrices."""

    k: jax.Array
    v: jax.Array
    mask: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=None, quant: bool = False
) -> KVCache:
    L, Kv, Dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim_
    dt = dtype or cfg.jnp_dtype
    if quant:
        return KVCache(
            k=jnp.zeros((L, batch, max_len, Kv * Dh), jnp.int8),
            v=jnp.zeros((L, batch, max_len, Kv * Dh), jnp.int8),
            mask=jnp.zeros((batch, max_len), jnp.int32),
            length=jnp.zeros((), jnp.int32),
            k_scale=jnp.zeros((L, batch, Kv, max_len), jnp.bfloat16),
            v_scale=jnp.zeros((L, batch, Kv, max_len), jnp.bfloat16),
        )
    return KVCache(
        k=jnp.zeros((L, batch, max_len, Kv * Dh), dt),
        v=jnp.zeros((L, batch, max_len, Kv * Dh), dt),
        mask=jnp.zeros((batch, max_len), jnp.int32),
        length=jnp.zeros((), jnp.int32),
    )


class PagedKVCache(NamedTuple):
    """Paged serving cache (ops/paged_attention.py): K/V live in
    fixed-size pages drawn from a shared pool, so HBM scales with the
    tokens a request actually reserves instead of B × max_len worst case.
    k/v: [L, n_pages, page, Kv*Dh]; page_table: [B, max_pages] int32 maps
    each row's logical chunk to its physical page; mask: [B,
    max_pages*page] logical slot validity (same semantics as
    KVCache.mask). Scales (int8 pool): [L, n_pages, Kv, page]. Only the
    serving decode path (forward(row_offsets=...)) consumes this —
    prefill runs on dense row caches which serving.py copies into pages
    at admission. The reference has no paging (dense HF caches,
    rag/eval.py:296-302)."""

    k: jax.Array
    v: jax.Array
    mask: jax.Array
    length: jax.Array
    page_table: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def max_len(self) -> int:
        return self.mask.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_paged_cache(
    cfg: ModelConfig, batch: int, max_len: int, n_pages: int,
    page: int = 256, dtype=None, quant: bool = False,
) -> PagedKVCache:
    """A paged pool of `n_pages` pages (dense equivalent would need
    batch * max_len / page pages; the saving is the point). Page 0 is
    RESERVED as the scratch target for inactive rows' lockstep writes —
    allocators must never hand it out (serving.py starts its free list
    at 1)."""
    assert max_len % page == 0, (max_len, page)
    L, Kv, Dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim_
    dt = dtype or cfg.jnp_dtype
    maxp = max_len // page
    common = dict(
        mask=jnp.zeros((batch, maxp * page), jnp.int32),
        length=jnp.zeros((), jnp.int32),
        page_table=jnp.zeros((batch, maxp), jnp.int32),
    )
    if quant:
        return PagedKVCache(
            k=jnp.zeros((L, n_pages, page, Kv * Dh), jnp.int8),
            v=jnp.zeros((L, n_pages, page, Kv * Dh), jnp.int8),
            k_scale=jnp.zeros((L, n_pages, Kv, page), jnp.bfloat16),
            v_scale=jnp.zeros((L, n_pages, Kv, page), jnp.bfloat16),
            **common,
        )
    return PagedKVCache(
        k=jnp.zeros((L, n_pages, page, Kv * Dh), dt),
        v=jnp.zeros((L, n_pages, page, Kv * Dh), dt),
        **common,
    )


def quantize_kv(x: jax.Array) -> tuple:
    """x [B, S, Kv, Dh] → (int8 [B, S, Kv*Dh], scale bf16 [B, S, Kv])
    per-(slot, head) absmax quantization. The scale is rounded to bf16
    BEFORE quantizing so the stored int8 values were produced with the
    exact scale the decode kernel dequantizes with (quantizing with the
    fp32 scale would add a systematic ≤0.4% bias per value)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [B, S, Kv]
    scale = jnp.maximum(amax / 127.0, 1e-8).astype(jnp.bfloat16)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale.astype(jnp.float32)[..., None]),
        -127, 127,
    ).astype(jnp.int8)
    B, S, Kv, Dh = x.shape
    return q.reshape(B, S, Kv * Dh), scale


def _attention_block(
    p: dict,
    x: jax.Array,  # [B, S, D]
    positions: jax.Array,  # [B, S]
    padding_mask: Optional[jax.Array],  # [B, S] for self-attn (no cache)
    cfg: ModelConfig,
    *,
    causal: bool,
    # cached decode/prefill: (k_all [L,B,Smax,Kv*Dh], v_all, kv_mask [B,Smax],
    # offset, layer_idx) — the FULL cache; this layer appends in place and
    # attends straight off the HBM buffer (no per-layer cache copies)
    layer_cache: Optional[tuple] = None,
    ring_axis: Optional[str] = None,  # sequence-parallel: mesh axis name
):
    B, S, D = x.shape
    H, Kv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    def proj(wname: str, bname: str, nh: int) -> jax.Array:
        y = _mm(x, p[wname])
        b = p.get(bname)  # Qwen2-family QKV biases (cfg.attention_bias)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.reshape(B, S, nh, Dh)

    q = proj("wq", "bq", H)
    k = proj("wk", "bk", Kv)
    v = proj("wv", "bv", Kv)
    q = apply_rope(q, positions, cfg.rope_theta, cfg.rope_scaling_)
    k = apply_rope(k, positions, cfg.rope_theta, cfg.rope_scaling_)

    if ring_axis is not None:
        # sequence-sharded exact attention: K/V shards rotate the ICI ring
        # (called inside shard_map; see parallel/seqpar.py)
        from gritlm_tpu.ops.ring_attention import ring_attention

        out = ring_attention(
            q, k, v, padding_mask, causal=causal, axis_name=ring_axis,
            sliding_window=cfg.sliding_window,
        )
        return _mm(out.reshape(B, S, H * Dh), p["wo"]), (k, v)

    if layer_cache is not None:
        (k_all, v_all, k_sc, v_sc, kv_mask, offset, lidx,
         page_table, shard_rows) = layer_cache
        per_row = getattr(offset, "ndim", 0) == 1  # [B] slot offsets
        if page_table is not None:
            # paged serving decode: the row's logical slot `offset` lives
            # in page page_table[b, offset // page] at offset % page.
            # INACTIVE rows still execute the write (lockstep program) but
            # their page-table entry may alias another request's page —
            # redirect them to the reserved scratch page 0 (dense pools
            # are immune: a row only ever writes its own row). S > 1 is
            # the speculative verify chunk: S tokens land at logical
            # slots offset + j (which may straddle a page boundary) with
            # intra-chunk causality handled by the kernel's per-row bound.
            from gritlm_tpu.ops.paged_attention import paged_decode

            page = k_all.shape[2]
            lslots = offset[:, None] + jnp.arange(S)[None, :]  # [B, S]
            pids = jnp.take_along_axis(page_table, lslots // page, axis=1)
            if padding_mask is not None:
                pids = jnp.where(padding_mask > 0, pids, 0)
            offs = lslots % page
            if k_sc is not None:
                k2, ks2 = quantize_kv(k)
                v2, vs2 = quantize_kv(v)
                k_sc = k_sc.at[lidx, pids, :, offs].set(ks2)
                v_sc = v_sc.at[lidx, pids, :, offs].set(vs2)
            else:
                k2 = k.reshape(B, S, Kv * Dh).astype(k_all.dtype)
                v2 = v.reshape(B, S, Kv * Dh).astype(v_all.dtype)
            k_all = k_all.at[lidx, pids, offs, :].set(k2)
            v_all = v_all.at[lidx, pids, offs, :].set(v2)
            if shard_rows is not None:
                # Multi-chip paged serving: the Pallas kernel is opaque
                # to GSPMD, so run it per-shard under shard_map — the
                # rows (q, page table, mask, offsets) shard over the
                # mesh's batch axes while the page POOL stays replicated,
                # so pinned prefix pages are shared zero-copy by rows on
                # EVERY shard. The scatter above stays GSPMD (per-step
                # updates are tiny [B, S, Kv*Dh] gathers into the
                # replicated pool).
                from jax import shard_map
                from jax.sharding import PartitionSpec

                mesh_, axes_ = shard_rows
                rows_sp = PartitionSpec(axes_)
                rep = PartitionSpec()
                quant = k_sc is not None

                def _pd(q, kp, vp, pt, km, lv, off, *sc):
                    ksc, vsc = sc if quant else (None, None)
                    return paged_decode(
                        q, kp, vp, pt, km, layer=lv[0], num_kv_heads=Kv,
                        k_scale=ksc, v_scale=vsc,
                        causal=S > 1, offset=off if S > 1 else 0,
                    )

                lv = jnp.asarray(lidx, jnp.int32).reshape(1)
                offs_rows = jnp.broadcast_to(
                    jnp.asarray(offset, jnp.int32), (B,))
                args = [q, k_all, v_all, page_table, kv_mask, lv,
                        offs_rows]
                specs = [rows_sp, rep, rep, rows_sp, rows_sp, rep,
                         rows_sp]
                if quant:
                    args += [k_sc, v_sc]
                    specs += [rep, rep]
                out = shard_map(
                    _pd, mesh=mesh_, in_specs=tuple(specs),
                    out_specs=rows_sp, check_vma=False,
                )(*args)
            else:
                out = paged_decode(
                    q, k_all, v_all, page_table, kv_mask,
                    layer=lidx, num_kv_heads=Kv,
                    k_scale=k_sc, v_scale=v_sc,
                    causal=S > 1, offset=offset if S > 1 else 0,
                )
            return (_mm(out.reshape(B, S, H * Dh), p["wo"]),
                    (k_all, v_all, k_sc, v_sc))
        if k_sc is not None:  # int8 cache: quantize this step's K/V
            k2, ks2 = quantize_kv(k)
            v2, vs2 = quantize_kv(v)
            # scales are slot-minor [L, B, Kv, Smax]
            if per_row:
                rows = jnp.arange(B)
                if S == 1:
                    k_sc = k_sc.at[lidx, rows, :, offset].set(ks2[:, 0, :])
                    v_sc = v_sc.at[lidx, rows, :, offset].set(vs2[:, 0, :])
                else:
                    idx = offset[:, None] + jnp.arange(S)[None, :]
                    k_sc = k_sc.at[lidx, rows[:, None], :, idx].set(ks2)
                    v_sc = v_sc.at[lidx, rows[:, None], :, idx].set(vs2)
            else:
                k_sc = jax.lax.dynamic_update_slice(
                    k_sc, ks2.transpose(0, 2, 1)[None], (lidx, 0, 0, offset))
                v_sc = jax.lax.dynamic_update_slice(
                    v_sc, vs2.transpose(0, 2, 1)[None], (lidx, 0, 0, offset))
            k2, v2 = k2[None], v2[None]
        else:
            k2 = k.reshape(B, S, Kv * Dh).astype(k_all.dtype)[None]
            v2 = v.reshape(B, S, Kv * Dh).astype(v_all.dtype)[None]
        if per_row:
            # continuous-batching decode (serving.py): each slot appends at
            # its OWN length. Rows are slot-dense (position ≡ slot index).
            # S == 1: the per-row kv_mask alone encodes causality — the
            # kernel runs mask-bounded with causal=False. S > 1 (the
            # speculative verify chunk): all S slots are mask-valid before
            # attention, so within-chunk causality needs the per-row causal
            # bound slot ≤ offset[b] + j.
            rows = jnp.arange(B)
            if S == 1:
                k_all = k_all.at[lidx, rows, offset, :].set(k2[0][:, 0, :])
                v_all = v_all.at[lidx, rows, offset, :].set(v2[0][:, 0, :])
                att_causal, att_window, att_off = False, None, 0
            else:
                idx = offset[:, None] + jnp.arange(S)[None, :]
                k_all = k_all.at[lidx, rows[:, None], idx, :].set(k2[0])
                v_all = v_all.at[lidx, rows[:, None], idx, :].set(v2[0])
                att_causal, att_window, att_off = (
                    True, cfg.sliding_window, offset
                )
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k2, (lidx, 0, offset, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v2, (lidx, 0, offset, 0))
            att_causal, att_window, att_off = causal, cfg.sliding_window, offset
        out = cached_attention(
            q, k_all, v_all, kv_mask,
            k_scale=k_sc, v_scale=v_sc,
            layer=lidx, offset=att_off, causal=att_causal,
            sliding_window=att_window, num_kv_heads=Kv,
        )
        new_kv = (k_all, v_all, k_sc, v_sc)
    else:
        out = multi_head_attention(
            q, k, v, padding_mask,
            causal=causal, sliding_window=cfg.sliding_window,
        )
        new_kv = (k, v)
    out = _mm(out.reshape(B, S, H * Dh), p["wo"])
    return out, new_kv


def _dense_mlp(p: dict, x: jax.Array) -> jax.Array:
    return _mm(jax.nn.silu(_mm(x, p["gate"])) * _mm(x, p["up"]), p["down"])


def _router(p: dict, xt: jax.Array, cfg: ModelConfig):
    """Mixtral token-choice routing: softmax → top-k → renormalize over the
    chosen experts (reference scripts/modeling_mixtral_gritlm.py:843-882)."""
    router_logits = (xt @ _w(p["router"], xt.dtype)).astype(jnp.float32)  # [T, E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    top_w, top_idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return router_logits, probs, top_w, top_idx


def _moe_mlp_dense(p: dict, x: jax.Array, cfg: ModelConfig):
    """Dense-gated MoE: every expert runs on every token, combined by gate
    weights. Exact (no token dropping), MXU-friendly, E/k× extra FLOPs —
    the right choice on few chips. Returns (out, router_logits [T, E])."""
    B, S, D = x.shape
    xt = x.reshape(B * S, D)
    router_logits, probs, top_w, top_idx = _router(p, xt, cfg)
    combine = jax.nn.one_hot(top_idx, probs.shape[-1], dtype=probs.dtype)  # [T,k,E]
    combine = jnp.einsum("tk,tke->te", top_w, combine)  # [T, E]
    h = jnp.einsum("td,edf->etf", xt, _w(p["gate"], xt.dtype))
    u = jnp.einsum("td,edf->etf", xt, _w(p["up"], xt.dtype))
    y = jnp.einsum("etf,efd->etd", jax.nn.silu(h) * u, _w(p["down"], xt.dtype))  # [E, T, D]
    out = jnp.einsum("te,etd->td", combine.astype(y.dtype), y)
    return out.reshape(B, S, D), router_logits, jnp.zeros((), jnp.float32)


def _moe_mlp_gshard(p: dict, x: jax.Array, cfg: ModelConfig):
    """Expert-parallel MoE (GShard dispatch/combine einsums): each token is
    sent to its top-k experts up to a per-expert capacity
    C = ceil(k·T/E · capacity_factor); overflow tokens are dropped (their
    residual stream passes through). With the expert weights sharded on the
    `expert` mesh axis, XLA turns the dispatch/combine einsums into
    all_to_all over ICI — the expert parallelism the reference never had
    (SURVEY §2.8 EP row). capacity_factor ≥ E/k makes it exact (then
    C ≥ k·T/E·(E/k) = T, so no route can overflow); the returned dropped
    fraction quantifies training quality loss at smaller factors (the
    reference computes every token's top-k densely and never drops,
    scripts/modeling_mixtral_gritlm.py:843-882)."""
    B, S, D = x.shape
    T = B * S
    E = cfg.num_local_experts
    k = cfg.num_experts_per_tok
    xt = x.reshape(T, D)
    router_logits, probs, top_w, top_idx = _router(p, xt, cfg)
    C = int(math.ceil(k * T / E * cfg.capacity_factor))
    C = min(max(C, 1), T)

    # position of each (choice, token) within its expert, choice-major so the
    # top-1 choice wins capacity over top-2 (GShard priority)
    masks = jax.nn.one_hot(top_idx, E, dtype=jnp.int32)  # [T, k, E]
    mask_flat = masks.transpose(1, 0, 2).reshape(k * T, E)
    pos_flat = jnp.cumsum(mask_flat, axis=0) * mask_flat - 1  # [k*T, E]
    pos = pos_flat.reshape(k, T, E).transpose(1, 0, 2)  # [T, k, E]
    pos = jnp.sum(pos * masks, axis=-1)  # [T, k] slot in chosen expert
    kept = (pos < C) & (pos >= 0)

    # dispatch [T, E, C] one-hot; combine adds the gate weights
    dispatch = (
        jax.nn.one_hot(top_idx, E, dtype=jnp.float32)[..., None]
        * jax.nn.one_hot(jnp.where(kept, pos, C), C + 1, dtype=jnp.float32)[
            :, :, None, :C
        ]
    )  # [T, k, E, C]
    combine = jnp.einsum("tk,tkec->tec", top_w, dispatch)  # [T, E, C]
    dispatch = jnp.sum(dispatch, axis=1)  # [T, E, C]

    # fraction of (token, choice) routes that overflowed capacity — surfaced
    # through forward()'s aux into train metrics
    dropped_frac = jnp.maximum(
        1.0 - jnp.sum(kept.astype(jnp.float32)) / (T * k), 0.0
    )

    xe = jnp.einsum("td,tec->ecd", xt.astype(jnp.float32), dispatch)  # [E,C,D]
    xe = xe.astype(x.dtype)
    h = jnp.einsum("ecd,edf->ecf", xe, _w(p["gate"], xe.dtype))
    u = jnp.einsum("ecd,edf->ecf", xe, _w(p["up"], xe.dtype))
    ye = jnp.einsum("ecf,efd->ecd", jax.nn.silu(h) * u, _w(p["down"], xe.dtype))  # [E,C,D]
    out = jnp.einsum("ecd,tec->td", ye.astype(jnp.float32), combine)
    return out.astype(x.dtype).reshape(B, S, D), router_logits, dropped_frac


def _moe_mlp_dropless(p: dict, x: jax.Array, cfg: ModelConfig):
    """Dropless MoE (MegaBlocks-style): sort the T·k (token, choice) pairs by
    expert and run grouped matmuls with jax.lax.ragged_dot — every token's
    top-k experts always compute (exactly the reference's semantics,
    scripts/modeling_mixtral_gritlm.py:843-882) at FLOPs ∝ T·k instead of
    dense's T·E, with static shapes throughout (argsort + bincount). The
    exact choice for big-T single-host / FSDP runs; `gshard` remains the
    expert-parallel (all_to_all) path with its capacity/drop tradeoff."""
    B, S, D = x.shape
    T = B * S
    k = cfg.num_experts_per_tok
    E = cfg.num_local_experts
    xt = x.reshape(T, D)
    router_logits, probs, top_w, top_idx = _router(p, xt, cfg)

    flat_e = top_idx.reshape(-1)  # [T*k] expert of each (token, choice)
    order = jnp.argsort(flat_e)  # stable → tokens stay ordered within expert
    tok = order // k  # owning token of each sorted row
    xs = jnp.take(xt, tok, axis=0)  # [T*k, D] rows grouped by expert
    group_sizes = jnp.bincount(flat_e, length=E)  # [E]

    h = jax.lax.ragged_dot(xs, _w(p["gate"], xs.dtype), group_sizes)
    u = jax.lax.ragged_dot(xs, _w(p["up"], xs.dtype), group_sizes)
    ys = jax.lax.ragged_dot(
        jax.nn.silu(h) * u, _w(p["down"], xs.dtype), group_sizes,
    )  # [T*k, D]
    # combine by INVERTING the sort permutation (gather) instead of a
    # scatter-add over tok: XLA TPU scatters serialize — measured v5e,
    # 8x88M top-2 encode (scripts/exp_moe_combine.py): scatter
    # combine +1.22 ms/layer vs gather +0.46 ms, outputs bit-identical
    inv = jnp.argsort(order)  # rows back to (token, choice) order
    ys_tok = jnp.take(ys, inv, axis=0).reshape(T, k, D)
    out = jnp.einsum(
        "tkd,tk->td", ys_tok.astype(jnp.float32), top_w.astype(jnp.float32)
    )
    return (out.astype(x.dtype).reshape(B, S, D), router_logits,
            jnp.zeros((), jnp.float32))


# moe_impl="auto" crossover, measured on v5e (scripts/exp_moe_impl.py, 8
# experts × ~88M/layer top-2 bf16): below this many tokens the dense
# all-experts pass wins (decode B=8: 4.14 vs 9.14 ms/tok — at tiny T every
# expert's weights stream from HBM anyway, so routing machinery is pure
# overhead); at/above it dropless ragged_dot wins (encode 32×512: 232 vs
# 134 embeds/s — top-2 FLOPs instead of all-8). Static shape ⇒ the branch
# resolves at trace time, no runtime cost.
MOE_AUTO_DENSE_MAX = 1024


def _moe_mlp(p: dict, x: jax.Array, cfg: ModelConfig):
    impl = cfg.moe_impl
    if impl == "auto":
        T = x.shape[0] * x.shape[1]
        impl = "dense" if T < MOE_AUTO_DENSE_MAX else "dropless"
    if impl == "gshard":
        return _moe_mlp_gshard(p, x, cfg)
    if impl == "dropless":
        return _moe_mlp_dropless(p, x, cfg)
    return _moe_mlp_dense(p, x, cfg)


def load_balancing_loss(router_logits: jax.Array, cfg: ModelConfig,
                        padding_mask: Optional[jax.Array] = None) -> jax.Array:
    """Switch-style aux loss over all layers' router logits, with the padding
    correction of the reference (scripts/modeling_mixtral_gritlm.py:80-153).
    router_logits: [L, T, E] (T = B*S); padding_mask: [B, S] or None."""
    L, T, E = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    _, top_idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    expert_mask = jax.nn.one_hot(top_idx, E, dtype=jnp.float32)  # [L, T, k, E]
    if padding_mask is not None:
        w = padding_mask.reshape(1, T, 1, 1).astype(jnp.float32)
        tokens = jnp.maximum(jnp.sum(padding_mask), 1.0)
        # same normalization as the unpadded branch / HF Mixtral
        # (modeling_mixtral_gritlm.py:135-138): per-expert routed fraction
        # summed over the k choice slots, masked tokens excluded
        tokens_per_expert = jnp.sum(expert_mask * w, axis=(0, 1, 2)) / (
            tokens * L
        )
        router_prob = jnp.sum(probs * w[:, :, 0, :], axis=(0, 1)) / (tokens * L)
    else:
        tokens_per_expert = jnp.mean(jnp.sum(expert_mask, axis=2), axis=(0, 1))
        router_prob = jnp.mean(probs, axis=(0, 1))
    return jnp.sum(tokens_per_expert * router_prob) * E


# ---------------------------------------------------------------------------
# Forward


def forward(
    params: dict,
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, S]
    *,
    attention_mask: Optional[jax.Array] = None,  # [B, S] 1 = real token
    causal: bool = True,
    positions: Optional[jax.Array] = None,  # [B, S]
    cache: Optional[KVCache] = None,
    row_offsets: Optional[jax.Array] = None,  # [B] per-slot cache offsets
    remat: bool = False,
    remat_policy: Optional[str] = None,
    output_router_logits: bool = False,
    final_norm: bool = True,
    shard_rows: Optional[tuple] = None,  # (Mesh, batch-axis names)
):
    """Run the trunk (no LM head). Returns (hidden [B,S,D], new_cache, aux).

    `final_norm=False` skips the final RMSNorm and returns the raw residual
    stream — for callers that fuse the norm into their epilogue
    (ops/fused_pool.fused_norm_mean_pool on the encode path).

    `causal=False` is the GritLM <|embed|> mode: full bidirectional attention
    under the padding mask (reference MistralModel.forward is_causal kwarg,
    scripts/modeling_mistral_gritlm.py:936-1036).

    With `cache`, keys/values are written at `cache.length` and attention runs
    over all valid cache slots (cache.mask) — used for prefill + decode and
    for RAG cache reuse.

    With `row_offsets` [B] (requires cache), each batch row appends at its
    OWN slot offset — the continuous-batching decode step (serving.py),
    where every slot holds an independent request at an independent
    length. Rows must be slot-dense (slot index ≡ position). S > 1 is the
    speculative verify chunk: S tokens append per row with causal
    attention inside the chunk; the caller clears rejected slots' mask
    bits afterwards.

    `shard_rows=(mesh, axes)` (paged caches only) runs the paged decode
    kernel per-shard under shard_map: rows shard over the mesh's batch
    axes, the page pool replicates (so pinned prefix pages are shared by
    all shards) — the multi-chip serving path (serving.py).
    """
    B, S = input_ids.shape
    x = jnp.take(params["embed"]["embedding"], input_ids, axis=0)

    if positions is None:
        if row_offsets is not None:
            positions = row_offsets[:, None] + jnp.arange(S)[None, :]
        elif cache is not None:
            positions = cache.length + jnp.arange(S)[None, :]
            positions = jnp.broadcast_to(positions, (B, S))
        else:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))

    paged = isinstance(cache, PagedKVCache)
    if paged and row_offsets is None:
        raise ValueError(
            "PagedKVCache is decode-only: requires row_offsets (serving "
            "prefills run on dense row caches, copied into pages at "
            "admission — serving.py)"
        )
    if cache is not None:
        step_mask = (
            attention_mask
            if attention_mask is not None
            else jnp.ones((B, S), jnp.int32)
        )
        if row_offsets is not None:
            offset = row_offsets
            if S == 1:
                kv_mask = cache.mask.at[jnp.arange(B), row_offsets].max(
                    step_mask[:, 0].astype(cache.mask.dtype)
                )
            else:
                # speculative verify chunk: S slots per row at its own
                # offset; rejected slots' bits are cleared by the caller
                idx = row_offsets[:, None] + jnp.arange(S)[None, :]
                kv_mask = cache.mask.at[jnp.arange(B)[:, None], idx].max(
                    step_mask.astype(cache.mask.dtype)
                )
        else:
            offset = cache.length
            kv_mask = jax.lax.dynamic_update_slice(
                cache.mask, step_mask.astype(cache.mask.dtype), (0, offset)
            )
    else:
        offset = 0
        kv_mask = None

    def _block(x, lp, layer_cache):
        h = rms_norm(x, lp["ln1"]["scale"], cfg.rms_norm_eps)
        attn_out, new_kv = _attention_block(
            lp["attn"], h, positions, attention_mask, cfg,
            causal=causal, layer_cache=layer_cache,
        )
        x = x + attn_out
        h = rms_norm(x, lp["ln2"]["scale"], cfg.rms_norm_eps)
        if cfg.is_moe:
            mlp_out, router_logits, dropped = _moe_mlp(lp["moe"], h, cfg)
        else:
            mlp_out = _dense_mlp(lp["mlp"], h)
            router_logits = jnp.zeros((0,), jnp.float32)
            dropped = jnp.zeros((), jnp.float32)
        return x + mlp_out, new_kv, router_logits, dropped

    # quantized serving leaves (int4 AND int8) ride the scan as loop-
    # invariant closures (scalar-prefetch indexed inside the kernel), never
    # as sliced xs — see _split_q4_leaves for why.
    layers_xs, q4_stacked = _split_q4_leaves(params["layers"])

    new_cache = None
    aux = {}
    if cache is not None:
        # The full cache rides the scan CARRY: each layer appends its step
        # K/V with one dynamic_update_slice (in place — XLA aliases carry
        # buffers) and attends directly against the full HBM buffer. Never
        # stack per-layer caches as scan ys: that materializes a whole new
        # [L,B,Smax,KD] cache per decode step, which dominated decode time.
        page_table = cache.page_table if paged else None

        def layer_fn(carry, lp_and_idx):
            x, k_all, v_all, k_sc, v_sc = carry
            lp, lidx = lp_and_idx
            if q4_stacked:
                lp = _merge_q4_leaves(lp, q4_stacked, lidx)
            x, (k_all, v_all, k_sc, v_sc), router_logits, dropped = _block(
                x, lp,
                (k_all, v_all, k_sc, v_sc, kv_mask, offset, lidx,
                 page_table, shard_rows if paged else None),
            )
            out_aux = (router_logits, dropped) if output_router_logits else ()
            return (x, k_all, v_all, k_sc, v_sc), out_aux

        if remat:
            layer_fn = _remat(layer_fn, remat_policy)
        (x, k_all, v_all, k_sc, v_sc), ys = jax.lax.scan(
            layer_fn,
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
            (layers_xs, jnp.arange(cfg.num_hidden_layers)),
        )
        if paged:
            new_cache = cache._replace(
                k=k_all, v=v_all, mask=kv_mask, k_scale=k_sc, v_scale=v_sc,
            )
        else:
            new_cache = KVCache(
                k=k_all, v=v_all, mask=kv_mask,
                # per-row offsets: the scalar length is not meaningful — slot
                # occupancy lives in the mask / the serving engine's row_lens
                length=(cache.length if row_offsets is not None
                        else cache.length + S),
                k_scale=k_sc, v_scale=v_sc,
            )
    else:
        def layer_fn(carry, lp_and_idx):
            x = carry
            lp, lidx = lp_and_idx
            if q4_stacked:
                lp = _merge_q4_leaves(lp, q4_stacked, lidx)
            x, _, router_logits, dropped = _block(x, lp, None)
            # Only stack what callers will read: router logits when training
            # asks for them. Unconditional ys would burn HBM on stacks
            # nobody reads.
            out_aux = (router_logits, dropped) if output_router_logits else ()
            return x, out_aux

        if remat:
            layer_fn = _remat(layer_fn, remat_policy)
        x, ys = jax.lax.scan(
            layer_fn, x, (layers_xs, jnp.arange(cfg.num_hidden_layers))
        )

    if final_norm:
        x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
    if output_router_logits:
        aux["router_logits"] = ys[0]
        aux["moe_dropped_frac"] = jnp.mean(ys[1])  # over layers
    return x, new_cache, aux


def apply_layer_stack(
    layer_params: dict,
    x: jax.Array,  # [B, S, D]
    positions: jax.Array,  # [B, S]
    attention_mask: Optional[jax.Array],
    cfg: ModelConfig,
    *,
    causal: bool,
    remat: bool = False,
    remat_policy: Optional[str] = None,
    ring_axis: Optional[str] = None,
    collect_router_stats: bool = False,
):
    """Run a (slice of the) stacked layer pytree over x — no cache, no router
    outputs. The scan body matches forward()'s layer_fn; factored out so the
    pipeline-parallel schedule (parallel/pipeline.py) and the
    sequence-parallel path (parallel/seqpar.py, via `ring_axis`) can run it
    on their shards.

    `collect_router_stats=True` (MoE training under PP/SP) additionally
    returns the load-balancing-loss numerators summed over this slice's
    layers and tokens: (cnt [E] — masked top-k route counts, prob [E] —
    masked router-prob sums). load_balancing_loss decomposes as
    Σ_e cnt_e·prob_e·E/(tokens·L)² with both numerators summed over ALL
    layers (HF Mixtral concatenates layers before the mean,
    scripts/modeling_mixtral_gritlm.py:135-138), so per-slice/per-shard
    partial sums psum'ed over the stage/seq axes reproduce it exactly."""
    w = None
    if collect_router_stats:
        w = (attention_mask if attention_mask is not None
             else jnp.ones(x.shape[:2], jnp.int32))
        w = w.reshape(-1, 1).astype(jnp.float32)  # [T, 1]

    def layer_fn(carry, lp):
        x = carry
        h = rms_norm(x, lp["ln1"]["scale"], cfg.rms_norm_eps)
        attn_out, _ = _attention_block(
            lp["attn"], h, positions, attention_mask, cfg, causal=causal,
            ring_axis=ring_axis,
        )
        x = x + attn_out
        h = rms_norm(x, lp["ln2"]["scale"], cfg.rms_norm_eps)
        stats = None
        if cfg.is_moe:
            mlp_out, router_logits, _ = _moe_mlp(lp["moe"], h, cfg)
            if collect_router_stats:
                # same fp32 softmax/top-k as load_balancing_loss
                probs = jax.nn.softmax(
                    router_logits.astype(jnp.float32), axis=-1)
                _, top_idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
                onehot = jax.nn.one_hot(
                    top_idx, cfg.num_local_experts, dtype=jnp.float32)
                cnt = jnp.sum(onehot * w[:, :, None], axis=(0, 1))  # [E]
                prob = jnp.sum(probs * w, axis=0)  # [E]
                stats = (cnt, prob)
        else:
            mlp_out = _dense_mlp(lp["mlp"], h)
        if collect_router_stats and stats is None:
            z = jnp.zeros((getattr(cfg, "num_local_experts", 1) or 1,),
                          jnp.float32)
            stats = (z, z)
        return x + mlp_out, (stats if collect_router_stats else None)

    if remat:
        layer_fn = _remat(layer_fn, remat_policy)
    x, ys = jax.lax.scan(layer_fn, x, layer_params)
    if collect_router_stats:
        cnt, prob = ys
        return x, (jnp.sum(cnt, axis=0), jnp.sum(prob, axis=0))
    return x


def lm_head_kernel(params: dict, cfg: ModelConfig, dtype) -> jax.Array:
    """The [D, V] LM-head kernel (dequantized if serving-quantized), shared
    by logits_from_hidden and the fused head+CE training loss."""
    if "lm_head" in params:
        return _w(params["lm_head"]["kernel"], dtype)
    if cfg.tie_word_embeddings:
        return params["embed"]["embedding"].T.astype(dtype)
    raise ValueError("No LM head in params and embeddings are not tied")


def logits_from_hidden(params: dict, cfg: ModelConfig, hidden: jax.Array) -> jax.Array:
    if "lm_head" in params:
        node = params["lm_head"]["kernel"]
        if isinstance(node, dict) and ("q4" in node or "q8" in node):
            return _mm(hidden, node)
    return hidden @ lm_head_kernel(params, cfg, hidden.dtype)


def forward_lm(params, cfg, input_ids, **kw):
    """Trunk + LM head → (logits [B,S,V], new_cache, aux)."""
    hidden, new_cache, aux = forward(params, cfg, input_ids, **kw)
    return logits_from_hidden(params, cfg, hidden), new_cache, aux


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
