"""Ring attention: exact attention over a sequence-sharded mesh axis.

Sequence parallelism is ABSENT in the reference (max train seq 2048; SURVEY
§5.7) — this is the TPU-native long-context capability justified by the
north star's long-document RAG focus. Inside `shard_map` with the sequence
dimension sharded over `axis_name`, each device holds q/k/v shards
[B, S/P, H, Dh]; K/V shards rotate around the ICI ring via `ppermute` while
every device accumulates its queries' attention online:

  out = Σ_i softmax-partial(q, kv_i)  merged by log-sum-exp weights,

which is flash attention's online-softmax identity applied at shard
granularity — exact, not approximate. Causality is enforced through the
absolute q/k offsets of each shard, so bidirectional (<|embed|>) and causal
modes both work. P-1 ppermute steps ride the ICI ring; compute of step i
overlaps the transfer of step i+1 (XLA schedules the ppermute async).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gritlm_tpu.ops.attention import NEG_INF


def _partial_attention(
    q: jax.Array,  # [B, Sq, H, Dh]
    k: jax.Array,  # [B, Sk, Hkv, Dh]
    v: jax.Array,
    kv_mask: Optional[jax.Array],  # [B, Sk]
    *,
    causal: bool,
    sliding_window: Optional[int],
    q_offset,
    k_offset,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out [B,Sq,H,Dh] normalized within this kv shard,
    lse [B,Sq,H] log-denominator). Large shards route through the Pallas
    flash kernel (blockwise — no [B,H,Sq,Sk] score materialization, which is
    what makes long-context ring shards memory-feasible); tiny shards fall
    back to the einsum reference. fp32 softmax either way."""
    b, sq, h, d = q.shape
    if d % 128 == 0 and sq >= 128 and k.shape[1] >= 128:
        from gritlm_tpu.ops.flash_attention import _flash_call

        mask = kv_mask if kv_mask is not None else jnp.ones(k.shape[:2], jnp.int32)
        # the kernel's causal/window rule is on offset + q_row vs local k_pos;
        # offset = q_offset − k_offset reproduces the ring shard geometry
        out, lse_str = _flash_call(
            q, k, v, mask, causal, sliding_window if causal else None,
            jnp.asarray(q_offset - k_offset, jnp.int32), with_lse=True,
        )
        lse = lse_str.reshape(b, h, 8, -1)[:, :, 0, :sq].transpose(0, 2, 1)
        return out, lse
    hkv = k.shape[2]
    g = h // hkv
    scale = d ** -0.5
    qg = q.reshape(b, sq, hkv, g, d)
    s = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [B, Hkv, G, Sq, Sk]
    keep = jnp.ones((b, 1, 1, sq, k.shape[1]), bool)
    if kv_mask is not None:
        keep &= kv_mask[:, None, None, None, :].astype(bool)
    if causal:
        q_pos = q_offset + jnp.arange(sq)
        k_pos = k_offset + jnp.arange(k.shape[1])
        keep &= (k_pos[None, :] <= q_pos[:, None])[None, None, None]
        if sliding_window is not None:
            keep &= (k_pos[None, :] > q_pos[:, None] - sliding_window)[
                None, None, None
            ]
    s = jnp.where(keep, s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, Hkv, G, Sq]
    m_safe = jnp.maximum(m, NEG_INF / 2)
    p = jnp.where(keep, jnp.exp(s - m_safe[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)  # [B, Hkv, G, Sq]
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p.astype(v.dtype), v)
    safe_l = jnp.where(l > 0, l, 1.0)
    out = out / safe_l.transpose(0, 3, 1, 2)[..., None].astype(out.dtype)
    lse = jnp.where(l > 0, m_safe + jnp.log(safe_l), NEG_INF)  # [B,Hkv,G,Sq]
    lse = lse.transpose(0, 3, 1, 2).reshape(b, sq, h)
    return out.reshape(b, sq, h, d), lse


def ring_attention(
    q: jax.Array,  # [B, S/P, H, Dh] local query shard
    k: jax.Array,  # [B, S/P, Hkv, Dh] local key shard
    v: jax.Array,
    kv_mask: Optional[jax.Array],  # [B, S/P] local key validity
    *,
    causal: bool,
    axis_name: str,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Call inside shard_map with the sequence dim sharded over axis_name."""
    p_size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    s_loc = q.shape[1]
    q_off = idx * s_loc

    perm = [(j, (j + 1) % p_size) for j in range(p_size)]
    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:2], jnp.int32)

    acc = jnp.zeros(q.shape[:2] + (q.shape[2], q.shape[3]), jnp.float32)
    m_run = jnp.full(q.shape[:2] + (q.shape[2],), NEG_INF, jnp.float32)
    l_run = jnp.zeros(q.shape[:2] + (q.shape[2],), jnp.float32)

    # carry: m = running max of partial lse's; l = Σ exp(lse_i − m);
    #        acc = Σ exp(lse_i − m) · out_i   (out_i already normalized)
    k_cur, v_cur, mask_cur = k, v, kv_mask
    for i in range(p_size):
        src = (idx - i) % p_size  # which rank's shard we hold this step
        out_i, lse_i = _partial_attention(
            q, k_cur, v_cur, mask_cur,
            causal=causal, sliding_window=sliding_window,
            q_offset=q_off, k_offset=src * s_loc,
        )
        m_new = jnp.maximum(m_run, lse_i)
        alpha = jnp.exp(m_run - m_new)  # fully-masked rows: 1, harmless (l=0)
        beta = jnp.exp(lse_i - m_new)
        acc = acc * alpha[..., None] + out_i.astype(jnp.float32) * beta[..., None]
        l_run = l_run * alpha + beta
        m_run = m_new
        if i + 1 < p_size:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            mask_cur = jax.lax.ppermute(mask_cur, axis_name, perm)

    out = acc / jnp.maximum(l_run[..., None], 1e-30)
    return out.astype(q.dtype)
