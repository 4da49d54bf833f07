"""int8 KV cache: quantized decode vs the bf16 cache path.

The quantized cache halves the HBM bytes decode streams per step (the
dominant long-context decode cost) and doubles cache capacity; these tests
pin the numerics: per-(slot, head) absmax int8 round-trips near-losslessly,
the fused in-kernel dequant matches a dequantize-then-attend oracle, and
end-to-end greedy generation agrees with the bf16 cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.models.transformer import (
    forward,
    init_cache,
    quantize_kv,
)


def test_quantize_kv_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3, 64)) * 3.0
    q, s = quantize_kv(x)
    deq = (
        q.reshape(2, 5, 3, 64).astype(jnp.float32)
        * s[..., None].astype(jnp.float32)
    )
    err = np.max(np.abs(np.asarray(deq - x)))
    amax = float(jnp.max(jnp.abs(x)))
    assert err <= amax / 127.0 + 1e-6  # one quantization step


def test_flash_decode_quant_matches_dequant_oracle():
    from gritlm_tpu.ops.attention import make_attention_bias, mha_reference
    from gritlm_tpu.ops.decode_attention import flash_decode

    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    B, Smax, H, Hkv, Dh, L = 2, 256, 4, 2, 128, 2
    length = 130
    q = jax.random.normal(keys[0], (B, 1, H, Dh)) * 0.5
    kf = jax.random.normal(keys[1], (L, B, Smax, Hkv, Dh)) * 0.7
    vf = jax.random.normal(keys[2], (L, B, Smax, Hkv, Dh)) * 0.7
    # quantize the whole cache the same way the write path does
    k8s, ks = jax.vmap(quantize_kv)(kf)  # [L,B,Smax,KD], [L,B,Smax,Kv]
    v8s, vs = jax.vmap(quantize_kv)(vf)
    ks_t = ks.transpose(0, 1, 3, 2)  # slot-minor [L,B,Kv,Smax]
    vs_t = vs.transpose(0, 1, 3, 2)
    mask = jnp.broadcast_to(
        (jnp.arange(Smax)[None, :] < length).astype(jnp.int32), (B, Smax)
    )
    for layer in range(L):
        got = flash_decode(
            q, k8s, v8s, mask, causal=True, offset=length - 1, layer=layer,
            num_kv_heads=Hkv, k_scale=ks_t, v_scale=vs_t,
        )
        # oracle: dequantize, then exact attention
        kd = (k8s[layer].reshape(B, Smax, Hkv, Dh).astype(jnp.float32)
              * ks[layer][..., None].astype(jnp.float32))
        vd = (v8s[layer].reshape(B, Smax, Hkv, Dh).astype(jnp.float32)
              * vs[layer][..., None].astype(jnp.float32))
        bias = make_attention_bias(mask, 1, Smax, causal=True,
                                   offset=length - 1)
        want = mha_reference(q, kd, vd, bias)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=5e-3
        )


def test_quant_cache_decode_close_to_bf16(cfg, params):
    """Prefill + single-token decode through forward() with an int8 cache
    tracks the bf16-cache hidden states closely."""
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    outs = {}
    for quant in (False, True):
        cache = init_cache(cfg, 2, 16, quant=quant)
        _, cache, _ = forward(
            params, cfg, ids[:, :9], attention_mask=mask[:, :9],
            causal=True, cache=cache,
        )
        h, cache, _ = forward(
            params, cfg, ids[:, 9:10], attention_mask=mask[:, 9:10],
            causal=True, cache=cache,
        )
        outs[quant] = np.asarray(h[:, 0], np.float32)
        assert int(cache.length) == 10
    err = np.max(np.abs(outs[True] - outs[False]))
    ref = np.max(np.abs(outs[False])) + 1e-6
    assert err / ref < 0.05, (err, ref)


def test_generate_with_quant_cache(cfg, params):
    """Greedy generation with kv_quant produces valid tokens and (for a
    tiny random model) overwhelmingly agrees with the bf16 cache path."""
    from gritlm_tpu.gritlm import GritLM

    m_bf = GritLM(cfg, params=params, mode="unified", attn="bbcc")
    m_q8 = GritLM(cfg, params=params, mode="unified", attn="bbcc",
                  kv_quant=True)
    prompts = ["<|user|>\nSay a word\n<|assistant|>\n"] * 2
    enc = m_bf.tokenizer(prompts)
    r_bf = m_bf.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                                  max_new_tokens=8)
    r_q8 = m_q8.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                                  max_new_tokens=8)
    a, b = np.asarray(r_bf.tokens), np.asarray(r_q8.tokens)
    agree = float((a == b).mean())
    assert agree >= 0.75, (agree, a, b)


def test_concat_and_pad_quant_caches(cfg, params):
    from gritlm_tpu.generate import concat_caches, pad_cache_to

    rng = np.random.default_rng(1)
    caches = []
    for s in (6, 8):
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, s)), jnp.int32)
        cache = init_cache(cfg, 2, s, quant=True)
        _, cache, _ = forward(params, cfg, ids, causal=False, cache=cache)
        caches.append(cache)
    cat = concat_caches(caches[0], caches[1])
    assert cat.quantized and int(cat.length) == 14
    assert cat.k_scale.shape[-1] == 14
    padded = pad_cache_to(cat, 32)
    assert padded.k.shape[2] == 32 and padded.k_scale.shape[-1] == 32
    assert int(np.asarray(padded.mask).sum()) == 28

def test_mesh_generate_with_quant_cache():
    """int8 cache over a (data, fsdp) mesh: scale leaves must shard/pad with
    the K/V rows; tokens must match the single-device quantized path."""
    from gritlm_tpu.gritlm import GritLM
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    m_mesh = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                    mesh=mesh, kv_quant=True)
    m_one = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0,
                   kv_quant=True)
    docs = ["context document A", "context doc B", "third ctx"]
    outs = []
    for m in (m_mesh, m_one):
        _, cache = m.encode(docs, get_cache=True, batch_size=4)
        assert cache.quantized
        enc = m.tokenizer(["\nQ?\n<|assistant|>\n"] * len(docs),
                          add_special_tokens=False)
        res = m.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                                  cache=cache, max_new_tokens=5)
        outs.append(np.asarray(res.tokens))
    np.testing.assert_array_equal(outs[0], outs[1])

def test_concat_caches_total_len(cfg, params):
    """total_len sizes the buffer in one shot (masked tail slots) so the
    follow-up pad_cache_to is a no-op — and numerics match concat+pad."""
    rng = np.random.default_rng(2)
    caches = []
    for s in (6, 8):
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, s)), jnp.int32)
        cache = init_cache(cfg, 2, s, quant=False)
        _, cache, _ = forward(params, cfg, ids, causal=False, cache=cache)
        caches.append(cache)
    from gritlm_tpu.generate import concat_caches, pad_cache_to

    sized = concat_caches(caches[0], caches[1], total_len=32)
    two_step = pad_cache_to(concat_caches(caches[0], caches[1]), 32)
    assert sized.k.shape == two_step.k.shape == caches[0].k.shape[:2] + (32,) + caches[0].k.shape[3:]
    np.testing.assert_array_equal(np.asarray(sized.k), np.asarray(two_step.k))
    np.testing.assert_array_equal(np.asarray(sized.mask), np.asarray(two_step.mask))
    assert int(sized.length) == 14
    # pad_cache_to on the sized cache is a no-op (same object)
    assert pad_cache_to(sized, 32) is sized
