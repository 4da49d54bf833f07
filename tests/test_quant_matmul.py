"""w4a16 serving: group-wise int4 weights + the fused Pallas matmul.

The int4 analogue of test_weight_quant (reference 4-bit path: bitsandbytes
NF4, gritlm/training/run.py:236-284 — load-time only, dequantized to bf16
for compute, exactly as here). Pins: pack/unpack roundtrip exactness, the
Pallas kernel against the XLA dequantize-matmul (interpret mode), quality
vs bf16 on the tiny model, and mesh sharding of q4 leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.ops import quant_matmul as qm
from gritlm_tpu.training.quant import (
    dequantize_kernel_int4,
    quantize_kernel_int4,
    unpack_int4,
)


def test_int4_pack_unpack_roundtrip():
    """Values already on the int4 grid survive quantize→unpack exactly."""
    rng = np.random.default_rng(0)
    g = 16
    K, N = 64, 32
    vals = rng.integers(-7, 8, (K, N)).astype(np.float32)
    # per-group scale 1.0: make each group's absmax exactly 7
    vals[0::g // 2, :] = 7.0
    node = quantize_kernel_int4(jnp.asarray(vals), group_size=g)
    assert node["q4"].dtype == jnp.uint8
    assert node["q4"].shape == (K // 2, N)
    assert node["scale"].shape == (K // g, N)
    q, scale = unpack_int4(node)
    np.testing.assert_array_equal(np.asarray(scale), np.ones((K // g, N)))
    np.testing.assert_array_equal(np.asarray(q), vals.astype(np.int32))
    deq = dequantize_kernel_int4(node, jnp.float32)
    np.testing.assert_array_equal(np.asarray(deq), vals)


def test_int4_quantization_error_bounded():
    """RTN error ≤ scale/2 per element."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    node = quantize_kernel_int4(w, group_size=128)
    deq = dequantize_kernel_int4(node, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    step = np.repeat(np.asarray(node["scale"]), 128, axis=0)
    assert (err <= step / 2 + 1e-6).all()


@pytest.mark.parametrize(
    "M,K,N,g",
    [
        (8, 512, 256, 32),  # decode-shaped, single k-block (gbh=8)
        (3, 512, 384, 32),  # M needs padding
        (16, 2048, 512, 16),  # four k-blocks at kbp cap, gbh=16
    ],
)
def test_w4_kernel_matches_reference(monkeypatch, M, K, N, g):
    monkeypatch.setattr(qm, "_FORCE_KERNEL", True)
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    node = quantize_kernel_int4(w, group_size=g)
    got = np.asarray(qm.w4a16_matmul(x, node), np.float32)
    # exact fp32 oracle: the kernel applies the group scale to the fp32
    # partial dot (reference rounds dequantized weights to bf16 first), so
    # both paths must sit within bf16-dot distance of the fp32 answer
    exact = np.asarray(x, np.float32) @ np.asarray(
        dequantize_kernel_int4(node, jnp.float32)
    )
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 5e-3, rel
    want = np.asarray(qm._reference(x, node), np.float32)
    rel_ref = np.linalg.norm(want - exact) / np.linalg.norm(exact)
    assert rel < rel_ref + 5e-3, (rel, rel_ref)


def test_w4_kernel_leading_dims_and_fallbacks(monkeypatch):
    monkeypatch.setattr(qm, "_FORCE_KERNEL", True)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    node = quantize_kernel_int4(w, group_size=128)
    # [B, S, K] input keeps its leading shape
    x = jnp.asarray(rng.normal(size=(2, 4, 256)), jnp.bfloat16)
    out = qm.w4a16_matmul(x, node)
    assert out.shape == (2, 4, 256)
    # prefill-sized row counts take the XLA path (same math, no kernel)
    xb = jnp.asarray(rng.normal(size=(qm.MAX_KERNEL_ROWS + 1, 256)), jnp.bfloat16)
    big = np.asarray(qm.w4a16_matmul(xb, node), np.float32)
    want = np.asarray(qm._reference(xb, node), np.float32)
    rel = np.linalg.norm(big - want) / np.linalg.norm(want)
    assert rel < 5e-3, rel


@pytest.mark.parametrize(
    "M,K,N",
    [
        (8, 512, 256),  # decode-shaped, one k-block
        (3, 512, 384),  # M needs padding
        (16, 1024, 512),  # two k-blocks at the int8 cap
        (300, 512, 256),  # prefill-shaped: two row blocks + row padding
    ],
)
def test_w8_kernel_matches_reference(monkeypatch, M, K, N):
    """The w8a16 Pallas kernel (interpret mode) against the fp32 oracle and
    the XLA dequantize-matmul it replaces on the decode path."""
    from gritlm_tpu.training.quant import dequantize_kernel, quantize_kernel

    monkeypatch.setattr(qm, "_FORCE_KERNEL", True)
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    node = quantize_kernel(w)
    got = np.asarray(qm.w8a16_matmul(x, node), np.float32)
    exact = np.asarray(x, np.float32) @ np.asarray(
        dequantize_kernel(node, jnp.float32)
    )
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 5e-3, rel
    want = np.asarray(qm._reference8(x, node), np.float32)
    rel_ref = np.linalg.norm(want - exact) / np.linalg.norm(exact)
    assert rel < rel_ref + 5e-3, (rel, rel_ref)


def test_w8_kernel_stacked_layer_select(monkeypatch):
    """Layer-stacked serving form: lidx picks the right layer's weights."""
    from gritlm_tpu.training.quant import quantize_kernel

    monkeypatch.setattr(qm, "_FORCE_KERNEL", True)
    rng = np.random.default_rng(5)
    L, K, N = 3, 512, 256
    w = jnp.asarray(rng.normal(size=(L, K, N)).astype(np.float32))
    node = quantize_kernel(w)  # stacked: q8 [L,K,N], scale [L,1,N]
    x = jnp.asarray(rng.normal(size=(4, K)), jnp.bfloat16)
    for lidx in range(L):
        got = np.asarray(
            qm.w8a16_matmul(x, {**node, "lidx": jnp.int32(lidx)}), np.float32
        )
        want = np.asarray(
            qm._reference8(x, {**node, "lidx": jnp.int32(lidx)}), np.float32
        )
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-3, (lidx, rel)


def test_w8_leading_dims_and_fallbacks(monkeypatch):
    from gritlm_tpu.training.quant import quantize_kernel

    monkeypatch.setattr(qm, "_FORCE_KERNEL", True)
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    node = quantize_kernel(w)
    x = jnp.asarray(rng.normal(size=(2, 4, 256)), jnp.bfloat16)
    out = qm.w8a16_matmul(x, node)
    assert out.shape == (2, 4, 256)
    # encode-sized row counts take the XLA path (same math, no kernel)
    xb = jnp.asarray(
        rng.normal(size=(qm.MAX_KERNEL_ROWS8 + 1, 256)), jnp.bfloat16
    )
    big = np.asarray(qm.w8a16_matmul(xb, node), np.float32)
    want = np.asarray(qm._reference8(xb, node), np.float32)
    rel = np.linalg.norm(big - want) / np.linalg.norm(want)
    assert rel < 5e-3, rel
    # non-tiling contracting dim (tiny test models) falls back too
    wt = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(4, 96)), jnp.bfloat16)
    nt = quantize_kernel(wt)
    np.testing.assert_allclose(
        np.asarray(qm.w8a16_matmul(xt, nt), np.float32),
        np.asarray(qm._reference8(xt, nt), np.float32), rtol=5e-3, atol=1e-3,
    )


def _models():
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.gritlm import GritLM

    m = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    mq = GritLM(tiny_mistral(), params=m.params, mode="unified", attn="bbcc",
                weight_quant=4)
    return m, mq


def test_w4_encode_close():
    m, mq = _models()
    sents = ["A cat sat on the mat.", "Bitcoin is a peer-to-peer currency."]
    a = m.encode(sents, instruction="<|user|>\nRepresent\n<|embed|>\n")
    b = mq.encode(sents, instruction="<|user|>\nRepresent\n<|embed|>\n")
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert float(cos.min()) > 0.95, cos


def test_w4_params_are_packed():
    _, mq = _models()
    lp = mq.params["layers"]["attn"]
    for k in ("wq", "wk", "wv", "wo"):
        assert lp[k]["q4"].dtype == jnp.uint8
    assert mq.params["lm_head"]["kernel"]["q4"].dtype == jnp.uint8
    assert mq.params["embed"]["embedding"].dtype != jnp.uint8


def test_w4_generate_runs_with_kv_quant():
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.gritlm import GritLM

    m, _ = _models()
    mq = GritLM(tiny_mistral(), params=m.params, mode="unified", attn="bbcc",
                weight_quant=4, kv_quant=True)
    enc = m.tokenizer(["<|user|>\nHello\n<|assistant|>\n"])
    res = mq.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                               max_new_tokens=6)
    assert res.tokens.shape == (1, 6)


def test_w4_mesh_encode():
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.gritlm import GritLM
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    m, mq = _models()
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    mq_mesh = GritLM(tiny_mistral(), params=m.params, mode="unified",
                     attn="bbcc", weight_quant=4, mesh=mesh)
    sents = ["alpha beta", "gamma delta epsilon", "zeta"]
    a = mq.encode(sents)
    b = mq_mesh.encode(sents)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)
