"""w8a16 serving: int8 weights (+ lm head) for inference.

Decode streams every parameter once per step, so int8 weights halve the
dominant decode bandwidth (the serving analogue of the reference's
bitsandbytes 8-bit load path, gritlm/training/run.py:236-284 — which the
reference only uses for training). These tests pin: quantized encode stays
close to bf16 (cosine), generation mostly agrees, and the quant leaves
shard over a mesh (sharding._with_quant_leaves)."""

import numpy as np

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.gritlm import GritLM


def _models():
    m = GritLM(tiny_mistral(), mode="unified", attn="bbcc", seed=0)
    mq = GritLM(tiny_mistral(), params=m.params, mode="unified", attn="bbcc",
                weight_quant=True)
    return m, mq


def test_weight_quant_encode_close():
    m, mq = _models()
    sents = ["A cat sat on the mat.", "Bitcoin is a peer-to-peer currency."]
    a = m.encode(sents, instruction="<|user|>\nRepresent\n<|embed|>\n")
    b = mq.encode(sents, instruction="<|user|>\nRepresent\n<|embed|>\n")
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert float(cos.min()) > 0.99, cos


def test_weight_quant_params_are_int8():
    import jax.numpy as jnp

    _, mq = _models()
    lp = mq.params["layers"]["attn"]
    for k in ("wq", "wk", "wv", "wo"):
        assert lp[k]["q8"].dtype == jnp.int8
    assert mq.params["lm_head"]["kernel"]["q8"].dtype == jnp.int8
    assert mq.params["embed"]["embedding"].dtype != jnp.int8  # lookup table


def test_weight_quant_generate_agrees_mostly():
    m, mq = _models()
    prompts = ["<|user|>\nSay a word\n<|assistant|>\n"] * 2
    enc = m.tokenizer(prompts)
    a = np.asarray(m.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], max_new_tokens=8).tokens)
    b = np.asarray(mq.generate_from_ids(
        enc["input_ids"], enc["attention_mask"], max_new_tokens=8).tokens)
    agree = float((a == b).mean())
    assert agree >= 0.7, (agree, a, b)


def test_weight_quant_mesh_encode():
    """Quant leaves get expanded shardings: q8 keeps the kernel spec, the
    scale drops the contracting axis — device_put over the mesh must work
    and produce the same embeddings as the single-device quantized path."""
    from gritlm_tpu.parallel import MeshConfig, make_mesh

    m, mq = _models()
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    mq_mesh = GritLM(tiny_mistral(), params=m.params, mode="unified",
                     attn="bbcc", weight_quant=True, mesh=mesh)
    sents = ["alpha beta", "gamma delta epsilon", "zeta"]
    a = mq.encode(sents)
    b = mq_mesh.encode(sents)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)


def test_weight_quant_with_kv_quant():
    """Both serving quantizations compose (int8 weights + int8 KV cache)."""
    m, _ = _models()
    mq = GritLM(tiny_mistral(), params=m.params, mode="unified", attn="bbcc",
                weight_quant=True, kv_quant=True)
    enc = m.tokenizer(["<|user|>\nHello\n<|assistant|>\n"])
    res = mq.generate_from_ids(enc["input_ids"], enc["attention_mask"],
                               max_new_tokens=6)
    assert res.tokens.shape == (1, 6)
