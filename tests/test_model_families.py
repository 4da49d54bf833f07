"""Llama-3 / Qwen2 model-family support.

The reference's GritLM wrapper accepts any HF causal LM (gritlm/gritlm.py:
24-41 — AutoModel* + embedding_attr discovery); our L1 equivalent covers the
architectures by feature: Llama-3 = Mistral trunk + llama3 NTK-by-parts RoPE
scaling, Qwen2 = Mistral trunk + QKV projection biases. These tests pin both
against stock HF torch modeling (same tactic as tests/test_loader.py's
Mistral/Mixtral parity)."""

import jax
import numpy as np
import pytest

from gritlm_tpu.config import ModelConfig, tiny_llama3, tiny_qwen2
from gritlm_tpu.models import forward_lm, init_params
from gritlm_tpu.models.loader import load_checkpoint, save_checkpoint


@pytest.mark.parametrize("cfg_fn", [tiny_llama3, tiny_qwen2])
def test_save_load_roundtrip(tmp_path, cfg_fn):
    cfg = cfg_fn()
    params = init_params(cfg, jax.random.PRNGKey(0))
    if cfg.attention_bias:  # non-zero biases must round-trip
        params["layers"]["attn"]["bq"] = jax.random.normal(
            jax.random.PRNGKey(1), params["layers"]["attn"]["bq"].shape
        ).astype(params["layers"]["attn"]["bq"].dtype)
    save_checkpoint(str(tmp_path), cfg, params)
    cfg2, params2 = load_checkpoint(str(tmp_path))
    assert cfg2.attention_bias == cfg.attention_bias
    assert cfg2.rope_scaling_ == cfg.rope_scaling_
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(params2)
    }
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat2[ks]), atol=0, err_msg=ks
        )


def test_from_hf_config_llama3_scaling():
    cfg = ModelConfig.from_hf_config({
        "model_type": "llama", "vocab_size": 777, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rope_theta": 500000.0,
        "rope_scaling": {
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    })
    assert cfg.rope_scaling_ == ("llama3", 8.0, 1.0, 4.0, 8192)
    with pytest.raises(NotImplementedError):
        ModelConfig.from_hf_config({
            "model_type": "llama", "rope_scaling": {"rope_type": "yarn"},
        })


def test_from_hf_config_qwen2_bias_default():
    cfg = ModelConfig.from_hf_config({
        "model_type": "qwen2", "vocab_size": 777, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
    })
    assert cfg.attention_bias  # HF Qwen2 has QKV biases unconditionally


def test_hf_torch_parity_llama3(tmp_path):
    """Logit parity vs stock HF LlamaForCausalLM with llama3 rope scaling —
    pins the NTK-by-parts frequency formula."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = tiny_llama3()
    params = init_params(cfg, jax.random.PRNGKey(5))
    save_checkpoint(str(tmp_path), cfg, params)

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_scaling={
            "rope_type": "llama3",
            "factor": cfg.rope_scaling_factor,
            "low_freq_factor": cfg.rope_low_freq_factor,
            "high_freq_factor": cfg.rope_high_freq_factor,
            "original_max_position_embeddings": cfg.rope_original_max_position,
        },
        attention_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(hf_cfg)
    import safetensors.torch

    sd = safetensors.torch.load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = model.float().eval()

    rng = np.random.default_rng(0)
    # positions past rope_original_max_position exercise the scaled branch
    ids = rng.integers(0, cfg.vocab_size, size=(1, 300))
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids)).logits.numpy()
    l_jax, _, _ = forward_lm(params, cfg, ids, causal=True)
    np.testing.assert_allclose(np.asarray(l_jax), out[None][0], atol=3e-4,
                               rtol=3e-3)


def test_hf_torch_parity_qwen2(tmp_path):
    """Logit parity vs stock HF Qwen2ForCausalLM — pins the QKV bias path."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = tiny_qwen2()
    params = init_params(cfg, jax.random.PRNGKey(6))
    # non-zero biases so the test actually checks them
    for b in ("bq", "bk", "bv"):
        params["layers"]["attn"][b] = (
            jax.random.normal(
                jax.random.PRNGKey(hash(b) % 2**31),
                params["layers"]["attn"][b].shape,
            ) * 0.1
        ).astype(params["layers"]["attn"][b].dtype)
    save_checkpoint(str(tmp_path), cfg, params)

    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = Qwen2ForCausalLM(hf_cfg)
    import safetensors.torch

    sd = safetensors.torch.load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = model.float().eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    l_jax, _, _ = forward_lm(params, cfg, ids, attention_mask=mask, causal=True)
    l_jax = np.asarray(l_jax)
    np.testing.assert_allclose(l_jax[0], out[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(l_jax[1, :6], out[1, :6], atol=2e-4, rtol=2e-3)


def test_qwen2_gritlm_end_to_end():
    """The full GritLM wrapper (encode + generate + int8 serving) runs on a
    Qwen2-architecture model."""
    from gritlm_tpu.gritlm import GritLM

    m = GritLM(tiny_qwen2(), mode="unified", attn="bbcc", weight_quant=True,
               kv_quant=True)
    emb = m.encode(["hello world", "qwen two"])
    assert emb.shape == (2, 64)
    out = m.generate("<|user|>\nHi\n<|assistant|>\n", max_new_tokens=4)
    assert isinstance(out, str)
