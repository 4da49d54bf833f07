import jax
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral, tiny_mixtral
from gritlm_tpu.models import forward_lm, init_params
from gritlm_tpu.models.loader import add_lm_head, load_checkpoint, save_checkpoint


@pytest.mark.parametrize("cfg_fn", [tiny_mistral, tiny_mixtral])
def test_save_load_roundtrip(tmp_path, cfg_fn):
    cfg = cfg_fn()
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), cfg, params)
    cfg2, params2 = load_checkpoint(str(tmp_path))
    assert cfg2.num_hidden_layers == cfg.num_hidden_layers
    assert cfg2.is_moe == cfg.is_moe
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[ks]), atol=0,
                                   err_msg=ks)


def test_loaded_model_runs(tmp_path):
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path), cfg, params)
    cfg2, params2 = load_checkpoint(str(tmp_path))
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    l1, _, _ = forward_lm(params, cfg, ids, causal=True)
    l2, _, _ = forward_lm(params2, cfg2, ids, causal=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_add_lm_head(tmp_path):
    cfg = tiny_mistral()
    donor = init_params(cfg, jax.random.PRNGKey(3), with_lm_head=True)
    embed_only = init_params(cfg, jax.random.PRNGKey(4), with_lm_head=False)
    assert "lm_head" not in embed_only
    grafted = add_lm_head(embed_only, donor)
    np.testing.assert_allclose(
        np.asarray(grafted["lm_head"]["kernel"]),
        np.asarray(donor["lm_head"]["kernel"]),
    )


def test_hf_torch_parity(tmp_path):
    """Golden numerics: export our tiny checkpoint to HF format, load it with
    torch/transformers MistralForCausalLM, compare logits (fp32, CPU).
    This pins RoPE convention, RMSNorm cast order, GQA and mask semantics to
    the exact HF behavior the reference forks."""
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(5))
    save_checkpoint(str(tmp_path), cfg, params)

    hf_cfg = MistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        sliding_window=None,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = MistralForCausalLM(hf_cfg)
    import safetensors.torch

    sd = safetensors.torch.load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = model.float().eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    import jax.numpy as jnp

    l_jax, _, _ = forward_lm(
        params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask), causal=True
    )
    l_jax = np.asarray(l_jax)
    # compare only unpadded positions (HF pads can differ)
    np.testing.assert_allclose(l_jax[0], out[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(l_jax[1, :6], out[1, :6], atol=2e-4, rtol=2e-3)


def test_hf_torch_parity_mixtral(tmp_path):
    """Mixtral MoE golden numerics: export tiny MoE checkpoint, load with
    transformers MixtralForCausalLM, compare logits — pins top-2 routing,
    renormalization, and expert MLP semantics to HF
    (scripts/modeling_mixtral_gritlm.py:843-882)."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = tiny_mixtral()
    params = init_params(cfg, jax.random.PRNGKey(7))
    save_checkpoint(str(tmp_path), cfg, params)

    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        num_local_experts=cfg.num_local_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        sliding_window=None,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = MixtralForCausalLM(hf_cfg)
    import safetensors.torch

    sd = safetensors.torch.load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model = model.float().eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    import jax.numpy as jnp

    l_jax, _, _ = forward_lm(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), causal=True,
    )
    l_jax = np.asarray(l_jax, np.float32)
    valid = mask.astype(bool)
    np.testing.assert_allclose(l_jax[valid], out[valid], rtol=2e-4, atol=2e-4)
