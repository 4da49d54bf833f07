"""Golden parity vs the reference implementation's *bidirectional* semantics.

test_loader.py pins causal logits to stock HF. These tests pin the thing that
makes GritLM GritLM: the is_causal=False mask semantics (reference
scripts/modeling_mistral_gritlm.py:1005-1036 — when is_causal is False the
mask is ONLY the expanded padding mask, no causal triangle) and the full
encode contract (tokenize → bidirectional forward → instruction mask → mean
pool → L2 normalize, reference gritlm/gritlm.py:92-218), plus greedy
generation token-stream parity and the README cosine-fixture pipeline
(reference README.md:62-69).

Shared tiny random weights: our init_params → save_checkpoint (HF layout) →
torch/transformers, so both frameworks run the identical function.

Encode-side tests are parameterized over {ByteTokenizer, hand-crafted BPE}:
the BPE fixture (tests/tok_fixtures.py) has merges spanning the template
boundary, so the reference's instruction-prefix assumption breaks and the
detect-and-correct path (gritlm_tpu/tokenizer.py:prefix_token_len) is what
keeps the masking token-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import forward, init_params
from gritlm_tpu.models.loader import save_checkpoint
from gritlm_tpu.tokenizer import ByteTokenizer
from tok_fixtures import make_tokenizer

torch = pytest.importorskip("torch")


@pytest.fixture(params=["byte", "bpe"])
def tok(request):
    return make_tokenizer(request.param)


def _hf_model(cfg, tmp_path, params):
    """Load our exported checkpoint into stock HF MistralForCausalLM (fp32)."""
    import safetensors.torch
    from transformers import MistralConfig, MistralForCausalLM

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
    sd = safetensors.torch.load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    return model.float().eval()


def _bidir_mask_4d(pad_mask: np.ndarray, sq: int) -> "torch.Tensor":
    """The reference's is_causal=False mask: padding expansion only
    (modeling_mistral_gritlm.py:1005-1036) as an HF 4D additive mask."""
    pad = torch.tensor(pad_mask, dtype=torch.float32)
    big_neg = torch.finfo(torch.float32).min
    m4 = (1.0 - pad[:, None, None, :]) * big_neg  # [B,1,1,Sk]
    return m4.expand(pad.shape[0], 1, sq, pad.shape[1]).contiguous()


def _torch_bidir_hidden(model, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model.model(
            input_ids=torch.tensor(np.asarray(ids, np.int64)),
            attention_mask=_bidir_mask_4d(mask, ids.shape[1]),
        ).last_hidden_state
    return out.numpy()


def test_bidirectional_hidden_parity(tmp_path):
    """forward(causal=False) ≡ HF trunk under the reference's non-causal mask."""
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(11))
    model = _hf_model(cfg, tmp_path, params)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0

    golden = _torch_bidir_hidden(model, ids, mask)
    ours, _, _ = forward(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), causal=False,
    )
    ours = np.asarray(ours, np.float32)
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], golden[valid], atol=1e-4, rtol=1e-3)

    # and it really is bidirectional: flipping a LATE token must change an
    # EARLY token's hidden state (would be impossible under a causal mask)
    ids2 = ids.copy()
    ids2[0, 7] = (ids2[0, 7] + 1) % cfg.vocab_size
    ours2, _, _ = forward(
        params, cfg, jnp.asarray(ids2),
        attention_mask=jnp.asarray(mask), causal=False,
    )
    assert np.abs(np.asarray(ours2)[0, 0] - ours[0, 0]).max() > 1e-6


def _torch_encode(model, tok, sentences, instruction: str) -> np.ndarray:
    """The reference GritLM.encode contract, run through torch/HF
    (gritlm/gritlm.py:92-176): prompt = instruction + sentence, bidirectional
    forward, instruction tokens excluded from mean pooling, L2 normalize."""
    batch = [instruction + s for s in sentences]
    enc = tok(batch, max_length=512, add_special_tokens=True)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    hidden = _torch_bidir_hidden(model, ids, mask)  # [B,S,D]
    # per-row instruction masking, oracle-side: longest common token prefix
    # of tokenize(instruction) vs the row (independent plain-Python
    # reimplementation of the detect-and-correct contract)
    pmask = mask.copy()
    pref = tok._encode_one(instruction, True)
    for i in range(ids.shape[0]):
        n = int(mask[i].sum())
        k = 0
        while k < min(len(pref), n) and int(ids[i, k]) == int(pref[k]):
            k += 1
        pmask[i, : min(k, n - 1)] = 0
    w = pmask[..., None].astype(np.float64)
    emb = (hidden.astype(np.float64) * w).sum(1) / w.sum(1)
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    return emb.astype(np.float32), ids.shape


def test_encode_contract_parity(tmp_path, tok):
    """Full GritLM.encode ≡ the reference pipeline on shared weights/tokens."""
    from gritlm_tpu import GritLM

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(12))
    model = _hf_model(cfg, tmp_path, params)

    instruction = "<|user|>\nRetrieve relevant passages.\n<|embed|>\n"
    sentences = [
        "Bitcoin is a decentralized digital currency.",
        "Generative representational instruction tuning.",
        "short",
    ]
    golden, _ = _torch_encode(model, tok, sentences, instruction)

    m = GritLM(cfg, params=params, tokenizer=tok, mode="embedding",
               attn="bbcc", pooling_method="mean", normalized=True)
    ours = m.encode(sentences, instruction=instruction)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-3)


def test_readme_cosine_fixture_parity(tmp_path, tok):
    """The README quickstart pipeline (reference README.md:62-69): embed
    queries + documents with instruction, cosine-sim matrix. Cross-checked
    value-for-value against the torch-side pipeline."""
    from gritlm_tpu import GritLM

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(13))
    model = _hf_model(cfg, tmp_path, params)

    def gritlm_instruction(instruction):
        return (
            "<|user|>\n" + instruction + "\n<|embed|>\n"
            if instruction
            else "<|embed|>\n"
        )

    queries = ["Please explain what a TPU is.", "What is GritLM?"]
    documents = [
        "A TPU is an accelerator for tensor computation.",
        "GritLM unifies embedding and generation via instruction tuning.",
    ]
    instr = gritlm_instruction("Given a query, retrieve the relevant passage")

    m = GritLM(cfg, params=params, tokenizer=tok, mode="embedding", attn="bbcc")
    q = m.encode(queries, instruction=instr)
    d = m.encode(documents, instruction=gritlm_instruction(""))
    sims = q @ d.T
    assert sims.shape == (2, 2)

    gq, _ = _torch_encode(model, tok, queries, instr)
    gd, _ = _torch_encode(model, tok, documents, gritlm_instruction(""))
    np.testing.assert_allclose(sims, gq @ gd.T, atol=2e-4)


def test_greedy_generation_token_parity(tmp_path):
    """Greedy decode token stream ≡ HF generate(do_sample=False) on shared
    weights — pins the prefill+decode cache path end to end."""
    from gritlm_tpu import GritLM

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(14))
    model = _hf_model(cfg, tmp_path, params)
    tok = ByteTokenizer()

    prompts = ["<|user|>\nHello there.\n<|assistant|>\n",
               "<|user|>\nWrite a poem\n<|assistant|>\n"]  # equal byte length
    enc = tok(prompts, max_length=128, add_special_tokens=True)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    assert mask.all(), "prompts must be unpadded for HF right-pad generate"

    new = 12
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(np.asarray(ids, np.int64)),
            attention_mask=torch.tensor(np.asarray(mask, np.int64)),
            max_new_tokens=new, do_sample=False,
            eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
        ).numpy()[:, ids.shape[1]:]

    m = GritLM(cfg, params=params, tokenizer=tok, mode="unified", attn="bbcc")
    res = m.generate_from_ids(ids, mask, max_new_tokens=new, temperature=0.0)
    toks = np.asarray(res.tokens)
    nv = np.asarray(res.num_valid)
    for b in range(len(prompts)):
        hf_b = hf_out[b]
        # trim HF's post-eos pad fill
        if (hf_b == tok.eos_token_id).any():
            stop = int(np.argmax(hf_b == tok.eos_token_id)) + 1
            hf_b = hf_b[:stop]
        ours_b = toks[b, : nv[b]]
        np.testing.assert_array_equal(ours_b, hf_b, err_msg=f"prompt {b}")


def _hf_generate_row(model, ids_row, new, eos_id, pad_id):
    """Unpadded single-row HF greedy generate — the honest oracle for ragged
    batches (HF itself wants left padding; feeding each row unpadded makes
    the target token stream padding-strategy-independent)."""
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(np.asarray([ids_row], np.int64)),
            max_new_tokens=new, do_sample=False,
            eos_token_id=eos_id, pad_token_id=pad_id,
        ).numpy()[0, len(ids_row):]
    if (out == eos_id).any():
        out = out[: int(np.argmax(out == eos_id)) + 1]
    return out


def test_ragged_prompt_generation_parity(tmp_path, tok):
    """VERDICT r2 weak-5: mixed-length right-padded prompt batches — the
    shape every real caller uses (gritlm.py generate_from_ids bucketing +
    position accounting + per-row EOS) — must be token-exact vs HF."""
    from gritlm_tpu import GritLM

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(15))
    model = _hf_model(cfg, tmp_path, params)

    prompts = [
        "<|user|>\nHello there, how are you today?\n<|assistant|>\n",
        "<|user|>\nHi\n<|assistant|>\n",
        "<|user|>\nWrite a very long poem about mountains and rivers\n<|assistant|>\n",
    ]
    enc = tok(prompts, max_length=128, add_special_tokens=True)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    lens = mask.sum(axis=1)
    assert len(set(lens.tolist())) > 1, "batch must actually be ragged"

    new = 10
    m = GritLM(cfg, params=params, tokenizer=tok, mode="unified", attn="bbcc")
    res = m.generate_from_ids(ids, mask, max_new_tokens=new, temperature=0.0)
    toks = np.asarray(res.tokens)
    nv = np.asarray(res.num_valid)
    for b in range(len(prompts)):
        hf_b = _hf_generate_row(model, ids[b, : lens[b]], new,
                                tok.eos_token_id, tok.pad_token_id)
        np.testing.assert_array_equal(toks[b, : nv[b]], hf_b,
                                      err_msg=f"prompt {b}")


def test_cache_continuation_generation_parity(tmp_path, tok):
    """Cache-continuation on ragged batches: a causally-encoded prefix cache
    + a padded continuation prompt must decode the same tokens HF produces
    on the concatenated unpadded stream — pins the cache mask / position
    accounting of generate.py across pad holes."""
    from gritlm_tpu import GritLM

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(16))
    model = _hf_model(cfg, tmp_path, params)

    # cccc → encode is causal, so the captured cache is exactly the causal
    # prefix state HF would build
    m = GritLM(cfg, params=params, tokenizer=tok, mode="unified", attn="cccc")
    prefixes = ["<s>The first document is about mountains. ",
                "<s>Doc two. "]
    conts = ["\n<|user|>\nSummarize\n<|assistant|>\n",
             "\n<|user|>\nWhat is the second document about, in short?\n<|assistant|>\n"]

    _, cache = m.encode(prefixes, get_cache=True, add_special_tokens=False,
                        max_length=64)
    enc_c = tok(conts, max_length=64, add_special_tokens=False)
    cids, cmask = enc_c["input_ids"], enc_c["attention_mask"]
    clens = cmask.sum(axis=1)
    new = 8
    res = m.generate_from_ids(cids, cmask, cache=cache, max_new_tokens=new,
                              temperature=0.0)
    toks = np.asarray(res.tokens)
    nv = np.asarray(res.num_valid)

    enc_p = tok(prefixes, max_length=64, add_special_tokens=False)
    plens = enc_p["attention_mask"].sum(axis=1)
    assert len(set(plens.tolist())) > 1, "prefixes must be ragged"
    for b in range(len(prefixes)):
        full = np.concatenate([enc_p["input_ids"][b, : plens[b]],
                               cids[b, : clens[b]]])
        hf_b = _hf_generate_row(model, full, new,
                                tok.eos_token_id, tok.pad_token_id)
        np.testing.assert_array_equal(toks[b, : nv[b]], hf_b,
                                      err_msg=f"row {b}")


def _hf_mixtral_model(cfg, tmp_path, params):
    """Tiny Mixtral checkpoint → stock HF MixtralForCausalLM (fp32)."""
    import safetensors.torch
    from transformers import MixtralConfig, MixtralForCausalLM

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
    sd = safetensors.torch.load_file(str(tmp_path / "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    return model.float().eval()


def test_mixtral_bidirectional_hidden_parity(tmp_path):
    """VERDICT r2 missing-2: the non-causal mask path through Mixtral —
    the embedding half of the 8x7B headline — vs the torch oracle
    (reference threads is_causal through Mixtral the same way,
    scripts/modeling_mixtral_gritlm.py:1228-1294)."""
    from gritlm_tpu.config import tiny_mixtral

    cfg = tiny_mixtral()
    params = init_params(cfg, jax.random.PRNGKey(21))
    model = _hf_mixtral_model(cfg, tmp_path, params)

    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0

    golden = _torch_bidir_hidden(model, ids, mask)
    ours, _, _ = forward(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask), causal=False,
    )
    ours = np.asarray(ours, np.float32)
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], golden[valid], atol=2e-4, rtol=1e-3)

    # bidirectionality check: a late-token flip must move an early hidden
    ids2 = ids.copy()
    ids2[0, 7] = (ids2[0, 7] + 1) % cfg.vocab_size
    ours2, _, _ = forward(
        params, cfg, jnp.asarray(ids2),
        attention_mask=jnp.asarray(mask), causal=False,
    )
    assert np.abs(np.asarray(ours2)[0, 0] - ours[0, 0]).max() > 1e-6


def test_mixtral_encode_contract_parity(tmp_path, tok):
    """Full GritLM.encode through Mixtral ≡ the reference pipeline (both
    tokenizers, incl. the boundary-merge BPE)."""
    from gritlm_tpu import GritLM
    from gritlm_tpu.config import tiny_mixtral

    cfg = tiny_mixtral()
    params = init_params(cfg, jax.random.PRNGKey(22))
    model = _hf_mixtral_model(cfg, tmp_path, params)

    instruction = "<|user|>\nRetrieve relevant passages.\n<|embed|>\n"
    sentences = ["Bitcoin is a decentralized digital currency.",
                 "Generative representational instruction tuning.", "short"]
    golden, _ = _torch_encode(model, tok, sentences, instruction)

    m = GritLM(cfg, params=params, tokenizer=tok, mode="embedding",
               attn="bbcc", pooling_method="mean", normalized=True)
    ours = m.encode(sentences, instruction=instruction)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-3)
