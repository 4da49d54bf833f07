"""HF-safetensors checkpoint bridge.

Loads Mistral/Mixtral HF checkpoints into the stacked-layer pytree layout of
gritlm_tpu.models.transformer, and exports back to HF naming — replacing the
reference's checkpoint utilities (scripts/reformat_statedict.py, shard.py,
convert_sharded.py, add_lm_head.py; SURVEY §2.7) with one import/export pair.

No torch involved: safetensors.numpy + jnp. HF stores Linear weights as
[out, in]; our kernels are [in, out], so everything transposes on the way in.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from gritlm_tpu.config import ModelConfig


def _open_all_tensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    tensors: Dict[str, np.ndarray] = {}
    idx = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(idx):
        with open(idx) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            tensors.update(load_file(os.path.join(path, shard)))
    else:
        for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
            tensors.update(load_file(f))
    if not tensors:
        raise FileNotFoundError(f"No safetensors found under {path}")
    return tensors


def _np_cast(x: np.ndarray, dtype) -> np.ndarray:
    # numpy can hold bfloat16 via ml_dtypes (jnp.dtype('bfloat16') works)
    return x.astype(dtype) if x.dtype != dtype else x


def load_checkpoint(
    path: str, with_lm_head: bool = True, dtype=None
) -> Tuple[ModelConfig, dict]:
    """`dtype` overrides the checkpoint dtype for BOTH the config and the
    tensors (e.g. dtype='float16' keeps fp16 numerics instead of the
    TPU-default bfloat16 promotion, cf. config.from_hf_config)."""
    cfg = ModelConfig.from_hf_config(
        os.path.join(path, "config.json"), dtype=dtype
    )
    tensors = _open_all_tensors(path)
    dt = np.dtype(cfg.jnp_dtype)

    def get(name: str, transpose: bool = False) -> np.ndarray:
        x = tensors[name]
        if transpose:
            x = x.T
        return _np_cast(x, dt)

    def maybe_prefix(name: str) -> str:
        # trainer state dicts may carry a leading "model." already; HF base
        # checkpoints use "model.layers..." while AutoModel ones drop it
        for p in ("model.", ""):
            if p + name in tensors:
                return p + name
        raise KeyError(name)

    L = cfg.num_hidden_layers

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        return np.stack([get(maybe_prefix(fmt.format(i=i)), transpose) for i in range(L)])

    attn = {
        "wq": stack("layers.{i}.self_attn.q_proj.weight", True),
        "wk": stack("layers.{i}.self_attn.k_proj.weight", True),
        "wv": stack("layers.{i}.self_attn.v_proj.weight", True),
        "wo": stack("layers.{i}.self_attn.o_proj.weight", True),
    }
    if cfg.attention_bias:  # Qwen2-family QKV biases
        attn["bq"] = stack("layers.{i}.self_attn.q_proj.bias")
        attn["bk"] = stack("layers.{i}.self_attn.k_proj.bias")
        attn["bv"] = stack("layers.{i}.self_attn.v_proj.bias")
    layers = {
        "ln1": {"scale": stack("layers.{i}.input_layernorm.weight")},
        "attn": attn,
        "ln2": {"scale": stack("layers.{i}.post_attention_layernorm.weight")},
    }
    if cfg.is_moe:
        E = cfg.num_local_experts

        def stack_experts(w: str, transpose: bool) -> np.ndarray:
            return np.stack([
                np.stack([
                    get(maybe_prefix(
                        f"layers.{i}.block_sparse_moe.experts.{e}.{w}.weight"
                    ), transpose)
                    for e in range(E)
                ])
                for i in range(L)
            ])

        layers["moe"] = {
            "router": stack("layers.{i}.block_sparse_moe.gate.weight", True),
            "gate": stack_experts("w1", True),  # HF w1 = gate [F, D]
            "up": stack_experts("w3", True),  # HF w3 = up   [F, D]
            "down": stack_experts("w2", True),  # HF w2 = down [D, F]
        }
    else:
        layers["mlp"] = {
            "gate": stack("layers.{i}.mlp.gate_proj.weight", True),
            "up": stack("layers.{i}.mlp.up_proj.weight", True),
            "down": stack("layers.{i}.mlp.down_proj.weight", True),
        }

    params = {
        "embed": {"embedding": get(maybe_prefix("embed_tokens.weight"))},
        "layers": layers,
        "final_ln": {"scale": get(maybe_prefix("norm.weight"))},
    }
    if with_lm_head and not cfg.tie_word_embeddings:
        if "lm_head.weight" in tensors:
            params["lm_head"] = {"kernel": get("lm_head.weight", True)}
    if "projection.weight" in tensors:
        params["projection"] = {
            "kernel": get("projection.weight", True),
            "bias": get("projection.bias"),
        }
    params = _to_jnp(params)
    return cfg, params


def _to_jnp(tree):
    import jax

    return jax.tree_util.tree_map(jnp.asarray, tree)


def save_checkpoint(
    path: str, cfg: ModelConfig, params: dict, max_shard_bytes: int = 5 * 2**30
) -> None:
    """Export to HF naming/safetensors (inverse of load_checkpoint); shards at
    ~5GB like the reference's scripts/shard.py."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}

    def put(name: str, x, transpose: bool = False) -> None:
        # np.asarray(jax_array) can be non-contiguous (padded device layouts);
        # safetensors serializes the raw buffer ignoring strides, so force a
        # contiguous copy or the written bytes are garbage.
        x = np.asarray(x)
        flat[name] = np.ascontiguousarray(x.T if transpose else x)

    put("model.embed_tokens.weight", params["embed"]["embedding"])
    L = cfg.num_hidden_layers
    ls = params["layers"]
    for i in range(L):
        p = f"model.layers.{i}"
        put(f"{p}.input_layernorm.weight", ls["ln1"]["scale"][i])
        put(f"{p}.self_attn.q_proj.weight", ls["attn"]["wq"][i], True)
        put(f"{p}.self_attn.k_proj.weight", ls["attn"]["wk"][i], True)
        put(f"{p}.self_attn.v_proj.weight", ls["attn"]["wv"][i], True)
        put(f"{p}.self_attn.o_proj.weight", ls["attn"]["wo"][i], True)
        if "bq" in ls["attn"]:
            put(f"{p}.self_attn.q_proj.bias", ls["attn"]["bq"][i])
            put(f"{p}.self_attn.k_proj.bias", ls["attn"]["bk"][i])
            put(f"{p}.self_attn.v_proj.bias", ls["attn"]["bv"][i])
        put(f"{p}.post_attention_layernorm.weight", ls["ln2"]["scale"][i])
        if cfg.is_moe:
            put(f"{p}.block_sparse_moe.gate.weight", ls["moe"]["router"][i], True)
            for e in range(cfg.num_local_experts):
                put(f"{p}.block_sparse_moe.experts.{e}.w1.weight", ls["moe"]["gate"][i, e], True)
                put(f"{p}.block_sparse_moe.experts.{e}.w3.weight", ls["moe"]["up"][i, e], True)
                put(f"{p}.block_sparse_moe.experts.{e}.w2.weight", ls["moe"]["down"][i, e], True)
        else:
            put(f"{p}.mlp.gate_proj.weight", ls["mlp"]["gate"][i], True)
            put(f"{p}.mlp.up_proj.weight", ls["mlp"]["up"][i], True)
            put(f"{p}.mlp.down_proj.weight", ls["mlp"]["down"][i], True)
    put("model.norm.weight", params["final_ln"]["scale"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"]["kernel"], True)
    if "projection" in params:
        # embedding projection head (trainable; reference keeps it inside the
        # GritLM module, gritlm/gritlm.py:43-47). Extra keys are ignored by
        # HF loaders (strict=False) and round-trip through load_checkpoint.
        put("projection.weight", params["projection"]["kernel"], True)
        put("projection.bias", params["projection"]["bias"])

    # shard
    shards, cur, cur_bytes = [], {}, 0
    for k, v in flat.items():
        if cur and cur_bytes + v.nbytes > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += v.nbytes
    shards.append(cur)

    if len(shards) == 1:
        save_file(shards[0], os.path.join(path, "model.safetensors"))
    else:
        weight_map = {}
        n = len(shards)
        for si, shard in enumerate(shards):
            fname = f"model-{si + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, os.path.join(path, fname))
            for k in shard:
                weight_map[k] = fname
        with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
            json.dump(
                {
                    "metadata": {"total_size": int(sum(v.nbytes for v in flat.values()))},
                    "weight_map": weight_map,
                },
                f,
            )

    hf_cfg = {
        "model_type": cfg.model_type,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "sliding_window": cfg.sliding_window,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "torch_dtype": cfg.dtype,
    }
    if cfg.head_dim is not None:
        # explicit head_dim != hidden/heads must round-trip or the attention
        # reshape fails on reload (from_hf_config accepts this key)
        hf_cfg["head_dim"] = cfg.head_dim
    if cfg.attention_bias:
        hf_cfg["attention_bias"] = True
    if cfg.rope_scaling_type is not None:
        rs = {"rope_type": cfg.rope_scaling_type,
              "factor": cfg.rope_scaling_factor}
        if cfg.rope_scaling_type == "llama3":
            rs.update(
                low_freq_factor=cfg.rope_low_freq_factor,
                high_freq_factor=cfg.rope_high_freq_factor,
                original_max_position_embeddings=cfg.rope_original_max_position,
            )
        hf_cfg["rope_scaling"] = rs
    if cfg.is_moe:
        hf_cfg.update(
            num_local_experts=cfg.num_local_experts,
            num_experts_per_tok=cfg.num_experts_per_tok,
            router_aux_loss_coef=cfg.router_aux_loss_coef,
        )
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)


def add_lm_head(params: dict, donor_params: dict) -> dict:
    """Graft an LM head from a donor checkpoint onto an embedding-only model
    (reference scripts/add_lm_head.py)."""
    out = dict(params)
    out["lm_head"] = donor_params["lm_head"]
    return out
