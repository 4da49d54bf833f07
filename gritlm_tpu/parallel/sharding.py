"""GSPMD sharding rules for the stacked-layer param tree.

Replaces the reference's FSDP/ZeRO YAML zoo (scripts/configs/*.yml; SURVEY
§2.8): parameters get NamedShardings over the (data, fsdp, model, expert)
mesh and XLA inserts the all-gathers / reduce-scatters that FSDP and
Megatron-TP do by hand.

Tensor-parallel layout is the standard column/row split:
  wq/wk/wv, mlp gate/up : output dim on `model`  (column parallel)
  wo, mlp down          : input dim on `model`   (row parallel → psum fused)
FSDP shards the opposite dim of each kernel. MoE expert tensors add the
`expert` axis on the leading expert dim.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gritlm_tpu.parallel.mesh import (
    AXIS_EXPERT,
    AXIS_FSDP,
    AXIS_MODEL,
    BATCH_AXES,
)


def param_partition_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Build a pytree of PartitionSpecs matching `params` (models/transformer
    layout). Works for dense and MoE trees."""
    specs: Dict[str, Any] = {
        "embed": {"embedding": P(AXIS_MODEL, AXIS_FSDP)},
        "final_ln": {"scale": P(None)},
    }
    if "projection" in params:
        specs["projection"] = {"kernel": P(None, None), "bias": P(None)}
    layers: Dict[str, Any] = {
        "ln1": {"scale": P(None, None)},
        "ln2": {"scale": P(None, None)},
        "attn": {
            "wq": P(None, AXIS_FSDP, AXIS_MODEL),
            "wk": P(None, AXIS_FSDP, AXIS_MODEL),
            "wv": P(None, AXIS_FSDP, AXIS_MODEL),
            "wo": P(None, AXIS_MODEL, AXIS_FSDP),
        },
    }
    if "bq" in params["layers"]["attn"]:  # Qwen2 QKV biases: output dim
        layers["attn"].update(
            bq=P(None, AXIS_MODEL), bk=P(None, AXIS_MODEL),
            bv=P(None, AXIS_MODEL),
        )
    lp = params["layers"]
    if "mlp" in lp:
        layers["mlp"] = {
            "gate": P(None, AXIS_FSDP, AXIS_MODEL),
            "up": P(None, AXIS_FSDP, AXIS_MODEL),
            "down": P(None, AXIS_MODEL, AXIS_FSDP),
        }
    if "moe" in lp:
        layers["moe"] = {
            "router": P(None, None, None),
            "gate": P(None, AXIS_EXPERT, AXIS_FSDP, AXIS_MODEL),
            "up": P(None, AXIS_EXPERT, AXIS_FSDP, AXIS_MODEL),
            "down": P(None, AXIS_EXPERT, AXIS_MODEL, AXIS_FSDP),
        }
    specs["layers"] = layers
    if "lm_head" in params:
        specs["lm_head"] = {"kernel": P(AXIS_FSDP, AXIS_MODEL)}
    return _with_quant_leaves(specs, params)


def _with_quant_leaves(spec_node: Any, param_node: Any) -> Any:
    """Expand kernel specs where the param leaf is a quantized serving/QLoRA
    leaf ({"q8"|"q4", "scale"}, training/quant.py): the packed values keep
    the kernel's spec (int4's K/2 packing halves the contracting dim but
    shards on the same axis); the scale ([..., 1, out] for int8,
    [..., K/g, out] for int4) drops the contracting axis — its group dim is
    small and replicating it avoids divisibility constraints."""
    from gritlm_tpu.training.quant import is_quantized_leaf

    if isinstance(param_node, dict) and "As" in param_node and "w" in param_node:
        # stacked multi-LoRA serving leaf (training/lora.stack_adapters):
        # the base kernel keeps its spec; the [L, n_adapters, in, r] /
        # [L, n_adapters, r, out] factors are tiny (rank r) — replicate
        return {
            "w": _with_quant_leaves(spec_node, param_node["w"]),
            "As": P(*((None,) * param_node["As"].ndim)),
            "Bs": P(*((None,) * param_node["Bs"].ndim)),
        }
    if is_quantized_leaf(param_node):
        s = tuple(spec_node)
        scale_spec = (
            P(*(s[:-2] + (None,) + s[-1:])) if len(s) >= 2 else P(None, None)
        )
        qkey = "q8" if "q8" in param_node else "q4"
        return {qkey: spec_node, "scale": scale_spec}
    if isinstance(param_node, dict) and isinstance(spec_node, dict):
        return {
            k: _with_quant_leaves(spec_node[k], v) if k in spec_node else spec_node.get(k)
            for k, v in param_node.items()
            if k in spec_node
        }
    return spec_node


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        param_partition_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """device_put the tree with its NamedShardings (host → mesh)."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors [B, ...]: shard B over data+fsdp (both consume batch)."""
    return NamedSharding(mesh, P(BATCH_AXES))


def batch_spec() -> P:
    return P(BATCH_AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
