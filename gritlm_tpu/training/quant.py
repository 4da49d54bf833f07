"""Int8 weight quantization for frozen-base (QLoRA-style) training.

The reference's QLoRA path is bitsandbytes NF4 on GPU (gritlm/training/
run.py:236-284). The TPU analogue: symmetric per-output-channel int8 absmax
quantization of the frozen base kernels. Storage drops 2× vs bf16 (a 7B base
fits a 16GB v5e with room for LoRA states); dequantization happens *inside
the layer scan* — models/transformer._w materializes one layer's bf16
weights at a time, so peak memory stays int8-base + one-layer transient.

Quantized leaf convention (understood by models/transformer._w):
    {"q8": int8 [..., in, out], "scale": f32 [..., 1, out]}
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and "q8" in node and "scale" in node


def quantize_kernel(w: jax.Array) -> dict:
    """Symmetric absmax int8 over the contracting (second-to-last) axis:
    scale is per output channel, broadcastable against the int8 tensor."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(node: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (node["q8"].astype(jnp.float32) * node["scale"]).astype(dtype)


def quantize_tree(
    params: dict, targets: Sequence[str] = DEFAULT_TARGETS
) -> dict:
    """Replace every targeted >=3D kernel (stacked-layer layout) with a
    quantized leaf. Non-targeted leaves pass through untouched."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if path and path[-1] in targets and getattr(node, "ndim", 0) >= 3:
            return quantize_kernel(node)
        return node

    return walk(params, ())


def quantize_for_serving(
    params: dict,
    targets: Sequence[str] = DEFAULT_TARGETS,
    quantize_lm_head: bool = True,
) -> dict:
    """w8a16 inference quantization: every stacked layer kernel plus (by
    default) the LM head becomes an int8 leaf. Decode is weight-bandwidth
    bound (each step streams every parameter once); int8 halves that
    traffic — the serving analogue of the reference's bitsandbytes load
    path. Dequantization fuses into the consuming matmul inside the layer
    scan (models/transformer._w / logits_from_hidden)."""
    out = quantize_tree(params, targets)
    if quantize_lm_head and "lm_head" in out:
        out = dict(out)
        out["lm_head"] = {"kernel": quantize_kernel(out["lm_head"]["kernel"])}
    return out


def dequantize_tree(params: dict, dtype=jnp.bfloat16) -> dict:
    """Inverse of quantize_tree (export path: qlora merge → HF bf16)."""

    def walk(node):
        if is_quantized_leaf(node):
            return dequantize_kernel(node, dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantized_bytes(params: dict) -> int:
    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "nbytes")
    )
