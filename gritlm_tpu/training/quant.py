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

import math
from typing import Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")

# Contracting-dim group for the w4 scale. 32 (vs the GPU-conventional 128)
# buys both quality (finer absmax groups) and speed: the Pallas kernel wants
# groups-per-block to be a multiple of the 8-sublane tile so the blocked
# scale view is a free bitcast of the stored (8,128)-tiled layout
# (ops/quant_matmul design note 3). Scale overhead is f32/32 = 0.125
# B/weight on top of the 0.5 B/weight nibbles — still half of int8.
INT4_GROUP_SIZE = 32


def is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and (
        ("q8" in node or "q4" in node) and "scale" in node
    )


def quantize_kernel(w: jax.Array) -> dict:
    """Symmetric absmax int8 over the contracting (second-to-last) axis:
    scale is per output channel, broadcastable against the int8 tensor."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(node: dict, dtype=jnp.bfloat16) -> jax.Array:
    if "q4" in node:
        return dequantize_kernel_int4(node, dtype)
    return (node["q8"].astype(jnp.float32) * node["scale"]).astype(dtype)


def quantize_kernel_int4(
    w: jax.Array, group_size: int | None = None
) -> dict:
    """Group-wise symmetric int4 (w4a16 serving): contracting-dim groups of
    `group_size` share one fp32 absmax/7 scale. Two nibbles pack into one
    uint8 (offset-binary, value = nibble - 8): the LOW nibble of packed row
    r holds contracting row r, the HIGH nibble row r + K/2 (half-split) —
    so the split-dot in ops/quant_matmul.w4a16_matmul consumes x as two
    *contiguous* lane windows (x[:, :K/2] and x[:, K/2:]) and never
    materializes a de-interleave (strided gathers on the hot decode path,
    and an unsupported-in-Mosaic lane reshape in-kernel, are what the
    earlier even/odd pairing cost).

    Leaf convention: {"q4": uint8 [..., K/2, N], "scale": f32 [..., K/g, N]}.
    HBM traffic at decode drops to 0.5 bytes/weight (+ ~0.03 for scales) —
    half of int8, a quarter of bf16; the TPU analogue of GPU 4-bit serving
    (bitsandbytes NF4 is the reference's 4-bit path, gritlm/training/
    run.py:236-284, load-time only — it dequantizes to bf16 for compute,
    exactly as we do inside the matmul)."""
    *lead, K, N = w.shape
    # default: 128, shrinking to the largest common power-of-two divisor for
    # tiny test widths (the kernel falls back to XLA below lane width anyway)
    g = group_size if group_size is not None else math.gcd(K, INT4_GROUP_SIZE)
    if K % g or K % 2 or g % 2:
        raise ValueError(f"contracting dim {K} / group {g} must be even "
                         f"with {g} | {K}")
    wf = w.astype(jnp.float32).reshape(*lead, K // g, g, N)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int32)
    q = q.reshape(*lead, K, N) + 8  # offset-binary in [0, 16)
    lo = q[..., : K // 2, :]
    hi = q[..., K // 2 :, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)  # [..., K/2, N]
    return {
        "q4": packed,
        "scale": scale[..., 0, :].astype(jnp.float32),  # [..., K/g, N]
    }


def unpack_int4(node: dict):
    """{"q4","scale"} → (values int32 [..., K, N] in [-8,7], scale)."""
    packed = node["q4"].astype(jnp.int32)
    lo = (packed & 0xF) - 8  # contracting rows [0, K/2)
    hi = (packed >> 4) - 8  # contracting rows [K/2, K)
    return jnp.concatenate([lo, hi], axis=-2), node["scale"]


def dequantize_kernel_int4(node: dict, dtype=jnp.bfloat16) -> jax.Array:
    q, scale = unpack_int4(node)
    *lead, K, N = q.shape
    G = scale.shape[-2]
    qf = q.astype(jnp.float32).reshape(*lead, G, K // G, N)
    return (qf * scale[..., :, None, :]).reshape(*lead, K, N).astype(dtype)


def quantize_tree(
    params: dict, targets: Sequence[str] = DEFAULT_TARGETS, bits: int = 8
) -> dict:
    """Replace every targeted >=3D kernel (stacked-layer layout) with a
    quantized leaf. Non-targeted leaves pass through untouched."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    quantize = quantize_kernel if bits == 8 else quantize_kernel_int4

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if path and path[-1] in targets and getattr(node, "ndim", 0) >= 3:
            return quantize(node)
        return node

    return walk(params, ())


def quantize_for_serving(
    params: dict,
    targets: Sequence[str] = DEFAULT_TARGETS,
    quantize_lm_head: bool = True,
    bits: int = 8,
) -> dict:
    """w8a16 / w4a16 inference quantization: every stacked layer kernel plus
    (by default) the LM head becomes an int8 or group-wise int4 leaf. Decode
    is weight-bandwidth bound (each step streams every parameter once);
    int8 halves that traffic, int4 quarters it — the serving analogue of
    the reference's bitsandbytes load path. At decode row counts both are
    consumed by fused Pallas matmuls (ops/quant_matmul.w8a16_matmul /
    w4a16_matmul) that dequantize in VMEM so HBM only ever sees the packed
    bytes; prefill/encode row counts dequantize one layer at a time inside
    the scan (models/transformer._w / logits_from_hidden) and use the
    native bf16 matmul."""
    out = quantize_tree(params, targets, bits=bits)
    if quantize_lm_head and "lm_head" in out:
        quantize = quantize_kernel if bits == 8 else quantize_kernel_int4
        out = dict(out)
        out["lm_head"] = {"kernel": quantize(out["lm_head"]["kernel"])}
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
