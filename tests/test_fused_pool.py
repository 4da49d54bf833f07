"""Fused norm+pool epilogue kernel vs the unfused reference (Pallas
interpret mode; the same kernel compiles on TPU where the encode step
uses it — gritlm._encode_step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gritlm_tpu.ops.fused_pool as fp
from gritlm_tpu.models.transformer import rms_norm
from gritlm_tpu.ops.pooling import pool


@pytest.fixture(autouse=True)
def force_kernel(monkeypatch):
    monkeypatch.setattr(fp, "_FORCE_KERNEL", True)


def _case(B=3, S=200, D=256, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(D,)) * 0.5 + 1.0, jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, :11] = 0  # instruction prefix masked out
    mask[1, S * 3 // 4:] = 0  # right padding
    if B > 2:
        mask[2, :5] = 0
    return hidden, gamma, jnp.asarray(mask)


@pytest.mark.parametrize("method", ["mean", "weightedmean"])
@pytest.mark.parametrize("normalized", [True, False])
def test_matches_unfused(method, normalized):
    hidden, gamma, mask = _case()
    got = fp.fused_norm_mean_pool(
        hidden, gamma, mask, eps=1e-5, method=method, normalized=normalized
    )
    normed = rms_norm(hidden, gamma, 1e-5)
    ref = pool(normed, mask, method)
    if normalized:
        ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert got.dtype == jnp.float32


def test_multi_block_sequence():
    """S > block size: the running token count must carry across blocks
    (weightedmean position weights are global, not per-block)."""
    hidden, gamma, mask = _case(B=2, S=700, D=128, seed=3)
    got = fp.fused_norm_mean_pool(hidden, gamma, mask, eps=1e-6,
                                  method="weightedmean")
    normed = rms_norm(hidden, gamma, 1e-6)
    ref = pool(normed, mask, "weightedmean")
    ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_empty_mask_row_is_finite():
    hidden, gamma, _ = _case(B=2, S=128, D=128)
    mask = jnp.zeros((2, 128), jnp.int32)
    got = fp.fused_norm_mean_pool(hidden, gamma, mask, eps=1e-5,
                                  normalized=False)
    assert np.isfinite(np.asarray(got)).all()
