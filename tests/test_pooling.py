import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.ops.pooling import mask_instruction, pool


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(3, 6, 4)).astype(np.float32)
    mask = np.array(
        [
            [1, 1, 1, 1, 1, 1],
            [1, 1, 1, 0, 0, 0],
            [0, 1, 1, 1, 0, 0],  # leading hole (masked instruction)
        ],
        np.int32,
    )
    return jnp.asarray(hidden), jnp.asarray(mask), hidden, mask


def test_mean(data):
    h, m, hn, mn = data
    out = np.asarray(pool(h, m, "mean"))
    for i in range(3):
        exp = (hn[i] * mn[i][:, None]).sum(0) / mn[i].sum()
        np.testing.assert_allclose(out[i], exp, rtol=1e-6)


def test_weightedmean(data):
    h, m, hn, mn = data
    out = np.asarray(pool(h, m, "weightedmean"))
    for i in range(3):
        w = mn[i] * np.cumsum(mn[i])
        exp = (hn[i] * w[:, None]).sum(0) / w.sum()
        np.testing.assert_allclose(out[i], exp, rtol=1e-5)


def test_cls(data):
    h, m, hn, _ = data
    np.testing.assert_allclose(np.asarray(pool(h, m, "cls")), hn[:, 0], rtol=1e-6)


def test_lasttoken(data):
    h, m, hn, mn = data
    out = np.asarray(pool(h, m, "lasttoken"))
    # last position where mask == 1: rows → 5, 2, 3
    np.testing.assert_allclose(out[0], hn[0, 5], rtol=1e-6)
    np.testing.assert_allclose(out[1], hn[1, 2], rtol=1e-6)
    np.testing.assert_allclose(out[2], hn[2, 3], rtol=1e-6)


def test_lasttoken_empty_mask_clamps():
    hidden = jnp.ones((1, 4, 2))
    mask = jnp.zeros((1, 4), jnp.int32)
    out = pool(hidden, mask, "lasttoken")
    # clamp-to-0 + mask multiply → zeros, no crash (reference clamp semantics)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_mask_instruction():
    mask = jnp.ones((2, 5), jnp.int32)
    out = np.asarray(mask_instruction(mask, jnp.array([2, 0])))
    np.testing.assert_array_equal(out, [[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])


def test_unknown_method_raises(data):
    h, m, *_ = data
    with pytest.raises(NotImplementedError):
        pool(h, m, "nope")
