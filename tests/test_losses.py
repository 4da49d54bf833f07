import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.training.losses import contrastive_loss, next_token_loss


def test_contrastive_perfect_alignment_low_loss():
    # queries exactly equal to their positives, orthogonal negatives
    q = jnp.eye(4, 8)  # 4 queries
    p_rows = []
    for i in range(4):
        p_rows.append(np.eye(8)[i])  # positive = query
        p_rows.append(np.eye(8)[i + 4])  # negative orthogonal
    p = jnp.asarray(np.stack(p_rows), jnp.float32)
    loss = contrastive_loss(q, p, temperature=0.02)
    assert float(loss) < 1e-3


def test_contrastive_target_stride():
    """Group size 2: query i's positive must be passage 2i, not i."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(3, 16)), jnp.float32)
    p = jnp.concatenate([q[:, None, :], jnp.asarray(rng.normal(size=(3, 1, 16)), jnp.float32)], axis=1)
    p = p.reshape(6, 16)  # [pos0, neg0, pos1, neg1, ...]
    aligned = contrastive_loss(q, p, temperature=0.5)
    # shuffle so positives no longer sit at stride positions
    p_bad = jnp.roll(p, 1, axis=0)
    misaligned = contrastive_loss(q, p_bad, temperature=0.5)
    assert float(aligned) < float(misaligned)


def test_contrastive_matches_manual_ce():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 4)).astype(np.float32)
    p = rng.normal(size=(4, 4)).astype(np.float32)
    tau = 0.1
    scores = q @ p.T / tau
    targets = [0, 2]
    exp = np.mean([
        -scores[i, t] + np.log(np.exp(scores[i]).sum()) for i, t in enumerate(targets)
    ])
    got = float(contrastive_loss(jnp.asarray(q), jnp.asarray(p), tau))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_next_token_loss_shift_and_ignore():
    V = 8
    logits = np.full((1, 4, V), -10.0, np.float32)
    labels = np.array([[-100, 3, 5, -100]])
    # predict correctly at the shifted positions: logits[t] predicts labels[t+1]
    logits[0, 0, 3] = 10.0  # predicts label[1]=3
    logits[0, 1, 5] = 10.0  # predicts label[2]=5
    loss = next_token_loss(jnp.asarray(logits), jnp.asarray(labels), "mixed", 1.0)
    assert float(loss) < 1e-3
    # wrong prediction at position 1 → large loss
    logits[0, 1, 5] = -10.0
    logits[0, 1, 2] = 10.0
    loss2 = next_token_loss(jnp.asarray(logits), jnp.asarray(labels), "mixed", 1.0)
    assert float(loss2) > 5.0


def test_next_token_loss_token_vs_mixed_weighting():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(2, 6, 10)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, size=(2, 6)))
    mixed = next_token_loss(logits, labels, "mixed", 1.0)
    token = next_token_loss(logits, labels, "token", 1.0)
    # token = sum/B; mixed = sum/n_valid; n_valid = 2*5 → token = mixed * 5
    np.testing.assert_allclose(float(token), float(mixed) * 5, rtol=1e-5)


def test_loss_factor_scales():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 5, 7)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7, size=(1, 5)))
    a = next_token_loss(logits, labels, "mixed", 1.0)
    b = next_token_loss(logits, labels, "mixed", 0.25)
    np.testing.assert_allclose(float(b), float(a) * 0.25, rtol=1e-6)


def test_all_ignored_labels_no_nan():
    logits = jnp.zeros((1, 4, 5))
    labels = jnp.full((1, 4), -100)
    loss = next_token_loss(logits, labels, "mixed", 1.0)
    assert np.isfinite(float(loss)) and float(loss) == 0.0
