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


# ---------------------------------------------------------------------------
# Fused (vocab-chunked) head+CE vs the unfused reference path


def _fused_case(B=2, S=7, D=16, V=37, chunk=8, seed=0, loss_type="mixed"):
    from gritlm_tpu.training.losses import fused_next_token_loss

    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(D, V)), jnp.float32)
    labels = np.asarray(rng.integers(0, V, size=(B, S)), np.int32)
    labels[rng.uniform(size=(B, S)) < 0.3] = -100
    labels = jnp.asarray(labels)

    def unfused(h, w):
        return next_token_loss(h @ w, labels, loss_type, 1.0)

    def fused(h, w):
        return fused_next_token_loss(h, w, labels, loss_type, 1.0,
                                     vocab_chunk=chunk)

    return hidden, kernel, unfused, fused


def test_fused_ce_matches_unfused_value_and_grads():
    # V=37 not divisible by chunk=8 → exercises the padded-column masking
    hidden, kernel, unfused, fused = _fused_case()
    l0, (gh0, gw0) = jax.value_and_grad(unfused, argnums=(0, 1))(hidden, kernel)
    l1, (gh1, gw1) = jax.value_and_grad(fused, argnums=(0, 1))(hidden, kernel)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), atol=1e-5)


def test_fused_ce_token_weighting_and_single_chunk():
    # chunk >= V degenerates to one scan step; token weighting path
    hidden, kernel, unfused, fused = _fused_case(V=12, chunk=16,
                                                 loss_type="token", seed=1)
    np.testing.assert_allclose(
        float(fused(hidden, kernel)), float(unfused(hidden, kernel)), rtol=1e-5
    )


def test_fused_ce_all_ignored_no_nan():
    from gritlm_tpu.training.losses import fused_next_token_loss

    hidden = jnp.ones((1, 4, 8), jnp.float32)
    kernel = jnp.ones((8, 11), jnp.float32)
    labels = jnp.full((1, 4), -100)
    loss = fused_next_token_loss(hidden, kernel, labels, "mixed", 1.0,
                                 vocab_chunk=4)
    assert np.isfinite(float(loss)) and float(loss) == 0.0


@pytest.mark.slow
def test_train_step_fused_ce_matches_unfused():
    # end-to-end: one unified train step, fused vs unfused gen loss
    from gritlm_tpu.config import ModelConfig
    from gritlm_tpu.models import init_params
    from gritlm_tpu.training.train import (
        TrainConfig, init_train_state, train_step,
    )

    cfg = ModelConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0), with_lm_head=True)
    rng = np.random.default_rng(5)

    def feat(b, s):
        return {
            "input_ids": jnp.asarray(rng.integers(0, 97, (b, s)), jnp.int32),
            "attention_mask": jnp.ones((b, s), jnp.int32),
            "instruction_lens": jnp.full((b,), 2, jnp.int32),
        }

    gen_ids = rng.integers(0, 97, (2, 10))
    labels = np.where(rng.uniform(size=(2, 10)) < 0.7, gen_ids, -100)
    batch = {
        "query": feat(2, 6),
        "passage": feat(4, 8),
        "generative": {
            "input_ids": jnp.asarray(gen_ids, jnp.int32),
            "attention_mask": jnp.ones((2, 10), jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
        },
    }
    out = {}
    for fused in (True, False):
        tc = TrainConfig(mode="unified", total_steps=10, fused_ce=fused,
                         remat=False)
        state = init_train_state(params, tc)
        new_state, m = train_step(state, batch, cfg, tc)
        out[fused] = (m, new_state)
    np.testing.assert_allclose(
        float(out[True][0].loss_gen), float(out[False][0].loss_gen), rtol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(out[True][1].params),
        jax.tree_util.tree_leaves(out[False][1].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
