"""Pipeline-parallel tests: GPipe schedule over the `stage` mesh axis must
match the plain layer-scan forward exactly, including gradients (so pipelined
training is sound)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.models.transformer import forward
from gritlm_tpu.parallel import MeshConfig, make_mesh
from gritlm_tpu.parallel.pipeline import pipeline_forward


@pytest.fixture(scope="module")
def cfg4():
    # 4 layers so a 4-stage pipeline gets one layer per stage
    return dataclasses.replace(tiny_mistral(), num_hidden_layers=4)


@pytest.fixture(scope="module")
def params4(cfg4):
    return init_params(cfg4, jax.random.PRNGKey(0), with_lm_head=False)


def _inputs(cfg, B=8, S=16, seed=1):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32).at[0, S - 3:].set(0)
    return ids, mask


@pytest.mark.parametrize("stages,data,micro", [(4, 2, 2), (2, 1, 4), (1, 2, 1)])
def test_pipeline_matches_forward(cfg4, params4, stages, data, micro):
    # the leftover devices land on fsdp, which (since r3) ZeRO-shards the
    # stage params AND consumes a slice of the batch — so B must cover
    # (data × fsdp) shards × microbatches
    mesh = make_mesh(MeshConfig(stage=stages, data=data, fsdp=8 // (stages * data)))
    n_shards = mesh.shape["data"] * mesh.shape["fsdp"]
    ids, mask = _inputs(cfg4, B=max(8, n_shards * micro))
    ref, _, _ = forward(params4, cfg4, ids, attention_mask=mask, causal=False)
    got = jax.jit(
        lambda p, i, m: pipeline_forward(
            p, cfg4, i, mesh, attention_mask=m, causal=False,
            n_microbatches=micro,
        )
    )(params4, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_causal(cfg4, params4):
    mesh = make_mesh(MeshConfig(stage=4, data=2, fsdp=1))
    ids, mask = _inputs(cfg4, seed=3)
    ref, _, _ = forward(params4, cfg4, ids, attention_mask=mask, causal=True)
    got = pipeline_forward(params4, cfg4, ids, mesh, attention_mask=mask,
                           causal=True, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients(cfg4, params4):
    """Backward through the pipeline (scan + ppermute + psum) equals the
    plain-forward gradient — pipelined training is exact."""
    mesh = make_mesh(MeshConfig(stage=4, data=1, fsdp=2))
    ids, mask = _inputs(cfg4, B=4, S=8, seed=5)

    def loss_pipe(p):
        h = pipeline_forward(p, cfg4, ids, mesh, attention_mask=mask,
                             causal=True, n_microbatches=2)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def loss_ref(p):
        h, _, _ = forward(p, cfg4, ids, attention_mask=mask, causal=True)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_pipe))(params4)
    g2 = jax.jit(jax.grad(loss_ref))(params4)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat2[ks]), rtol=2e-4, atol=2e-4,
            err_msg=ks,
        )


def test_pipeline_rejects_bad_split(cfg4, params4):
    mesh = make_mesh(MeshConfig(stage=8, data=1, fsdp=1))
    ids, mask = _inputs(cfg4)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward(params4, cfg4, ids, mesh, attention_mask=mask,
                         n_microbatches=2)


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host layer (multi-process paths
    need a real pod; these pin the contracts)."""
    from gritlm_tpu.parallel import multihost as mh

    mh.initialize()
    assert mh.is_coordinator()
    mh.barrier()  # must not deadlock on 8 local devices
    assert mh.broadcast_host_obj({"a": 1}) == {"a": 1}
    assert mh.local_shard_rows(10) == (0, 10)


def test_multihost_metric_and_dump_helpers(tmp_path):
    from gritlm_tpu.parallel import multihost as mh

    avg, n = mh.weighted_average(0.5, 10)
    assert (avg, n) == (0.5, 10)
    assert mh.avg_dist_dict(["em"], {"em": 0.7, "count": 4}) == {"em": 0.7}
    out = mh.save_distributed_rows(
        [{"q": "a"}, {"q": "b"}], str(tmp_path / "preds.jsonl"))
    assert out is not None
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 2 and '"q": "a"' in lines[0]
