"""End-to-end training CLI: toy JSONL → sharded train → checkpoint →
resume → HF export (the analogue of the reference's train_test.sh smoke,
SURVEY §4.1)."""

import os

import jax
import numpy as np
import pytest

TOY = os.path.join(os.path.dirname(__file__), "toy_data")


def _args(outdir, max_steps, resume=False):
    a = [
        "--train_data", TOY, "--mode", "unified",
        "--per_device_train_batch_size", "2", "--max_steps", str(max_steps),
        "--query_max_len", "128", "--passage_max_len", "128",
        "--generative_max_len", "64",
        "--mesh_data", "2", "--mesh_fsdp", "2", "--mesh_model", "2",
        "--gc_chunks", "2", "--save_steps", "3", "--logging_steps", "2",
        "--learning_rate", "1e-3", "--output_dir", outdir,
    ]
    if resume:
        a += ["--resume_from_checkpoint", "auto"]
    return a


@pytest.mark.slow
def test_train_cli_checkpoint_resume_export(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gritlm_tpu.training.run import main

    out = str(tmp_path / "run")
    r1 = main(_args(out, 4))
    assert r1["steps"] == 4
    assert np.isfinite(r1["final"]["loss"])
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "checkpoints", "step_3"))

    r2 = main(_args(out, 6, resume=True))
    assert r2["steps"] == 6  # continued from 4, not restarted

    # exported checkpoint round-trips into the inference API
    from gritlm_tpu import GritLM

    m = GritLM.from_pretrained(os.path.join(out, "export"), mode="unified")
    e = m.encode("roundtrip")
    assert e.shape == (m.config.hidden_size,)


def test_parse_args_types():
    from gritlm_tpu.training.arguments import parse_args

    a = parse_args([
        "--train_data", "x,y", "--learning_rate", "3e-4", "--gc_chunks", "4",
        "--prefixlm", "--max_steps", "17", "--resume_from_checkpoint", "auto",
    ])
    assert a.train_data == ["x", "y"]
    assert a.learning_rate == 3e-4 and a.gc_chunks == 4
    assert a.prefixlm is True
    assert a.max_steps == 17
    assert a.resume_from_checkpoint == "auto"
    with pytest.raises(ValueError):
        parse_args(["--nope", "1"])


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    """A killed-and-resumed run must consume exactly the batch stream the
    uninterrupted run would have: final weights bit-identical (deterministic
    data order + deterministic step). Guards the skip-first-batches resume
    (reference gradcache_trainer.py:464-508)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from gritlm_tpu.models.loader import load_checkpoint
    from gritlm_tpu.training.run import main

    rA = main(_args(str(tmp_path / "a"), 6))
    assert rA["steps"] == 6

    # "kill" run B during step 4 — after the step-3 checkpoint (save_steps=3),
    # before any later save — then resume with the same max_steps
    from gritlm_tpu.training.metrics_logger import MetricsLogger

    orig_log = MetricsLogger.log

    def bomb(self, step, metrics):
        if step >= 4:
            raise KeyboardInterrupt("simulated kill")
        return orig_log(self, step, metrics)

    MetricsLogger.log = bomb
    try:
        with pytest.raises(KeyboardInterrupt):
            main(_args(str(tmp_path / "b"), 6))
    finally:
        MetricsLogger.log = orig_log
    rB = main(_args(str(tmp_path / "b"), 6, resume=True))
    assert rB["steps"] == 6

    _, pa = load_checkpoint(rA["export"])
    _, pb = load_checkpoint(rB["export"])
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(pb))
    assert flat_a
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf, jnp.float32), np.asarray(flat_b[path], jnp.float32),
            err_msg=str(path),
        )


@pytest.mark.slow
def test_run_qlora_smoke(tmp_path):
    """End-to-end QLoRA training run on toy data: int8 frozen base + LoRA
    adapters, merged dense HF export at the end (reference --qlora path)."""
    from gritlm_tpu.models.loader import load_checkpoint
    from gritlm_tpu.training.run import main

    out = main([
        "--train_data", TOY,
        "--mode", "unified",
        "--model_preset", "tiny_mistral",
        "--per_device_train_batch_size", "2",
        "--max_steps", "3",
        "--mesh_data", "4", "--mesh_fsdp", "2",
        "--qlora", "true", "--lora_r", "4",
        "--query_max_len", "32", "--passage_max_len", "32",
        "--generative_max_len", "48",
        "--logging_steps", "1", "--save_steps", "0",
        "--output_dir", str(tmp_path),
    ])
    assert out["steps"] == 3
    assert np.isfinite(out["final"]["loss"])
    cfg2, params2 = load_checkpoint(out["export"])
    import jax.numpy as jnp
    assert params2["layers"]["attn"]["wq"].dtype != jnp.int8


def test_checkpoint_save_total_limit_one(tmp_path):
    """Sync mode honors save_total_limit=1 exactly; async mode holds at
    most limit+1 until the next join and wait() re-enforces the limit."""
    import jax
    from gritlm_tpu.config import tiny_mistral
    from gritlm_tpu.models import init_params
    from gritlm_tpu.training.checkpoint import CheckpointManager
    from gritlm_tpu.training.train import TrainConfig, init_train_state

    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = TrainConfig(mode="embedding", total_steps=4)
    state = init_train_state(params, tc)

    sync = CheckpointManager(str(tmp_path / "s"), save_total_limit=1,
                             async_save=False)
    for step in (1, 2, 3):
        sync.save(state._replace(step=jax.numpy.asarray(step)))
        assert sync.all_steps() == [step]

    an = CheckpointManager(str(tmp_path / "a"), save_total_limit=1,
                          async_save=True)
    for step in (1, 2):
        an.save(state._replace(step=jax.numpy.asarray(step)))
    an.wait()
    assert an.all_steps() == [2]
