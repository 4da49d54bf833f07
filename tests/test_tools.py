"""Checkpoint utility CLI tests (reference scripts/{shard,add_lm_head,
reformat_statedict,convert_sharded}.py; SURVEY §2.7)."""

import json
import os

import jax
import numpy as np
from safetensors.numpy import load_file

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.models.loader import load_checkpoint, save_checkpoint
from gritlm_tpu.tools import main as tools_main


def _tiny_ckpt(path, key=0, with_lm_head=True):
    cfg = tiny_mistral()
    params = init_params(cfg, jax.random.PRNGKey(key), with_lm_head=with_lm_head)
    save_checkpoint(str(path), cfg, params)
    return cfg, params


def test_shard_roundtrip(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    cfg, params = _tiny_ckpt(src)
    # force multi-shard with a tiny shard cap
    tools_main(["shard", "--model", str(src), "--out", str(dst),
                "--max_shard_gb", str(64 * 1024 / 2**30)])  # 64KB shards
    assert os.path.exists(dst / "model.safetensors.index.json")
    n_shards = len([f for f in os.listdir(dst) if f.endswith(".safetensors")])
    assert n_shards > 1
    cfg2, params2 = load_checkpoint(str(dst))
    np.testing.assert_array_equal(
        np.asarray(params["embed"]["embedding"]),
        np.asarray(params2["embed"]["embedding"]),
    )


def test_add_lm_head_cli(tmp_path):
    base, donor, out = tmp_path / "base", tmp_path / "donor", tmp_path / "out"
    _tiny_ckpt(base, key=1, with_lm_head=False)
    _, donor_params = _tiny_ckpt(donor, key=2, with_lm_head=True)
    tools_main(["add-lm-head", "--model", str(base), "--donor", str(donor),
                "--out", str(out)])
    merged = load_file(str(out / "model.safetensors"))
    np.testing.assert_array_equal(
        merged["lm_head.weight"],
        np.ascontiguousarray(np.asarray(donor_params["lm_head"]["kernel"]).T),
    )


def test_strip_prefix(tmp_path):
    from safetensors.numpy import save_file

    src, out = tmp_path / "wrapped", tmp_path / "clean"
    os.makedirs(src)
    save_file(
        {"model.model.embed_tokens.weight": np.zeros((4, 2), np.float32),
         "lm_head.weight": np.ones((2, 4), np.float32)},
        str(src / "model.safetensors"),
    )
    tools_main(["strip-prefix", "--model", str(src), "--prefix", "model.",
                "--out", str(out)])
    t = load_file(str(out / "model.safetensors"))
    assert set(t) == {"model.embed_tokens.weight", "lm_head.weight"}


def test_export_hf_from_orbax(tmp_path):
    """convert_sharded analogue: train-state Orbax checkpoint → HF dir →
    loads back with identical params."""
    import optax
    import orbax.checkpoint as ocp

    cfg, params = _tiny_ckpt(tmp_path / "ref")  # writes config.json too
    opt_state = optax.adamw(1e-4).init(params)
    state = {"step": np.int64(7), "params": params, "opt": opt_state}
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(str(tmp_path / "ckpt" / "step_7" / "state"), dict(state=state))
    ckpt.wait_until_finished()
    tools_main(["export-hf", "--checkpoint", str(tmp_path / "ckpt" / "step_7"),
                "--config", str(tmp_path / "ref" / "config.json"),
                "--out", str(tmp_path / "hf")])
    cfg2, params2 = load_checkpoint(str(tmp_path / "hf"))
    np.testing.assert_allclose(
        np.asarray(params["layers"]["attn"]["wq"], np.float32),
        np.asarray(params2["layers"]["attn"]["wq"], np.float32),
    )
