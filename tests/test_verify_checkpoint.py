"""verify-checkpoint CLI (VERDICT r3 next-6): one command that proves an
HF-format checkpoint loads through the bridge and matches the torch oracle,
reproduces the README cosine-fixture protocol, and runs an offline
retrieval smoke — proven here on a tiny-random checkpoint written by the
same export path real checkpoints use (models/loader.save_checkpoint)."""

import json

import jax
import pytest

from gritlm_tpu.config import tiny_mistral
from gritlm_tpu.models import init_params
from gritlm_tpu.models.loader import save_checkpoint


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    # fp32 export: the parity stage compares against a float32 torch oracle
    import dataclasses

    cfg = dataclasses.replace(tiny_mistral(), dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(7), with_lm_head=True)
    path = tmp_path_factory.mktemp("tiny_hf_ckpt")
    save_checkpoint(str(path), cfg, params)
    return str(path)


def _run(argv, capsys):
    from gritlm_tpu import tools

    tools.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_verify_checkpoint_full(ckpt_dir, capsys, tmp_path):
    pytest.importorskip("transformers")
    out_file = tmp_path / "verdict.json"
    v = _run(["verify-checkpoint", "--model", ckpt_dir,
              "--out", str(out_file)], capsys)
    assert v["ok"] is True
    assert v["load"]["ok"] and v["load"]["model_type"] == "mistral"
    # the torch oracle loaded the same safetensors → parity must hold
    tp = v["torch_parity"]
    assert tp["ran"] and tp["pass"], tp
    assert tp["causal_logit_rel_diff"] < 2e-3
    assert tp["bidirectional_hidden_rel_diff"] < 2e-3
    # fixture stage ran; random weights ≠ GritLM-7B values
    cf = v["cosine_fixture"]
    assert len(cf["sims"]) == 4 and cf["matches_gritlm7b"] is False
    # retrieval smoke produced metrics over the bundled micro-corpus
    rs = v["retrieval_smoke"]
    assert rs["n_queries"] == 6 and rs["n_docs"] == 18
    assert 0.0 <= rs["ndcg@10"] <= 1.0
    # verdict file mirrors stdout
    assert json.loads(out_file.read_text())["ok"] is True


def test_verify_checkpoint_skip_torch(ckpt_dir, capsys):
    v = _run(["verify-checkpoint", "--model", ckpt_dir, "--skip_torch"],
             capsys)
    assert v["ok"] is True
    assert v["torch_parity"] == {"ran": False, "reason": "--skip_torch"}


def test_verify_checkpoint_bad_dir(tmp_path, capsys):
    with pytest.raises(SystemExit):
        _run(["verify-checkpoint", "--model", str(tmp_path / "nope")],
             capsys)
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["load"]["ok"] is False
