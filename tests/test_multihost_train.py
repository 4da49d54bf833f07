"""Process-spanning GSPMD training (VERDICT r3 next-4): 2 processes × 4
virtual CPU devices each, ONE global mesh (data=2, fsdp=2, model=2), real
`make_sharded_train_step` steps — the actual pod topology the reference
trains on (256-GPU multi-node FSDP,
/root/reference/scripts/configs/config_256gpusfsdp_m8x7.yml,
scripts/training/train_gritlm_7b.sh:37-52). The losses must match the
single-process 8-device run: same global batch, same params, same mesh
shape — GSPMD compiles the same program, only the process boundary moves.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
import json, sys
rank, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
from gritlm_tpu.parallel import multihost as mh

mh.initialize(coordinator_address=f"127.0.0.1:{port}",
              num_processes=nproc, process_id=rank)
assert jax.device_count() == 8 and len(jax.local_devices()) == 4

import numpy as np
from tests.test_multihost_train import make_batch, CFG4, TC
from gritlm_tpu.models import init_params
from gritlm_tpu.parallel import MeshConfig, make_mesh
from gritlm_tpu.training.train import init_train_state, make_sharded_train_step

mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
batch = make_batch()
params = jax.tree_util.tree_map(np.asarray, init_params(CFG4, jax.random.PRNGKey(0)))
run, shard = make_sharded_train_step(mesh, CFG4, TC)
state = shard(init_train_state(params, TC))
losses = []
for _ in range(2):
    state, m = run(state, batch)
    losses.append([float(m.loss), float(m.loss_emb), float(m.loss_gen),
                   float(m.grad_norm)])
if rank == 0:
    with open(f"{outdir}/losses.json", "w") as f:
        json.dump(losses, f)
mh.barrier("done")
"""


def _cfg4():
    import dataclasses

    from gritlm_tpu.config import tiny_mistral

    return dataclasses.replace(tiny_mistral(), num_hidden_layers=4)


def _tc():
    from gritlm_tpu.training.train import TrainConfig

    return TrainConfig(mode="unified", total_steps=4, gc_chunks=1, remat=True)


# module-level so the worker (which imports this module) builds the
# IDENTICAL config/batch from the same code
try:
    CFG4 = _cfg4()
    TC = _tc()
except Exception:  # collection without jax initialised
    CFG4 = TC = None


def make_batch():
    from gritlm_tpu.tokenizer import ByteTokenizer
    from gritlm_tpu.training.data import GritCollator

    coll = GritCollator(
        ByteTokenizer(), query_max_len=32, passage_max_len=32,
        generative_max_len=96,
    )
    feats = []
    for i in range(8):
        feats.append((
            ("find", f"query number {i}"),
            [("find", f"positive passage {i}"), ("find", f"negative {i}")],
            [f"question {i}?", f"answer {i}"],
        ))
    return coll(feats)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gspmd_train_matches_single_process(tmp_path):
    import jax
    import numpy as np

    from gritlm_tpu.models import init_params
    from gritlm_tpu.parallel import MeshConfig, make_mesh
    from gritlm_tpu.training.train import (
        init_train_state,
        make_sharded_train_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    # single-process baseline on the same (data=2, fsdp=2, model=2) mesh
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2),
                     devices=jax.devices()[:8])
    batch = make_batch()
    params = jax.tree_util.tree_map(
        np.asarray, init_params(CFG4, jax.random.PRNGKey(0))
    )
    run, shard = make_sharded_train_step(mesh, CFG4, TC)
    state = shard(init_train_state(params, TC))
    base = []
    for _ in range(2):
        state, m = run(state, batch)
        base.append([float(m.loss), float(m.loss_emb), float(m.loss_gen),
                     float(m.grad_norm)])

    # 2-process run over the process-spanning global mesh
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the TPU tunnel out
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(r), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    dist = json.load(open(tmp_path / "losses.json"))
    # same program, same data, same mesh shape → losses must agree to fp32
    # roundoff (the collective schedule may differ across process splits)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(base),
                               rtol=1e-5, atol=1e-6)
