"""Cross-process multihost execution (VERDICT r2 missing-3): spawn two real
processes, wire them with jax.distributed.initialize over CPU, and exercise
barrier / broadcast_host_obj / weighted_average / save_distributed_rows —
the coordinator/merge paths the in-process tests can't reach. The analogue of
the reference's torchrun multi-node launches
(/root/reference/scripts/training/train_gritlm_7b.sh:37-52)."""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import json, sys
rank, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
from gritlm_tpu.parallel import multihost as mh

mh.initialize(coordinator_address=f"127.0.0.1:{port}",
              num_processes=nproc, process_id=rank)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == rank
assert len(jax.devices()) == nproc  # one CPU device contributed per process

mh.barrier("start")
# coordinator-only payload with arbitrary structure; other ranks pass None
obj = mh.broadcast_host_obj({"seed": 42, "tag": "from-rank-0"}
                            if mh.is_coordinator() else None)
avg, cnt = mh.weighted_average(float(rank + 1), 2.0)
lo, hi = mh.local_shard_rows(5)
rows = [{"rank": rank, "i": i} for i in range(2)]
merged = mh.save_distributed_rows(rows, f"{outdir}/preds.jsonl")
mh.barrier("end")
with open(f"{outdir}/result.{rank}.json", "w") as f:
    json.dump({"obj": obj, "avg": avg, "cnt": cnt, "rows": [lo, hi],
               "merged": merged}, f)
"""


def test_two_process_multihost(tmp_path):
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
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    res = [json.load(open(tmp_path / f"result.{r}.json")) for r in range(2)]
    # broadcast: every rank got the coordinator's object
    for r in res:
        assert r["obj"] == {"seed": 42, "tag": "from-rank-0"}
    # weighted average of (1, w=2) and (2, w=2) = 1.5, total count 4
    for r in res:
        assert r["avg"] == pytest.approx(1.5)
        assert r["cnt"] == pytest.approx(4.0)
    # contiguous host striding of 5 rows over 2 hosts: [0,3) and [3,5)
    assert res[0]["rows"] == [0, 3] and res[1]["rows"] == [3, 5]
    # merged JSONL exists only via the coordinator, in rank order
    assert res[0]["merged"] is not None and res[1]["merged"] is None
    lines = [json.loads(l) for l in open(tmp_path / "preds.jsonl")]
    assert [(l["rank"], l["i"]) for l in lines] == [
        (0, 0), (0, 1), (1, 0), (1, 1)
    ]
    # tmp shards were cleaned up
    assert not list(tmp_path.glob("preds.jsonl.tmp.*"))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
