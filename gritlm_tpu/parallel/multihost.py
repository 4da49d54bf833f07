"""Multi-host runtime: initialization, process gating, global barriers.

The reference's multi-node story is torchrun/accelerate + NCCL rendezvous
with watchdog-timeout tuning (SURVEY §5.8: c10d rendezvous, 10h timeouts,
NCCL_ASYNC_ERROR_HANDLING). On TPU pods none of that exists: every host runs
the same program, `jax.distributed.initialize()` wires the controller, and
collectives compile onto ICI/DCN. This module is the thin layer around that:

  initialize()        idempotent jax.distributed.initialize with env detection
  is_coordinator()    process_index == 0 (rank-0 gating for logs/writes)
  barrier()           global device barrier via a tiny psum (the analogue of
                      dist.barrier at checkpoint-rename time,
                      gradcache_trainer.py:166)
  broadcast_host_obj  coordinator → all hosts for small host-side metadata
  local_shard_rows()  this host's row range of a globally sharded batch
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize. On TPU pods args come from the
    metadata server automatically; args are only needed for CPU/GPU fleets.
    Safe to call in single-process runs (no-op)."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None:
        # single process (or TPU auto-detection already happened at import).
        # Deliberately NOT probing jax.process_count() here: that would
        # initialize the XLA backend, and a later explicit
        # jax.distributed.initialize would then be rejected.
        _initialized = True
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already wired (TPU pod auto-init / double call). JAX 0.9 words
        # this "should only be called once" or "must be called before any
        # JAX calls" — tolerate both only when a controller is actually up
        msg = str(e).lower()
        tolerable = "already" in msg or "once" in msg or "before any" in msg
        if not tolerable:
            raise
        try:
            up = jax.process_count() >= 1
        except Exception:
            up = False
        if not up:
            raise
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d, %d local devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count())


def is_coordinator() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point: all hosts join a tiny
    all-reduce across all devices. Used around checkpoint renames and final
    writes (reference dist.barrier, rag/dist_utils.py:139-141)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("all",))
    x = jax.device_put(
        np.zeros((len(devs),), np.float32),
        NamedSharding(mesh, P("all")),
    )
    out = jax.jit(
        lambda v: jax.numpy.sum(v),
        out_shardings=NamedSharding(mesh, P()),
    )(x)
    jax.device_get(out)


def broadcast_host_obj(obj: Any, name: str = "bcast") -> Any:
    """Coordinator's small pickled object → every host (host-metadata
    exchange; the analogue of varsize object gathers in rag/dist_utils.py).

    Non-coordinators may pass anything (ignored): the object is pickled on
    the coordinator and shipped as bytes in two broadcasts (length, payload),
    so arbitrary structures work — `multihost_utils.broadcast_one_to_all`
    alone would require an identical pytree on every host."""
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj) if is_coordinator() else b""
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray([len(payload)], np.int64)
    )[0])
    buf = np.frombuffer(payload.ljust(n, b"\0"), np.uint8) if is_coordinator() \
        else np.zeros((n,), np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(np.asarray(out).tobytes())


def weighted_average(value: float, count: float) -> Tuple[float, float]:
    """Global weighted mean over hosts: returns (avg, total_count) — the
    analogue of rag/dist_utils.weighted_average (dist_utils.py:91-104)."""
    if jax.process_count() == 1:
        return (value, count)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(
        np.asarray([value * count, count], np.float64)
    )
    tot_w, tot_c = float(arr[:, 0].sum()), float(arr[:, 1].sum())
    return (tot_w / max(tot_c, 1e-9), tot_c)


def avg_dist_dict(keys, d: dict) -> dict:
    """Average a {metric: (value, count)}-style dict across hosts
    (rag/dist_utils.avg_dist_dict, dist_utils.py:106-111)."""
    return {k: weighted_average(d[k], d.get("count", 1))[0] for k in keys}


def save_distributed_rows(rows, path: str) -> Optional[str]:
    """Every host dumps its rows to path.tmp.<rank>; the coordinator merges
    them into one JSONL at `path` (reference save_distributed_dataset,
    rag/dist_utils.py:113-137). Returns the final path on the coordinator,
    None elsewhere."""
    import json
    import os

    tmp = f"{path}.tmp.{jax.process_index()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    barrier("save_distributed_rows")
    if not is_coordinator():
        return None
    with open(path, "w", encoding="utf-8") as out:
        # numeric rank order, bounded by the live process count (a lexical
        # glob would scramble >=10 ranks and sweep in stale tmp files)
        for rank in range(jax.process_count()):
            part = f"{path}.tmp.{rank}"
            with open(part, encoding="utf-8") as f:
                out.write(f.read())
            os.remove(part)
    return path


def local_shard_rows(n_rows: int) -> Tuple[int, int]:
    """[start, end) row range this host owns of an n_rows global batch —
    round-robin-free contiguous striding (loader-side sharding, the analogue
    of rank-strided passage loading, rag/index.py:165-173)."""
    p, n = jax.process_index(), jax.process_count()
    per = -(-n_rows // n)
    start = min(p * per, n_rows)
    return start, min(start + per, n_rows)
