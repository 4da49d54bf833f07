"""Device mesh construction.

The reference scales with NCCL DDP/FSDP configs (18 accelerate YAMLs spanning
1→256 GPUs; SURVEY §2.8). Here the topology is one `jax.sharding.Mesh` with
named axes and everything else is sharding annotations:

  data   — batch (pure data parallel; cross-device negatives gather over this)
  fsdp   — parameter sharding (ZeRO-3 analogue; XLA inserts all-gather /
           reduce-scatter automatically)
  model  — tensor parallel (attention heads / MLP hidden)
  expert — MoE expert parallel (Mixtral; the reference had none)

Axes of size 1 cost nothing, so one mesh shape covers every config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_STAGE = "stage"
AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_MODEL = "model"
AXIS_EXPERT = "expert"

# stage outermost: pipeline boundaries tolerate the slowest links (DCN in
# multi-slice pods), everything else rides ICI
ALL_AXES = (AXIS_STAGE, AXIS_DATA, AXIS_FSDP, AXIS_MODEL, AXIS_EXPERT)

# Axes a batch dimension is sharded over (DP + FSDP both consume batch).
BATCH_AXES = (AXIS_DATA, AXIS_FSDP)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = -1  # -1 = all remaining devices
    model: int = 1
    expert: int = 1
    stage: int = 1  # pipeline stages (parallel/pipeline.py)

    def resolve(self, n_devices: int) -> "MeshConfig":
        known = self.data * self.model * self.expert * self.stage
        if self.fsdp == -1:
            assert n_devices % known == 0, (n_devices, self)
            return dataclasses.replace(self, fsdp=n_devices // known)
        assert known * self.fsdp == n_devices
        return self


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = (cfg or MeshConfig()).resolve(len(devices))
    arr = np.asarray(devices).reshape(
        cfg.stage, cfg.data, cfg.fsdp, cfg.model, cfg.expert
    )
    return Mesh(arr, ALL_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1, fsdp=1, model=1, expert=1),
                     devices=jax.devices()[:1])
