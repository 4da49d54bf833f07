"""Orbax checkpointing: sharded TrainState save / restore / rotate / resume.

Replaces the reference's staged-rename atomic checkpointing + FSDP
FULL_STATE_DICT dance + conversion scripts (gradcache_trainer.py:102-172,
scripts/convert_sharded.py; SURVEY §5.4): Orbax writes sharded arrays
atomically and restores them onto any mesh, so no reformat/convert step
exists. Final model export to HF safetensors goes through
models/loader.save_checkpoint.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from gritlm_tpu.training.train import TrainState

_STEP_RE = re.compile(r"^step_(\d+)$")


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        save_total_limit: int = 2,
        async_save: bool = True,
    ):
        """With async_save (default) `save()` returns once the on-device
        arrays are snapshotted and the write streams to disk in the
        background — training continues through the I/O (the reference
        blocks all ranks through a 10-hour-timeout FULL_STATE_DICT save,
        gradcache_trainer.py:58-74). A new save, restore, or wait() joins
        the previous write first; incomplete steps (crash mid-write) are
        invisible to all_steps/latest_step because Orbax renames its tmp
        dir atomically on commit."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_total_limit = save_total_limit
        self.async_save = async_save
        self._ckpt = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------ paths

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def all_steps(self):
        steps = []
        if os.path.isdir(self.directory):
            for d in os.listdir(self.directory):
                m = _STEP_RE.match(d)
                # only committed checkpoints: the "state" leaf dir appears
                # atomically when Orbax renames its tmp dir
                if m and os.path.isdir(
                    os.path.join(self.directory, d, "state")
                ):
                    steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # ------------------------------------------------------------------- save

    def save(self, state: TrainState, extra: Optional[dict] = None) -> str:
        step = int(jax.device_get(state.step))
        path = self._path(step)
        self._ckpt.wait_until_finished()  # join the previous async write
        self._rotate()  # enforce the limit over committed steps
        self._ckpt.save(
            os.path.join(path, "state"), dict(state=state), force=True
        )
        if not self.async_save:
            self._ckpt.wait_until_finished()
            self._rotate()  # sync mode: exact limit on return
        if extra:
            import json

            with open(os.path.join(path, "extra.json"), "w") as f:
                json.dump(extra, f)
        return path

    def wait(self) -> None:
        """Block until any in-flight async save has committed (call before
        process exit or before handing the directory to another consumer).
        Async mode holds up to limit+1 committed checkpoints between a save
        and the next join point (the old one is never deleted before the
        new one commits); this re-enforces the limit after joining."""
        self._ckpt.wait_until_finished()
        self._rotate()

    def _rotate(self) -> None:
        keep = self.save_total_limit
        steps = self.all_steps()
        while len(steps) > keep:
            victim = steps.pop(0)
            import shutil

            shutil.rmtree(self._path(victim), ignore_errors=True)

    def read_extra(self, step: Optional[int] = None) -> Optional[dict]:
        """Sidecar metadata saved alongside a step (data cursor for resume)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        p = os.path.join(self._path(step), "extra.json")
        if os.path.exists(p):
            import json

            with open(p) as f:
                return json.load(f)
        return None

    # ---------------------------------------------------------------- restore

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the template's shardings/dtypes (template = freshly
        built, sharded TrainState)."""
        self._ckpt.wait_until_finished()  # a just-saved step must be visible
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        # abstract template (shape/dtype/sharding) so orbax restores each
        # array directly onto its mesh shards
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "sharding") else x,
            template,
        )
        restored = self._ckpt.restore(
            os.path.join(self._path(step), "state"),
            target={"state": abstract},
        )
        state = restored["state"]
        if not isinstance(state, TrainState):
            state = TrainState(*state)
        return state
