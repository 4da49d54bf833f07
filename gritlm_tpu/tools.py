"""Checkpoint utility CLI: `python -m gritlm_tpu.tools <cmd> ...`

TPU-native replacements for the reference's checkpoint scripts (SURVEY §2.7):

  export-hf     Orbax training checkpoint → HF-safetensors model directory
                (analogue of scripts/convert_sharded.py — there is no
                FSDP-sharded-state-dict dance; Orbax already stores the
                resharded arrays, we just read the params subtree and write
                safetensors).
  shard         Re-save an HF checkpoint with a max shard size
                (scripts/shard.py).
  add-lm-head   Graft lm_head from a donor checkpoint onto an
                embedding-only model (scripts/add_lm_head.py).
  strip-prefix  Normalize state-dict key prefixes (e.g. trainer-wrapped
                "model.model.layers…" → "model.layers…";
                scripts/reformat_statedict.py).

All host-side: numpy + safetensors, no device needed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict

import numpy as np


def _load_hf_tensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    tensors: Dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        tensors.update(load_file(f))
    if not tensors:
        raise FileNotFoundError(f"no safetensors under {path}")
    return tensors


def _save_hf_tensors(path: str, tensors: Dict[str, np.ndarray],
                     max_shard_bytes: int) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    shards, cur, cur_bytes = [], {}, 0
    for k, v in tensors.items():
        if cur and cur_bytes + v.nbytes > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = np.ascontiguousarray(v)
        cur_bytes += v.nbytes
    shards.append(cur)
    if len(shards) == 1:
        save_file(shards[0], os.path.join(path, "model.safetensors"))
        return
    weight_map = {}
    for si, shard in enumerate(shards):
        fname = f"model-{si + 1:05d}-of-{len(shards):05d}.safetensors"
        save_file(shard, os.path.join(path, fname))
        weight_map.update({k: fname for k in shard})
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": int(sum(v.nbytes for v in tensors.values()))},
                   "weight_map": weight_map}, f)


def _copy_aux_files(src: str, dst: str) -> None:
    import shutil

    for name in ("config.json", "tokenizer.json", "tokenizer_config.json",
                 "special_tokens_map.json", "generation_config.json"):
        p = os.path.join(src, name)
        if os.path.exists(p) and os.path.abspath(src) != os.path.abspath(dst):
            shutil.copy(p, os.path.join(dst, name))


def cmd_export_hf(args) -> None:
    """Orbax step_N/state → HF safetensors dir."""
    import orbax.checkpoint as ocp

    from gritlm_tpu.config import ModelConfig
    from gritlm_tpu.models.loader import save_checkpoint

    state_path = args.checkpoint
    if not os.path.basename(state_path.rstrip("/")) == "state":
        cand = os.path.join(state_path, "state")
        if os.path.isdir(cand):
            state_path = cand
    restored = ocp.StandardCheckpointer().restore(state_path)
    params = restored["state"]["params"]
    step = restored["state"].get("step")
    cfg = ModelConfig.from_hf_config(args.config)
    save_checkpoint(args.out, cfg, params,
                    max_shard_bytes=args.max_shard_gb * 2**30)
    print(f"exported step={np.asarray(step) if step is not None else '?'} "
          f"→ {args.out}")


def cmd_shard(args) -> None:
    tensors = _load_hf_tensors(args.model)
    _save_hf_tensors(args.out, tensors, args.max_shard_gb * 2**30)
    _copy_aux_files(args.model, args.out)
    print(f"resharded {len(tensors)} tensors → {args.out}")


def cmd_add_lm_head(args) -> None:
    tensors = _load_hf_tensors(args.model)
    donor = _load_hf_tensors(args.donor)
    if "lm_head.weight" not in donor:
        raise KeyError(f"donor {args.donor} has no lm_head.weight")
    tensors["lm_head.weight"] = donor["lm_head.weight"]
    _save_hf_tensors(args.out, tensors, args.max_shard_gb * 2**30)
    _copy_aux_files(args.model, args.out)
    print(f"grafted lm_head from {args.donor} → {args.out}")


def cmd_strip_prefix(args) -> None:
    tensors = _load_hf_tensors(args.model)
    pref = args.prefix
    out = {(k[len(pref):] if k.startswith(pref) else k): v
           for k, v in tensors.items()}
    _save_hf_tensors(args.out, out, args.max_shard_gb * 2**30)
    _copy_aux_files(args.model, args.out)
    n = sum(k.startswith(pref) for k in tensors)
    print(f"stripped {pref!r} from {n}/{len(tensors)} keys → {args.out}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gritlm_tpu.tools", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--out", required=True)
        sp.add_argument("--max_shard_gb", type=float, default=5.0)

    sp = sub.add_parser("export-hf", help="Orbax checkpoint → HF safetensors")
    sp.add_argument("--checkpoint", required=True,
                    help="…/step_N or …/step_N/state directory")
    sp.add_argument("--config", required=True, help="HF-style config.json")
    common(sp)
    sp.set_defaults(fn=cmd_export_hf)

    sp = sub.add_parser("shard", help="re-save HF checkpoint with shard size")
    sp.add_argument("--model", required=True)
    common(sp)
    sp.set_defaults(fn=cmd_shard)

    sp = sub.add_parser("add-lm-head", help="graft donor lm_head")
    sp.add_argument("--model", required=True)
    sp.add_argument("--donor", required=True)
    common(sp)
    sp.set_defaults(fn=cmd_add_lm_head)

    sp = sub.add_parser("strip-prefix", help="strip state-dict key prefix")
    sp.add_argument("--model", required=True)
    sp.add_argument("--prefix", default="model.")
    common(sp)
    sp.set_defaults(fn=cmd_strip_prefix)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
