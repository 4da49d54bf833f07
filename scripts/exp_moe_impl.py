"""MoE execution strategy shootout on real hardware: dense vs gshard vs
dropless for the Mixtral-shaped bench config (8 experts × ~88M/layer,
top-2, bf16) at the encode and decode shapes bench.py measures.

  dense    — every token through every expert, gate-weighted sum (the
             reference's single-GPU execution, modeling_mixtral_gritlm.py:
             843-882): 4× the FLOPs of top-2 but zero routing overhead.
  gshard   — capacity-factor dispatch via one-hot matmuls: fixed shapes,
             drops overflow tokens (training-time semantics).
  dropless — ragged_dot grouped matmul over tokens sorted by expert: exact
             top-2 compute, no drops (inference-correct).

Usage: python scripts/exp_moe_impl.py [--steps 10]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    from bench import _moe_bench_config, bench_decode, bench_encode
    from gritlm_tpu.models import init_params

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    base = _moe_bench_config()
    params = init_params(base, jax.random.PRNGKey(1), with_lm_head=True)
    for impl in ("dense", "gshard", "dropless"):
        cfg = dataclasses.replace(base, moe_impl=impl)
        enc = bench_encode(cfg, params)
        dec = bench_decode(cfg, params)
        print(f"{impl:>9}: encode {enc:8.2f} embeds/s   "
              f"decode {dec:7.3f} ms/token")


if __name__ == "__main__":
    main()
