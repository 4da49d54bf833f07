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
  verify-checkpoint
                One-command real-weights readiness check (VERDICT r3
                next-6): load an HF-format checkpoint dir through the
                bridge, run causal + bidirectional logit/hidden parity vs
                transformers (if installed), reproduce the README cosine
                fixture protocol (/root/reference/README.md:62-69), run a
                QUICK_EVAL-style offline retrieval smoke on a bundled
                micro-corpus, and emit ONE JSON verdict. The day real
                GritLM weights are reachable, quality parity is a single
                invocation.

All host-side: numpy + safetensors, no device needed (verify-checkpoint
uses the default device).
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


# ------------------------------------------------------- verify-checkpoint

# The README correctness fixture (reference README.md:50-69): two paper
# titles as queries, their abstracts as documents, expected cosines for
# GritLM-7B. Published-example data, not code.
_FIXTURE_INSTRUCTION = (
    "Given a scientific paper title, retrieve the paper's abstract"
)
_FIXTURE_QUERIES = [
    "Bitcoin: A Peer-to-Peer Electronic Cash System",
    "Generative Representational Instruction Tuning",
]
_FIXTURE_DOCUMENTS = [
    "A purely peer-to-peer version of electronic cash would allow online "
    "payments to be sent directly from one party to another without going "
    "through a financial institution. Digital signatures provide part of "
    "the solution, but the main benefits are lost if a trusted third party "
    "is still required to prevent double-spending. We propose a solution to "
    "the double-spending problem using a peer-to-peer network. The network "
    "timestamps transactions by hashing them into an ongoing chain of "
    "hash-based proof-of-work, forming a record that cannot be changed "
    "without redoing the proof-of-work. The longest chain not only serves "
    "as proof of the sequence of events witnessed, but proof that it came "
    "from the largest pool of CPU power. As long as a majority of CPU power "
    "is controlled by nodes that are not cooperating to attack the network, "
    "they'll generate the longest chain and outpace attackers. The network "
    "itself requires minimal structure. Messages are broadcast on a best "
    "effort basis, and nodes can leave and rejoin the network at will, "
    "accepting the longest proof-of-work chain as proof of what happened "
    "while they were gone.",
    "All text-based language problems can be reduced to either generation "
    "or embedding. Current models only perform well at one or the other. "
    "We introduce generative representational instruction tuning (GRIT) "
    "whereby a large language model is trained to handle both generative "
    "and embedding tasks by distinguishing between them through "
    "instructions. Compared to other open models, our resulting GritLM 7B "
    "sets a new state of the art on the Massive Text Embedding Benchmark "
    "(MTEB) and outperforms all models up to its size on a range of "
    "generative tasks. By scaling up further, GritLM 8X7B outperforms all "
    "open generative language models that we tried while still being among "
    "the best embedding models. Notably, we find that GRIT matches "
    "training on only generative or embedding data, thus we can unify both "
    "at no performance loss. Among other benefits, the unification via "
    "GRIT speeds up Retrieval-Augmented Generation (RAG) by > 60% for "
    "long documents, by no longer requiring separate retrieval and "
    "generation models. Models, code, etc. are freely available at "
    "https://github.com/ContextualAI/gritlm.",
]
# README.md:62-69 expected cosines for GritLM-7B: [q0d0, q0d1, q1d0, q1d1]
_FIXTURE_EXPECTED = [0.608, 0.101, 0.120, 0.533]


def _gritlm_instruction(instruction: str) -> str:
    return ("<|user|>\n" + instruction + "\n<|embed|>\n") if instruction \
        else "<|embed|>\n"


def _micro_corpus():
    """Bundled QUICK_EVAL-style micro retrieval task: 6 queries × 18 docs,
    one relevant doc each (BEIR layout dicts)."""
    topics = [
        ("volcanic eruptions and lava flows",
         "Volcanoes erupt when magma rises through the crust; lava flows "
         "and ash clouds reshape the surrounding landscape."),
        ("training neural networks with gradient descent",
         "Neural networks learn by gradient descent: backpropagation "
         "computes parameter gradients of the loss layer by layer."),
        ("baking sourdough bread at home",
         "Sourdough bread rises from a wild yeast starter; long cold "
         "fermentation develops flavor before baking in a dutch oven."),
        ("the orbit of the moon around the earth",
         "The moon orbits the earth roughly every 27 days, driving ocean "
         "tides through its gravitational pull."),
        ("repairing a punctured bicycle tire",
         "To fix a bicycle puncture, remove the wheel, lever off the "
         "tire, patch the inner tube, and re-inflate to pressure."),
        ("the fall of the roman empire",
         "The western roman empire declined over centuries, pressured by "
         "invasions, economic strain, and political fragmentation."),
    ]
    fillers = [
        "Quarterly earnings rose on strong subscription revenue.",
        "The recipe calls for two eggs and a cup of flour.",
        "Photosynthesis converts sunlight into chemical energy in plants.",
        "The symphony's final movement returns to the opening theme.",
        "Glaciers carve valleys as they advance and retreat.",
        "The museum's new wing exhibits contemporary sculpture.",
        "Honeybees communicate foraging directions through dances.",
        "The novel interleaves two timelines a century apart.",
        "Submarine cables carry most intercontinental internet traffic.",
        "A balanced diet includes proteins, fats, and carbohydrates.",
        "The playwright revised the final act after previews.",
        "Coral reefs host a quarter of all marine species.",
    ]
    corpus, queries, qrels = {}, {}, {}
    for i, (q, d) in enumerate(topics):
        corpus[f"d{i}"] = {"title": "", "text": d}
        queries[f"q{i}"] = q
        qrels[f"q{i}"] = {f"d{i}": 1}
    for j, d in enumerate(fillers):
        corpus[f"f{j}"] = {"title": "", "text": d}
    return corpus, queries, qrels


def _torch_parity(path: str, model, max_diff_tol: float) -> dict:
    """Causal logit + bidirectional hidden parity vs the torch/HF oracle
    loaded from the SAME checkpoint dir (the architecture-parity protocol
    of tests/test_golden_parity.py, on real weights)."""
    import torch
    from transformers import AutoModelForCausalLM

    import jax
    import jax.numpy as jnp

    from gritlm_tpu.models.transformer import forward, forward_lm

    oracle = AutoModelForCausalLM.from_pretrained(
        path, torch_dtype=torch.float32, attn_implementation="eager",
        local_files_only=True,
    ).eval()

    cfg, params = model.config, model.params
    rng = np.random.default_rng(0)
    B, S = 2, 48
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, S - 7:] = 0  # one padded row exercises the mask path

    with torch.no_grad():
        t_logits = oracle(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.float().numpy()
    j_logits, _, _ = forward_lm(
        params, cfg, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32), causal=True,
    )
    j_logits = np.asarray(jax.device_get(j_logits), np.float32)
    valid = mask[:, :, None].astype(bool)
    causal_diff = float(
        np.max(np.abs((j_logits - t_logits) * valid))
        / max(np.max(np.abs(t_logits * valid)), 1e-9)
    )

    # bidirectional: base model under an explicit non-causal 4D mask (the
    # is_causal=False semantics of scripts/modeling_mistral_gritlm.py:
    # 1005-1036 — HF's stock model accepts the prepared 4D mask directly)
    pad = torch.tensor(mask, dtype=torch.float32)
    big_neg = torch.finfo(torch.float32).min
    m4 = (1.0 - pad[:, None, None, :].expand(B, 1, S, S)) * big_neg
    with torch.no_grad():
        t_hidden = getattr(oracle, "model", oracle)(
            input_ids=torch.tensor(ids), attention_mask=m4
        ).last_hidden_state.float().numpy()
    j_hidden, _, _ = forward(
        params, cfg, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32), causal=False,
    )
    j_hidden = np.asarray(jax.device_get(j_hidden), np.float32)
    bidir_diff = float(
        np.max(np.abs((j_hidden - t_hidden) * valid))
        / max(np.max(np.abs(t_hidden * valid)), 1e-9)
    )
    return {
        "ran": True,
        "causal_logit_rel_diff": round(causal_diff, 6),
        "bidirectional_hidden_rel_diff": round(bidir_diff, 6),
        "pass": causal_diff < max_diff_tol and bidir_diff < max_diff_tol,
    }


def cmd_verify_checkpoint(args) -> None:
    from gritlm_tpu.eval.retrieval import evaluate_retrieval
    from gritlm_tpu.gritlm import GritLM

    verdict: dict = {"checkpoint": args.model}

    # 1. bridge load
    try:
        model = GritLM.from_pretrained(
            args.model, mode="unified",
            dtype="float32" if args.fp32 else None,
        )
        n_params = int(sum(
            int(np.prod(x.shape))
            for x in __import__("jax").tree_util.tree_leaves(model.params)
        ))
        verdict["load"] = {
            "ok": True,
            "model_type": model.config.model_type,
            "n_params": n_params,
            "dtype": model.config.dtype,
        }
    except Exception as e:  # noqa: BLE001 — verdict must always emit
        verdict["load"] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(verdict))
        raise SystemExit(1)

    # 2. torch/transformers parity (skippable: torch absent or --skip_torch)
    if args.skip_torch:
        verdict["torch_parity"] = {"ran": False, "reason": "--skip_torch"}
    else:
        try:
            verdict["torch_parity"] = _torch_parity(
                args.model, model, args.parity_tol
            )
        except ImportError as e:
            verdict["torch_parity"] = {"ran": False, "reason": str(e)}

    # 3. README cosine fixture protocol
    d_rep = model.encode(_FIXTURE_DOCUMENTS,
                         instruction=_gritlm_instruction(""))
    q_rep = model.encode(_FIXTURE_QUERIES,
                         instruction=_gritlm_instruction(_FIXTURE_INSTRUCTION))

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    sims = [cos(q_rep[0], d_rep[0]), cos(q_rep[0], d_rep[1]),
            cos(q_rep[1], d_rep[0]), cos(q_rep[1], d_rep[1])]
    verdict["cosine_fixture"] = {
        "sims": [round(s, 4) for s in sims],
        "expected_gritlm7b": _FIXTURE_EXPECTED,
        "matches_gritlm7b": bool(
            all(abs(s - e) < args.fixture_tol
                for s, e in zip(sims, _FIXTURE_EXPECTED))
        ),
        # weaker, model-agnostic sanity: positives dominate their row
        "positives_rank_first": bool(sims[0] > sims[1] and sims[3] > sims[2]),
    }

    # 4. offline retrieval smoke (QUICK_EVAL spirit, micro-corpus)
    corpus, queries, qrels = _micro_corpus()
    metrics = evaluate_retrieval(
        model, corpus, queries, qrels,
        query_instruction=_gritlm_instruction(
            "Retrieve the passage that answers the query"),
        max_length=256, top_k=10, k_values=(1, 10),
    )
    verdict["retrieval_smoke"] = {
        "ndcg@10": round(metrics.get("ndcg@10", 0.0), 4),
        "recall@1": round(metrics.get("recall@1", 0.0), 4),
        "n_queries": len(queries), "n_docs": len(corpus),
    }

    verdict["ok"] = bool(
        verdict["load"]["ok"]
        and verdict.get("torch_parity", {}).get("pass", True) is not False
    )
    out = json.dumps(verdict)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    if not verdict["ok"]:
        raise SystemExit(2)


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

    sp = sub.add_parser(
        "verify-checkpoint",
        help="load an HF checkpoint dir, prove parity, emit a JSON verdict",
    )
    sp.add_argument("--model", required=True, help="HF-format checkpoint dir")
    sp.add_argument("--out", default=None, help="also write the verdict here")
    sp.add_argument("--skip_torch", action="store_true",
                    help="skip the transformers oracle comparison")
    sp.add_argument("--fp32", action="store_true",
                    help="load in fp32 (tightest parity; default keeps the "
                    "checkpoint dtype)")
    sp.add_argument("--parity_tol", type=float, default=2e-3,
                    help="max relative logit/hidden diff vs torch (fp32)")
    sp.add_argument("--fixture_tol", type=float, default=0.02,
                    help="tolerance on the README cosine fixture values")
    sp.set_defaults(fn=cmd_verify_checkpoint)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
