"""GRIT training entry point: `python -m gritlm_tpu.training.run --args...`

The TPU counterpart of the reference's `python -m training.run`
(gritlm/training/run.py:54-434): loads JSONL data, builds the unified
dataset/collator/sampler, shards model + optimizer over the mesh, runs the
jitted train step (GradCache inside), logs loss_emb/loss_gen, checkpoints
with Orbax and exports the final model as an HF-safetensors checkpoint.

Example (toy smoke, CPU 8 devices):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python -m gritlm_tpu.training.run --train_data tests/toy_data \\
      --mode unified --per_device_train_batch_size 2 --max_steps 8 \\
      --mesh_data 2 --mesh_fsdp 2 --mesh_model 2 --output_dir /tmp/run
"""

from __future__ import annotations

import json
import logging
import os

import jax

logger = logging.getLogger("gritlm_tpu.train")


def main(argv=None) -> dict:
    from gritlm_tpu import config as cfgmod
    from gritlm_tpu.models import init_params
    from gritlm_tpu.models.loader import load_checkpoint, save_checkpoint
    from gritlm_tpu.parallel import MeshConfig, make_mesh
    from gritlm_tpu.tokenizer import load_tokenizer
    from gritlm_tpu.training.arguments import parse_args
    from gritlm_tpu.training.checkpoint import CheckpointManager
    from gritlm_tpu.training.data import (
        GritCollator,
        GritDataset,
        batch_iterator,
        load_train_dirs,
    )
    from gritlm_tpu.training.metrics_logger import MetricsLogger
    from gritlm_tpu.training.train import (
        init_train_state,
        make_sharded_train_step,
    )

    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "run_args.json"), "w") as f:
        json.dump(args.__dict__, f, indent=2, default=str)

    # ---- model
    if args.model_name_or_path:
        cfg, params = load_checkpoint(
            args.model_name_or_path, with_lm_head=(args.mode != "embedding"),
            dtype=args.dtype,
        )
        if args.moe_impl and cfg.is_moe:
            import dataclasses as dc

            cfg = dc.replace(cfg, moe_impl=args.moe_impl)
        tokenizer = load_tokenizer(args.model_name_or_path)
    else:
        cfg = getattr(cfgmod, args.model_preset)()
        if args.dtype:
            import dataclasses as dc

            cfg = dc.replace(cfg, dtype=args.dtype)
        if args.moe_impl and cfg.is_moe:
            import dataclasses as dc

            cfg = dc.replace(cfg, moe_impl=args.moe_impl)
        params = init_params(cfg, jax.random.PRNGKey(args.seed),
                             with_lm_head=(args.mode != "embedding"))
        tokenizer = load_tokenizer(None)
    if args.projection:
        import jax.numpy as jnp

        kp = jax.random.PRNGKey(args.seed + 1)
        lim = (6.0 / (cfg.hidden_size + args.projection)) ** 0.5
        params["projection"] = {
            "kernel": jax.random.uniform(
                kp, (cfg.hidden_size, args.projection), jnp.float32, -lim, lim
            ).astype(cfg.jnp_dtype),
            "bias": jnp.zeros((args.projection,), cfg.jnp_dtype),
        }
    logger.info("model: %s (%s), moe=%s, projection=%s", args.model_preset or
                args.model_name_or_path, cfg.dtype, cfg.is_moe, args.projection)

    # ---- data
    from gritlm_tpu.training.data import filter_too_long_instructions

    emb_sets, gen_sets = load_train_dirs(args.train_data)
    emb_sets = filter_too_long_instructions(
        tokenizer, emb_sets, args.query_max_len, args.passage_max_len
    )
    emb_sets = [s for s in emb_sets if s]
    n_emb = sum(len(s) for s in emb_sets)
    n_gen = sum(len(s) for s in gen_sets)
    logger.info("data: %d embedding samples (%d files), %d generative (%d files)",
                n_emb, len(emb_sets), n_gen, len(gen_sets))
    if args.mode == "unified" and n_emb == 0 and n_gen > 0:
        logger.warning(
            "unified mode but every embedding sample was filtered out "
            "(instruction+query longer than query_max_len=%d / passage_max_len"
            "=%d?) — training degrades to generative-only",
            args.query_max_len, args.passage_max_len)
    with open(os.path.join(args.output_dir, "dataset_num_samples.json"), "w") as f:
        json.dump({"embedding": n_emb, "generative": n_gen}, f)
    dataset = GritDataset(
        emb_sets, gen_sets, mode=args.mode,
        train_group_size=args.train_group_size,
        max_char_len=max(args.passage_max_len, args.generative_max_len) * 10,
        seed=args.seed, use_unique_indices=args.use_unique_indices,
    )

    # ---- mesh & global batch
    step_kind = "gspmd"
    if args.seq_parallel:
        # long-context: sequences sharded over every device (ring attention)
        from gritlm_tpu.parallel.seqpar import make_seq_mesh

        assert args.mesh_stage == 1 and args.mesh_model == 1, (
            "--seq_parallel is a dedicated 1-D seq mesh; unset the other axes")
        mesh = make_seq_mesh()
        dp_ways = 1
        step_kind = "seqpar"
    elif args.mesh_stage > 1:
        mesh = make_mesh(MeshConfig(
            stage=args.mesh_stage, data=args.mesh_data,
            fsdp=args.mesh_fsdp,
            model=args.mesh_model, expert=args.mesh_expert,
        ))
        assert mesh.shape["model"] == 1, (
            "pipeline training composes with --mesh_data/--mesh_fsdp; "
            "tensor parallel inside a stage is not supported (v1)")
        dp_ways = mesh.shape["data"] * mesh.shape["fsdp"]
        step_kind = "pipeline"
    else:
        mesh = make_mesh(MeshConfig(
            data=args.mesh_data, fsdp=args.mesh_fsdp,
            model=args.mesh_model, expert=args.mesh_expert,
        ))
        dp_ways = mesh.shape["data"] * mesh.shape["fsdp"]
    global_bs = args.per_device_train_batch_size * dp_ways
    take_nth = 1
    if args.per_device_generative_bs:
        assert args.per_device_train_batch_size % args.per_device_generative_bs == 0
        take_nth = args.per_device_train_batch_size // args.per_device_generative_bs
    collator = GritCollator(
        tokenizer,
        query_max_len=args.query_max_len,
        passage_max_len=args.passage_max_len,
        generative_max_len=args.generative_max_len,
        prefixlm=args.prefixlm,
        take_nth=take_nth,
    )

    steps_per_epoch = max(len(dataset) // global_bs, 1)
    total_steps = args.max_steps or steps_per_epoch * args.num_train_epochs
    tc = args.to_train_config(total_steps)
    logger.info("mesh=%s global_bs=%d steps=%d gradcache_chunks=%d",
                dict(mesh.shape), global_bs, total_steps, tc.gc_chunks)

    # ---- state (+ resume)
    lora_setup = None
    if args.lora or args.qlora:
        assert step_kind == "gspmd", (
            "lora/qlora training uses the GSPMD step; unset "
            "--mesh_stage/--seq_parallel")
        from gritlm_tpu.training.lora import make_lora_train_state

        run_step, state, frozen_base, lora_scale = make_lora_train_state(
            mesh, cfg, tc, params, r=args.lora_r, alpha=args.lora_alpha,
            quantize=args.qlora, seed=args.seed,
        )
        lora_setup = (frozen_base, lora_scale)
        logger.info("%s training: r=%d alpha=%d (base frozen%s)",
                    "qlora" if args.qlora else "lora", args.lora_r,
                    args.lora_alpha, ", int8" if args.qlora else "")
    elif step_kind == "pipeline":
        from gritlm_tpu.training.train import make_pipeline_train_step

        run_step, shard_state = make_pipeline_train_step(
            mesh, cfg, tc, n_microbatches=args.pipeline_microbatches
        )
        state = shard_state(init_train_state(params, tc))
    elif step_kind == "seqpar":
        from gritlm_tpu.training.train import make_seqpar_train_step

        run_step, shard_state = make_seqpar_train_step(mesh, cfg, tc)
        state = shard_state(init_train_state(params, tc))
    else:
        run_step, shard_state = make_sharded_train_step(mesh, cfg, tc)
        state = shard_state(init_train_state(params, tc))
    del params
    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                             args.save_total_limit)
    start_step = 0
    start_epoch, skip_batches = 0, 0
    if args.resume_from_checkpoint:
        want = None  # "auto" → latest
        if args.resume_from_checkpoint != "auto":
            import re

            m = re.search(r"step_(\d+)", args.resume_from_checkpoint)
            want = int(m.group(1)) if m else None
        if ckpt.latest_step() is not None:
            state = ckpt.restore(state, step=want)
            start_step = int(jax.device_get(state.step))
            # Data-order resume: fast-forward the deterministic batch stream
            # to where the original run stopped (reference skip_first_batches,
            # gradcache_trainer.py:464-508). Prefer the exact cursor saved in
            # extra.json; fall back to steps_per_epoch arithmetic for legacy
            # checkpoints without one.
            extra = ckpt.read_extra(want) or {}
            if "batch_in_epoch" in extra:
                start_epoch = int(extra.get("epoch", 0))
                skip_batches = int(extra["batch_in_epoch"])
            else:
                start_epoch = start_step // steps_per_epoch
                skip_batches = start_step % steps_per_epoch
            logger.info("resumed from step %d (epoch %d, skipping %d batches)",
                        start_step, start_epoch, skip_batches)

    native = None
    if args.native_loader:
        from gritlm_tpu.tokenizer import ByteTokenizer

        if not isinstance(tokenizer, ByteTokenizer):
            logger.warning("native_loader supports the byte tokenizer only; "
                           "falling back to the python pipeline")
        else:
            from gritlm_tpu.training.native_loader import NativeGritLoader

            native = NativeGritLoader(
                args.train_data, batch_size=global_bs,
                train_group_size=args.train_group_size,
                query_max_len=args.query_max_len,
                passage_max_len=args.passage_max_len,
                generative_max_len=args.generative_max_len,
                seed=args.seed, take_nth=take_nth,
            )
            logger.info("native loader: %d emb / %d gen samples",
                        native.n_emb, native.n_gen)

    def batches_for(epoch: int, skip: int = 0):
        if native is not None:
            it = native.epoch(epoch)
            for _ in range(skip):  # C++ loader: draining skipped batches is cheap
                if next(it, None) is None:
                    return iter(())
            return it
        return batch_iterator(dataset, collator, global_bs,
                              seed=args.seed, epoch=epoch, skip=skip)

    mlog = MetricsLogger(args.output_dir, args.logging_steps)
    step = start_step
    done = False
    last = {}
    epoch, bidx = start_epoch, skip_batches  # cursor if the loop never runs
    for epoch in range(args.num_train_epochs * 50):  # re-iterate if max_steps larger
        if done:
            break
        if epoch < start_epoch:
            # replay fully-consumed epochs' dataset draws so GritDataset.rng
            # reaches the same state as the uninterrupted run (collation is
            # skipped inside batch_iterator; native loader reseeds per epoch)
            if native is None:
                for _ in batches_for(epoch, skip=10**9):
                    pass
            continue
        bidx = skip_batches if epoch == start_epoch else 0
        for batch in batches_for(epoch, skip=bidx):
            if step >= total_steps:
                done = True
                break
            state, m = run_step(state, batch)
            step += 1
            bidx += 1
            last = {
                "loss": float(m.loss), "loss_emb": float(m.loss_emb),
                "loss_gen": float(m.loss_gen), "grad_norm": float(m.grad_norm),
            }
            if cfg.is_moe:
                # GShard capacity-overflow rate (0.0 = exact routing)
                last["moe_dropped_frac"] = float(m.moe_dropped_frac)
            mlog.log(step, last)
            if args.save_steps and step % args.save_steps == 0:
                ckpt.save(state, extra={"epoch": epoch, "batch_in_epoch": bidx})
        if args.max_steps is None and epoch + 1 >= args.num_train_epochs:
            done = True

    # ---- final save: orbax + HF export (LoRA: merged into dense weights)
    ckpt.save(state, extra={"epoch": epoch, "batch_in_epoch": bidx})
    ckpt.wait()  # the final async write must commit before we return
    export_dir = os.path.join(args.output_dir, "export")
    if lora_setup is not None:
        from gritlm_tpu.training.lora import merge

        frozen_base, lora_scale = lora_setup
        host_params = jax.device_get(
            merge(frozen_base, state.params, lora_scale)
        )
    else:
        host_params = jax.device_get(state.params)
    save_checkpoint(export_dir, cfg, host_params)
    logger.info("final checkpoint step %d → %s", step, export_dir)
    mlog.close()
    return {"steps": step, "final": last, "export": export_dir}


if __name__ == "__main__":
    main()
