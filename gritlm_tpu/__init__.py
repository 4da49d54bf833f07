"""gritlm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of GritLM.

GritLM (Generative Representational Instruction Tuning) is one decoder-only LLM
that does both text embedding (bidirectional attention + pooling in <|embed|> mode)
and generation (causal attention), distinguished purely by prompt format.
Reference behavior: /root/reference (ContextualAI/gritlm); see SURVEY.md.

This package is a from-scratch TPU-first redesign:
  - models/    pure-functional Mistral/Mixtral decoders (pytree params, lax.scan layers)
  - ops/       Pallas kernels + reference jnp paths (flash fwd+bwd, ring attention, pooling)
  - parallel/  mesh + GSPMD sharding rules (stage/data/fsdp/model/expert axes),
               GPipe pipeline, sequence-parallel trunk, multi-host runtime
  - training/  GRIT joint training: contrastive + next-token losses, scan-GradCache,
               LoRA/int8-QLoRA, Orbax checkpoints, run CLI, native C++ loader
  - index/     sharded flat dense index (matmul + fused top-k over the mesh)
  - rag/       doc/query KV-cache RAG engine, task plugins, corpus/QA prep
  - eval/      MTEB adapter + instruction sets, generative tasks, reranker,
               latency harness, result aggregation
  - data_prep/ training-data format contract + hard-negative mining
  - tools.py   checkpoint utility CLI
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import so `import gritlm_tpu.models` works before every subsystem exists
    if name == "GritLM":
        from gritlm_tpu.gritlm import GritLM

        return GritLM
    raise AttributeError(name)
