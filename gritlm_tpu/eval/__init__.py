from gritlm_tpu.eval.retrieval import evaluate_retrieval, retrieval_metrics  # noqa: F401
