from gritlm_tpu.rag.engine import RAGEngine, CacheMode  # noqa: F401
from gritlm_tpu.rag.metrics import exact_match_score, f1_score, match_score  # noqa: F401
