from gritlm_tpu.rag.engine import RAGEngine, CacheMode  # noqa: F401
from gritlm_tpu.rag.metrics import exact_match_score, f1_score, match_score  # noqa: F401
from gritlm_tpu.rag.tasks import get_task, register_task, filter_results_by_id  # noqa: F401
from gritlm_tpu.rag.corpus import load_passages, synthetic_passages, passage_text  # noqa: F401
