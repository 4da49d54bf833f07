from gritlm_tpu.data_prep.format import (  # noqa: F401
    validate_embedding_row,
    validate_generative_row,
    validate_file,
    reformat_pairs,
    reformat_chat,
    dataset_length_stats,
    check_decontamination,
)
from gritlm_tpu.data_prep.mine_negatives import mine_hard_negatives  # noqa: F401
