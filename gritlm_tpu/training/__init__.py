from gritlm_tpu.training.losses import contrastive_loss, next_token_loss  # noqa: F401
