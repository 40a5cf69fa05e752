"""Training: optax optimizers, jitted DP train steps with ZeRO-2-sharded
optimizer state, checkpointing. Replaces the reference's PyTorch-Lightning +
DeepSpeed stack (trainer.py, utils/utils_train.py, config/config.yaml)."""

from open_pandora_tpu.train.optim import make_optimizer, trainable_partition  # noqa: F401
from open_pandora_tpu.train.step import TrainState, make_finetune_step  # noqa: F401
