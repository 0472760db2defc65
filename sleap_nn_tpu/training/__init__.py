"""Training engine: jitted train step, optax optimizers/schedulers, orbax
checkpoints, CSV/ZMQ callbacks, pjit data parallelism over a device mesh."""

from sleap_nn_tpu.training.model_trainer import ModelTrainer

__all__ = ["ModelTrainer"]
