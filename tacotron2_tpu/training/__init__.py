from tacotron2_tpu.training.losses import tacotron2_loss
from tacotron2_tpu.training.optimizer import make_optimizer, multistep_lr_schedule
from tacotron2_tpu.training.train_state import TrainState

__all__ = ["tacotron2_loss", "make_optimizer", "multistep_lr_schedule", "TrainState"]
