from cgcnet_tpu.train.optim import make_optimizer, step_lr_schedule
from cgcnet_tpu.train.metrics import ImageLevelMetric
from cgcnet_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from cgcnet_tpu.train.state import TrainState, create_train_state
from cgcnet_tpu.train.loop import Trainer, evaluate

__all__ = [
    "make_optimizer",
    "step_lr_schedule",
    "ImageLevelMetric",
    "save_checkpoint",
    "load_checkpoint",
    "TrainState",
    "create_train_state",
    "Trainer",
    "evaluate",
]
