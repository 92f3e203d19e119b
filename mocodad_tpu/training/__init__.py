from mocodad_tpu.training.checkpoint import (  # noqa: F401
    TopKCheckpointManager, load_checkpoint, merge_matching, save_checkpoint)
from mocodad_tpu.training.ema import ema_init, ema_update  # noqa: F401
from mocodad_tpu.training.loop import Trainer, TrainState  # noqa: F401
