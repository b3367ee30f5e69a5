from .checkpoint import TrainCheckpointer, load_params, load_unet_checkpoint, save_params
from .logging import TrainLogger
from .profiling import StepTimer, annotate, trace

__all__ = [
    "TrainCheckpointer", "load_params", "load_unet_checkpoint", "save_params",
    "TrainLogger", "StepTimer", "annotate", "trace",
]
