"""Training subsystem: engine, pipeline, callbacks, loggers."""

from predict_pv_yield_tpu.training.callbacks import EarlyStopping, ModelCheckpoint
from predict_pv_yield_tpu.training.engine import Trainer
from predict_pv_yield_tpu.training.pipeline import train

__all__ = ["Trainer", "train", "ModelCheckpoint", "EarlyStopping"]
