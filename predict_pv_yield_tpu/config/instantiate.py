"""``_target_`` instantiation with reference-compatibility aliasing.

The hydra idiom ``hydra.utils.instantiate({_target_: "pkg.mod.Cls", ...})``
(reference ``training.py:39-65``) is reimplemented here, plus an alias table
that maps the *reference's* target strings — torch/Lightning/OCF class paths —
onto their native equivalents, so a user's existing experiment YAMLs work
unchanged against this framework.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

#: reference target -> native target (EXACT string matches only).
TARGET_ALIASES: Dict[str, str] = {
    # model zoo (reference configs/model/*.yaml)
    "predict_pv_yield.models.baseline.last_value.Model": "predict_pv_yield_tpu.models.baseline.Model",
    "predict_pv_yield.models.conv3d.model.Model": "predict_pv_yield_tpu.models.conv3d.Model",
    "predict_pv_yield.models.conv3d.model_sat_nwp.Model": "predict_pv_yield_tpu.models.conv3d_sat_nwp.Model",
    "predict_pv_yield.models.conv3d.model_nwp.Model": "predict_pv_yield_tpu.models.conv3d_nwp.Model",
    "predict_pv_yield.models.perceiver.perceiver.PerceiverModel": "predict_pv_yield_tpu.models.perceiver.PerceiverModel",
    "predict_pv_yield.models.perceiver.perceiver_nwp_sat.Model": "predict_pv_yield_tpu.models.perceiver_nwp_sat.Model",
    "predict_pv_yield.models.perceiver.perceiver_conv3d_nwp_sat.Model": "predict_pv_yield_tpu.models.perceiver_conv3d_nwp_sat.Model",
    # data layer
    "predict_pv_yield.data.dataloader.NetCDFDataModule": "predict_pv_yield_tpu.data.loader.NetCDFDataModule",
    "nowcasting_dataloader.datamodules.NetCDFDataModule": "predict_pv_yield_tpu.data.loader.NetCDFDataModule",
    # execution substrate
    "pytorch_lightning.Trainer": "predict_pv_yield_tpu.training.engine.Trainer",
    "pytorch_lightning.callbacks.ModelCheckpoint": "predict_pv_yield_tpu.training.callbacks.ModelCheckpoint",
    "pytorch_lightning.callbacks.EarlyStopping": "predict_pv_yield_tpu.training.callbacks.EarlyStopping",
    # logger backends (reference configs/logger/*.yaml)
    "pytorch_lightning.loggers.csv_logs.CSVLogger": "predict_pv_yield_tpu.training.loggers.CSVLogger",
    "pytorch_lightning.loggers.tensorboard.TensorBoardLogger": "predict_pv_yield_tpu.training.loggers.TensorBoardLogger",
    "pytorch_lightning.loggers.wandb.WandbLogger": "predict_pv_yield_tpu.training.loggers.WandbLogger",
    "pytorch_lightning.loggers.neptune.NeptuneLogger": "predict_pv_yield_tpu.training.loggers.NeptuneLogger",
    "pytorch_lightning.loggers.mlflow.MLFlowLogger": "predict_pv_yield_tpu.training.loggers.MLFlowLogger",
    "pytorch_lightning.loggers.comet.CometLogger": "predict_pv_yield_tpu.training.loggers.CometLogger",
}

#: kwargs accepted by the reference classes but meaningless here; dropped
#: silently so reference YAMLs instantiate cleanly. NOTE: the SaaS logger
#: kwargs (api_key/project_name/experiment_name/offline) are NOT in this
#: set — the native backends consume them (configs/logger/*.yaml route
#: runs by them; stripping silently misdirected comet/mlflow runs).
_IGNORED_KWARGS = {
    "gpus",
    "auto_select_gpus",
    "tpu_cores",
    "progress_bar_refresh_rate",
    "close_after_fit",
}


def locate(target: str) -> Any:
    """Import ``pkg.mod.attr`` (hydra's ``_locate`` analog)."""
    aliased = TARGET_ALIASES.get(target)
    if aliased is None and target.split(".", 1)[0] in (
        "pytorch_lightning", "predict_pv_yield", "nowcasting_dataloader",
        "nowcasting_dataset", "nowcasting_utils",
    ):
        # a reference-framework path with no alias: fail with a pointer
        # instead of a ModuleNotFoundError for a package that is
        # intentionally absent here
        raise ValueError(
            f"reference target {target!r} has no native equivalent in "
            "TARGET_ALIASES (config/instantiate.py); add a mapping or "
            "point _target_ at a predict_pv_yield_tpu class"
        )
    target = aliased or target
    module_name, _, attr = target.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(cfg: Dict[str, Any], **extra_kwargs: Any) -> Any:
    """Build the object a ``_target_`` config node describes."""
    if "_target_" not in cfg:
        raise ValueError(f"config node has no _target_: {cfg}")
    cls = locate(cfg["_target_"])
    kwargs = {
        key: value
        for key, value in cfg.items()
        if not key.startswith("_") and key not in _IGNORED_KWARGS
    }
    kwargs.update(extra_kwargs)
    try:
        return cls(**kwargs)
    except TypeError:
        # Reference configs may carry kwargs our native class doesn't take
        # (Lightning surface differences). Retry with only accepted names.
        import inspect

        signature = inspect.signature(cls)
        accepts_var_kw = any(
            p.kind == inspect.Parameter.VAR_KEYWORD
            for p in signature.parameters.values()
        )
        if accepts_var_kw:
            raise
        allowed = set(signature.parameters)
        dropped = sorted(set(kwargs) - allowed)
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "%s does not accept config keys %s; dropping them "
                "(check for typos)", cls.__name__, dropped,
            )
        return cls(**{k: v for k, v in kwargs.items() if k in allowed})
