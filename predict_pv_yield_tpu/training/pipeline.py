"""The training pipeline: config → objects → fit/validate → metric.

Native equivalent of reference ``predict_pv_yield/training.py:22-107``. The
flow is identical — seed, instantiate datamodule/model/callbacks/loggers/
trainer from the composed config, log hyperparameters, fit (or validate when
a ``validate_only`` key is present), optional test pass, finish, return the
``optimized_metric`` for hyperparameter sweeps.
"""

from __future__ import annotations

import logging
import random
from typing import Any, Dict, Optional

import numpy as np

from predict_pv_yield_tpu import utils
from predict_pv_yield_tpu.config.instantiate import instantiate

log = logging.getLogger(__name__)


def seed_everything(seed: int) -> None:
    """Seed python/numpy; JAX keys are derived explicitly from the trainer's
    seed (functional PRNG — nothing global to seed)."""
    random.seed(seed)
    np.random.seed(seed)


def train(config: Dict[str, Any]) -> Optional[float]:
    """Run the full training (or validation-only) pipeline.

    Args:
        config: composed run config (see ``config/composer.py``).

    Returns:
        The value of ``config.optimized_metric`` if set (consumed by the
        hyperparameter sweeper), else None.
    """
    seed = config.get("seed")
    if seed is not None:
        seed_everything(seed)

    log.info("Instantiating datamodule <%s>", config["datamodule"]["_target_"])
    datamodule = instantiate(config["datamodule"])

    log.info("Instantiating model <%s>", config["model"]["_target_"])
    model = instantiate(config["model"])

    callbacks = []
    for _, cb_conf in (config.get("callbacks") or {}).items():
        if isinstance(cb_conf, dict) and "_target_" in cb_conf:
            log.info("Instantiating callback <%s>", cb_conf["_target_"])
            callbacks.append(instantiate(cb_conf))

    loggers = []
    for _, lg_conf in (config.get("logger") or {}).items():
        if isinstance(lg_conf, dict) and "_target_" in lg_conf:
            log.info("Instantiating logger <%s>", lg_conf["_target_"])
            loggers.append(instantiate(lg_conf))

    log.info("Instantiating trainer <%s>", config["trainer"]["_target_"])
    trainer = instantiate(
        config["trainer"], callbacks=callbacks, logger=loggers
    )
    if seed is not None:
        trainer.seed = seed

    log.info("Logging hyperparameters!")
    utils.log_hyperparameters(
        config=config,
        model=model,
        datamodule=datamodule,
        trainer=trainer,
        callbacks=callbacks,
        logger=loggers,
    )

    log.info("Starting training!")
    # reference semantics are KEY PRESENCE (`if 'validate_only' in config:`,
    # training.py:80-81) — any value, even a falsy one, skips training; warn
    # when the value looks like an attempt to opt back in
    validate_only = "validate_only" in config
    if validate_only and str(config.get("validate_only")).strip().lower() in (
        "0", "false", "none", ""
    ):
        log.warning(
            "validate_only is PRESENCE-based (reference training.py:80-81): "
            "remove the key (~validate_only) to train; its falsy value does "
            "not re-enable fitting"
        )
    if validate_only:
        trainer.validate(model=model, datamodule=datamodule)
    else:
        trainer.fit(model=model, datamodule=datamodule)

    if config.get("test_after_training") and not config.get("trainer", {}).get(
        "fast_dev_run"
    ):
        # Test with the best checkpoint, like Lightning's trainer.test()
        # (reference training.py:86-88 + callbacks config "save best").
        ckpt = trainer.checkpoint_callback
        if ckpt is not None and ckpt.best_model_path and trainer.state is not None:
            from predict_pv_yield_tpu.training.callbacks import load_state

            log.info("Testing with best checkpoint %s", ckpt.best_model_path)
            trainer.state = load_state(ckpt.best_model_path, trainer.state)
        log.info("Starting testing!")
        trainer.test()

    log.info("Finalizing!")
    utils.finish(config=config, trainer=trainer, logger=loggers)

    if trainer.checkpoint_callback is not None:
        log.info("Best checkpoint path:\n%s", trainer.checkpoint_callback.best_model_path)

    optimized_metric = config.get("optimized_metric")
    if optimized_metric:
        return trainer.callback_metrics.get(optimized_metric)
    return None
