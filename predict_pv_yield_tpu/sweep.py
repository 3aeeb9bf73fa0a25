"""Hyperparameter sweeps.

Native equivalent of the reference's Optuna sweeper plugin
(``configs/hparams_search/conv3d_optuna.yaml``, SURVEY §3.5): each trial
composes the run config with trial overrides, runs the full training
pipeline, and the sweeper optimises ``optimized_metric``.

Optuna (TPE) is used when importable; otherwise a first-party sampler covers
the same config surface: exhaustive enumeration when the categorical product
is within ``n_trials``, else seeded random search. Either way the sweep is a
plain Python loop — each trial is its own XLA program, compiled and discarded.
"""

from __future__ import annotations

import itertools
import logging
import random
from typing import Any, Dict, List, Optional, Tuple

log = logging.getLogger(__name__)


def _space_choices(search_space: Dict[str, Any]) -> List[Tuple[str, List[Any]]]:
    choices = []
    for key, spec in search_space.items():
        if spec.get("type") == "categorical":
            choices.append((key, list(spec["choices"])))
        elif spec.get("type") in ("int", "float"):
            low, high = spec["low"], spec["high"]
            steps = spec.get("steps", 8)
            if spec["type"] == "int":
                values = sorted({int(round(low + i * (high - low) / (steps - 1))) for i in range(steps)})
            else:
                values = [low + i * (high - low) / (steps - 1) for i in range(steps)]
            choices.append((key, values))
        else:
            raise ValueError(f"unsupported search-space spec for {key}: {spec}")
    return choices


def run_sweep(compose_fn, base_overrides: List[str], config: Dict[str, Any]):
    """Run the sweep described by ``config['sweep']`` and return
    (best_value, best_overrides, all_trials)."""
    from predict_pv_yield_tpu.training.pipeline import train

    sweep_cfg = config.get("sweep") or {}
    metric = config.get("optimized_metric", "MSE/Validation_epoch")
    direction = sweep_cfg.get("direction", "minimize")
    n_trials = int(sweep_cfg.get("n_trials", 20))
    seed = int(sweep_cfg.get("seed", 0))
    search_space = sweep_cfg.get("search_space", {})
    choices = _space_choices(search_space)

    def evaluate(assignment: Dict[str, Any]) -> Optional[float]:
        trial_overrides = base_overrides + [
            f"{key}={value}" for key, value in assignment.items()
        ]
        trial_config = compose_fn(overrides=trial_overrides)
        trial_config["optimized_metric"] = metric
        value = train(trial_config)
        log.info("trial %s -> %s=%s", assignment, metric, value)
        return None if value is None else float(value)

    trials: List[Tuple[Dict[str, Any], Optional[float]]] = []

    try:
        import optuna
    except ImportError:
        optuna = None

    if optuna is not None:
        # ImportError from inside a trial must surface, not silently switch
        # samplers — hence the import is resolved before any trial runs.
        def objective(trial):
            assignment = {
                key: trial.suggest_categorical(key, values) for key, values in choices
            }
            value = evaluate(assignment)
            trials.append((assignment, value))
            if value is None:  # failed trial must never win
                return float("inf") if direction == "minimize" else float("-inf")
            return value

        sampler = optuna.samplers.TPESampler(seed=seed)
        study = optuna.create_study(direction=direction, sampler=sampler)
        study.optimize(objective, n_trials=n_trials)
        best = study.best_params, study.best_value
    else:
        # First-party sampler: exhaustive if small, else seeded random.
        rng = random.Random(seed)
        combos = list(itertools.product(*(values for _, values in choices)))
        if len(combos) > n_trials:
            combos = rng.sample(combos, n_trials)
        for combo in combos:
            assignment = {key: value for (key, _), value in zip(choices, combo)}
            trials.append((assignment, evaluate(assignment)))
        scored = [(a, v) for a, v in trials if v is not None]
        if not scored:
            return None, None, trials
        best = min(scored, key=lambda av: av[1] if direction == "minimize" else -av[1])

    log.info("sweep best: %s", best)
    return best[1], best[0], trials
