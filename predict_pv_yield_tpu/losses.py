"""Loss functions.

Native equivalent of the external ``nowcasting_utils.models.loss.WeightedLosses``
consumed at reference ``base_model.py:76,102-103``.

Semantics reconstructed from the reference's published metric values
(``experiments/2021-11/2021-11-25.txt:7-17``): for the GSP baseline,
``MAE_EXP / NMAE = 1.8553 / 0.05798 = 32.0`` and
``MSE_EXP / MSE = 0.2092 / 0.006537 = 32.0`` with batch size 32 — i.e. the
exp-weighted losses are *summed* over the batch (not averaged) with per-horizon
weights normalised to sum to 1. We replicate that exactly so logged values are
comparable with the reference's lab notes.

Everything is pure jnp — these run inside the jitted train/eval step and fuse
into the surrounding XLA program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class WeightedLosses:
    """Exponentially-decaying per-forecast-horizon loss weights.

    ``weights[i] ∝ exp(-decay_rate * i)``, normalised to sum to 1 over the
    forecast horizon; the weighted losses sum over both batch and horizon.
    """

    def __init__(self, decay_rate: float | None = None, forecast_length: int = 6):
        if decay_rate is None:
            decay_rate = 0.5
        self.decay_rate = decay_rate
        self.forecast_length = forecast_length
        weights = np.exp(-decay_rate * np.arange(forecast_length, dtype=np.float32))
        self.weights = jnp.asarray(weights / weights.sum())

    def get_mse_exp(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Batch-summed, horizon-weighted squared error."""
        return jnp.sum(self.weights * (output - target) ** 2)

    def get_mae_exp(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Batch-summed, horizon-weighted absolute error."""
        return jnp.sum(self.weights * jnp.abs(output - target))


def mse_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain mean squared error (reference ``base_model.py:98``)."""
    return jnp.mean((output - target) ** 2)


def nmae_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The reference's "NMAE": plain mean absolute error of [0,1]-normalised
    yield (reference ``base_model.py:99``). This is also the training loss —
    the reference's ``training_step`` returns it (``base_model.py:148-153``)."""
    return jnp.mean(jnp.abs(output - target))
