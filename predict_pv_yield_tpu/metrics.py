"""Per-forecast-horizon metrics.

Native equivalent of the external ``nowcasting_utils.models.metrics`` functions
consumed at reference ``base_model.py:123-124``: each returns a vector with one
value per forecast horizon (mean over the batch dimension).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_each_forecast_horizon(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(forecast_len,) mean squared error per horizon."""
    return jnp.mean((output - target) ** 2, axis=0)


def mae_each_forecast_horizon(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(forecast_len,) mean absolute error per horizon."""
    return jnp.mean(jnp.abs(output - target), axis=0)
