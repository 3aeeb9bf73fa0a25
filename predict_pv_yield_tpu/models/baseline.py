"""Persistence baseline: repeat the last observed yield value.

Native equivalent of reference ``models/baseline/last_value.py:12-45``.
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel


class Model(BaseModel):
    """Take the last non-forecast yield value and copy it forward
    ``forecast_len`` times (reference ``last_value.py:39-44``)."""

    model_name: ClassVar[str] = "last_value"

    forecast_minutes: int = 12
    history_minutes: int = 6
    output_variable: str = "pv_yield"

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)
        if self.output_variable == "gsp_yield":
            yield_data = x.gsp.gsp_yield
        else:
            yield_data = x.pv.pv_yield
        # Last value before the forecast window, centre system (index 0).
        y_hat = yield_data[:, -self.forecast_len - 1, 0]
        return jnp.repeat(y_hat[:, None], self.forecast_len, axis=1)
