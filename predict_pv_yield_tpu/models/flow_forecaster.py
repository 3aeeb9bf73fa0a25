"""Optical-flow residual forecaster — notebook 13's Conv3d model in flax.

Native equivalent of the reference's ``LitAutoEncoder`` (notebook 13 cell 39):
4 strided history frames + 1 flow-warped prediction stack into a depth-5
volume with a broadcast forecast-horizon channel; four Conv3d layers with
kernel (2,3,3) and padding (0,1,1) collapse depth 5→1, the last layer
striding (1,2,2) to map the 128 px context onto the 64 px target crop.
Trained with MSE against the true future frame (Adam lr=1e-4, cell 45).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

#: Example/batch field names (notebook 13 cell 17 constants).
TARGET_SAT_IMAGE = "target_sat_image"
FORECAST_HORIZON = "forecast_horizon"
HISTORICAL_SAT_IMAGES = "historical_sat_images"
OPTICAL_FLOW_PREDICTIONS = "optical_flow_predictions"


class FlowForecaster(nn.Module):
    """(history, flow prediction, horizon) → corrected future frame."""

    channels: int = 32  # CHANNELS (cell 39)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        historical = batch[HISTORICAL_SAT_IMAGES].astype(jnp.float32)  # (B, 4, H, W)
        flow_pred = batch[OPTICAL_FLOW_PREDICTIONS].astype(jnp.float32)  # (B, H, W)
        horizon = batch[FORECAST_HORIZON].astype(jnp.float32)  # (B,)

        frames = jnp.concatenate([historical, flow_pred[:, None]], axis=1)  # (B, 5, H, W)
        batch_size, depth, height, width = frames.shape

        horizon_plane = jnp.broadcast_to(
            horizon[:, None, None, None], (batch_size, depth, height, width)
        )
        # channel-last volume: (B, D, H, W, C=2) — frame values + horizon
        x = jnp.stack([frames, horizon_plane], axis=-1)

        kernel = (2, 3, 3)
        padding = [(0, 0), (1, 1), (1, 1)]
        x = nn.relu(
            nn.Conv(self.channels // 2, kernel, padding=padding, dtype=self.dtype, name="conv0")(x)
        )
        x = nn.relu(
            nn.Conv(self.channels, kernel, padding=padding, dtype=self.dtype, name="conv1")(x)
        )
        x = nn.relu(
            nn.Conv(self.channels, kernel, padding=padding, dtype=self.dtype, name="conv2")(x)
        )
        x = nn.Conv(
            1,
            kernel,
            strides=(1, 2, 2),
            padding=padding,
            dtype=self.dtype,
            name="conv3",
        )(x)
        # depth has collapsed 5→1; drop depth and channel dims
        return x[:, 0, :, :, 0]
