"""Optical-flow residual forecasters — the notebook-lineage models in flax.

``FlowForecaster`` is the native equivalent of the reference's
``LitAutoEncoder`` (notebook 13 cell 39): 4 strided history frames + 1
flow-warped prediction stack into a depth-5 volume with a broadcast
forecast-horizon channel; four Conv3d layers with kernel (2,3,3) and padding
(0,1,1) collapse depth 5→1, the last layer striding (1,2,2) to map the
128 px context onto the 64 px target crop. Trained with MSE against the true
future frame (Adam lr=1e-4, cell 45).

The research lineage's architecture variants (SURVEY §2.5.2) are rebuilt
alongside it, each with the source notebook's exact topology and output-crop
quirk (exposed as ``crop_target`` so training code can align the label):

* ``Conv2dAEForecaster`` — notebook ``14_back_to_2d_conv_AE.ipynb`` cell 39:
  a stride-2 2-D conv encoder/decoder over the channel-stacked frames whose
  valid-padding pyramid emits 63×63 (the notebook trains against
  ``y[..., :-1, :-1]``).
* ``MaxPoolAEForecaster`` — notebook ``16_maxpool.ipynb`` cell 41: unstrided
  valid convs, ONE 3×3/3 max-pool bottleneck (the unpool stages are commented
  out in the notebook's final form), transposed-conv decoder emitting 48×48
  (trained against ``y[..., 8:-8, 8:-8]``).
* ``PureConv3dForecaster`` — notebook ``12_just_3d_conv.ipynb`` cell 53: the
  pre-flow control — history frames + horizon only (NO flow-warped
  prediction channel), five Conv3d layers at 128 channels.
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

    @staticmethod
    def crop_target(y: jnp.ndarray) -> jnp.ndarray:
        """The notebook-13 net emits the full 64 px target crop unchanged."""
        return y

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


def _stack_frames_channel_last(batch: dict, include_flow: bool) -> jnp.ndarray:
    """(B, H, W, C) stack of [history frames, optional flow-warped prediction,
    broadcast forecast-horizon plane] — the 2-D variants' input assembly
    (notebook 14 cell 39 / notebook 16 cell 41 ``forward``, channel-last)."""
    historical = batch[HISTORICAL_SAT_IMAGES].astype(jnp.float32)  # (B, 4, H, W)
    horizon = batch[FORECAST_HORIZON].astype(jnp.float32)  # (B,)
    planes = [historical]
    if include_flow:
        flow_pred = batch[OPTICAL_FLOW_PREDICTIONS].astype(jnp.float32)
        planes.append(flow_pred[:, None])
    frames = jnp.concatenate(planes, axis=1)  # (B, C-1, H, W)
    batch_size, _, height, width = frames.shape
    horizon_plane = jnp.broadcast_to(
        horizon[:, None, None, None], (batch_size, 1, height, width)
    )
    frames = jnp.concatenate([frames, horizon_plane], axis=1)
    return jnp.moveaxis(frames, 1, -1)


class Conv2dAEForecaster(nn.Module):
    """Notebook-14 2-D conv autoencoder variant (cell 39).

    Channel-stacked input (4 history + flow prediction + horizon = 6
    channels); encoder of four stride-2 valid 3×3 convs (128→63→31→15→7 px),
    decoder of three stride-2 valid transposed convs (7→15→31→63 px). The
    63×63 output is compared against ``crop_target`` of the 64 px label —
    the notebook's ``y[..., :-1, :-1]`` stride artefact.
    """

    channels: int = 32  # CHANNELS (notebook 14 cell 39)
    dtype: Optional[Any] = None

    @staticmethod
    def crop_target(y: jnp.ndarray) -> jnp.ndarray:
        return y[..., :-1, :-1]

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        x = _stack_frames_channel_last(batch, include_flow=True)
        for i, features in enumerate(
            [self.channels // 2, self.channels, self.channels, self.channels]
        ):
            x = nn.relu(
                nn.Conv(
                    features, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"enc{i}",
                )(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.channels, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="dec0",
            )(x)
        )
        x = nn.relu(
            nn.ConvTranspose(
                self.channels // 2, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="dec1",
            )(x)
        )
        x = nn.ConvTranspose(
            1, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="dec2",
        )(x)
        return x[..., 0]


class MaxPoolAEForecaster(nn.Module):
    """Notebook-16 max-pool autoencoder variant (cell 41).

    Four unstrided valid 3×3 convs (128→120 px), one 3×3/3 max-pool
    bottleneck (→40 px; the notebook's earlier pool/unpool stages are
    commented out in its final form so only this one survives), then four
    valid transposed convs (→48 px). Output matches ``crop_target`` —
    the notebook's ``y[..., 8:-8, 8:-8]``. The notebook normalises frames
    and target *inside* the model (``normalise_images_in_model``, cell 40)
    because its loader ships raw counts; here the flow dataset already
    normalises by SAT_IMAGE_MEAN/STD, so no in-model scaling.
    """

    channels: int = 32  # CHANNELS (notebook 16 cell 41)
    dtype: Optional[Any] = None

    @staticmethod
    def crop_target(y: jnp.ndarray) -> jnp.ndarray:
        return y[..., 8:-8, 8:-8]

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        x = _stack_frames_channel_last(batch, include_flow=True)
        for i, features in enumerate(
            [self.channels // 2, self.channels, self.channels, self.channels]
        ):
            x = nn.relu(
                nn.Conv(
                    features, (3, 3), padding="VALID",
                    dtype=self.dtype, name=f"enc{i}",
                )(x)
            )
        x = nn.max_pool(x, window_shape=(3, 3), strides=(3, 3))
        decoder_features = [
            self.channels, self.channels // 2, self.channels // 2,
        ]
        for i, features in enumerate(decoder_features):
            x = nn.relu(
                nn.ConvTranspose(
                    features, (3, 3), padding="VALID",
                    dtype=self.dtype, name=f"dec{i}",
                )(x)
            )
        x = nn.ConvTranspose(
            1, (3, 3), padding="VALID", dtype=self.dtype, name="dec3",
        )(x)
        return x[..., 0]


class PureConv3dForecaster(nn.Module):
    """Notebook-12 pure-3D-conv variant (cell 53) — the pre-flow control.

    History frames only (no flow-warped prediction channel) stacked as a
    depth-4 volume with a broadcast horizon channel (in_channels=2); five
    Conv3d layers with kernel (2,3,3) collapse depth 4→1 (the third layer
    pads depth to keep the count), the last striding (1,2,2) to emit the
    64 px target resolution at 128 px context.
    """

    channels: int = 128  # CHANNELS (notebook 12 cell 53)
    dtype: Optional[Any] = None

    @staticmethod
    def crop_target(y: jnp.ndarray) -> jnp.ndarray:
        return y

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        historical = batch[HISTORICAL_SAT_IMAGES].astype(jnp.float32)  # (B, 4, H, W)
        horizon = batch[FORECAST_HORIZON].astype(jnp.float32)  # (B,)
        batch_size, depth, height, width = historical.shape
        horizon_plane = jnp.broadcast_to(
            horizon[:, None, None, None], (batch_size, depth, height, width)
        )
        # channel-last volume (B, D=4, H, W, C=2): frames + horizon
        x = jnp.stack([historical, horizon_plane], axis=-1)

        kernel = (2, 3, 3)
        pad_same_hw = [(0, 0), (1, 1), (1, 1)]
        pad_depth_too = [(1, 1), (1, 1), (1, 1)]
        x = nn.relu(
            nn.Conv(self.channels // 2, kernel, padding=pad_same_hw,
                    dtype=self.dtype, name="conv0")(x)
        )
        x = nn.relu(
            nn.Conv(self.channels, kernel, padding=pad_same_hw,
                    dtype=self.dtype, name="conv1")(x)
        )
        x = nn.relu(
            nn.Conv(self.channels, kernel, padding=pad_depth_too,
                    dtype=self.dtype, name="conv2")(x)
        )
        x = nn.relu(
            nn.Conv(self.channels, kernel, padding=pad_same_hw,
                    dtype=self.dtype, name="conv3")(x)
        )
        x = nn.Conv(
            1, kernel, strides=(1, 2, 2), padding=pad_same_hw,
            dtype=self.dtype, name="conv4",
        )(x)
        # depth has collapsed 4→1
        return x[:, 0, :, :, 0]


#: notebook → forecaster class, for CLI/‌config selection.
FORECASTER_ARCHITECTURES = {
    "conv3d": FlowForecaster,            # notebook 13 (production)
    "conv2d_ae": Conv2dAEForecaster,     # notebook 14
    "maxpool_ae": MaxPoolAEForecaster,   # notebook 16
    "pure_conv3d": PureConv3dForecaster, # notebook 12
}
