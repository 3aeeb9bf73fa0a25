"""Experiment-script models (reference ``experiments/001`` and ``002``).

The reference keeps three standalone Lightning scripts beside the package
(SURVEY §2.5.1). Experiment 003 (Perceiver-per-frame + RNN) matured into the
package's perceiver model — covered by ``models/perceiver.py``; the other two
architectures are provided here as first-class zoo members:

* :class:`CNNConcatTimesteps` — experiment 001: all history timesteps stacked
  into the channel dimension of one 2-D CNN, with hand-built extra input
  channels (centre marker, normalised OSGB coordinate planes, pixel ramps),
  PV history + flattened NWP + datetime sin/cos features + ID embedding into
  an FC head (reference ``experiments/001...py:210-342``).
* :class:`CNNRNN` — experiment 002: a per-frame 2-D CNN encoder (timesteps
  folded into the batch) with the same extra channels, followed by the GRU
  encoder/decoder seq2seq (reference ``experiments/002...py:54-281``).

Both consume the standard :class:`Batch` (the experiments used the flat
zarr-streaming ``Example`` dict; the fields map 1:1 — sat coords via
``batch.satellite.x/y``, datetime features via ``batch.datetime``).
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.consts import (
    N_PV_SYSTEM_IDS,
    SAT_X_MEAN,
    SAT_X_STD,
    SAT_Y_MEAN,
    SAT_Y_STD,
)
from predict_pv_yield_tpu.data.batch import Batch, as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.layers import StackedGRU, embed_checked


def _extra_channels(batch: Batch, batch_size: int, height: int, width: int, dtype):
    """Centre marker, OSGB coordinate planes, pixel ramps — the five
    hand-built conv input channels (reference ``experiments/001...py:278-301``)."""
    centre = jnp.zeros((batch_size, height, width), dtype)
    half_h, half_w = height // 2, width // 2
    centre = centre.at[
        :, half_h - 2 : half_h + 2, half_w - 2 : half_w + 2
    ].set(1.0)

    if batch.satellite.x is not None:
        x_coords = (batch.satellite.x.astype(dtype) - SAT_X_MEAN) / SAT_X_STD
        x_plane = jnp.broadcast_to(x_coords[:, None, :], (batch_size, height, width))
    else:
        x_plane = jnp.zeros((batch_size, height, width), dtype)
    if batch.satellite.y is not None:
        y_coords = (batch.satellite.y.astype(dtype) - SAT_Y_MEAN) / SAT_Y_STD
        y_plane = jnp.broadcast_to(y_coords[:, :, None], (batch_size, height, width))
    else:
        y_plane = jnp.zeros((batch_size, height, width), dtype)

    # per-axis ramps: a width-length ramp along the height axis would crash
    # (or silently mislabel) any non-square crop
    pixel_range_w = (jnp.arange(width, dtype=dtype) - 64.0) / 37.0
    pixel_range_h = (jnp.arange(height, dtype=dtype) - 64.0) / 37.0
    pixel_x = jnp.broadcast_to(
        pixel_range_w[None, None, :], (batch_size, height, width)
    )
    pixel_y = jnp.broadcast_to(
        pixel_range_h[None, :, None], (batch_size, height, width)
    )

    return jnp.stack([centre, x_plane, y_plane, pixel_x, pixel_y], axis=-1)


def _datetime_features(batch: Batch, batch_size: int, seq_len: int, dtype):
    """(B, T, 4) sin/cos hour-of-day and day-of-year features; zeros when the
    dataset does not carry them."""
    fields = [
        batch.datetime.hour_of_day_sin,
        batch.datetime.hour_of_day_cos,
        batch.datetime.day_of_year_sin,
        batch.datetime.day_of_year_cos,
    ]
    columns = [
        f[:batch_size, :seq_len].astype(dtype)
        if f is not None
        else jnp.zeros((batch_size, seq_len), dtype)
        for f in fields
    ]
    return jnp.stack(columns, axis=-1)


class CNNConcatTimesteps(BaseModel):
    """Experiment 001: 2-D CNN over channel-stacked history frames."""

    model_name: ClassVar[str] = "cnn_concat_timesteps"

    history_minutes: int = 30
    forecast_minutes: int = 60
    output_variable: str = "pv_yield"
    channels: int = 144  # CHANNELS (001:215)
    embedding_dim: int = 16
    include_nwp: bool = True

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)
        dtype = self.dtype or jnp.float32

        # history frames only, timesteps → channels (001:266-275)
        sat = x.satellite.data.astype(dtype)  # (B, C, T, H, W)
        batch_size, n_chans, _, height, width = sat.shape
        sat = sat[:, :, : self.history_len_5 + 1]
        frames = jnp.transpose(sat, (0, 3, 4, 1, 2)).reshape(
            batch_size, height, width, -1
        )

        extra = _extra_channels(x, batch_size, height, width, dtype)
        out = jnp.concatenate([frames, extra], axis=-1)

        out = nn.relu(nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype, name="sat_conv1")(out))
        out = nn.max_pool(out, (3, 3), strides=(3, 3))
        out = nn.relu(nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype, name="sat_conv2")(out))
        out = nn.max_pool(out, (3, 3), strides=(3, 3))
        out = nn.relu(nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype, name="sat_conv3")(out))
        if 0 in out.shape[1:3]:
            raise ValueError(
                f"satellite images of {height}x{width} px collapse to zero "
                "through the 3x(conv3+pool3) stack — this architecture needs "
                "at least 35 px (reference experiment 001 used large crops)"
            )
        out = out.reshape(batch_size, -1)
        out = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc1")(out))

        # PV history of the target system (001:326)
        pv_history = jnp.nan_to_num(
            x.pv.pv_yield[:, : self.history_len_5 + 1, 0]
        ).astype(dtype)
        parts = [out, pv_history]

        if self.include_nwp and x.nwp.data is not None:
            parts.append(x.nwp.data.astype(dtype).reshape(batch_size, -1))

        seq_len = x.satellite.data.shape[2]
        datetime_features = _datetime_features(x, batch_size, seq_len, dtype)
        parts.append(datetime_features.reshape(batch_size, -1))

        if self.embedding_dim:
            ids = x.pv.pv_system_row_number[:batch_size, 0].astype(jnp.int32)
            parts.append(
                embed_checked(
                    nn.Embed(
                        N_PV_SYSTEM_IDS, self.embedding_dim,
                        name="pv_system_id_embedding",
                    ),
                    ids,
                ).astype(dtype)
            )

        out = jnp.concatenate(parts, axis=1)
        out = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2")(out))
        out = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc3")(out))
        out = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc4")(out))
        return nn.Dense(self.forecast_len, dtype=self.dtype, name="fc5")(out)


class CNNRNN(BaseModel):
    """Experiment 002: per-frame CNN encoder + GRU seq2seq."""

    model_name: ClassVar[str] = "cnn_rnn"

    history_minutes: int = 30
    forecast_minutes: int = 60
    output_variable: str = "pv_yield"
    channels: int = 128  # CHANNELS (002:96)
    last_conv_channels: int = 32
    fc_output_size: int = 8
    rnn_hidden_size: int = 16
    embedding_dim: int = 16
    include_nwp: bool = True

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)
        dtype = self.dtype or jnp.float32

        sat = x.satellite.data.astype(dtype)  # (B, C, T, H, W)
        batch_size, n_chans, seq_len, height, width = sat.shape

        # fold timesteps into the batch (002:171-174)
        frames = jnp.transpose(sat, (0, 2, 3, 4, 1)).reshape(
            batch_size * seq_len, height, width, n_chans
        )
        extra = _extra_channels(x, batch_size, height, width, dtype)
        extra = jnp.repeat(extra, seq_len, axis=0)
        out = jnp.concatenate([frames, extra], axis=-1)

        out = nn.relu(nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype, name="sat_conv1")(out))
        out = nn.relu(nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype, name="sat_conv2")(out))
        out = nn.relu(
            nn.Conv(self.last_conv_channels, (3, 3), padding="VALID", dtype=self.dtype, name="sat_conv3")(out)
        )
        out = out.reshape(batch_size * seq_len, -1)
        out = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc1")(out))

        if self.embedding_dim:
            ids = jnp.repeat(
                x.pv.pv_system_row_number[:batch_size, 0].astype(jnp.int32), seq_len
            )
            embedding = embed_checked(
                nn.Embed(
                    N_PV_SYSTEM_IDS, self.embedding_dim,
                    name="pv_system_id_embedding",
                ),
                ids,
            )
            out = jnp.concatenate([out, embedding.astype(dtype)], axis=1)

        out = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2")(out))
        out = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc3")(out))
        out = nn.relu(nn.Dense(32, dtype=self.dtype, name="fc4")(out))
        out = nn.relu(nn.Dense(self.fc_output_size, dtype=self.dtype, name="fc5")(out))
        out = out.reshape(batch_size, seq_len, self.fc_output_size)

        # per-step NWP (time-padded to the satellite grid) + datetime features
        parts = [out]
        if self.include_nwp and x.nwp.data is not None:
            nwp = jnp.transpose(x.nwp.data.astype(dtype), (0, 2, 1, 3, 4))
            nwp = nwp.reshape(batch_size, nwp.shape[1], -1)
            nwp = jnp.pad(nwp, [(0, 0), (0, seq_len - nwp.shape[1]), (0, 0)])
            parts.append(nwp)
        parts.append(_datetime_features(x, batch_size, seq_len, dtype))
        rnn_input = jnp.concatenate(parts, axis=2)

        pv_history = jnp.nan_to_num(
            x.pv.pv_yield[:, : self.history_len_5 + 1, 0]
        ).astype(dtype)[..., None]
        encoder_input = jnp.concatenate(
            [rnn_input[:, : self.history_len_5 + 1], pv_history], axis=2
        )

        _, encoder_hidden = StackedGRU(
            hidden_size=self.rnn_hidden_size, num_layers=2, dtype=self.dtype, name="encoder_rnn"
        )(encoder_input)
        decoder_output, _ = StackedGRU(
            hidden_size=self.rnn_hidden_size, num_layers=2, dtype=self.dtype, name="decoder_rnn"
        )(rnn_input[:, -self.forecast_len :], initial_carry=encoder_hidden)

        decoder_output = nn.relu(nn.Dense(8, dtype=self.dtype, name="decoder_fc1")(decoder_output))
        decoder_output = nn.Dense(1, dtype=self.dtype, name="decoder_fc2")(decoder_output)
        return decoder_output.squeeze(-1)
