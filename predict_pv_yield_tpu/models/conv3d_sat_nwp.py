"""conv3d_sat_nwp — the flagship: parallel sat + NWP conv towers, yield
history branches, system-ID embedding, fused FC head.

Native equivalent of reference ``models/conv3d/model_sat_nwp.py:14-268``:

* satellite tower at 5-minute cadence, NWP tower at 60-minute cadence, both
  3×3×3 convs with time-preserving padding ``(1, 0, 0)``;
* ``include_future_satellite=False`` drops future frames before the tower
  (reference ``:85-88,184-185``);
* 30-minute GSP/PV yield-history branch (``:201-215``), optional 5-minute
  PV-history branch through a dense layer (``:218-229``);
* 940-entry system-ID embedding (``:148-151,250-260``);
* fc3/fc4 head (``:262-266``).
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.consts import N_PV_SYSTEM_IDS
from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.layers import (
    Conv3dTower,
    embed_checked,
    to_channel_last,
)


class Model(BaseModel):
    model_name: ClassVar[str] = "conv3d_sat_nwp"

    include_pv_or_gsp_yield_history: bool = True
    include_nwp: bool = True
    forecast_minutes: int = 30
    history_minutes: int = 60
    number_of_conv3d_layers: int = 4
    conv3d_channels: int = 32
    image_size_pixels: int = 64
    nwp_image_size_pixels: int = 64
    number_sat_channels: int = 12
    number_nwp_channels: int = 10
    fc1_output_features: int = 128
    fc2_output_features: int = 128
    fc3_output_features: int = 64
    output_variable: str = "pv_yield"
    embedding_dem: int = 16
    include_pv_yield_history: bool = True
    include_future_satellite: bool = True

    @property
    def cnn_output_size(self) -> int:
        """Sat-tower flattened size; time is preserved by the (1,0,0) padding
        (reference ``model_sat_nwp.py:85-93``)."""
        if self.include_future_satellite:
            time = self.seq_lens.seq_len_5
        else:
            time = self.history_len_5 + 1
        size = self.image_size_pixels - 2 * self.number_of_conv3d_layers
        return self.conv3d_channels * size * size * time

    @property
    def nwp_cnn_output_size(self) -> int:
        size = self.nwp_image_size_pixels - 2 * self.number_of_conv3d_layers
        return self.conv3d_channels * size * size * self.seq_lens.seq_len_60

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)

        sat_data = to_channel_last(x.satellite.data.astype(jnp.float32))
        batch_size = sat_data.shape[0]

        if not self.include_future_satellite:
            sat_data = sat_data[:, : self.history_len_5 + 1]

        out = Conv3dTower(
            channels=self.conv3d_channels,
            num_layers=self.number_of_conv3d_layers,
            pad_time=True,
            dtype=self.dtype,
            name="sat_tower",
        )(sat_data)
        out = out.reshape(batch_size, self.cnn_output_size)
        out = nn.relu(nn.Dense(self.fc1_output_features, dtype=self.dtype, name="fc1")(out))
        out = nn.relu(nn.Dense(self.fc2_output_features, dtype=self.dtype, name="fc2")(out))

        # 30-minute yield history of the target variable (reference :201-215).
        if self.include_pv_or_gsp_yield_history:
            if self.output_variable == "gsp_yield":
                history = x.gsp.gsp_yield[:, : self.history_len_30 + 1]
            else:
                history = x.pv.pv_yield[:, : self.history_len_30 + 1]
            history = jnp.nan_to_num(history, nan=0.0).astype(jnp.float32)
            out = jnp.concatenate([out, history.reshape(batch_size, -1)], axis=1)

        # 5-minute PV history branch, first 128 systems (reference :218-229).
        if self.include_pv_yield_history:
            pv_history = x.pv.pv_yield[:, : self.history_len_5 + 1, :128]
            pv_history = jnp.nan_to_num(pv_history, nan=0.0).astype(jnp.float32)
            pv_history = pv_history.reshape(batch_size, -1)
            pv_history = nn.relu(nn.Dense(128, dtype=self.dtype, name="pv_fc1")(pv_history))
            out = jnp.concatenate([out, pv_history], axis=1)

        # NWP tower (reference :232-248).
        if self.include_nwp:
            nwp_data = to_channel_last(x.nwp.data.astype(jnp.float32))
            out_nwp = Conv3dTower(
                channels=self.conv3d_channels,
                num_layers=self.number_of_conv3d_layers,
                pad_time=True,
                dtype=self.dtype,
                name="nwp_tower",
            )(nwp_data)
            out_nwp = out_nwp.reshape(batch_size, self.nwp_cnn_output_size)
            out_nwp = nn.relu(nn.Dense(self.fc1_output_features, dtype=self.dtype, name="nwp_fc1")(out_nwp))
            out_nwp = nn.relu(nn.Dense(128, dtype=self.dtype, name="nwp_fc2")(out_nwp))
            out = jnp.concatenate([out, out_nwp], axis=1)

        # System-ID embedding (reference :250-260).
        if self.embedding_dem:
            if self.output_variable == "pv_yield":
                ids = x.pv.pv_system_row_number[0 : self.batch_size, 0]
            else:
                ids = x.gsp.gsp_id[0 : self.batch_size, 0]
            embedding = embed_checked(
                nn.Embed(
                    num_embeddings=N_PV_SYSTEM_IDS,
                    features=self.embedding_dem,
                    name="pv_system_id_embedding",
                ),
                ids,
            )
            out = jnp.concatenate([out, embedding], axis=1)

        out = nn.relu(nn.Dense(self.fc3_output_features, dtype=self.dtype, name="fc3")(out))
        out = nn.Dense(self.forecast_len, dtype=self.dtype, name="fc4")(out)
        return out.reshape(batch_size, self.forecast_len)
