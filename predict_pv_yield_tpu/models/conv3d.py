"""conv3d — 3-D CNN over satellite video + PV/GSP history + flattened NWP.

Native equivalent of reference ``models/conv3d/model.py:14-156``: N valid
3×3×3 convolutions over the satellite sequence, flatten → fc1/fc2, concat
NaN-cleaned yield history and an NWP branch, fc3/fc4 → forecast vector.

TPU notes:
* channel-last layout inside the tower (see ``models/layers.py``);
* the reference hardcodes its NWP feature count to a dataset version
  (``10 * 19 * 2 * 2``, reference ``model.py:60,72``) — here the Dense layer
  infers it from the data, removing the hardcode while keeping behaviour;
* the flatten order differs from torch's channel-first flatten; the
  torch-checkpoint converter permutes fc1's input weights to compensate.
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.layers import Conv3dTower, to_channel_last


class Model(BaseModel):
    model_name: ClassVar[str] = "conv3d"

    include_pv_yield: bool = True
    include_nwp: bool = True
    forecast_minutes: int = 30
    history_minutes: int = 60
    number_of_conv3d_layers: int = 4
    conv3d_channels: int = 32
    image_size_pixels: int = 64
    number_sat_channels: int = 12
    fc1_output_features: int = 128
    fc2_output_features: int = 128
    fc3_output_features: int = 64
    output_variable: str = "pv_yield"

    @property
    def cnn_output_size(self) -> int:
        """Flattened conv-tower size (reference ``model.py:74-78``)."""
        size = self.image_size_pixels - 2 * self.number_of_conv3d_layers
        time = self.seq_lens.seq_len_5 - 2 * self.number_of_conv3d_layers
        return self.conv3d_channels * size * size * time

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)

        # Satellite video: (B, C, T5, H, W) -> channel-last tower.
        sat_data = to_channel_last(x.satellite.data.astype(jnp.float32))
        batch_size = sat_data.shape[0]

        out = Conv3dTower(
            channels=self.conv3d_channels,
            num_layers=self.number_of_conv3d_layers,
            pad_time=False,
            dtype=self.dtype,
            name="sat_tower",
        )(sat_data)
        out = out.reshape(batch_size, self.cnn_output_size)

        out = nn.relu(nn.Dense(self.fc1_output_features, dtype=self.dtype, name="fc1")(out))
        out = nn.relu(nn.Dense(self.fc2_output_features, dtype=self.dtype, name="fc2")(out))

        # Yield history: first history_len_30 + 1 steps, NaN -> 0
        # (reference model.py:131-136, incl. the quirk of slicing the 5-minute
        # pv series with the 30-minute history length).
        if self.include_pv_yield:
            history = x[self.output_variable][:, : self.history_len_30 + 1]
            history = jnp.nan_to_num(history, nan=0.0).astype(jnp.float32)
            out = jnp.concatenate([out, history.reshape(batch_size, -1)], axis=1)

        # NWP: flatten everything through one dense layer (reference
        # model.py:139-148).
        if self.include_nwp:
            nwp = x["nwp"].astype(jnp.float32).reshape(batch_size, -1)
            out_nwp = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc_nwp")(nwp))
            out = jnp.concatenate([out, out_nwp], axis=1)

        out = nn.relu(nn.Dense(self.fc3_output_features, dtype=self.dtype, name="fc3")(out))
        out = nn.Dense(self.forecast_len, dtype=self.dtype, name="fc4")(out)
        return out.reshape(batch_size, self.forecast_len)
