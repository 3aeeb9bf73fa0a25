"""conv3d_nwp — NWP-only 3-D conv tower + FC head.

Native equivalent of reference ``models/conv3d/model_nwp.py:14-153``. The
reference registers unused pv/embedding layers (``model_nwp.py:111-120``) that
never see data; we keep the hyperparameters for config compatibility but do
not allocate dead parameters.
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.layers import Conv3dTower, to_channel_last


class Model(BaseModel):
    model_name: ClassVar[str] = "conv3d_nwp"

    include_pv_or_gsp_yield_history: bool = True
    include_nwp: bool = True
    forecast_minutes: int = 30
    history_minutes: int = 60
    number_of_conv3d_layers: int = 4
    conv3d_channels: int = 32
    nwp_image_size_pixels: int = 64
    number_nwp_channels: int = 10
    fc1_output_features: int = 128
    fc2_output_features: int = 128
    fc3_output_features: int = 64
    output_variable: str = "gsp_yield"
    embedding_dem: int = 16
    include_pv_yield_history: bool = True
    include_future_satellite: bool = True

    @property
    def nwp_cnn_output_size(self) -> int:
        size = self.nwp_image_size_pixels - 2 * self.number_of_conv3d_layers
        return self.conv3d_channels * size * size * self.seq_lens.seq_len_60

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)

        nwp_data = to_channel_last(x.nwp.data.astype(jnp.float32))
        batch_size = nwp_data.shape[0]

        out = Conv3dTower(
            channels=self.conv3d_channels,
            num_layers=self.number_of_conv3d_layers,
            pad_time=True,
            dtype=self.dtype,
            name="nwp_tower",
        )(nwp_data)
        out = out.reshape(batch_size, self.nwp_cnn_output_size)
        out = nn.relu(nn.Dense(self.fc1_output_features, dtype=self.dtype, name="nwp_fc1")(out))
        out = nn.relu(nn.Dense(128, dtype=self.dtype, name="nwp_fc2")(out))

        out = nn.relu(nn.Dense(self.fc3_output_features, dtype=self.dtype, name="fc3")(out))
        out = nn.Dense(self.forecast_len, dtype=self.dtype, name="fc4")(out)
        return out.reshape(batch_size, self.forecast_len)
