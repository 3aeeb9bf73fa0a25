"""perceiver_conv3d_nwp_sat — Conv3d+MaxPool stems before the Perceiver.

Native equivalent of reference
``models/perceiver/perceiver_conv3d_nwp_sat.py:60-235``: a ``Conv3dMaxPool``
stem (k3 SAME conv + max-pool stride (1,2,2), halving H/W) on both satellite
and NWP streams, concatenated as channels into the weight-tied Perceiver;
``use_future_satellite_images=False`` zeroes the future frames (``:148-149``).
"""

from __future__ import annotations

from typing import ClassVar, Sequence

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.layers import Conv3dMaxPool
from predict_pv_yield_tpu.models.perceiver import (
    FC_OUTPUT_SIZE,
    PERCEIVER_OUTPUT_SIZE,
    fc_head_with_embedding,
    params,
    rnn_seq2seq,
)
from predict_pv_yield_tpu.models.perceiver_core import Perceiver


class Model(BaseModel):
    model_name: ClassVar[str] = "perceiver_conv3d_nwp_sat"

    history_minutes: int = params["history_minutes"]
    forecast_minutes: int = params["forecast_minutes"]
    nwp_channels: Sequence[str] = params["nwp_channels"]
    batch_size: int = 32
    num_latents: int = 128
    latent_dim: int = 64
    embedding_dem: int = 16
    #: shard attention/FF weights over the mesh 'model' axis (TP)
    partition_attention: bool = False
    #: unroll the tied depth loop (see perceiver_core.Perceiver.depth_unroll)
    depth_unroll: bool = False
    output_variable: str = "pv_yield"
    conv3d_channels: int = 16
    use_future_satellite_images: bool = True

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)

        sat_data = x.satellite.data[0 : self.batch_size].astype(jnp.float32)
        batch_size = sat_data.shape[0]

        if not self.use_future_satellite_images:
            # zero (not drop) future frames, keeping the sequence length
            # (reference :148-149).
            seq = sat_data.shape[2]
            mask = (jnp.arange(seq) < seq - self.forecast_len_5).astype(sat_data.dtype)
            sat_data = sat_data * mask[None, None, :, None, None]

        # stems run channel-last (B, T, H, W, C)
        sat_data = jnp.transpose(sat_data, (0, 2, 3, 4, 1))
        sat_data = Conv3dMaxPool(
            out_channels=self.conv3d_channels, dtype=self.dtype, name="sat_conv3d_maxpool"
        )(sat_data)
        seq_len, width, height, n_chans = sat_data.shape[1:]
        new_batch_size = batch_size * seq_len
        sat_data = sat_data.reshape(new_batch_size, width, height, n_chans)

        nwp_data = x.nwp.data[0 : self.batch_size].astype(jnp.float32)
        nwp_data = jnp.transpose(nwp_data, (0, 2, 3, 4, 1))
        nwp_data = Conv3dMaxPool(
            out_channels=self.conv3d_channels, dtype=self.dtype, name="nwp_conv3d_maxpool"
        )(nwp_data)
        nwp_seq_len, nwp_width, nwp_height, n_nwp_chans = nwp_data.shape[1:]
        nwp_data = jnp.pad(
            nwp_data, [(0, 0), (0, seq_len - nwp_seq_len), (0, 0), (0, 0), (0, 0)]
        )
        nwp_data = nwp_data.reshape(new_batch_size, nwp_width, nwp_height, n_nwp_chans)

        assert nwp_width == width, f"widths should be the same ({nwp_width},{width})"
        assert nwp_height == height, f"heights should be the same ({nwp_height},{height})"

        data = jnp.concatenate([sat_data, nwp_data.astype(sat_data.dtype)], axis=-1)

        out = Perceiver(
            input_channels=2 * self.conv3d_channels,
            input_axis=2,
            num_freq_bands=6,
            max_freq=10.0,
            depth=self.total_seq_length,
            num_latents=self.num_latents,
            latent_dim=self.latent_dim,
            num_classes=PERCEIVER_OUTPUT_SIZE,
            weight_tie_layers=True,
            partition_attention=self.partition_attention,
            depth_unroll=self.depth_unroll,
            dtype=self.dtype,
            name="perceiver",
        )(data)

        out = out.reshape(new_batch_size, PERCEIVER_OUTPUT_SIZE)

        # Reference quirk kept: always pv_system_row_number, no gsp_id
        # branch (reference perceiver_conv3d_nwp_sat.py:189).
        ids = (
            x.pv.pv_system_row_number[0 : self.batch_size, 0]
            if self.embedding_dem
            else None
        )
        out = fc_head_with_embedding(self, out, ids)

        rnn_input = out.reshape(batch_size, self.total_seq_length, FC_OUTPUT_SIZE)
        return rnn_seq2seq(self, x, rnn_input)
