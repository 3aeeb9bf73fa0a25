"""perceiver_nwp_sat — NWP concatenated as extra Perceiver input channels.

Native equivalent of reference ``models/perceiver/perceiver_nwp_sat.py:41-204``:
same skeleton as ``perceiver.py`` but the time-padded NWP grids join the
satellite frames as channels before the Perceiver (sat and NWP must share
H×W — asserted, reference ``:140-141``), and the RNN input is the Perceiver
features only (``:180-185``).
"""

from __future__ import annotations

from typing import ClassVar, Sequence

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.perceiver import (
    FC_OUTPUT_SIZE,
    PERCEIVER_OUTPUT_SIZE,
    fc_head_with_embedding,
    params,
    rnn_seq2seq,
)
from predict_pv_yield_tpu.models.perceiver_core import Perceiver


class Model(BaseModel):
    model_name: ClassVar[str] = "perceiver_nwp_sat"

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

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)

        sat_data = x.satellite.data[0 : self.batch_size].astype(jnp.float32)
        batch_size, n_chans, seq_len, width, height = sat_data.shape
        sat_data = jnp.transpose(sat_data, (0, 2, 3, 4, 1))
        new_batch_size = batch_size * seq_len
        sat_data = sat_data.reshape(new_batch_size, width, height, n_chans)

        # NWP: time-pad to the satellite length, fold time into batch, concat
        # as channels (reference :127-143).
        nwp_data = x.nwp.data[0 : self.batch_size].astype(jnp.float32)
        nwp_data = jnp.transpose(nwp_data, (0, 2, 3, 4, 1))  # (B, Tn, H, W, C)
        nwp_seq_len, nwp_width, nwp_height, n_nwp_chans = nwp_data.shape[1:]
        nwp_data = jnp.pad(
            nwp_data, [(0, 0), (0, seq_len - nwp_seq_len), (0, 0), (0, 0), (0, 0)]
        )
        nwp_data = nwp_data.reshape(new_batch_size, nwp_width, nwp_height, n_nwp_chans)

        assert nwp_width == width, f"widths should be the same ({nwp_width},{width})"
        assert nwp_height == height, f"heights should be the same ({nwp_height},{height})"

        data = jnp.concatenate([sat_data, nwp_data], axis=-1)

        out = Perceiver(
            input_channels=n_chans + n_nwp_chans,
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

        # Reference quirk kept: unlike the sibling perceiver model, this
        # model ALWAYS embeds pv_system_row_number — no gsp_id branch for
        # gsp_yield targets (reference perceiver_nwp_sat.py:155; needs pv
        # data present even when training on GSP).
        ids = (
            x.pv.pv_system_row_number[0 : self.batch_size, 0]
            if self.embedding_dem
            else None
        )
        out = fc_head_with_embedding(self, out, ids)

        # RNN input is the Perceiver features only (reference :180-185).
        rnn_input = out.reshape(batch_size, self.total_seq_length, FC_OUTPUT_SIZE)
        return rnn_seq2seq(self, x, rnn_input)
