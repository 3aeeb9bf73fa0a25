"""perceiver — Perceiver-per-frame encoder + GRU seq2seq over time.

Native equivalent of reference ``models/perceiver/perceiver.py:42-200``:

* timesteps folded into the batch dimension, each satellite frame through a
  weight-tied Perceiver (depth = total sequence length) — the reference's
  scaling mechanism for sequence length (SURVEY §5.7);
* FC stack fc1..fc5 → 8 features per frame; 2048-entry system-ID embedding
  repeated per timestep;
* NWP zero-padded in time to the satellite sequence length, flattened per
  step, concatenated into the RNN input (``:163-173``);
* 2-layer GRU encoder over the history window (+ a yield-history channel),
  decoder over the last ``forecast_len`` steps seeded with the encoder's
  final hidden state (``:176-194``), FC head → per-step scalar.
"""

from __future__ import annotations

from typing import ClassVar, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.consts import N_PERCEIVER_EMBEDDING_IDS, NWP_VARIABLE_NAMES
from predict_pv_yield_tpu.data.batch import as_batch
from predict_pv_yield_tpu.models.base import BaseModel
from predict_pv_yield_tpu.models.layers import StackedGRU
from predict_pv_yield_tpu.models.perceiver_core import Perceiver

PERCEIVER_OUTPUT_SIZE = 512
FC_OUTPUT_SIZE = 8
RNN_HIDDEN_SIZE = 16

#: reference module-level ``params`` dict defaults (``perceiver.py:15-25``).
params = dict(
    batch_size=32,
    history_minutes=30,
    forecast_minutes=120,
    image_size_pixels=64,
    nwp_channels=tuple(NWP_VARIABLE_NAMES[0:10]),
    sat_channels=(
        "IR_016", "IR_039", "IR_087", "IR_097", "IR_108", "IR_120",
        "IR_134", "VIS006", "VIS008", "WV_062", "WV_073",
    ),
)


class PerceiverModel(BaseModel):
    model_name: ClassVar[str] = "perceiver"

    history_minutes: int = params["history_minutes"]
    forecast_minutes: int = params["forecast_minutes"]
    nwp_channels: Sequence[str] = params["nwp_channels"]
    batch_size: int = 32
    num_latents: int = 128
    latent_dim: int = 64
    embedding_dem: int = 16
    #: shard attention/FF weights over the mesh 'model' axis (TP)
    partition_attention: bool = False
    output_variable: str = "pv_yield"

    @property
    def total_seq_length(self) -> int:
        return self.history_minutes // 5 + self.forecast_minutes // 5 + 1

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = as_batch(x)

        # Satellite frames -> fold time into the batch (reference :119-126).
        sat_data = x.satellite.data[0 : self.batch_size].astype(jnp.float32)
        batch_size, n_chans, seq_len, width, height = sat_data.shape
        sat_data = jnp.transpose(sat_data, (0, 2, 3, 4, 1))  # (B, T, H, W, C)
        new_batch_size = batch_size * seq_len
        sat_data = sat_data.reshape(new_batch_size, width, height, n_chans)

        out = Perceiver(
            input_channels=n_chans,
            input_axis=2,
            num_freq_bands=6,
            max_freq=10.0,
            depth=self.total_seq_length,
            num_latents=self.num_latents,
            latent_dim=self.latent_dim,
            num_classes=PERCEIVER_OUTPUT_SIZE,
            weight_tie_layers=True,
            partition_attention=self.partition_attention,
            dtype=self.dtype,
            name="perceiver",
        )(sat_data)

        out = out.reshape(new_batch_size, PERCEIVER_OUTPUT_SIZE)
        out = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc1")(out))

        # System-ID embedding, repeated per timestep (reference :135-145).
        if self.embedding_dem:
            if self.output_variable == "pv_yield":
                ids = x.pv.pv_system_row_number[0 : self.batch_size, 0]
            else:
                ids = x.gsp.gsp_id[0 : self.batch_size, 0]
            ids = jnp.repeat(ids.astype(jnp.int32), self.total_seq_length)
            embedding = nn.Embed(
                num_embeddings=N_PERCEIVER_EMBEDDING_IDS,
                features=self.embedding_dem,
                name="pv_system_id_embedding",
            )(ids)
            out = jnp.concatenate([out, embedding.astype(out.dtype)], axis=1)

        out = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2")(out))
        out = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc3")(out))
        out = nn.relu(nn.Dense(32, dtype=self.dtype, name="fc4")(out))
        out = nn.relu(nn.Dense(FC_OUTPUT_SIZE, dtype=self.dtype, name="fc5")(out))

        out = out.reshape(batch_size, self.total_seq_length, FC_OUTPUT_SIZE)

        # NWP zero-padded in time to the satellite length, flattened per step
        # (reference :163-173).
        nwp_data = x.nwp.data[0 : self.batch_size].astype(jnp.float32)
        nwp_data = jnp.transpose(nwp_data, (0, 2, 1, 3, 4))  # (B, Tn, C, H, W)
        nwp_seq_len = nwp_data.shape[1]
        pad = [(0, 0), (0, seq_len - nwp_seq_len), (0, 0), (0, 0), (0, 0)]
        nwp_data = jnp.pad(nwp_data, pad)
        nwp_data = nwp_data.reshape(batch_size, seq_len, -1)

        rnn_input = jnp.concatenate([out, nwp_data.astype(out.dtype)], axis=2)

        # Encoder over the history (+ yield-history channel), decoder over the
        # forecast window seeded with the encoder state (reference :184-194).
        if self.output_variable == "pv_yield":
            yield_history = x.pv.pv_yield[0 : self.batch_size][
                :, : self.history_len_5 + 1, 0
            ][..., None].astype(out.dtype)
            encoder_input = jnp.concatenate(
                [rnn_input[:, : self.history_len_5 + 1], yield_history], axis=2
            )
        else:
            yield_history = x.gsp.gsp_yield[0 : self.batch_size][
                :, : self.history_len_30 + 1, 0
            ][..., None].astype(out.dtype)
            encoder_input = jnp.concatenate(
                [rnn_input[:, : self.history_len_30 + 1], yield_history], axis=2
            )

        _, encoder_hidden = StackedGRU(
            hidden_size=RNN_HIDDEN_SIZE, num_layers=2, dtype=self.dtype, name="encoder_rnn"
        )(encoder_input)
        decoder_output, _ = StackedGRU(
            hidden_size=RNN_HIDDEN_SIZE, num_layers=2, dtype=self.dtype, name="decoder_rnn"
        )(rnn_input[:, -self.forecast_len :], initial_carry=encoder_hidden)

        decoder_output = nn.relu(
            nn.Dense(8, dtype=self.dtype, name="decoder_fc1")(decoder_output)
        )
        decoder_output = nn.Dense(1, dtype=self.dtype, name="decoder_fc2")(decoder_output)
        return decoder_output.squeeze(-1)
