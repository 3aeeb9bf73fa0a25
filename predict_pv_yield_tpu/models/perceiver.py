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


def fc_head_with_embedding(model, out, ids) -> jnp.ndarray:
    """fc1 → optional system-ID embedding concat → fc2..fc5, per folded
    (B·T) frame — the head block the reference duplicates across its three
    perceiver files (``perceiver.py:128-155`` and siblings). Runs inside the
    calling model's ``@nn.compact`` scope, so parameter names are identical
    to defining the layers inline (fc1…fc5, pv_system_id_embedding).

    ``ids`` is the per-example ID vector the caller selected — the selection
    rule is the one place the three models legitimately differ (perceiver
    branches on output_variable; the nwp_sat variants always use
    pv_system_row_number, a kept reference quirk)."""
    out = nn.relu(nn.Dense(256, dtype=model.dtype, name="fc1")(out))
    if model.embedding_dem:
        from predict_pv_yield_tpu.models.layers import embed_checked

        ids = jnp.repeat(ids.astype(jnp.int32), model.total_seq_length)
        embedding = embed_checked(
            nn.Embed(
                num_embeddings=N_PERCEIVER_EMBEDDING_IDS,
                features=model.embedding_dem,
                name="pv_system_id_embedding",
            ),
            ids,
        )
        out = jnp.concatenate([out, embedding.astype(out.dtype)], axis=1)
    out = nn.relu(nn.Dense(128, dtype=model.dtype, name="fc2")(out))
    out = nn.relu(nn.Dense(64, dtype=model.dtype, name="fc3")(out))
    out = nn.relu(nn.Dense(32, dtype=model.dtype, name="fc4")(out))
    return nn.relu(nn.Dense(FC_OUTPUT_SIZE, dtype=model.dtype, name="fc5")(out))


def rnn_seq2seq(model, x, rnn_input) -> jnp.ndarray:
    """GRU encoder over the history window (+ yield-history channel) →
    decoder over the last ``forecast_len`` steps seeded with the encoder
    state → FC head → per-step scalar (reference ``perceiver.py:176-200``,
    duplicated in both siblings). Shares the calling model's compact scope
    (param names encoder_rnn/decoder_rnn/decoder_fc1/decoder_fc2)."""
    if model.output_variable == "pv_yield":
        history_len = model.history_len_5
        series = x.pv.pv_yield
    else:
        history_len = model.history_len_30
        series = x.gsp.gsp_yield
    yield_history = series[0 : model.batch_size][:, : history_len + 1, 0][
        ..., None
    ].astype(rnn_input.dtype)
    encoder_input = jnp.concatenate(
        [rnn_input[:, : history_len + 1], yield_history], axis=2
    )

    _, encoder_hidden = StackedGRU(
        hidden_size=RNN_HIDDEN_SIZE, num_layers=2, dtype=model.dtype, name="encoder_rnn"
    )(encoder_input)
    decoder_output, _ = StackedGRU(
        hidden_size=RNN_HIDDEN_SIZE, num_layers=2, dtype=model.dtype, name="decoder_rnn"
    )(rnn_input[:, -model.forecast_len :], initial_carry=encoder_hidden)

    decoder_output = nn.relu(
        nn.Dense(8, dtype=model.dtype, name="decoder_fc1")(decoder_output)
    )
    decoder_output = nn.Dense(1, dtype=model.dtype, name="decoder_fc2")(decoder_output)
    return decoder_output.squeeze(-1)


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
    #: unroll the tied depth loop (see perceiver_core.Perceiver.depth_unroll)
    depth_unroll: bool = False
    output_variable: str = "pv_yield"

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
            depth_unroll=self.depth_unroll,
            dtype=self.dtype,
            name="perceiver",
        )(sat_data)

        out = out.reshape(new_batch_size, PERCEIVER_OUTPUT_SIZE)

        # System-ID embedding, repeated per timestep (reference :135-145) —
        # this model branches the ID source on the target variable.
        ids = None
        if self.embedding_dem:
            if self.output_variable == "pv_yield":
                ids = x.pv.pv_system_row_number[0 : self.batch_size, 0]
            else:
                ids = x.gsp.gsp_id[0 : self.batch_size, 0]
        out = fc_head_with_embedding(self, out, ids)

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
        return rnn_seq2seq(self, x, rnn_input)
