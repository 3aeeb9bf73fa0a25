"""Model base class.

The reference couples model definition, loss computation, logging and
optimisation inside one ``pl.LightningModule`` (reference ``base_model.py:27``).
The TPU-native design splits that: models here are pure flax modules —
``Batch -> (batch_size, forecast_len)`` functions with static shapes — and a
single generic engine (``training/engine.py``) owns the jitted train/eval
steps, metrics, and checkpointing for every model.

``BaseModel`` supplies what all reference models share:

* the sequence-length arithmetic incl. the 60-minute ceil quirk
  (reference ``base_model.py:41-60``, via :class:`SeqLens`);
* target-variable selection: ``pv_yield`` → 5-minute cadence, 128
  samples/batch; ``gsp_yield`` → 30-minute cadence, 32 samples/batch
  (``base_model.py:66-74``);
* the target slice ``y[0:batch_size, -forecast_len:, 0]``
  (``base_model.py:91-95``).

Because flax modules are frozen dataclasses, all hyperparameters are fields
set at construction (``Model(**load_config(yaml))`` works exactly as in the
reference tests) and every derived length is a pure property — static Python
arithmetic, so XLA sees fixed shapes only.
"""

from __future__ import annotations

from typing import Any, ClassVar, Optional

import jax.numpy as jnp
from flax import linen as nn

from predict_pv_yield_tpu.data.batch import Batch
from predict_pv_yield_tpu.seqlen import SeqLens


class BaseModel(nn.Module):
    """Shared hyperparameters and derived quantities for all forecast models."""

    history_minutes: int = 60
    forecast_minutes: int = 30
    output_variable: str = "pv_yield"
    #: Examples per batch the model consumes (reference class default 32,
    #: ``base_model.py:30``). Slicing mirrors the reference exactly: targets
    #: and embedding IDs are sliced to ``[0:batch_size]`` everywhere; the
    #: perceiver family also slices its image inputs (``perceiver.py:119``)
    #: while the conv3d family consumes the full file batch
    #: (``model_sat_nwp.py:181``) — so conv3d models require the prepared
    #: batch size to equal ``batch_size``, as the reference does.
    batch_size: int = 32
    #: Stem of the per-epoch validation-results CSV (reference base_model.py:33).
    results_file_name: str = "results_epoch"
    #: Activation/compute dtype; ``jnp.bfloat16`` enables TPU mixed precision
    #: (params stay fp32). None keeps fp32 — the reference's ``precision=16``
    #: AMP analog, set by the engine from trainer config.
    dtype: Optional[Any] = None

    #: Human-readable model-zoo name (reference sets ``name``; linen reserves
    #: that identifier for module naming, so we use ``model_name``).
    model_name: ClassVar[str] = "base"

    @property
    def seq_lens(self) -> SeqLens:
        return SeqLens(self.history_minutes, self.forecast_minutes)

    # Per-cadence lengths, mirroring reference attribute names.
    @property
    def history_len_5(self) -> int:
        return self.seq_lens.history_len_5

    @property
    def forecast_len_5(self) -> int:
        return self.seq_lens.forecast_len_5

    @property
    def history_len_30(self) -> int:
        return self.seq_lens.history_len_30

    @property
    def forecast_len_30(self) -> int:
        return self.seq_lens.forecast_len_30

    @property
    def history_len_60(self) -> int:
        return self.seq_lens.history_len_60

    @property
    def total_seq_length(self) -> int:
        """5-minute steps incl. t0 — the perceiver family's frame count and
        Perceiver depth (reference ``perceiver.py:34``); == seq_len_5."""
        return self.seq_lens.seq_len_5

    @property
    def forecast_len_60(self) -> int:
        return self.seq_lens.forecast_len_60

    @property
    def forecast_len(self) -> int:
        return self.seq_lens.target_lens(self.output_variable)[1]

    @property
    def history_len(self) -> int:
        return self.seq_lens.target_lens(self.output_variable)[0]

    @property
    def number_of_samples_per_batch(self) -> int:
        return self.seq_lens.target_lens(self.output_variable)[2]

    @property
    def number_of_pv_samples_per_batch(self) -> int:
        return 128  # reference base_model.py:74

    # ------------------------------------------------------------------
    def target(self, batch: Batch) -> jnp.ndarray:
        """Ground truth ``y``: centre system/GSP, last ``forecast_len`` steps
        (reference ``base_model.py:91-95``)."""
        y = batch.gsp.gsp_yield if self.output_variable == "gsp_yield" else batch.pv.pv_yield
        return y[0 : self.batch_size, -self.forecast_len :, 0]
