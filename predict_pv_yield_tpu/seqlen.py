"""Sequence-length arithmetic shared by every model and the data layer.

Replicates the reference's derivation of per-cadence history/forecast step
counts from minutes, including its quirks (reference ``base_model.py:41-74``):

* 5- and 30-minute lengths use floor division;
* the 60-minute *history* length uses ``ceil`` ("for 30 minutes of history
  data, one history value will be used", ``base_model.py:55-57``) while the
  60-minute forecast length uses floor division;
* ``pv_yield`` targets run at 5-minute cadence with 128 samples/batch,
  ``gsp_yield`` targets at 30-minute cadence with 32 samples/batch
  (``base_model.py:66-74``).

Everything here is static Python arithmetic executed at model-construction
time, so downstream XLA programs see fixed shapes only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class SeqLens:
    """Step counts at 5/30/60-minute cadence for a (history, forecast) window."""

    history_minutes: int
    forecast_minutes: int

    @property
    def history_len_5(self) -> int:
        return self.history_minutes // 5

    @property
    def forecast_len_5(self) -> int:
        return self.forecast_minutes // 5

    @property
    def history_len_30(self) -> int:
        return self.history_minutes // 30

    @property
    def forecast_len_30(self) -> int:
        return self.forecast_minutes // 30

    @property
    def history_len_60(self) -> int:
        # ceil: 30 minutes of history still contributes one 60-minute value
        # (reference base_model.py:57).
        return int(math.ceil(self.history_minutes / 60))

    @property
    def forecast_len_60(self) -> int:
        return self.forecast_minutes // 60

    @property
    def seq_len_5(self) -> int:
        """Total 5-minute steps: history + t0 + forecast."""
        return self.history_len_5 + self.forecast_len_5 + 1

    @property
    def seq_len_30(self) -> int:
        return self.history_len_30 + self.forecast_len_30 + 1

    @property
    def seq_len_60(self) -> int:
        return self.history_len_60 + self.forecast_len_60 + 1

    def target_lens(self, output_variable: str) -> tuple[int, int, int]:
        """(history_len, forecast_len, samples_per_batch) for a target variable
        (reference ``base_model.py:66-74``). Unknown variables raise — the
        reference's if/else would silently give a typo'd config 30-minute
        lens while its target selection fell through to 5-minute pv data."""
        if output_variable == "pv_yield":
            return self.history_len_5, self.forecast_len_5, 128
        if output_variable == "gsp_yield":
            return self.history_len_30, self.forecast_len_30, 32
        raise ValueError(
            f"output_variable must be 'pv_yield' or 'gsp_yield', not "
            f"{output_variable!r}"
        )
