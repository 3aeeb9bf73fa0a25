"""Validation-results tables.

Native equivalent of ``nowcasting_utils.metrics.validation`` consumed at
reference ``base_model.py:229-250``. The output contract is pinned by the
reference's own test (``tests/models/baseline/test_baseline_model_gsp.py:104-110``):

* one row per (example, forecast horizon): ``n_batches * batch_size * forecast_len_30``
* columns ``t0_datetime_utc, target_datetime_utc, gsp_id,
  actual_gsp_pv_outturn_mw, forecast_gsp_pv_outturn_mw``

Values arrive de-normalised to MW (multiplied by ``gsp_capacity`` upstream,
reference ``base_model.py:223-227``). GSP targets are at 30-minute cadence, so
``target_datetime_utc = t0 + 30 min * (horizon_index + 1)``.
"""

from __future__ import annotations

import logging
import os
from typing import List, Sequence

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def make_validation_results(
    truths_mw: np.ndarray,
    predictions_mw: np.ndarray,
    capacity_mwp: np.ndarray,
    gsp_ids: Sequence[int],
    batch_idx: int,
    t0_datetimes_utc,
) -> pd.DataFrame:
    """Build the per-batch validation results table.

    Args:
        truths_mw: (batch_size, forecast_len) actual GSP outturn in MW.
        predictions_mw: (batch_size, forecast_len) forecast outturn in MW.
        capacity_mwp: (batch_size, forecast_len) GSP capacity in MWp.
        gsp_ids: (batch_size,) GSP identifiers.
        batch_idx: index of this validation batch.
        t0_datetimes_utc: (batch_size,) forecast-origin timestamps.
    """
    truths_mw = np.asarray(truths_mw)
    predictions_mw = np.asarray(predictions_mw)
    capacity_mwp = np.asarray(capacity_mwp)
    batch_size, forecast_len = truths_mw.shape

    t0 = pd.to_datetime(np.asarray(t0_datetimes_utc))
    horizons = np.arange(1, forecast_len + 1)

    rows = {
        "t0_datetime_utc": np.repeat(np.asarray(t0), forecast_len),
        "target_datetime_utc": (
            np.repeat(np.asarray(t0), forecast_len)
            + np.tile(horizons, batch_size) * pd.Timedelta(minutes=30)
        ),
        "gsp_id": np.repeat(np.asarray(gsp_ids), forecast_len),
        "actual_gsp_pv_outturn_mw": truths_mw.reshape(-1),
        "forecast_gsp_pv_outturn_mw": predictions_mw.reshape(-1),
        "capacity_mwp": capacity_mwp.reshape(-1),
        "batch_index": np.full(batch_size * forecast_len, batch_idx, dtype=np.int64),
    }
    return pd.DataFrame(rows)


def save_validation_results_to_logger(
    results_dfs: List[pd.DataFrame],
    results_file_name: str,
    current_epoch: int,
    logger=None,
) -> str:
    """Concatenate per-batch tables and persist ``{results_file_name}_{epoch}.csv``.

    If the experiment logger exposes ``log_artifact`` the CSV path is also
    forwarded to it (the reference uploads the CSV to Neptune,
    ``base_model.py:247-250``).
    """
    if not results_dfs:
        return ""
    results = pd.concat(results_dfs, ignore_index=True)
    path = f"{results_file_name}_{current_epoch}.csv"
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    results.to_csv(path, index=False)
    if logger is not None and hasattr(logger, "log_artifact"):
        try:
            logger.log_artifact(path)
        except Exception as exc:  # logging must never kill training
            logging.getLogger(__name__).warning(
                "could not upload %s: %s", path, exc, exc_info=True
            )
    return path
