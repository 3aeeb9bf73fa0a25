"""Dataset-wide constants.

Native equivalents of the constants the reference pulls from the external
``nowcasting_dataset.consts`` package (see reference
``predict_pv_yield/netcdf_dataset.py:15-32`` and
``experiments/001_CNN_concat_all_timesteps_as_channels.py:58-59``).

The per-channel satellite statistics were computed by the reference's
``notebooks/mean_and_std_of_satellite_imagery.ipynb`` and are part of the
on-disk data contract: satellite imagery is stored as int16 counts and decoded
to float32 via ``(x - SAT_MEAN[c]) / SAT_STD[c]``.
"""

from __future__ import annotations

import numpy as np

#: The 12 EUMETSAT SEVIRI channels, HRV first.
SAT_VARIABLE_NAMES = (
    "HRV",
    "IR_016",
    "IR_039",
    "IR_087",
    "IR_097",
    "IR_108",
    "IR_120",
    "IR_134",
    "VIS006",
    "VIS008",
    "WV_062",
    "WV_073",
)

#: UK Met Office UKV NWP channels (reference ``experiments/001...py:58-59``).
NWP_VARIABLE_NAMES = (
    "t",
    "dswrf",
    "prate",
    "r",
    "sde",
    "si10",
    "vis",
    "lcc",
    "mcc",
    "hcc",
)

#: Per-channel mean of raw int16 satellite counts, aligned with
#: SAT_VARIABLE_NAMES (reference ``netcdf_dataset.py:19-24``).
SAT_MEAN = np.array(
    [
        93.23458,
        131.71373,
        843.7779,
        736.6148,
        771.1189,
        589.66034,
        862.29816,
        927.69586,
        90.70885,
        107.58985,
        618.4583,
        532.47394,
    ],
    dtype=np.float32,
)

#: Per-channel std of raw int16 satellite counts (``netcdf_dataset.py:26-32``).
SAT_STD = np.array(
    [
        115.34247,
        139.92636,
        36.99538,
        57.366386,
        30.346825,
        149.68007,
        51.70631,
        35.872967,
        115.77212,
        120.997154,
        98.57828,
        99.76469,
    ],
    dtype=np.float32,
)

#: HRV-only statistics used by the optical-flow pipeline
#: (reference notebook 13 cell 9: SAT_IMAGE_MEAN / SAT_IMAGE_STD).
SAT_IMAGE_MEAN = np.float32(93.23458)
SAT_IMAGE_STD = np.float32(115.34247)

#: OSGB geo-coordinate normalisation constants for the coordinate-plane input
#: channels of the experiment models (reference ``experiments/001...py:210-213``
#: and ``models/perceiver/perceiver.py:28-31``).
SAT_X_MEAN = np.float32(309000)
SAT_X_STD = np.float32(316387.42073603)
SAT_Y_MEAN = np.float32(519000)
SAT_Y_STD = np.float32(406454.17945938)

#: Number of PV systems per example in a prepared batch
#: (reference ``base_model.py:74``).
N_PV_SYSTEMS_PER_EXAMPLE = 128

#: Number of GSPs per example in a prepared batch.
N_GSPS_PER_EXAMPLE = 32

#: Embedding table sizes used by the model zoo
#: (reference ``model_sat_nwp.py:148-151`` and ``perceiver.py:91``).
N_PV_SYSTEM_IDS = 940
N_PERCEIVER_EMBEDDING_IDS = 2048
