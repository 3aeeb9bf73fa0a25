"""Model zoo registry.

Maps zoo names (and reference ``_target_`` strings, see
``config/instantiate.py``) to flax module classes.
"""

from __future__ import annotations

from typing import Dict, Type

from predict_pv_yield_tpu.models import base as base  # noqa: F401
from predict_pv_yield_tpu.models import baseline as _baseline
from predict_pv_yield_tpu.models import conv3d as _conv3d
from predict_pv_yield_tpu.models import conv3d_nwp as _conv3d_nwp
from predict_pv_yield_tpu.models import conv3d_sat_nwp as _conv3d_sat_nwp

MODEL_REGISTRY: Dict[str, Type] = {
    "last_value": _baseline.Model,
    "baseline": _baseline.Model,
    "conv3d": _conv3d.Model,
    "conv3d_sat_nwp": _conv3d_sat_nwp.Model,
    "conv3d_nwp": _conv3d_nwp.Model,
}


def register_model(name: str, cls) -> None:
    MODEL_REGISTRY[name] = cls


def get_model(name: str):
    return MODEL_REGISTRY[name]


def _register_experimental() -> None:
    from predict_pv_yield_tpu.models import experimental as _experimental
    from predict_pv_yield_tpu.models import flow_forecaster as _flow

    MODEL_REGISTRY.setdefault("cnn_concat_timesteps", _experimental.CNNConcatTimesteps)
    MODEL_REGISTRY.setdefault("cnn_rnn", _experimental.CNNRNN)
    MODEL_REGISTRY.setdefault("flow_forecaster", _flow.FlowForecaster)


def _register_perceivers() -> None:
    """Perceiver family is imported lazily (heavier modules)."""
    from predict_pv_yield_tpu.models import perceiver as _perceiver
    from predict_pv_yield_tpu.models import perceiver_nwp_sat as _pns
    from predict_pv_yield_tpu.models import perceiver_conv3d_nwp_sat as _pcns

    MODEL_REGISTRY.setdefault("perceiver", _perceiver.PerceiverModel)
    MODEL_REGISTRY.setdefault("perceiver_nwp_sat", _pns.Model)
    MODEL_REGISTRY.setdefault("perceiver_conv3d_nwp_sat", _pcns.Model)
