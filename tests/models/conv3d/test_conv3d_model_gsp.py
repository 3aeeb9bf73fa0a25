"""conv3d GSP-target tests — mirrors reference
``tests/models/conv3d/test_conv3d_model_gsp.py``."""

import jax

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.conv3d import Model
from predict_pv_yield_tpu.utils import load_config


def test_model_forward_gsp(configuration_conv3d):
    config = load_config("tests/configs/model/conv3d_gsp.yaml")
    model = Model(**config)
    assert model.output_variable == "gsp_yield"
    batch = FakeDataset(configuration=configuration_conv3d)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert len(y.shape) == 2
    assert y.shape[0] == 2
    assert y.shape[1] == model.forecast_len_30
