"""Forecaster architecture variants (notebooks 12 / 14 / 16).

The reference's optical-flow lineage trained several residual-forecaster
topologies besides the production notebook-13 Conv3d (SURVEY §2.5.2): a
stride-2 2-D conv autoencoder (``14_back_to_2d_conv_AE.ipynb`` cell 39), a
max-pool autoencoder (``16_maxpool.ipynb`` cell 41), and the pre-flow
pure-3D-conv control (``12_just_3d_conv.ipynb`` cell 53). Each is gated here
on (a) the notebook's exact output geometry, (b) a loss-decreasing training
step, and (c) full-model parity against a torch mirror built from the
notebook's own layer stack — the transposed-conv variants exercise kernel
layouts no other parity test covers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
from torch import nn as tnn

from predict_pv_yield_tpu.models.flow_forecaster import (
    FORECASTER_ARCHITECTURES,
    FORECAST_HORIZON,
    HISTORICAL_SAT_IMAGES,
    OPTICAL_FLOW_PREDICTIONS,
    TARGET_SAT_IMAGE,
    Conv2dAEForecaster,
    FlowForecaster,
    MaxPoolAEForecaster,
    PureConv3dForecaster,
)

CONTEXT, TARGET = 128, 64


def _batch(batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        HISTORICAL_SAT_IMAGES: rng.normal(
            size=(batch_size, 4, CONTEXT, CONTEXT)
        ).astype(np.float32),
        OPTICAL_FLOW_PREDICTIONS: rng.normal(
            size=(batch_size, CONTEXT, CONTEXT)
        ).astype(np.float32),
        TARGET_SAT_IMAGE: rng.normal(size=(batch_size, TARGET, TARGET)).astype(
            np.float32
        ),
        FORECAST_HORIZON: rng.normal(size=(batch_size,)).astype(np.float32),
    }


# (arch key, class, output size at 128 px context, cropped-target size)
CASES = [
    ("conv3d", FlowForecaster, 64, 64),            # notebook 13
    ("conv2d_ae", Conv2dAEForecaster, 63, 63),     # notebook 14: y[:-1, :-1]
    ("maxpool_ae", MaxPoolAEForecaster, 48, 48),   # notebook 16: y[8:-8, 8:-8]
    ("pure_conv3d", PureConv3dForecaster, 64, 64), # notebook 12
]


@pytest.mark.parametrize("key,cls,out_px,crop_px", CASES)
def test_output_geometry_and_registry(key, cls, out_px, crop_px):
    assert FORECASTER_ARCHITECTURES[key] is cls
    batch = _batch()
    model = cls(channels=8)
    variables = model.init(jax.random.key(0), batch)
    y_hat = model.apply(variables, batch)
    assert y_hat.shape == (2, out_px, out_px)
    target = model.crop_target(batch[TARGET_SAT_IMAGE])
    assert target.shape == (2, crop_px, crop_px)
    # the cropped label must align with the prediction footprint
    assert y_hat.shape == target.shape


@pytest.mark.parametrize("key,cls,out_px,crop_px", CASES)
def test_one_step_decreases_loss(key, cls, out_px, crop_px):
    batch = _batch(seed=1)
    model = cls(channels=8)
    variables = model.init(jax.random.key(1), batch)
    tx = optax.adam(1e-4)  # the notebooks' configure_optimizers lr
    opt_state = tx.init(variables)

    def loss_fn(params):
        prediction = model.apply(params, batch)
        target = model.crop_target(batch[TARGET_SAT_IMAGE])
        return jnp.mean((prediction - target) ** 2)

    loss0, grads = jax.value_and_grad(loss_fn)(variables)
    updates, opt_state = tx.update(grads, opt_state, variables)
    variables = optax.apply_updates(variables, updates)
    loss1 = loss_fn(variables)
    assert np.isfinite(float(loss0)) and float(loss1) < float(loss0)


# ---------------------------------------------------------------------------
# Torch parity: mirrors assembled from the notebooks' own nn.Sequential stacks
# ---------------------------------------------------------------------------

def _conv_kernel(w: torch.Tensor) -> np.ndarray:
    """torch Conv (out,in,kH,kW[,kD…]) → flax (spatial…, in, out)."""
    w = w.detach().numpy()
    spatial = tuple(range(2, w.ndim))
    return np.transpose(w, spatial + (1, 0))


def _tconv_kernel(w: torch.Tensor) -> np.ndarray:
    """torch ConvTranspose (in,out,kH,kW) → flax ConvTranspose (kH,kW,in,out).

    flax's ``ConvTranspose`` (``transpose_kernel=False``) correlates the
    stride-dilated input with the kernel as given; torch computes the
    gradient of a forward conv, i.e. the same thing with spatially FLIPPED
    taps — so the mapping flips the spatial axes.
    """
    w = w.detach().numpy()
    spatial = tuple(range(2, w.ndim))
    return np.flip(np.transpose(w, spatial + (0, 1)), axis=tuple(range(len(spatial))))


def _assemble_input_torch(batch: dict, include_flow: bool = True) -> torch.Tensor:
    planes = [torch.from_numpy(batch[HISTORICAL_SAT_IMAGES])]
    if include_flow:
        planes.append(torch.from_numpy(batch[OPTICAL_FLOW_PREDICTIONS]).unsqueeze(1))
    images = torch.cat(planes, dim=1)
    b, _, h, w = images.shape
    horizon = torch.from_numpy(batch[FORECAST_HORIZON]).view(-1, 1, 1, 1).expand(b, 1, h, w)
    return torch.cat([images, horizon], dim=1)


def test_conv2d_ae_torch_parity():
    """Full-model parity with notebook 14 cell 39's encoder/decoder stack."""
    channels = 8
    torch.manual_seed(0)
    tmodel = tnn.Sequential(
        tnn.Conv2d(6, channels // 2, 3, stride=2), tnn.ReLU(),
        tnn.Conv2d(channels // 2, channels, 3, stride=2), tnn.ReLU(),
        tnn.Conv2d(channels, channels, 3, stride=2), tnn.ReLU(),
        tnn.Conv2d(channels, channels, 3, stride=2), tnn.ReLU(),
        tnn.ConvTranspose2d(channels, channels, 3, stride=2), tnn.ReLU(),
        tnn.ConvTranspose2d(channels, channels // 2, 3, stride=2), tnn.ReLU(),
        tnn.ConvTranspose2d(channels // 2, 1, 3, stride=2),
    )
    batch = _batch(seed=2)
    with torch.no_grad():
        expected = tmodel(_assemble_input_torch(batch)).squeeze(1).numpy()

    convs = [m for m in tmodel if isinstance(m, tnn.Conv2d)]
    tconvs = [m for m in tmodel if isinstance(m, tnn.ConvTranspose2d)]
    params = {}
    for i, layer in enumerate(convs):
        params[f"enc{i}"] = {
            "kernel": _conv_kernel(layer.weight),
            "bias": layer.bias.detach().numpy(),
        }
    for i, layer in enumerate(tconvs):
        params[f"dec{i}"] = {
            "kernel": _tconv_kernel(layer.weight),
            "bias": layer.bias.detach().numpy(),
        }

    model = Conv2dAEForecaster(channels=channels)
    actual = np.asarray(model.apply({"params": params}, batch))
    assert expected.shape == actual.shape == (2, 63, 63)
    np.testing.assert_allclose(actual, expected, atol=1e-4, rtol=1e-4)


def test_maxpool_ae_torch_parity():
    """Full-model parity with notebook 16 cell 41's final (single-pool) form."""
    channels = 8
    torch.manual_seed(1)
    enc = [
        tnn.Conv2d(6, channels // 2, 3),
        tnn.Conv2d(channels // 2, channels, 3),
        tnn.Conv2d(channels, channels, 3),
        tnn.Conv2d(channels, channels, 3),
    ]
    dec = [
        tnn.ConvTranspose2d(channels, channels, 3),
        tnn.ConvTranspose2d(channels, channels // 2, 3),
        tnn.ConvTranspose2d(channels // 2, channels // 2, 3),
        tnn.ConvTranspose2d(channels // 2, 1, 3),
    ]
    pool = tnn.MaxPool2d(3)  # stride defaults to the kernel size
    batch = _batch(seed=3)
    with torch.no_grad():
        x = _assemble_input_torch(batch)
        for layer in enc:
            x = torch.relu(layer(x))
        x = pool(x)
        for layer in dec[:-1]:
            x = torch.relu(layer(x))
        expected = dec[-1](x).squeeze(1).numpy()

    params = {}
    for i, layer in enumerate(enc):
        params[f"enc{i}"] = {
            "kernel": _conv_kernel(layer.weight),
            "bias": layer.bias.detach().numpy(),
        }
    for i, layer in enumerate(dec):
        params[f"dec{i}"] = {
            "kernel": _tconv_kernel(layer.weight),
            "bias": layer.bias.detach().numpy(),
        }

    model = MaxPoolAEForecaster(channels=channels)
    actual = np.asarray(model.apply({"params": params}, batch))
    assert expected.shape == actual.shape == (2, 48, 48)
    np.testing.assert_allclose(actual, expected, atol=1e-4, rtol=1e-4)


def test_pure_conv3d_torch_parity():
    """Full-model parity with notebook 12 cell 53's five-layer Conv3d stack."""
    channels = 8
    torch.manual_seed(2)
    kernel = (2, 3, 3)
    tmodel = tnn.Sequential(
        tnn.Conv3d(2, channels // 2, kernel, padding=(0, 1, 1)), tnn.ReLU(),
        tnn.Conv3d(channels // 2, channels, kernel, padding=(0, 1, 1)), tnn.ReLU(),
        tnn.Conv3d(channels, channels, kernel, padding=(1, 1, 1)), tnn.ReLU(),
        tnn.Conv3d(channels, channels, kernel, padding=(0, 1, 1)), tnn.ReLU(),
        tnn.Conv3d(channels, 1, kernel, stride=(1, 2, 2), padding=(0, 1, 1)),
    )
    batch = _batch(seed=4)
    hist = torch.from_numpy(batch[HISTORICAL_SAT_IMAGES])  # (B, 4, H, W)
    b, d, h, w = hist.shape
    horizon = torch.from_numpy(batch[FORECAST_HORIZON]).view(-1, 1, 1, 1, 1)
    volume = torch.cat(
        [hist.unsqueeze(1), horizon.expand(b, 1, d, h, w)], dim=1
    )  # (B, 2, 4, H, W)
    with torch.no_grad():
        expected = tmodel(volume).squeeze(1).squeeze(1).numpy()

    convs = [m for m in tmodel if isinstance(m, tnn.Conv3d)]
    params = {
        f"conv{i}": {
            "kernel": _conv_kernel(layer.weight),
            "bias": layer.bias.detach().numpy(),
        }
        for i, layer in enumerate(convs)
    }
    model = PureConv3dForecaster(channels=channels)
    actual = np.asarray(model.apply({"params": params}, batch))
    assert expected.shape == actual.shape == (2, 64, 64)
    np.testing.assert_allclose(actual, expected, atol=1e-4, rtol=1e-4)
