"""Optical-flow kernel tests: known-motion recovery, warping semantics,
prediction triangle, SSIM behaviour.

Correctness is gated two ways: analytically here (for a pure translation of
a smooth image the true flow is known exactly and the estimator must recover
it in the interior), and bit-for-bit-ish against OpenCV in
``tests/test_opencv_parity.py`` (the reference's contracted gate — its
notebook 13 uses ``cv2.calcOpticalFlowFarneback`` / ``cv2.remap`` directly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from predict_pv_yield_tpu.ops.optical_flow import (
    farneback_flow,
    flow_sequence,
    polynomial_expansion,
)
from predict_pv_yield_tpu.ops.remap import (
    flow_predictions,
    prediction_valid_mask,
    remap_image,
)
from predict_pv_yield_tpu.ops.ssim import ssim


def _smooth_image(size=96, seed=0, scale=8):
    """Smooth random field (band-limited so translations are well-posed)."""
    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((size // scale, size // scale)).astype(np.float32)
    image = jax.image.resize(jnp.asarray(coarse), (size, size), "bicubic")
    return image * 50.0 + 100.0


def _translate(image, dx, dy):
    """Shift image content by (dx, dy) using spectral (exact) translation."""
    freq = jnp.fft.fft2(image)
    height, width = image.shape
    fy = jnp.fft.fftfreq(height)[:, None]
    fx = jnp.fft.fftfreq(width)[None, :]
    phase = jnp.exp(-2j * jnp.pi * (fy * dy + fx * dx))
    return jnp.real(jnp.fft.ifft2(freq * phase)).astype(jnp.float32)


def test_polynomial_expansion_on_quadratic():
    """The expansion must exactly recover a global quadratic's A and b."""
    size = 32
    y, x = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    xc, yc = x - size // 2, y - size // 2
    image = 0.5 * xc**2 + 0.25 * yc**2 + 0.3 * xc * yc + 2.0 * xc - 1.0 * yc + 7.0
    A, b = polynomial_expansion(jnp.asarray(image, jnp.float32))
    interior = (slice(8, -8), slice(8, -8))
    np.testing.assert_allclose(np.asarray(A[..., 0, 0][interior]), 0.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(A[..., 1, 1][interior]), 0.25, atol=1e-3)
    np.testing.assert_allclose(np.asarray(A[..., 0, 1][interior]), 0.15, atol=1e-3)
    # b is the local gradient: d/dx at (x0,y0) = x0 + ... — check at centre
    centre = size // 2
    np.testing.assert_allclose(float(b[centre, centre, 0]), 2.0, atol=1e-2)
    np.testing.assert_allclose(float(b[centre, centre, 1]), -1.0, atol=1e-2)


@pytest.mark.parametrize("shift", [(3.0, -2.0), (-1.5, 2.5)])
def test_farneback_recovers_translation(shift):
    dx, dy = shift
    im1 = _smooth_image(size=96, seed=1)
    im2 = _translate(im1, dx, dy)
    flow = farneback_flow(im1, im2, winsize=15)
    interior = np.asarray(flow[24:-24, 24:-24])
    err_x = np.abs(interior[..., 0] - dx)
    err_y = np.abs(interior[..., 1] - dy)
    assert np.median(err_x) < 0.4, np.median(err_x)
    assert np.median(err_y) < 0.4, np.median(err_y)


def test_flow_sequence_batches():
    im = _smooth_image(size=64, seed=2)
    frames = jnp.stack([_translate(im, i * 1.0, 0.0) for i in range(4)])
    flows = flow_sequence(frames, winsize=15)
    assert flows.shape == (3, 64, 64, 2)
    # each consecutive pair has ~unit x displacement
    med = np.median(np.asarray(flows[:, 16:-16, 16:-16, 0]), axis=(1, 2))
    np.testing.assert_allclose(med, 1.0, atol=0.4)


def test_remap_semantics():
    """Warping frame t by the true flow must reproduce frame t+1."""
    im1 = _smooth_image(size=64, seed=3)
    dx, dy = 3.0, -2.0
    im2 = _translate(im1, dx, dy)
    flow = jnp.broadcast_to(jnp.asarray([dx, dy], jnp.float32), (64, 64, 2))
    warped = remap_image(im1, flow)
    valid = ~jnp.isnan(warped)
    # NaN border appears exactly where samples leave the frame
    assert bool(jnp.isnan(warped[:, :3]).all())  # dx=3: left border invalid
    err = jnp.abs(jnp.where(valid, warped - im2, 0.0))
    assert float(err.max()) < 2.0
    assert float(jnp.median(err[valid])) < 0.2


def test_flow_predictions_triangle():
    im = _smooth_image(size=48, seed=4)
    frames = jnp.stack([_translate(im, 2.0 * i, 0.0) for i in range(5)])
    flows = flow_sequence(frames, winsize=15)
    preds = flow_predictions(frames, flows)
    assert preds.shape == (4, 4, 48, 48)
    mask = np.asarray(prediction_valid_mask(5))
    assert mask.sum() == 4 * 5 / 2  # n(n-1)/2 valid predictions
    # prediction (source 0, step 2) approximates frame 2 where valid
    pred = preds[0, 1]
    valid = ~np.isnan(np.asarray(pred))
    err = np.abs(np.asarray(pred) - np.asarray(frames[2]))[valid]
    assert np.median(err) < 2.0


def test_ssim():
    im = _smooth_image(size=64, seed=5)
    assert float(ssim(im, im)) == pytest.approx(1.0, abs=1e-5)
    noisy = im + 20.0 * np.random.default_rng(0).standard_normal(im.shape).astype(np.float32)
    value = float(ssim(im, noisy))
    assert 0.0 < value < 0.9
    # translation hurts SSIM more than identity
    shifted = _translate(im, 5.0, 0.0)
    assert float(ssim(im, shifted)) < 0.95


def test_flow_sequence_sharded_matches_unsharded():
    """The SPMD pair-parallel path (8-device mesh) equals the single-device
    result — the multi-chip form of the reference's per-pair process farm."""
    from predict_pv_yield_tpu.ops.optical_flow import flow_sequence_sharded

    im = _smooth_image(size=64, seed=7)
    frames = jnp.stack([_translate(im, 0.5 * t, -0.3 * t) for t in range(9)])
    sharded = flow_sequence_sharded(frames, winsize=15)
    assert sharded.shape == (8, 64, 64, 2)
    assert len(sharded.sharding.device_set) == 8
    unsharded = flow_sequence(frames, winsize=15)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(unsharded), atol=1e-5
    )


def test_weighted_average_flow_matches_numpy():
    """Reference optical_flow_1 cell 22: linear-ramp recency weighting of
    warm-up flows."""
    from predict_pv_yield_tpu.ops.remap import weighted_average_flow

    rng = np.random.default_rng(0)
    flows = rng.standard_normal((5, 8, 8, 2)).astype(np.float32)
    expected = np.average(flows, axis=0, weights=range(1, 6)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(weighted_average_flow(jnp.asarray(flows))), expected, rtol=1e-5
    )


def test_ssim_matches_independent_scipy_formula():
    """Cross-validation of the SSIM port: an independent implementation of
    Wang et al. 2004 with skimage's defaults (uniform window, sample
    covariance, interior mean) built on scipy.ndimage must agree to float
    noise."""
    scipy_ndimage = pytest.importorskip("scipy.ndimage")

    from predict_pv_yield_tpu.ops.ssim import ssim

    def ssim_scipy(im1, im2, data_range, win_size=7, k1=0.01, k2=0.03):
        im1 = im1.astype(np.float64)
        im2 = im2.astype(np.float64)
        n = win_size**2
        cov_norm = n / (n - 1)
        filt = lambda a: scipy_ndimage.uniform_filter(a, win_size)  # noqa: E731
        ux, uy = filt(im1), filt(im2)
        vx = cov_norm * (filt(im1 * im1) - ux * ux)
        vy = cov_norm * (filt(im2 * im2) - uy * uy)
        vxy = cov_norm * (filt(im1 * im2) - ux * uy)
        c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        pad = win_size // 2
        return s[pad:-pad, pad:-pad].mean()

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(48, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    theirs = float(ssim_scipy(a, b, data_range=1.0))
    assert abs(ours - theirs) < 1e-5, (ours, theirs)
