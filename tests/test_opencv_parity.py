"""OpenCV parity gate for the optical-flow stack (SURVEY §7 phase 6).

The reference computes Farnebäck flow and forward warps with OpenCV
(``cv2.calcOpticalFlowFarneback`` with the tuned parameters of notebook 13
cell 7; ``cv2.remap`` in cell 8). These tests hold the TPU-native kernels to
sub-pixel agreement with the real OpenCV implementation on translation,
multi-scale-texture, and small-image fixtures, at the reference's production
parameters.

Measured bounds (documented, asserted with ~3× headroom):

  - flow, 256² band-limited, reference params: 0.0011 px mean / 0.014 px max
    interior error vs cv2 (and 1e-6 px vs ground truth).
  - flow, 128²/64² multi-octave texture: ≤0.0023 px mean / ≤0.0085 px max.
  - remap: ≤1e-4 absolute image error, NaN border masks identical.

Matching cv2 this tightly required three semantic details replicated in
``ops/optical_flow.py``: cv2's levels-counts-downscale-steps pyramid built by
smoothed INTER_LINEAR resizes of the original frame, the out-of-bounds warp
branch of FarnebackUpdateMatrices, and its 5-px border damping ramp
(constants verified against the cv2 binary).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from predict_pv_yield_tpu.ops.optical_flow import farneback_flow, flow_sequence
from predict_pv_yield_tpu.ops.remap import flow_predictions, remap_image

# notebook 13 cell 7 parameters
REFERENCE_PARAMS = dict(
    pyr_scale=0.5, levels=2, winsize=40, iterations=3, poly_n=5, poly_sigma=0.7
)


def _band_limited(size, seed=0, scale=8):
    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((size // scale, size // scale)).astype(np.float32)
    image = jax.image.resize(jnp.asarray(coarse), (size, size), "bicubic")
    return np.asarray(image * 50.0 + 100.0)


def _textured(size, seed=3):
    """Multi-octave texture — energy at wavelengths 4..32 px, like real
    cloud imagery; exercises every pyramid level."""
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size), np.float32)
    for scale in (4, 8, 16, 32):
        coarse = rng.standard_normal((size // scale, size // scale)).astype(np.float32)
        img += np.asarray(jax.image.resize(jnp.asarray(coarse), (size, size), "bicubic")) * scale
    return img * 3.0 + 128.0


def _translate(image, dx, dy):
    """Exact spectral translation (periodic, so borders stay textured)."""
    freq = np.fft.fft2(image)
    h, w = image.shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    shifted = np.fft.ifft2(freq * np.exp(-2j * np.pi * (fy * dy + fx * dx)))
    return np.real(shifted).astype(np.float32)


def _cv_flow(im1, im2, **overrides):
    params = {**REFERENCE_PARAMS, **overrides}
    return cv2.calcOpticalFlowFarneback(
        im1, im2, None, flags=cv2.OPTFLOW_FARNEBACK_GAUSSIAN, **params
    )


def _our_flow(im1, im2, **overrides):
    params = {**REFERENCE_PARAMS, **overrides}
    return np.asarray(
        farneback_flow(jnp.asarray(im1), jnp.asarray(im2), gaussian=True, **params)
    )


@pytest.mark.parametrize(
    "fixture,size,margin,mean_tol,max_tol",
    [
        # margin 2 (just the bilinear edge taps): the OOB-warp b-term and
        # cv2's +1e-3 det regularisation brought the BORDER band to exact
        # parity too (round-3 review; measured ~2e-5 px max at margin 2)
        ("band_limited", 256, 2, 1e-4, 1e-3),
        ("textured", 128, 2, 1e-4, 1e-3),
        ("textured", 64, 2, 1e-4, 1e-3),
    ],
)
def test_farneback_matches_opencv(fixture, size, margin, mean_tol, max_tol):
    im1 = _band_limited(size) if fixture == "band_limited" else _textured(size)
    im2 = _translate(im1, 3.0, -2.0)
    ref = _cv_flow(im1, im2)
    ours = _our_flow(im1, im2)
    diff = np.abs(ours - ref)[margin:-margin, margin:-margin]
    assert diff.mean() < mean_tol, diff.mean()
    assert diff.max() < max_tol, diff.max()


def test_farneback_matches_opencv_across_params():
    """Parameter sweep corners from optical_flow_1.ipynb cells 38-45."""
    im1 = _textured(96, seed=11)
    im2 = _translate(im1, -1.5, 2.5)
    for overrides in (
        dict(winsize=20, iterations=2),
        dict(levels=1, winsize=15),
        dict(levels=3, poly_n=7, poly_sigma=1.5),
    ):
        ref = _cv_flow(im1, im2, **overrides)
        ours = _our_flow(im1, im2, **overrides)
        diff = np.abs(ours - ref)[2:-2, 2:-2]
        assert diff.mean() < 1e-4, (overrides, diff.mean())
        assert diff.max() < 1e-3, (overrides, diff.max())


def _cv_remap(image, flow):
    """The notebook's remap_image: dst(y,x) = src(y−flow_y, x−flow_x) with a
    NaN constant border (notebook 13 cell 8)."""
    h, w = image.shape
    remap = -flow.copy()
    remap[..., 0] += np.arange(w, dtype=np.float32)
    remap[..., 1] += np.arange(h, dtype=np.float32)[:, None]
    return cv2.remap(
        image, remap, None, cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=np.nan,
    )


@pytest.mark.parametrize("kind", ["constant", "varying"])
def test_remap_matches_opencv(kind):
    image = _textured(96, seed=5)
    if kind == "constant":
        flow = np.broadcast_to(
            np.asarray([2.3, -1.7], np.float32), (96, 96, 2)
        ).copy()
    else:
        yy, xx = np.meshgrid(
            np.arange(96, dtype=np.float32), np.arange(96, dtype=np.float32),
            indexing="ij",
        )
        flow = np.stack([2.0 + xx / 96, -1.0 - yy / 96], -1)
    ref = _cv_remap(image, flow)
    ours = np.asarray(remap_image(jnp.asarray(image), jnp.asarray(flow)))
    assert (np.isnan(ref) == np.isnan(ours)).all()
    valid = ~np.isnan(ref)
    assert np.abs(ref - ours)[valid].max() < 1e-3


def test_native_cpp_matches_opencv():
    """The first-party C++ kernel is held to the same cv2 gate."""
    from predict_pv_yield_tpu import native

    try:
        native.load_library()
    except native.NativeUnavailable as exc:  # pragma: no cover
        pytest.skip(f"native library unavailable: {exc}")
    im1 = _textured(128)
    im2 = _translate(im1, 3.0, -2.0)
    ref = _cv_flow(im1, im2)
    params = {k: v for k, v in REFERENCE_PARAMS.items() if k != "pyr_scale"}
    ours = native.farneback_flow_native(im1, im2, **params)
    diff = np.abs(ours - ref)[2:-2, 2:-2]
    assert diff.mean() < 1e-4, diff.mean()
    assert diff.max() < 1e-3, diff.max()


def test_flow_predictions_match_opencv_triangle():
    """The full notebook-13 prediction matrix: n frames → n−1 flows →
    triangular warped predictions, each leg computed with cv2 on one side."""
    base = _textured(64, seed=9)
    frames = np.stack([_translate(base, 1.5 * t, -1.0 * t) for t in range(4)])
    flows = np.asarray(flow_sequence(jnp.asarray(frames), winsize=20))
    # flows themselves match cv2 pair-by-pair
    for i in range(3):
        ref = _cv_flow(frames[i], frames[i + 1], winsize=20)
        diff = np.abs(flows[i] - ref)[2:-2, 2:-2]
        assert diff.max() < 1e-3, (i, diff.max())
    preds = np.asarray(flow_predictions(jnp.asarray(frames), jnp.asarray(flows)))
    for source in range(3):
        for step in range(3 - source):
            ref = _cv_remap(frames[source], flows[source] * (step + 1))
            ours = preds[source, step]
            assert (np.isnan(ref) == np.isnan(ours)).all(), (source, step)
            valid = ~np.isnan(ref)
            assert np.abs(ref - ours)[valid].max() < 0.05, (source, step)
