"""Cross-validation: C++ host kernels vs the JAX/XLA kernels.

Two independent implementations of the same algorithm (one C++, one jnp)
must agree on random smooth inputs; both are additionally held to OpenCV
itself in tests/test_opencv_parity.py (cv2 is importable in this image)."""

import numpy as np
import pytest

from predict_pv_yield_tpu import native


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except native.NativeUnavailable as exc:  # pragma: no cover
        pytest.skip(f"native library unavailable: {exc}")


def _smooth(size=80, seed=0):
    import jax.numpy as jnp
    import jax

    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((size // 8, size // 8)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(coarse), (size, size), "bicubic")) * 40 + 120


def _translate(image, dx, dy):
    import jax.numpy as jnp

    freq = jnp.fft.fft2(image)
    h, w = image.shape
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.fftfreq(w)[None, :]
    return np.asarray(
        jnp.real(jnp.fft.ifft2(freq * jnp.exp(-2j * jnp.pi * (fy * dy + fx * dx))))
    ).astype(np.float32)


def test_native_recovers_translation(lib):
    im1 = _smooth(seed=1)
    im2 = _translate(im1, 2.5, -1.5)
    flow = native.farneback_flow_native(im1, im2, winsize=15)
    interior = flow[20:-20, 20:-20]
    assert np.median(np.abs(interior[..., 0] - 2.5)) < 0.4
    assert np.median(np.abs(interior[..., 1] + 1.5)) < 0.4


def test_native_matches_jax(lib):
    from predict_pv_yield_tpu.ops.optical_flow import farneback_flow

    im1 = _smooth(seed=2)
    im2 = _translate(im1, 1.5, 2.0)
    flow_cpp = native.farneback_flow_native(im1, im2, winsize=15)
    flow_jax = np.asarray(farneback_flow(im1, im2, winsize=15))
    interior = (slice(20, -20), slice(20, -20))
    diff = np.abs(flow_cpp[interior] - flow_jax[interior])
    # independent implementations of the same math: sub-0.1px agreement
    assert np.median(diff) < 0.1, np.median(diff)
    assert np.percentile(diff, 95) < 0.5


def test_native_remap_matches_jax(lib):
    from predict_pv_yield_tpu.ops.remap import remap_image as remap_jax

    im = _smooth(seed=3)
    flow = np.stack(
        [np.full_like(im, 2.0), np.full_like(im, -3.0)], axis=-1
    ).astype(np.float32)
    out_cpp = native.remap_image_native(im, flow)
    out_jax = np.asarray(remap_jax(im, flow))
    np.testing.assert_array_equal(np.isnan(out_cpp), np.isnan(out_jax))
    valid = ~np.isnan(out_cpp)
    np.testing.assert_allclose(out_cpp[valid], out_jax[valid], atol=1e-4)


def test_native_sequence(lib):
    im = _smooth(seed=4, size=48)
    frames = np.stack([_translate(im, i * 1.0, 0.0) for i in range(4)])
    flows = native.flow_sequence_native(frames, winsize=15)
    assert flows.shape == (3, 48, 48, 2)
    med = np.median(flows[:, 12:-12, 12:-12, 0], axis=(1, 2))
    np.testing.assert_allclose(med, 1.0, atol=0.4)
