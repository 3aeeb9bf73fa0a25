"""Pallas blur kernel vs XLA reference path.

The production flow path uses the XLA convs unconditionally (the Pallas
kernel is a documented negative result — ops/pallas_blur.py docstring);
the kernel body itself stays correct under the pallas interpreter here.
"""

import jax
import numpy as np
import pytest

from predict_pv_yield_tpu.ops.optical_flow import _gaussian_kernel
from predict_pv_yield_tpu.ops.pallas_blur import _band_matrix, _sep_blur_xla, sep_blur


def test_band_matrix_is_correlation():
    kernel = np.array([1.0, 2.0, 3.0], np.float32)
    band = _band_matrix(kernel, out_size=4)
    x = np.arange(6, dtype=np.float32)  # padded input, radius 1
    out = x @ band
    expected = [
        x[0] * 1 + x[1] * 2 + x[2] * 3,
        x[1] * 1 + x[2] * 2 + x[3] * 3,
        x[2] * 1 + x[3] * 2 + x[4] * 3,
        x[3] * 1 + x[4] * 2 + x[5] * 3,
    ]
    np.testing.assert_allclose(out, expected)


def test_sep_blur_matches_xla_path():
    rng = np.random.default_rng(0)
    fields = rng.standard_normal((5, 96, 96)).astype(np.float32)
    kernel = _gaussian_kernel(20, 6.0)
    reference = np.asarray(_sep_blur_xla(fields, kernel))
    out = np.asarray(sep_blur(fields, kernel))
    np.testing.assert_allclose(out, reference, atol=1e-4)


def test_sep_blur_kernel_body_interpreted():
    """Run the actual pallas kernel via the interpreter on CPU."""
    import functools
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from predict_pv_yield_tpu.ops import pallas_blur as pb

    rng = np.random.default_rng(1)
    fields = rng.standard_normal((3, 64, 64)).astype(np.float32)
    kernel = _gaussian_kernel(8, 3.0)
    radius = len(kernel) // 2
    tile = 64
    grid_h = 1

    padded = np.pad(fields, ((0, 0), (radius, radius), (radius, radius)), mode="edge")
    rows_needed = (grid_h + 1) * tile
    padded = np.pad(padded, ((0, 0), (0, rows_needed - padded.shape[1]), (0, 0)))
    band_x = pb._band_matrix(kernel, 64)
    band_y = pb._band_matrix(kernel, tile).T

    block = (3, tile, padded.shape[2])
    out = pl.pallas_call(
        functools.partial(pb._blur_kernel, tile=tile, radius=radius),
        grid=(grid_h,),
        in_specs=[
            pl.BlockSpec(block, lambda i: (0, i, 0)),
            pl.BlockSpec(block, lambda i: (0, i + 1, 0)),
            pl.BlockSpec(band_x.shape, lambda i: (0, 0)),
            pl.BlockSpec(band_y.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3, tile, 64), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, grid_h * tile, 64), jnp.float32),
        interpret=True,
    )(jnp.asarray(padded), jnp.asarray(padded), jnp.asarray(band_x), jnp.asarray(band_y))

    reference = np.asarray(_sep_blur_xla(jnp.asarray(fields), kernel))
    np.testing.assert_allclose(np.asarray(out)[:, :64], reference, atol=1e-4)
