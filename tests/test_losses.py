"""Loss semantics, pinned to the reference's published metric ratios
(``experiments/2021-11/2021-11-25.txt:7-17``: MAE_EXP/NMAE = batch_size)."""

import jax.numpy as jnp
import numpy as np

from predict_pv_yield_tpu.losses import WeightedLosses, mse_loss, nmae_loss


def test_weights_normalised():
    wl = WeightedLosses(forecast_length=4)
    np.testing.assert_allclose(float(jnp.sum(wl.weights)), 1.0, rtol=1e-6)
    # strictly decaying
    weights = np.asarray(wl.weights)
    assert (np.diff(weights) < 0).all()


def test_exp_losses_sum_over_batch():
    batch_size, forecast_len = 32, 4
    wl = WeightedLosses(forecast_length=forecast_len)
    output = jnp.ones((batch_size, forecast_len))
    target = jnp.zeros((batch_size, forecast_len))
    # |err| == 1 everywhere -> weighted sum per example = 1 -> batch sum = 32.
    np.testing.assert_allclose(float(wl.get_mae_exp(output, target)), batch_size, rtol=1e-5)
    np.testing.assert_allclose(float(wl.get_mse_exp(output, target)), batch_size, rtol=1e-5)
    # matches the reference ratio MAE_EXP / NMAE = batch_size for uniform error
    assert float(nmae_loss(output, target)) == 1.0


def test_plain_losses():
    output = jnp.array([[1.0, 2.0]])
    target = jnp.array([[0.0, 4.0]])
    np.testing.assert_allclose(float(mse_loss(output, target)), (1 + 4) / 2)
    np.testing.assert_allclose(float(nmae_loss(output, target)), (1 + 2) / 2)
