"""Train the optical-flow residual forecaster — notebook 13 as a script.

End-to-end equivalent of the reference's
``13_3d_conv_with_optical_flow_predictions.ipynb`` training loop: a
SatelliteFlowLoader builds super batches (flow + triangular predictions on
device), the in-memory dataset samples 128→64 px crop examples, and the
Conv3d residual forecaster trains with MSE against the true future frame
(Adam lr=1e-4, cell 45), reporting SSIM of model vs flow-only vs persistence
on held-out data (the notebook's evaluation, ``optical_flow_1.ipynb`` cell 35).

    python tools/train_flow_forecaster.py --zarr /path/to/hrv.zarr --steps 500
    python tools/train_flow_forecaster.py --synthetic --steps 50   # no data needed
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_archive(n_days=2, size=192, seed=0):
    """Drifting smooth cloud field, int16, 5-minute cadence."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = n_days * 24 * 12
    datetimes = np.datetime64("2019-05-20T00:00") + np.arange(n) * np.timedelta64(5, "m")
    coarse = rng.integers(0, 900, size=(16, size // 16, size // 16)).astype(np.float32)
    frames = np.empty((n, size, size), dtype=np.int16)
    for i in range(n):
        img = np.asarray(
            jax.image.resize(jnp.asarray(coarse[i % 16]), (size, size), "bilinear")
        )
        frames[i] = np.roll(img.astype(np.int16), shift=(i % 11) - 5, axis=1)
    return frames, datetimes


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--zarr", help="HRV satellite zarr array path")
    parser.add_argument("--zarr-member", default=None, help="array within a zarr group")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument(
        "--arch", default="conv3d",
        help="forecaster architecture: notebook 13 Conv3d (default), "
        "notebook 14 2-D conv AE (conv2d_ae), notebook 16 max-pool AE "
        "(maxpool_ae), or the notebook 12 pre-flow pure-3D-conv control "
        "(pure_conv3d) — validated against FORECASTER_ARCHITECTURES",
    )
    parser.add_argument(
        "--channels", type=int, default=None,
        help="conv width (default: the source notebook's value)",
    )
    parser.add_argument("--n-super-batches", type=int, default=4)
    parser.add_argument("--forecast-timesteps", type=int, default=48)
    parser.add_argument("--crop-large", type=int, default=128)
    parser.add_argument("--crop-small", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from predict_pv_yield_tpu.data.flow_dataset import FlowInMemDataset, SatelliteFlowLoader
    from predict_pv_yield_tpu.models.flow_forecaster import (
        FORECASTER_ARCHITECTURES,
        FORECAST_HORIZON,
        HISTORICAL_SAT_IMAGES,
        OPTICAL_FLOW_PREDICTIONS,
        TARGET_SAT_IMAGE,
    )
    from predict_pv_yield_tpu.ops.ssim import ssim

    if args.synthetic or not args.zarr:
        frames, datetimes = synthetic_archive()
        test_range = (np.datetime64("2019-05-21"), np.datetime64("2019-05-22"))
    else:
        from predict_pv_yield_tpu.data.zarr_reader import open_zarr

        frames = open_zarr(args.zarr, args.zarr_member)
        n = frames.shape[0]
        datetimes = np.datetime64("2019-01-01T00:00") + np.arange(n) * np.timedelta64(5, "m")
        test_range = (np.datetime64("2019-06-01"), np.datetime64("2019-06-14"))

    loader = SatelliteFlowLoader(
        data=frames,
        datetimes=datetimes,
        num_forecast_timesteps=args.forecast_timesteps,
        testing_date_range=test_range,
    )
    dataset = FlowInMemDataset(
        loader,
        n_super_batches=args.n_super_batches,
        n_examples_per_epoch=args.steps * args.batch_size,
        batch_size=args.batch_size,
        crop_large=args.crop_large,
        crop_small=args.crop_small,
    )

    if args.arch not in FORECASTER_ARCHITECTURES:
        parser.error(
            f"--arch {args.arch!r}: choose from "
            f"{sorted(FORECASTER_ARCHITECTURES)}"
        )
    model_cls = FORECASTER_ARCHITECTURES[args.arch]
    model = (
        model_cls() if args.channels is None else model_cls(channels=args.channels)
    )
    batch = next(iter(dataset))
    variables = model.init(jax.random.key(0), batch)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, batch):
        def loss_fn(params):
            prediction = model.apply(params, batch)
            # each notebook variant's stride/padding pyramid emits a slightly
            # different output size; crop_target aligns the label to it
            target = model.crop_target(batch[TARGET_SAT_IMAGE])
            return jnp.mean((prediction - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state2 = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state2, loss

    t0 = time.perf_counter()
    step = 0
    for batch in dataset:
        variables, opt_state, loss = train_step(variables, opt_state, batch)
        step += 1
        if step % 20 == 0:
            print(f"step {step}: mse={float(loss):.5f} "
                  f"({step * args.batch_size / (time.perf_counter() - t0):.1f} ex/s)")
        if step >= args.steps:
            break

    # evaluation: SSIM of model vs flow-only vs persistence on the held-out
    # testing date range (the notebook's BatchType.TESTING split)
    eval_dataset = FlowInMemDataset(
        loader,
        n_super_batches=1,
        n_examples_per_epoch=8 * args.batch_size,
        batch_size=args.batch_size,
        batch_type="testing",
        crop_large=args.crop_large,
        crop_small=args.crop_small,
        background_refresh=False,
        seed=1,
    )
    border = (args.crop_large - args.crop_small) // 2
    scores = {"model": [], "flow": [], "persistence": []}
    for _ in range(8):
        batch = next(iter(eval_dataset))
        prediction = np.asarray(model.apply(variables, batch))
        centre = (slice(None), slice(border, -border), slice(border, -border))
        # all three methods are scored on the model's own output footprint
        target = np.asarray(model.crop_target(batch[TARGET_SAT_IMAGE]))
        flow_pred = np.asarray(
            model.crop_target(batch[OPTICAL_FLOW_PREDICTIONS][centre])
        )
        persistence = np.asarray(
            model.crop_target(batch[HISTORICAL_SAT_IMAGES][:, -1][centre])
        )
        for i in range(len(target)):
            # One data_range per example, from the TARGET, shared by all
            # three methods — inferring it per call would give each method
            # different C1/C2 stabilisers (a method with wider-ranged
            # predictions would score an inflated SSIM).
            span = float(np.nanmax(target[i]) - np.nanmin(target[i])) or 1.0
            scores["model"].append(
                float(ssim(prediction[i], target[i], data_range=span))
            )
            scores["flow"].append(
                float(ssim(flow_pred[i], target[i], data_range=span))
            )
            scores["persistence"].append(
                float(ssim(persistence[i], target[i], data_range=span))
            )
    for name, values in scores.items():
        print(f"SSIM {name}: {np.mean(values):.4f}")


if __name__ == "__main__":
    main()
