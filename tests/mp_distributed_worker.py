"""Worker for the two-process distributed test (run via subprocess).

Each process: force a 4-device virtual CPU backend, join the coordinator,
load its host-local half of a deterministic global batch, run ONE sharded
train step through the engine's real multi-host path
(``Trainer._to_device`` → ``global_batch_from_host_local``), and print a
digest of the post-step parameters. The parent asserts both processes agree —
the DDP-equivalence contract of the reference's ``num_nodes``/
``num_processes`` trainer surface (reference ``configs/trainer/
all_params.yaml:8-9``).
"""

import hashlib
import sys


def main() -> None:
    port = sys.argv[1]
    process_id = int(sys.argv[2])
    # devices per process (default 4 = the 8-global-device pytest shape);
    # __graft_entry__.dryrun_multichip passes n_devices//2 here so the
    # driver's MULTICHIP artifact also certifies the multi-process path
    devices_per_proc = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devices_per_proc)
    # persistent compile cache: the parent test (and the driver's dryrun)
    # re-runs this worker with identical programs — warm runs skip the
    # multi-minute CPU compiles (this jax build ignores the env var alone)
    from predict_pv_yield_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    import numpy as np

    from predict_pv_yield_tpu.config.dataset import Configuration
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.models.conv3d_sat_nwp import Model
    from predict_pv_yield_tpu.parallel.distributed import (
        host_local_batch_slice,
        initialize_distributed,
    )
    from predict_pv_yield_tpu.training.engine import Trainer

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == devices_per_proc, jax.local_device_count()
    total_devices = 2 * devices_per_proc
    assert jax.device_count() == total_devices, jax.device_count()

    global_batch_size = total_devices  # one example per device
    configuration = Configuration()
    configuration.process.batch_size = global_batch_size
    configuration.input_data.default_history_minutes = 30
    configuration.input_data.default_forecast_minutes = 60
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = 12
    configuration.input_data.nwp.nwp_image_size_pixels = 12

    # Same seed on both processes → identical global batch; each host keeps
    # only its slice, as a real per-host loader would.
    global_host_batch = fake_batch(configuration, np.random.default_rng(0))
    local_slice = host_local_batch_slice(global_batch_size)
    local_batch = jax.tree.map(lambda x: x[local_slice], global_host_batch)
    assert local_batch.batch_size == global_batch_size // 2

    model = Model(
        forecast_minutes=60,
        history_minutes=30,
        number_of_conv3d_layers=2,
        conv3d_channels=8,
        image_size_pixels=12,
        nwp_image_size_pixels=12,
        number_sat_channels=11,
        number_nwp_channels=10,
        fc1_output_features=16,
        fc2_output_features=16,
        fc3_output_features=16,
        output_variable="gsp_yield",
        include_pv_yield_history=True,
        include_future_satellite=True,
    )

    trainer = Trainer(max_epochs=1, profiler=None)
    trainer.setup(model, local_batch)
    assert trainer.mesh.shape["data"] == total_devices, trainer.mesh

    device_batch = trainer._to_device(local_batch)
    sat = device_batch.satellite.data
    assert sat.shape[0] == global_batch_size, sat.shape
    assert len(sat.sharding.device_set) == total_devices, sat.sharding

    state, metrics = trainer._compiled["train"](trainer.state, device_batch)
    nmae = float(jax.device_get(metrics["NMAE"]))
    assert np.isfinite(nmae), metrics

    # Fused-dispatch path: two batches stacked into a (2, B, ...) pytree,
    # scan axis replicated, batch axis assembled host-locally
    # (global_batch_from_host_local with batch_axis=1).
    trainer.state = state
    trainer.steps_per_execution = 2
    multi = trainer._build_multi_train_step(trainer._model)
    stacked = trainer._to_device_stacked([local_batch, local_batch])
    sat2 = stacked.satellite.data
    assert sat2.shape[:2] == (2, global_batch_size), sat2.shape
    assert len(sat2.sharding.device_set) == total_devices, sat2.sharding
    state, stacked_metrics = multi(trainer.state, stacked)
    scan_nmae = np.asarray(jax.device_get(stacked_metrics["NMAE"]))
    assert scan_nmae.shape == (2,) and np.isfinite(scan_nmae).all()

    # Validation-results path on the multi-host mesh: y_hat comes back
    # globally data-sharded and NOT fully addressable here, so
    # _host_local_array must hand back exactly THIS process's rows for the
    # MW de-normalisation to line up with the host-local capacities.
    trainer.state = state
    _, _, _, y_hat = trainer._compiled["eval"](trainer.state, device_batch)
    local_pred = trainer._host_local_array(y_hat)
    assert local_pred.shape[0] == global_batch_size // 2, local_pred.shape
    assert np.isfinite(local_pred).all()
    df = trainer._validation_results(model, local_batch, y_hat, batch_idx=0)
    expected_rows = (global_batch_size // 2) * model.forecast_len_30
    assert df is not None and len(df) == expected_rows, (len(df), expected_rows)

    # Params are replicated → addressable everywhere; digest must agree.
    leaves = jax.tree_util.tree_leaves(state.params)
    flat = np.concatenate([np.asarray(leaf, np.float32).ravel() for leaf in leaves])
    digest = hashlib.sha256(flat.tobytes()).hexdigest()
    print(f"RESULT process={process_id} digest={digest} nmae={nmae:.6f}", flush=True)


if __name__ == "__main__":
    main()
