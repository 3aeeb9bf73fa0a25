"""Integrated input-pipeline gate (VERDICT r2 #9): one real ``Trainer.fit``
epoch from on-disk shards, asserting the training loop's measured wait on
the host pipeline is small next to step compute — the host ≥ device
composition argument as an EXECUTED assertion rather than two numbers
composed by hand (PARITY.md measures the halves separately on the dev rig,
where the tunnel hides the end-to-end rate).
"""

import numpy as np
import pytest

from predict_pv_yield_tpu.data.loader import PrefetchingLoader
from predict_pv_yield_tpu.data.shards import ShardDataset, write_shard


@pytest.fixture()
def shard_dir(tmp_path, configuration_conv3d):
    from predict_pv_yield_tpu.data.fake import fake_batch

    for i in range(8):
        rng = np.random.default_rng(i)
        batch = fake_batch(configuration_conv3d, rng)
        # native wire: raw int16 satellite counts, decoded on device
        raw = rng.integers(-1, 1023, size=batch.satellite.data.shape, dtype=np.int16)
        batch = batch.replace(satellite=batch.satellite.replace(data=raw))
        write_shard(str(tmp_path), i, batch, fmt="raw")
    return str(tmp_path)


def test_loader_wait_small_vs_step_time(shard_dir, tmp_cwd):
    from predict_pv_yield_tpu.models.conv3d import Model
    from predict_pv_yield_tpu.training.engine import Trainer

    dataset = ShardDataset(n_batches=8, src_path=shard_dir)
    loader = PrefetchingLoader(
        dataset, num_workers=2, prefetch_factor=4, shuffle=False
    )
    from predict_pv_yield_tpu.utils import load_config

    model_cfg = load_config("tests/configs/model/conv3d.yaml")
    model_cfg.pop("_target_", None)
    model = Model(**model_cfg)
    trainer = Trainer(max_epochs=1, profiler="simple", precision=16)
    metrics = trainer.fit(model, train_dataloaders=loader)
    assert np.isfinite(metrics["NMAE/Train_epoch"])

    totals = trainer.profiler.totals
    assert totals["train_step"] > 0, dict(totals)
    # with a 2-thread prefetching loader over mmap shards, the training loop
    # must spend far less time waiting on the host than computing steps
    assert totals["loader_next"] < 0.5 * totals["train_step"], dict(totals)
