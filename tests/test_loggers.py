"""Logger backends: CSV layout and the first-party tfevents wire format."""

import csv
import os
import struct

import pytest

from predict_pv_yield_tpu.training.loggers import CSVLogger, JSONLLogger, TensorBoardLogger
from predict_pv_yield_tpu.training.tfevents import _masked_crc


def test_csv_logger(tmp_path):
    logger = CSVLogger(save_dir=str(tmp_path))
    logger.log_hyperparams({"lr": 5e-4})
    logger.log_metrics({"NMAE/Train": 0.1}, step=0)
    logger.log_metrics({"NMAE/Train": 0.05, "MSE/Train": 0.01}, step=1)
    logger.finalize()
    with open(os.path.join(logger.log_dir, "metrics.csv")) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2
    assert rows[1]["MSE/Train"] == "0.01"
    assert os.path.exists(os.path.join(logger.log_dir, "hparams.json"))


def test_jsonl_logger(tmp_path):
    logger = JSONLLogger(save_dir=str(tmp_path))
    logger.log_metrics({"a": 1.0}, step=0)
    logger.finalize()
    assert os.path.exists(os.path.join(logger.log_dir, "metrics.jsonl"))


def test_tfevents_records_wellformed(tmp_path):
    logger = TensorBoardLogger(save_dir=str(tmp_path))
    logger.log_metrics({"NMAE/Train": 0.5}, step=3)
    logger.finalize()
    files = [
        f
        for f in os.listdir(logger.log_dir)
        if f.startswith("events.out.tfevents")
    ]
    assert len(files) == 1
    with open(os.path.join(logger.log_dir, files[0]), "rb") as fh:
        data = fh.read()
    # walk the TFRecord framing and verify lengths + masked crc32c checksums
    offset, records = 0, 0
    while offset < len(data):
        header = data[offset : offset + 8]
        (length,) = struct.unpack("<Q", header)
        (len_crc,) = struct.unpack("<I", data[offset + 8 : offset + 12])
        assert len_crc == _masked_crc(header)
        payload = data[offset + 12 : offset + 12 + length]
        (payload_crc,) = struct.unpack(
            "<I", data[offset + 12 + length : offset + 16 + length]
        )
        assert payload_crc == _masked_crc(payload)
        offset += 16 + length
        records += 1
    assert records == 2  # file_version event + one scalar
    assert b"NMAE/Train" in data


def test_tfevents_readable_by_tensorflow(tmp_path):
    """Cross-validation against the real consumer: TensorFlow's event reader
    (present in this image) must parse the first-party writer's file and
    recover every scalar exactly — stronger than the self-validating CRC
    framing check above."""
    tf = pytest.importorskip("tensorflow")

    from predict_pv_yield_tpu.training.loggers import TensorBoardLogger

    logger = TensorBoardLogger(save_dir=str(tmp_path))
    logger.log_metrics({"NMAE/Train": 0.125, "MSE/Train": 0.5}, step=3)
    logger.log_metrics({"NMAE/Train": 0.0625}, step=4)
    logger.finalize()

    event_files = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path)
        for f in files
        if f.startswith("events.out.tfevents")
    ]
    assert event_files, list(os.walk(tmp_path))

    seen = {}
    for path in event_files:
        for record in tf.compat.v1.train.summary_iterator(path):
            for value in record.summary.value:
                seen[(value.tag, record.step)] = value.simple_value
    assert seen[("NMAE/Train", 3)] == 0.125
    assert seen[("MSE/Train", 3)] == 0.5
    assert seen[("NMAE/Train", 4)] == 0.0625
