"""Sequence-length arithmetic parity (reference ``base_model.py:41-74``)."""

from predict_pv_yield_tpu.seqlen import SeqLens


def test_basic_lens():
    lens = SeqLens(history_minutes=30, forecast_minutes=120)
    assert lens.history_len_5 == 6
    assert lens.forecast_len_5 == 24
    assert lens.history_len_30 == 1
    assert lens.forecast_len_30 == 4
    assert lens.history_len_60 == 1  # ceil(30/60)
    assert lens.forecast_len_60 == 2
    assert lens.seq_len_5 == 31
    assert lens.seq_len_60 == 4


def test_ceil_quirk():
    # 60-minute history length uses ceil (reference base_model.py:57).
    assert SeqLens(30, 60).history_len_60 == 1
    assert SeqLens(60, 60).history_len_60 == 1
    assert SeqLens(90, 60).history_len_60 == 2
    # ... while the forecast length uses floor.
    assert SeqLens(30, 90).forecast_len_60 == 1


def test_target_lens():
    lens = SeqLens(60, 30)
    assert lens.target_lens("pv_yield") == (12, 6, 128)
    assert lens.target_lens("gsp_yield") == (2, 1, 32)
