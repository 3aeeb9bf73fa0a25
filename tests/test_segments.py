"""Contiguous-segment sampling (reference notebook 28 cells 75/79/92).

The zarr-chunk-sequence test reproduces the notebook's own ASCII diagram
(cell 79 docstring) exactly, translated onto a datetime axis.
"""

import numpy as np
import pytest

from predict_pv_yield_tpu.data.segments import (
    Segment,
    get_contiguous_segments,
    get_random_segments,
    get_zarr_chunk_sequences,
    select_nwp_init_times,
)


def _dt(minutes):
    return np.datetime64("2020-01-01T00:00") + np.timedelta64(int(minutes), "m")


FIVE_MIN = np.timedelta64(5, "m")


def _index(start_min, end_min, step=5):
    return np.array([_dt(m) for m in range(start_min, end_min + 1, step)])


class TestGetContiguousSegments:
    def test_single_run(self):
        idx = _index(0, 60)
        segs = get_contiguous_segments(idx, min_timesteps=2, max_gap=FIVE_MIN)
        assert segs == [Segment(_dt(0), _dt(60))]

    def test_gap_splits_and_short_run_dropped(self):
        # 12:00,12:05 | gap | 18:00..18:30 — the notebook's own example shape
        idx = np.concatenate([_index(0, 5), _index(360, 390)])
        segs = get_contiguous_segments(idx, min_timesteps=3, max_gap=FIVE_MIN)
        # first run has 2 timesteps < min_timesteps=3 → discarded
        assert segs == [Segment(_dt(360), _dt(390))]
        # with min_timesteps=2 both survive, ends inclusive
        segs = get_contiguous_segments(idx, min_timesteps=2, max_gap=FIVE_MIN)
        assert segs == [Segment(_dt(0), _dt(5)), Segment(_dt(360), _dt(390))]

    def test_empty_index(self):
        assert get_contiguous_segments([], 1, FIVE_MIN) == []

    def test_accepts_plain_python_datetimes_via_cast(self):
        idx = _index(0, 20).astype("datetime64[s]")
        segs = get_contiguous_segments(idx, 2, FIVE_MIN)
        assert len(segs) == 1


class TestGetZarrChunkSequences:
    def test_notebook_ascii_diagram(self):
        """Cell 79's worked example: chunk size 5, n=3, segment [3, 32]."""
        boundaries = [_dt(m) for m in range(0, 36, 5)]  # 0,5,...,35
        segment = Segment(_dt(3), _dt(32))
        seqs = get_zarr_chunk_sequences(3, boundaries, [segment])
        expected = [
            Segment(_dt(3), _dt(15)),
            Segment(_dt(5), _dt(20)),
            Segment(_dt(10), _dt(25)),
            Segment(_dt(15), _dt(30)),
            Segment(_dt(20), _dt(32)),
        ]
        assert seqs == expected

    def test_segment_start_on_boundary(self):
        boundaries = [_dt(m) for m in range(0, 36, 5)]
        seqs = get_zarr_chunk_sequences(3, boundaries, [Segment(_dt(5), _dt(20))])
        assert seqs == [Segment(_dt(5), _dt(20))]

    def test_short_segment_single_sequence(self):
        boundaries = [_dt(m) for m in range(0, 36, 5)]
        seqs = get_zarr_chunk_sequences(3, boundaries, [Segment(_dt(6), _dt(9))])
        assert seqs == [Segment(_dt(6), _dt(9))]

    def test_rejects_nonpositive_n(self):
        with pytest.raises(ValueError):
            get_zarr_chunk_sequences(0, [_dt(0)], [])

    def test_unbracketed_segment_raises(self):
        """Boundaries must include the archive END boundary — the notebook
        IndexErrors (past the end) or silently wraps (before the start);
        the native contract raises."""
        boundaries = [_dt(m) for m in range(0, 36, 5)]  # last = 35
        with pytest.raises(ValueError, match="not bracketed"):
            get_zarr_chunk_sequences(3, boundaries, [Segment(_dt(3), _dt(40))])
        with pytest.raises(ValueError, match="not bracketed"):
            get_zarr_chunk_sequences(3, boundaries, [Segment(_dt(-7), _dt(20))])

    def test_segment_ending_on_last_boundary(self):
        boundaries = [_dt(m) for m in range(0, 16, 5)]  # 0,5,10,15
        seqs = get_zarr_chunk_sequences(2, boundaries, [Segment(_dt(0), _dt(15))])
        assert seqs == [
            Segment(_dt(0), _dt(10)),
            Segment(_dt(5), _dt(15)),
        ]

    def test_degenerate_segment_at_last_boundary(self):
        boundaries = [_dt(m) for m in range(0, 16, 5)]
        seqs = get_zarr_chunk_sequences(2, boundaries, [Segment(_dt(15), _dt(15))])
        assert seqs == [Segment(_dt(15), _dt(15))]


class TestGetRandomSegments:
    def test_windows_lie_inside_sources_on_grid(self):
        sources = [Segment(_dt(0), _dt(120)), Segment(_dt(600), _dt(900))]
        rng = np.random.default_rng(0)
        duration = np.timedelta64(30, "m")
        out = get_random_segments(sources, duration, 200, rng=rng)
        assert len(out) == 200
        for seg in out:
            assert seg.end - seg.start == duration
            inside = any(
                seg.start >= s.start and seg.end <= s.end for s in sources
            )
            assert inside
            # grid-aligned start relative to its source segment
            src = next(s for s in sources if seg.start >= s.start and seg.end <= s.end)
            assert (seg.start - src.start) % FIVE_MIN == np.timedelta64(0, "m")

    def test_sampling_proportional_to_duration(self):
        short = Segment(_dt(0), _dt(60))      # 1 h
        long = Segment(_dt(600), _dt(1320))   # 12 h
        rng = np.random.default_rng(1)
        out = get_random_segments([short, long], np.timedelta64(30, "m"), 500, rng=rng)
        n_long = sum(1 for seg in out if seg.start >= long.start)
        # expected fraction 12/13 ≈ 0.92; binomial noise at n=500 is ~±0.04
        assert n_long / 500 > 0.85

    def test_too_short_sources_masked_not_crashed(self):
        tiny = Segment(_dt(0), _dt(10))
        ok = Segment(_dt(100), _dt(400))
        out = get_random_segments(
            [tiny, ok], np.timedelta64(60, "m"), 50, rng=np.random.default_rng(2)
        )
        assert all(seg.start >= ok.start for seg in out)

    def test_all_sources_too_short_raises(self):
        with pytest.raises(ValueError):
            get_random_segments(
                [Segment(_dt(0), _dt(10))], np.timedelta64(60, "m"), 1
            )

    def test_exact_length_source_usable(self):
        """A source exactly ``duration`` long is sampleable (the notebook's
        exclusive rng.choice would crash here — divergence under test)."""
        src = Segment(_dt(0), _dt(30))
        out = get_random_segments(
            [src], np.timedelta64(30, "m"), 5, rng=np.random.default_rng(3)
        )
        assert all(seg == src for seg in out)

    def test_empty_sources_raises(self):
        with pytest.raises(ValueError):
            get_random_segments([], np.timedelta64(5, "m"), 1)


def _h(hours):
    return np.datetime64("2020-06-01T00:00") + np.timedelta64(int(hours * 60), "m")


class TestSelectNwpInitTimes:
    """Notebook 28 cell 85: freshest NWP run per history step, frozen at t0."""

    def test_history_ffill_future_frozen(self):
        # 3-hourly NWP runs at 00/03/06/09; example window 01:10–07:40, t0 04:20
        init_times = [_h(0), _h(3), _h(6), _h(9)]
        targets, chosen, steps = select_nwp_init_times(
            init_times, start=_h(1) + np.timedelta64(10, "m"),
            end=_h(7) + np.timedelta64(40, "m"), t0=_h(4) + np.timedelta64(20, "m"),
        )
        # hourly grid: floor(01:10)=01:00 .. ceil(07:40)=08:00
        assert list(targets) == [_h(h) for h in range(1, 9)]
        # history (targets <= ceil(t0)=05:00): freshest run per target;
        # future (06:00..08:00): frozen at the 05:00 choice (init 03:00) —
        # NOT the 06:00 run, which postdates "now"
        assert list(chosen) == [
            _h(0), _h(0),            # 01:00, 02:00 ← run 00
            _h(3), _h(3), _h(3),     # 03:00–05:00 ← run 03
            _h(3), _h(3), _h(3),     # 06:00–08:00 frozen at run 03
        ]
        assert list(steps) == [
            np.timedelta64(h, "h") for h in [1, 2, 0, 1, 2, 3, 4, 5]
        ]

    def test_on_the_hour_t0_and_start(self):
        init_times = [_h(0), _h(6)]
        targets, chosen, steps = select_nwp_init_times(
            init_times, start=_h(0), end=_h(2), t0=_h(1)
        )
        assert list(targets) == [_h(0), _h(1), _h(2)]
        assert list(chosen) == [_h(0)] * 3
        assert steps[0] == np.timedelta64(0, "h")

    def test_future_may_reuse_exact_t0_run(self):
        """A run initialised exactly at ceil(t0) IS available (ffill is <=)."""
        init_times = [_h(0), _h(4)]
        _, chosen, _ = select_nwp_init_times(
            init_times, start=_h(3), end=_h(6), t0=_h(3) + np.timedelta64(30, "m")
        )
        # ceil(t0)=04:00 picks the 04:00 run; future frozen to it
        assert list(chosen) == [_h(0), _h(4), _h(4), _h(4)]

    def test_future_leak_quirk_is_faithful(self):
        """The notebook freezes on ceil(t0), NOT t0: with hourly runs and
        t0 04:20, the future uses the 05:00 run — initialised 40 minutes
        after 'now'. Replicated faithfully (cell 85); this test pins it."""
        init_times = [_h(h) for h in range(0, 10)]  # hourly runs
        _, chosen, _ = select_nwp_init_times(
            init_times, start=_h(3), end=_h(8), t0=_h(4) + np.timedelta64(20, "m")
        )
        # ceil(t0)=05:00 → ffill picks the 05:00 run; future frozen on it
        assert list(chosen) == [_h(3), _h(4), _h(5), _h(5), _h(5), _h(5)]

    def test_uncovered_start_raises(self):
        with pytest.raises(ValueError):
            select_nwp_init_times([_h(5)], start=_h(1), end=_h(6), t0=_h(2))

    def test_t0_outside_window_raises(self):
        with pytest.raises(ValueError):
            select_nwp_init_times([_h(0)], start=_h(1), end=_h(2), t0=_h(3))
