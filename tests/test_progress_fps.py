"""Windowed-FPS progress formatter (reference issue #610 PR-A).

Parity target: reference tests/inference/test_issue_610.py — the progress
rate is computed over a trailing (time, frames) window so it is
batch-size-invariant and reflects CURRENT throughput — against
sleap_nn_tpu/cli.py ``make_rolling_fps`` with an injected clock.
"""

import pytest

from sleap_nn_tpu.cli import make_rolling_fps


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_empty_then_single_sample_blank():
    clock = FakeClock()
    fps = make_rolling_fps(clock=clock)
    assert fps(0) == ""  # one sample: no rate yet


def test_two_samples_compute_rate():
    clock = FakeClock()
    fps = make_rolling_fps(clock=clock)
    fps(0)
    clock.t = 2.0
    assert fps(50) == "25.0 fps"


def test_zero_time_delta_stays_blank():
    clock = FakeClock()
    fps = make_rolling_fps(clock=clock)
    fps(0)
    assert fps(100) == ""  # same timestamp: no division by zero


def test_batch_size_invariance():
    """The same frame throughput reports the same rate regardless of how
    many frames arrive per callback."""
    def run(batch):
        clock = FakeClock()
        fps = make_rolling_fps(clock=clock)
        out = ""
        for i in range(0, 120 + batch, batch):
            clock.t = i / 30.0  # 30 frames/sec wall pace
            out = fps(i)
        return out

    assert run(4) == run(24) == "30.0 fps"


def test_window_tracks_current_rate_not_lifetime_mean():
    clock = FakeClock()
    fps = make_rolling_fps(window=4, clock=clock)
    # Slow phase: 1 frame/sec.
    for i in range(6):
        clock.t = float(i)
        fps(i)
    # Fast phase: 100 frames/sec for enough samples to flush the window.
    n = 5
    for k in range(1, 5):
        clock.t = 5.0 + k * 0.01
        n = 5 + k
        out = fps(n)
    # Window holds only fast-phase samples -> ~100 fps, nowhere near the
    # lifetime mean (~2 fps).
    assert float(out.split()[0]) == pytest.approx(100.0, rel=0.05)


def test_window_cap_respected():
    clock = FakeClock()
    fps = make_rolling_fps(window=2, clock=clock)
    clock.t = 0.0
    fps(0)
    clock.t = 1.0
    fps(10)
    clock.t = 2.0
    # Window of 2: rate uses only the last two samples (10 fps), ignoring
    # the origin sample.
    assert fps(20) == "10.0 fps"


def test_non_monotonic_counts_report_negative_rate():
    """A provider restart (count reset) shows up rather than crashing."""
    clock = FakeClock()
    fps = make_rolling_fps(window=2, clock=clock)
    clock.t = 0.0
    fps(100)
    clock.t = 1.0
    assert fps(40) == "-60.0 fps"


def test_default_clock_is_wall_time():
    fps = make_rolling_fps()
    fps(0)
    assert isinstance(fps(10), str)
