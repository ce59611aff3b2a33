"""Timer utility tests."""

import time

from tabcorr_tpu.utils.profiling import Timer


def test_timer_collects_phases():
    timer = Timer()
    with timer("phase_a"):
        time.sleep(0.01)
    with timer("phase_a"):
        time.sleep(0.01)
    with timer("phase_b"):
        pass
    assert timer.total("phase_a") >= 0.02
    assert timer.total() >= timer.total("phase_a")
    assert "phase_b" in timer.summary()
