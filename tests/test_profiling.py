"""StepProfiler — the host-side phase clock behind every wallclock.json."""

import time

from stylemesh_tpu.utils.profiling import StepProfiler, annotate


def test_step_profiler_accumulates_phases():
    prof = StepProfiler()
    for _ in range(3):
        with prof.phase("work"):
            time.sleep(0.01)
    with prof.phase("other"):
        pass
    s = prof.summary()
    assert set(s) == {"work", "other"}
    assert s["work"]["total_s"] >= 0.03
    assert abs(s["work"]["mean_ms"] - 1000 * s["work"]["total_s"] / 3) < 1.0
    assert s["other"]["total_s"] >= 0.0


def test_step_profiler_counts_exceptions():
    prof = StepProfiler()
    try:
        with prof.phase("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert prof.counts["boom"] == 1  # timing recorded despite the raise


def test_annotate_is_usable_as_context():
    with annotate("unit-test-phase"):
        pass
