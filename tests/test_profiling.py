"""Observability utilities."""

import time

from turbosqueeze_tpu.utils.profiling import Profiler, throughput


def test_profiler_sections():
    prof = Profiler()
    with prof.section("work", nbytes=1_000_000):
        time.sleep(0.01)
    with prof.section("work", nbytes=1_000_000):
        time.sleep(0.01)
    s = prof.sections["work"]
    assert s.calls == 2 and s.bytes == 2_000_000
    assert s.seconds >= 0.02
    assert "work" in prof.report() and "MB/s" in prof.report()


def test_throughput():
    rate, result = throughput(10_000_000, lambda: sum(range(1000)))
    assert result == sum(range(1000))
    assert rate > 0
