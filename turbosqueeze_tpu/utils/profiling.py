"""Observability: wall-clock throughput timers and device trace capture.

The upstream reference has no tracing (its only timing is `clock()` CPU-time
in the sample CLI, with unit-suspect MB/s math — SURVEY.md §5/§6). Here:
wall-clock section timers with byte-throughput accounting, plus optional
`jax.profiler` trace capture around device sections.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class Section:
    name: str
    seconds: float = 0.0
    bytes: int = 0
    calls: int = 0

    @property
    def mbps(self) -> float:
        return self.bytes / 1e6 / self.seconds if self.seconds else 0.0


@dataclass
class Profiler:
    """Accumulating section timers.

    >>> prof = Profiler()
    >>> with prof.section("decode", nbytes=len(data)):
    ...     out = decompress(data)
    >>> prof.report()
    """

    sections: Dict[str, Section] = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str, nbytes: int = 0) -> Iterator[Section]:
        s = self.sections.setdefault(name, Section(name))
        t0 = time.perf_counter()
        try:
            yield s
        finally:
            s.seconds += time.perf_counter() - t0
            s.bytes += nbytes
            s.calls += 1

    def report(self) -> str:
        lines = []
        for s in self.sections.values():
            rate = f"{s.mbps:,.0f} MB/s" if s.bytes else ""
            lines.append(f"{s.name:<24} {s.seconds * 1e3:9.1f} ms "
                         f"x{s.calls:<4} {rate}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace around a device section (TensorBoard
    format). No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(nbytes: int, fn, *args, reps: int = 3, warmup: int = 1,
               sync=None):
    """Measure fn(*args) wall-clock throughput in MB/s.

    `sync` forces device completion (e.g. jax.block_until_ready); pass
    None for host-side functions.
    """
    for _ in range(warmup):
        r = fn(*args)
        if sync:
            sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        if sync:
            sync(r)
    dt = (time.perf_counter() - t0) / reps
    return nbytes / 1e6 / dt, r
