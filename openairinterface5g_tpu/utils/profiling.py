"""Per-stage timing + device profiling (time_meas / T-tracer analog).

The reference wraps every PHY stage in rdtsc counters
(common/utils/time_meas.h:96 start_meas/stop_meas, printed by
dump_L1_meas_stats) and streams events to the T tracer shm ring.  Here:

  - Meas/MeasGroup: wall-clock accumulators with the same
    count/mean/max reporting format (print_meas analog).  For device
    work they optionally block_until_ready so the measured span covers
    execution, not dispatch.
  - trace(name): jax.profiler.TraceAnnotation context so stages show up
    named in TensorBoard/Perfetto device traces (T-tracer analog).
  - profile_to(dir): capture a full device trace around a code block.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Meas:
    name: str
    count: int = 0
    total: float = 0.0
    max: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._t0
        self.count += 1
        self.total += dt
        self.max = max(self.max, dt)
        return dt

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class MeasGroup:
    """Named stage timers; print_meas-style report."""

    def __init__(self):
        self._meas: dict[str, Meas] = {}

    def __getitem__(self, name: str) -> Meas:
        if name not in self._meas:
            self._meas[name] = Meas(name)
        return self._meas[name]

    @contextlib.contextmanager
    def measure(self, name: str, sync_result=None):
        m = self[name]
        m.start()
        box = {}
        try:
            yield box
        finally:
            m.stop(box.get("sync", sync_result))

    def report(self) -> str:
        lines = [f"{'stage':<32}{'count':>8}{'mean us':>12}{'max us':>12}{'total ms':>12}"]
        for m in sorted(self._meas.values(), key=lambda x: -x.total):
            lines.append(
                f"{m.name:<32}{m.count:>8}{m.mean*1e6:>12.1f}{m.max*1e6:>12.1f}{m.total*1e3:>12.2f}")
        return "\n".join(lines)


def trace(name: str):
    """Named device-trace annotation (shows in captured profiles)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a device trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
