"""Tracing / profiling utilities (reference aux subsystem, SURVEY.md 5.1).

The reference only prints coarse time.time() deltas at stage ends
(run_experiments.py:120-121 etc.).  Here timing is first-class:
- StageTimer: hierarchical wall-clock stage timing with a report table;
- trace(): context manager around jax.profiler for device-level traces
  (XPlane dumps viewable in TensorBoard/Perfetto);
- device_sync(): block until all dispatched device work completes so
  timings measure compute, not dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional, Tuple


def device_sync() -> None:
    """Barrier on EVERY addressable device — a single default-device sync
    under-measures mesh stages (devices 1..N-1 may still be executing and
    their time would bleed into the next stage)."""
    import jax
    jax.block_until_ready([
        jax.device_put(0.0, d) + 0 for d in jax.local_devices()])


class StageTimer:
    """Accumulating named stage timer.

    with timer.stage("decode"): ...
    print(timer.report())
    """

    def __init__(self, sync_device: bool = False):
        self._acc: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        self._order: List[str] = []
        self._sync = sync_device

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        if self._sync:
            device_sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync:
                device_sync()
            dt = time.perf_counter() - t0
            if name not in self._acc:
                self._acc[name] = 0.0
                self._counts[name] = 0
                self._order.append(name)
            self._acc[name] += dt
            self._counts[name] += 1

    def totals(self) -> Dict[str, float]:
        return dict(self._acc)

    def report(self) -> str:
        total = sum(self._acc.values()) or 1.0
        lines = [f"{'stage':<24}{'total_s':>10}{'calls':>8}{'pct':>7}"]
        for name in self._order:
            t = self._acc[name]
            lines.append(f"{name:<24}{t:>10.3f}{self._counts[name]:>8}"
                         f"{100 * t / total:>6.1f}%")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile trace for this block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        device_sync()
        jax.profiler.stop_trace()
