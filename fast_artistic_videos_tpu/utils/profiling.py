"""Tracing and timing — first-class replacements for the reference's
os.clock() prints (fast_artistic_video_core.lua:122,154-177; SURVEY.md §5
"Tracing / profiling").

  * StageTimer — running per-stage wall-clock stats for the host loop
    (load / flow / stylize / save), printed as a table.
  * device_trace — context manager around jax.profiler for XLA traces
    (viewable in TensorBoard / Perfetto), gated so it degrades to a no-op
    where the profiler is unsupported (e.g. tunneled backends).
  * device_sync — portable completion barrier: block_until_ready is a no-op
    on some transports, so a scalar readback is used.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Force completion of everything producing `x`; returns a checksum."""
    return float(jnp.sum(x))


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.totals[name] += time.monotonic() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'stage':<16} {'total s':>9} {'count':>7} {'ms/call':>9}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<16} {t:9.2f} {n:7d} {1000*t/max(n,1):9.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace if a log_dir is given and the backend supports it."""
    if not log_dir:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # tunneled/experimental backends may refuse
        print(f"profiler unavailable ({e}); continuing without trace")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
