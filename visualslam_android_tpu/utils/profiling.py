"""Per-stage timing and XLA trace capture.

The reference has NO tracing/profiling subsystem — only commented-out
printf remnants (SURVEY.md §5: jni/Tracker.cc:144, jni/Bundle.cc:9 ccout).
This module is the capability the build plan adds instead: lightweight
wall-clock stage timers that understand JAX's async dispatch (a stage is
only "done" when its outputs are block_until_ready'd), plus a context
manager around jax.profiler for full XLA traces viewable in
TensorBoard/Perfetto.

Usage:
    timer = StageTimer()
    with timer.stage("track"):
        out = track_map(...)
        timer.sync(out)          # block on device completion
    print(timer.report())
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulates wall-clock samples per named stage."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield self
            return
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.samples.setdefault(name, []).append(
                time.perf_counter() - t0
            )

    def sync(self, *outputs):
        """Block until device work producing `outputs` is done, so the
        enclosing stage() measures compute, not dispatch. No-op while
        disabled — a block_until_ready per stage would serialize the
        frame loop against device (or remote-tunnel) latency for no
        benefit when nothing is being timed."""
        if not self.enabled:
            return
        import jax

        for out in outputs:
            jax.block_until_ready(out)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            xs_s = sorted(xs)
            n = len(xs_s)
            out[name] = {
                "count": n,
                "total_s": sum(xs_s),
                "mean_ms": 1e3 * sum(xs_s) / n,
                "p50_ms": 1e3 * xs_s[n // 2],
                "max_ms": 1e3 * xs_s[-1],
            }
        return out

    def report(self) -> str:
        rows = sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        )
        lines = [
            f"{'stage':<24}{'count':>7}{'total s':>10}{'mean ms':>10}"
            f"{'p50 ms':>10}{'max ms':>10}"
        ]
        for name, s in rows:
            lines.append(
                f"{name:<24}{s['count']:>7d}{s['total_s']:>10.3f}"
                f"{s['mean_ms']:>10.2f}{s['p50_ms']:>10.2f}"
                f"{s['max_ms']:>10.2f}"
            )
        return "\n".join(lines)

    def reset(self):
        self.samples.clear()


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture a full XLA profiler trace into log_dir (None = no-op)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
