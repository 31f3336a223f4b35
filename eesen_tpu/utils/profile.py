"""Profiling: per-op wall-time accumulation + device trace capture.

Mirrors the reference's CuDevice profiling (reference:
src/gpucompute/cuda-device.{h,cc}:85-90,323-365 — AccuProfile accumulates
per-op elapsed time into a map, PrintProfile dumps it sorted with memory
stats; enabled in training/inference epilogues).  Adds what the reference
lacks: `trace()` wraps jax.profiler for XLA-level device traces viewable
in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax

from eesen_tpu.utils.logging import get_logger

log = get_logger("utils.profile")


class Profiler:
    """Accumulating wall-clock profiler (CuDevice::AccuProfile)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def track(self, key: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[key] = self.totals.get(key, 0.0) + dt
            self.counts[key] = self.counts.get(key, 0) + 1

    def accumulate(self, key: str, seconds: float) -> None:
        self.totals[key] = self.totals.get(key, 0.0) + seconds
        self.counts[key] = self.counts.get(key, 0) + 1

    def print_profile(self) -> str:
        """Sorted dump (CuDevice::PrintProfile), returned and logged."""
        lines = ["-----\n[profile]:"]
        for key, total in sorted(self.totals.items(), key=lambda kv: kv[1]):
            lines.append(
                f"{key}\t{total:.6f}s\t(n={self.counts[key]})"
            )
        lines.append(
            f"Total GPU-equivalent time: {sum(self.totals.values()):.4f}s"
        )
        out = "\n".join(lines)
        log.info("%s", out)
        return out

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


# module-level default, like the CuDevice singleton
profiler = Profiler()


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace for TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_stats() -> Optional[dict]:
    """Live device memory stats (CuDevice's free/used memory printout)."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
