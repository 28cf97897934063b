"""Metrics & profiling: rays/s counters and jax.profiler hooks.

The reference's only instrumentation is a commented-out tick-time print
(renderer/src/main.rs:26-32,117-120) and the frames counter. Here:
structured per-frame metrics (rays/s, spp/s, frame ms) and optional
Perfetto trace capture via jax.profiler (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class FrameMetrics:
    width: int
    height: int
    spp: int
    depth: int
    frame_ms: float

    @property
    def rays(self) -> int:
        # Primary rays; bounce rays are depth-bounded, so total traced-ray
        # throughput is reported separately as rays * depth upper bound.
        return self.width * self.height * self.spp

    @property
    def rays_per_s(self) -> float:
        return self.rays / (self.frame_ms / 1e3) if self.frame_ms > 0 else 0.0

    @property
    def spp_per_s(self) -> float:
        return self.spp / (self.frame_ms / 1e3) if self.frame_ms > 0 else 0.0

    def to_dict(self) -> dict:
        return dict(
            width=self.width,
            height=self.height,
            spp=self.spp,
            depth=self.depth,
            frame_ms=self.frame_ms,
            rays=self.rays,
            rays_per_s=self.rays_per_s,
            spp_per_s=self.spp_per_s,
        )


@dataclass
class MetricsLog:
    """Accumulates per-frame metrics; json-lines friendly."""

    frames: list = field(default_factory=list)

    def record(self, m: FrameMetrics) -> None:
        self.frames.append(m)

    def summary(self) -> dict:
        if not self.frames:
            return {}
        ms = [f.frame_ms for f in self.frames]
        # steady-state: drop the first (compile) frame if there are others
        steady = ms[1:] if len(ms) > 1 else ms
        avg_ms = sum(steady) / len(steady)
        f0 = self.frames[-1]
        return dict(
            frames=len(ms),
            first_frame_ms=ms[0],
            avg_frame_ms=avg_ms,
            rays_per_s=f0.rays / (avg_ms / 1e3),
            spp_per_s=f0.spp / (avg_ms / 1e3),
        )

    def dump_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for m in self.frames:
                f.write(json.dumps(m.to_dict()) + "\n")


class Timer:
    """Wall-clock timer for device work; call .stop() after
    block_until_ready."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def stop(self) -> float:
        return (time.perf_counter() - self.t0) * 1e3


@contextlib.contextmanager
def trace_to(log_dir: str | None):
    """Optional jax.profiler capture (Perfetto-compatible)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
