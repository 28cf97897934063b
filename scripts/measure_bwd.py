#!/usr/bin/env python
"""Forward+backward benchmark — thin wrapper over bench.py's fwd_bwd
metric (custom-VJP backward Pallas kernel; BWD_TILE_ROWS / BWD_DEPTH env
overrides). `--xla` measures the lax.scan integrator with per-bounce remat
(the round-1 fallback, ~8.2e6 rays/s) instead. Equivalent to
`BENCH_ONLY=bwd python bench.py`."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402  (bench configures the compile cache on import)
import bench  # noqa: E402


def main() -> int:
    on_tpu = jax.devices()[0].platform != "cpu" and "--xla" not in sys.argv
    bench.bench_forward_backward(on_tpu)
    return 0


if __name__ == "__main__":
    sys.exit(main())
