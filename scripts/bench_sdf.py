#!/usr/bin/env python
"""SDF-scene benchmark — thin wrapper over bench.py's sdf metric so the
methodology (chained accumulator, best-of-3 windows, host-readback clock)
can never drift from the driver's headline run. Equivalent to
`BENCH_ONLY=sdf python bench.py`."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402  (bench configures the compile cache on import)
import bench  # noqa: E402


def main() -> int:
    bench.bench_sdf(jax.devices()[0].platform != "cpu")
    return 0


if __name__ == "__main__":
    sys.exit(main())
