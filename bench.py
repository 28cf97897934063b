#!/usr/bin/env python
"""Headline benchmark: forward rays/s on one chip at 1080p, Disney-BSDF
analytical scene (BASELINE.md target: >= 1e8 rays/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Rays are counted conservatively as path segments only
(width * height * spp * depth), excluding shadow rays — the actual traced-ray
count is ~2x this (one NEE shadow ray per bounce).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> int:
    import pathtracer_tpu as pt

    width, height, spp, depth, frames = 1920, 1080, 1, 4, 50
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=depth)
    key = jax.random.PRNGKey(0)

    def frame(k):
        return pt.render_frame(scene, k, width, height, spp=spp)

    # Warm-up / compile. No device->host transfers anywhere: the tunneled
    # TPU backend supports compute + block_until_ready but transfers can
    # stall; correctness is covered by the CPU-oracle test suite.
    jax.block_until_ready(frame(key))

    keys = jax.random.split(key, frames)
    t0 = time.perf_counter()
    out = None
    for i in range(frames):
        out = frame(keys[i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rays = width * height * spp * depth * frames
    rays_per_s = rays / dt
    baseline = 1e8  # BASELINE.md: >= 1e8 rays/s/chip forward at 1080p
    print(
        json.dumps(
            {
                "metric": "fwd_rays_per_s_1080p_depth4",
                "value": rays_per_s,
                "unit": "rays/s/chip",
                "vs_baseline": rays_per_s / baseline,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
