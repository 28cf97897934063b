#!/usr/bin/env python
"""Headline benchmark: forward rays/s on one chip at 1080p, Disney-BSDF
analytical scene (BASELINE.md target: >= 1e8 rays/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Rays are counted conservatively as path segments only
(width * height * spp * depth), excluding shadow rays — the actual traced-ray
count is ~2x this (one NEE shadow ray per bounce).

Measurement notes (hard-won on the tunneled axon backend):
- frames are CHAINED through an accumulator so no kernel can be elided and
  every frame's execution is on the critical path;
- the clock stops on a host readback of a scalar reduction of the
  accumulator (block_until_ready alone has been observed to return early
  through the tunnel, reporting physically impossible rates).
"""

import json
import sys
import time

import os
import jax

# Persistent XLA compile cache: Mosaic/XLA compiles of the 1080p kernels
# take minutes cold; cache them across processes (driver runs included).
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp


def main() -> int:
    import pathtracer_tpu as pt
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    width, height, spp, depth, frames = 1920, 1080, 1, 4, 150
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=depth)
    key = jax.random.PRNGKey(0)

    on_tpu = jax.devices()[0].platform != "cpu"

    def frame(k):
        if on_tpu:
            # Fused Pallas megakernel, in-kernel TPU PRNG (zero uniform
            # bandwidth); validated against the XLA integrator + f64 oracle
            # in tests/test_megakernel.py.
            return render_frame_pallas(
                scene, k, width, height, spp=spp, uniforms="inkernel",
                tile_rows=32,
            )
        return pt.render_frame(scene, k, width, height, spp=spp)

    # Warm-up / compile, synced by readback. A handful of chained frames:
    # the first few dispatches through the tunneled backend are erratically
    # slow (queue/allocator warmup), which would otherwise pollute the
    # measurement window.
    acc = frame(key)
    wkeys = jax.random.split(jax.random.PRNGKey(1), 16)
    for i in range(16):
        acc = acc + frame(wkeys[i])
    float(jnp.sum(acc))

    keys = jax.random.split(key, frames)
    t0 = time.perf_counter()
    for i in range(frames):
        acc = acc + frame(keys[i])
    checksum = float(jnp.sum(acc))  # forces execution of the whole chain
    dt = time.perf_counter() - t0
    assert jnp.isfinite(checksum), f"non-finite checksum {checksum}"

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
