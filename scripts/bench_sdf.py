#!/usr/bin/env python
"""SDF-scene benchmark: forward rays/s on one chip at 1080p through the
sphere-traced SDF megakernel (ops/megakernel_sdf.py) — the reference's
stated thesis workload (/root/reference/Readme.md:76-84), on the fast path.

Each "ray" here is a full path segment whose intersection is an
over-relaxed sphere-trace march (<= 96 steps, early-exit per tile block)
plus a capped shadow march and Disney shading — not a closed-form test.

Same methodology as bench.py: chained accumulator frames, clock stopped on
a host readback of a scalar reduction.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp


def main() -> int:
    from pathtracer_tpu.models.sdf import make_scene as make_sdf_scene
    from pathtracer_tpu.ops.megakernel import render_frame_pallas
    import pathtracer_tpu.ops.megakernel_sdf  # noqa: F401  (registers "sdf")

    width, height, spp, depth, frames = 1920, 1080, 1, 4, 40
    scene = make_sdf_scene(dtype=jnp.float32, recursion_depth=depth)
    key = jax.random.PRNGKey(0)

    def frame(k):
        return render_frame_pallas(
            scene, k, width, height, spp=spp, uniforms="inkernel",
            tile_rows=40,
        )

    acc = frame(key)
    wkeys = jax.random.split(jax.random.PRNGKey(1), 8)
    for i in range(8):
        acc = acc + frame(wkeys[i])
    float(jnp.sum(acc))

    keys = jax.random.split(key, frames)
    t0 = time.perf_counter()
    for i in range(frames):
        acc = acc + frame(keys[i])
    checksum = float(jnp.sum(acc))
    dt = time.perf_counter() - t0
    assert jnp.isfinite(checksum), f"non-finite checksum {checksum}"

    rays = width * height * spp * depth * frames
    print(
        json.dumps(
            {
                "metric": "sdf_fwd_rays_per_s_1080p_depth4",
                "value": rays / dt,
                "unit": "rays/s/chip",
                "vs_baseline": rays / dt / 1e8,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
