#!/usr/bin/env python
"""Measure forward+backward rays/s on one chip at 1080p (BASELINE.md row 2).

Gradient of a scalar pixel loss wrt (light emission, material albedo) through
the full bounce loop with the detached-sampling estimator. Two paths:

- pallas (default on TPU): the megakernel's custom-VJP backward kernel
  (ops/megakernel.py) — the tile's path is replayed in VMEM and the VJP of
  the pure path function runs fused against the image cotangent.
- xla (fallback / --xla): the lax.scan integrator with per-bounce remat
  (round-1 baseline: 8.18e6 rays/s).

Chained accumulator + host readback, same methodology as bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Persistent XLA compile cache: Mosaic/XLA compiles of the 1080p kernels
# take minutes cold; cache them across processes (driver runs included).
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp


def main() -> int:
    import pathtracer_tpu as pt
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    use_xla = "--xla" in sys.argv or jax.devices()[0].platform == "cpu"
    tile_rows = int(os.environ.get("BWD_TILE_ROWS", "16"))
    depth = int(os.environ.get("BWD_DEPTH", "4"))
    width, height, spp, frames = 1920, 1080, 1, 20
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=depth)

    def loss_fn(emission, rgb, key):
        s = scene.replace(
            lights=scene.lights._replace(emission=emission),
            params=scene.params._replace(
                materials=scene.params.materials._replace(rgb=rgb)
            ),
        )
        if use_xla:
            img = pt.render_frame(
                s, key, width, height, spp=spp, detach=True, remat=True
            )
        else:
            img = render_frame_pallas(
                s, key, width, height, spp=spp, uniforms="inkernel",
                tile_rows=tile_rows,
            )
        return jnp.mean(img[..., :3] ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    em, rgb = scene.lights.emission, scene.params.materials.rgb

    g_em, g_rgb = grad_fn(em, rgb, jax.random.PRNGKey(0))
    acc = jnp.sum(jnp.stack([jnp.sum(g_em.x), jnp.sum(g_rgb.x)]))
    float(acc)  # sync after compile

    keys = jax.random.split(jax.random.PRNGKey(1), frames)
    t0 = time.perf_counter()
    for i in range(frames):
        g_em, g_rgb = grad_fn(em, rgb, keys[i])
        acc = acc + jnp.sum(g_em.x) + jnp.sum(g_rgb.x)
    checksum = float(acc)
    dt = time.perf_counter() - t0
    assert jnp.isfinite(checksum), checksum

    rays = width * height * spp * depth * frames
    print(
        json.dumps(
            {
                "metric": "fwd_bwd_rays_per_s_1080p_depth4",
                "value": rays / dt,
                "unit": "rays/s/chip",
                "path": "xla" if use_xla else "pallas_custom_vjp",
                "tile_rows": tile_rows,
                "depth": depth,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
