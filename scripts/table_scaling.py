#!/usr/bin/env python
"""Table-scaling study: in-kernel lights/materials where-chain costs.

The kernel reaches lights and materials through static where-chains over
SMEM scalars (ops/megakernel.py `_pick_material`, `_sample_light_unrolled`)
— O(L) / O(M) per lookup. This measures where that stops being free
(round-5 VERDICT weak #5; the reference's `number_of_lights`/`light_at`
trait surface implies arbitrary counts, scene.rs:49-55).

Method: the analytical demo scene with the light list grown to L spherical
lights (each 1/L emission, jittered positions: same total power, real
sampling work) and the material table padded to M records (the demo's 3 +
padding clones; lookups still resolve to 0-2, so the cost measured is the
table traversal itself). One JSON line per config through the bench.py
device-chained methodology.
"""

import json
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

WIDTH, HEIGHT, DEPTH, FRAMES = 1920, 1080, 4, 30


def scene_with_tables(n_lights: int, n_materials: int):
    import numpy as np

    import pathtracer_tpu as pt
    from pathtracer_tpu.models.light import concat_lights, spherical_light

    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=DEPTH)
    if n_lights > 1:
        rng = np.random.default_rng(0)
        groups = []
        for i in range(n_lights):
            jit = rng.normal(0, 0.4, 3)
            groups.append(spherical_light(
                (3.0 + jit[0], 2.0 + jit[1], 2.0 + jit[2]), 1.0,
                tuple(3.0 / n_lights for _ in range(3)),
            ))
        scene = scene.replace(lights=concat_lights(*groups))
    if n_materials > 3:
        mats = scene.params.materials
        reps = -(-n_materials // 3)
        mats = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a] * reps)[:n_materials], mats
        )
        scene = scene.replace(
            params=scene.params._replace(materials=mats)
        )
    return scene


def measure(scene):
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    def frame(k):
        return render_frame_pallas(
            scene, k, WIDTH, HEIGHT, spp=1, uniforms="inkernel", tile_rows=32
        )

    def chain(acc, key):
        def body(i, a):
            return a + frame(jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, FRAMES, body, acc)

    cj = jax.jit(chain)
    acc = cj(frame(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
    float(jnp.sum(acc))
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        acc = cj(acc, jax.random.PRNGKey(2 + w))
        float(jnp.sum(acc))
        best = min(best, time.perf_counter() - t0)
    return WIDTH * HEIGHT * DEPTH * FRAMES / best


def main() -> int:
    for tag, ls, ms in (
        ("lights", (1, 2, 4, 8), 3),
        ("materials", 1, (3, 8, 16, 32)),
    ):
        if tag == "lights":
            for L in ls:
                v = measure(scene_with_tables(L, 3))
                print(json.dumps({"metric": f"fwd_rays_per_s_L{L}_M3",
                                  "value": v}), flush=True)
        else:
            for M in ms:
                v = measure(scene_with_tables(1, M))
                print(json.dumps({"metric": f"fwd_rays_per_s_L1_M{M}",
                                  "value": v}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
