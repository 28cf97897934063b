#!/usr/bin/env python
"""Headline benchmarks on one chip at 1080p — one JSON line per metric:

1. forward rays/s, analytical Disney-BSDF scene (target >= 1e8 rays/s/chip)
2. forward+backward rays/s (custom-VJP backward Pallas kernel)
3. forward rays/s, sphere-traced SDF scene (the reference's stated thesis
   workload, /root/reference/Readme.md:76-84)
4. forward rays/s, volumetric-media scene (glass sphere + HG scatter medium)
5. forward rays/s, triangle-mesh scene (beyond the reference's scope)

Rays are counted conservatively as path segments only
(width * height * spp * depth), excluding shadow rays — the actual traced-ray
count is ~2x this (one NEE shadow ray per bounce).

Measurement notes (hard-won on the tunneled axon backend):
- frames are CHAINED through an accumulator so no kernel can be elided and
  every frame's execution is on the critical path;
- the clock stops on a host readback of a scalar reduction of the
  accumulator (block_until_ready alone has been observed to return early
  through the tunnel, reporting physically impossible rates);
- this 2-core host is dispatch-sensitive: run on an idle box (concurrent
  pytest jobs cost 10-25% of reported rays/s).
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

WIDTH, HEIGHT, SPP = 1920, 1080, 1
BASELINE = 1e8  # BASELINE.md: >= 1e8 rays/s/chip at 1080p


def _measure(frame, depth, frames, warmup, windows=4, max_windows=10):
    """Device-chained timing: ONE dispatch per window, not one per frame.

    The whole `frames`-frame chain runs inside a single jitted
    `lax.fori_loop` (key folded in-device), so host->device dispatch
    through the tunneled axon backend is entirely off the critical path —
    a window's wall time is `frames` back-to-back kernel executions plus
    one dispatch + one scalar readback. This is what the reference left
    commented out (/root/reference/renderer/src/main.rs:117-120), made
    robust against host/tunnel state.

    Slow-phase defense: take at least `windows` windows; if the median
    disagrees with the best by >15% keep sampling (up to `max_windows`).
    All window times are returned for the JSON record so the capture is
    auditable."""

    def chain(acc, key):
        def body(i, a):
            return a + frame(jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, frames, body, acc)

    chain_j = jax.jit(chain)
    acc = frame(jax.random.PRNGKey(0))  # shape/dtype seed for the carry
    acc = chain_j(acc, jax.random.PRNGKey(1))  # compile + warm (full window)
    for i in range(max(0, warmup // frames)):
        acc = acc + frame(jax.random.fold_in(jax.random.PRNGKey(1), 1000 + i))
    float(jnp.sum(acc))

    times = []
    w = 0
    while True:
        key = jax.random.PRNGKey(2 + w)
        t0 = time.perf_counter()
        acc = chain_j(acc, key)
        checksum = float(jnp.sum(acc))  # host readback stops the clock
        dt = time.perf_counter() - t0
        assert jnp.isfinite(checksum), f"non-finite checksum {checksum}"
        times.append(dt)
        w += 1
        if w >= windows:
            ts = sorted(times)
            med = ts[len(ts) // 2]
            if med / ts[0] <= 1.15 or w >= max_windows:
                break
    best = min(times)
    return WIDTH * HEIGHT * SPP * depth * frames / best, times


def _emit(metric, value, times=None, **extra):
    rec = {
        "metric": metric,
        "value": value,
        "unit": "rays/s/chip",
        "vs_baseline": value / BASELINE,
        **extra,
    }
    if times is not None:
        rec["window_s"] = [round(t, 4) for t in times]
    print(json.dumps(rec), flush=True)


def bench_forward(on_tpu):
    import pathtracer_tpu as pt
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    depth = 4
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=depth)

    def frame(k):
        if on_tpu:
            # Fused Pallas megakernel, in-kernel TPU PRNG (zero uniform
            # bandwidth); validated against the XLA integrator + f64 oracle
            # in tests/test_megakernel.py.
            return render_frame_pallas(
                scene, k, WIDTH, HEIGHT, spp=SPP, uniforms="inkernel",
                tile_rows=32,
            )
        return pt.render_frame(scene, k, WIDTH, HEIGHT, spp=SPP)

    value, times = _measure(
        frame, depth,
        frames=90 if on_tpu else 3, warmup=0,
        windows=4 if on_tpu else 1,
    )
    _emit("fwd_rays_per_s_1080p_depth4", value, times)


def bench_forward_backward(on_tpu):
    """Gradient of a pixel loss wrt (light emission, material albedo) through
    the full bounce loop: the custom-VJP backward Pallas kernel replays the
    tile's path and runs the VJP fused in VMEM (loop under differentiation:
    /root/reference/rust-pathtracer/src/tracer.rs:61-103)."""
    import pathtracer_tpu as pt
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    tile_rows = int(os.environ.get("BWD_TILE_ROWS", "16"))
    depth = int(os.environ.get("BWD_DEPTH", "4"))
    frames = 30
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=depth)

    def loss_fn(emission, rgb, key):
        s = scene.replace(
            lights=scene.lights._replace(emission=emission),
            params=scene.params._replace(
                materials=scene.params.materials._replace(rgb=rgb)
            ),
        )
        if on_tpu:
            img = render_frame_pallas(
                s, key, WIDTH, HEIGHT, spp=SPP, uniforms="inkernel",
                tile_rows=tile_rows,
            )
        else:
            img = pt.render_frame(
                s, key, WIDTH, HEIGHT, spp=SPP, detach=True, remat=True
            )
        return jnp.mean(img[..., :3] ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    em, rgb = scene.lights.emission, scene.params.materials.rgb

    def frame(k):
        g_em, g_rgb = grad_fn(em, rgb, k)
        return jnp.sum(g_em.x) + jnp.sum(g_rgb.x)

    value, times = _measure(frame, depth, frames=frames, warmup=0)
    _emit(
        "fwd_bwd_rays_per_s_1080p_depth4", value, times,
        path="pallas_custom_vjp" if on_tpu else "xla_remat",
        tile_rows=tile_rows, depth=depth,
    )


def bench_sdf(on_tpu):
    """Each "ray" is a path segment whose intersection is an over-relaxed
    sphere-trace march (<= 96 steps, block-granular early exit) plus a
    capped shadow march and Disney shading — not a closed-form test."""
    import pathtracer_tpu as pt
    from pathtracer_tpu.models.sdf import make_scene as make_sdf_scene
    from pathtracer_tpu.ops.megakernel import render_frame_pallas
    import pathtracer_tpu.ops.megakernel_sdf  # noqa: F401  (registers "sdf")

    depth = 4
    scene = make_sdf_scene(dtype=jnp.float32, recursion_depth=depth)

    def frame(k):
        if on_tpu:
            # tile_rows=40: 27 exact block rows at 1080p (no bottom-edge
            # waste); measured marginally above 32 (1.69e8 vs 1.66e8).
            return render_frame_pallas(
                scene, k, WIDTH, HEIGHT, spp=SPP, uniforms="inkernel",
                tile_rows=40,
            )
        return pt.render_frame(scene, k, WIDTH, HEIGHT, spp=SPP)

    value, times = _measure(frame, depth, frames=30, warmup=0)
    _emit("sdf_fwd_rays_per_s_1080p_depth4", value, times)


def bench_media(on_tpu):
    """Volumetric media on the fast path: the analytical scene with a glass
    sphere filled with an HG-phase scattering medium (the reference's
    Medium is declared-but-dead, material.rs:16-34 + Readme.md:13 TODO;
    here the full free-flight/NEE/HG-continuation path runs fused in the
    kernel when the material table declares a medium)."""
    import pathtracer_tpu as pt
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    depth = 6  # media paths need the extra bounces through the interface
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=depth)
    mats = scene.params.materials
    mats = mats._replace(
        spec_trans=mats.spec_trans.at[1].set(1.0),
        metallic=mats.metallic.at[1].set(0.0),
        roughness=mats.roughness.at[1].set(0.05),
        ior=mats.ior.at[1].set(1.5),
    )
    med = mats.medium
    med = med._replace(
        medium_type=med.medium_type.at[1].set(int(pt.MediumType.SCATTER)),
        density=med.density.at[1].set(0.6),
        color=med.color._replace(
            x=med.color.x.at[1].set(0.9),
            y=med.color.y.at[1].set(0.6),
            z=med.color.z.at[1].set(0.3),
        ),
        anisotropy=med.anisotropy.at[1].set(0.4),
    )
    scene = scene.replace(
        params=scene.params._replace(materials=mats._replace(medium=med))
    )

    def frame(k):
        if on_tpu:
            return render_frame_pallas(
                scene, k, WIDTH, HEIGHT, spp=SPP, uniforms="inkernel",
                tile_rows=32,
            )
        return pt.render_frame(scene, k, WIDTH, HEIGHT, spp=SPP)

    value, times = _measure(frame, depth, frames=40, warmup=0)
    _emit("media_fwd_rays_per_s_1080p_depth6", value, times)


def bench_mesh(on_tpu):
    """Triangle-mesh scene family (beyond the reference's scope): 20-tri
    demo mesh, Moller-Trumbore unrolled in-kernel over static topology."""
    import pathtracer_tpu as pt
    from pathtracer_tpu.models.mesh import make_scene as make_mesh_scene
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    depth = 4
    scene = make_mesh_scene(dtype=jnp.float32, recursion_depth=depth)

    def frame(k):
        if on_tpu:
            return render_frame_pallas(
                scene, k, WIDTH, HEIGHT, spp=SPP, uniforms="inkernel",
                tile_rows=32,
            )
        return pt.render_frame(scene, k, WIDTH, HEIGHT, spp=SPP)

    value, times = _measure(frame, depth, frames=60, warmup=0)
    _emit("mesh_fwd_rays_per_s_1080p_depth4", value, times)


def bench_mesh1k(on_tpu):
    """Kilo-triangle mesh scene (1090 triangles: tessellated UV sphere +
    ground) through the bigmesh backend: coefficient-table Möller-Trumbore
    streamed 128 triangles/chunk as [CHUNK,1]x[1,R] broadcast FMAs with
    AABB-cond chunk culling (models/bigmesh.py). Every ray is tested
    against the full table modulo culling — this is the backend seam the
    reference's trait Scene was built to carry (scene.rs:5-27), two orders
    of magnitude past its actual content."""
    import pathtracer_tpu as pt
    from pathtracer_tpu.models.bigmesh import make_scene as make_bigmesh_scene
    from pathtracer_tpu.ops.megakernel import render_frame_pallas
    import pathtracer_tpu.ops.megakernel_bigmesh  # noqa: F401  (registers)

    depth = 4
    scene = make_bigmesh_scene(dtype=jnp.float32, recursion_depth=depth)

    def frame(k):
        if on_tpu:
            return render_frame_pallas(
                scene, k, WIDTH, HEIGHT, spp=SPP, uniforms="inkernel",
                tile_rows=8,
            )
        return pt.render_frame(scene, k, WIDTH, HEIGHT, spp=SPP)

    value, times = _measure(frame, depth, frames=10, warmup=0)
    _emit("mesh1k_fwd_rays_per_s_1080p_depth4", value, times,
          triangles=scene.params.num_tris)


def main() -> int:
    on_tpu = jax.devices()[0].platform != "cpu"
    only = os.environ.get("BENCH_ONLY", "")
    if not on_tpu:
        # CPU fallback (no Mosaic): forward XLA only, tiny frame budget —
        # the number is meaningless for the TPU targets but keeps the
        # script runnable anywhere.
        bench_forward(on_tpu)
        return 0
    for name, fn in (
        ("fwd", bench_forward),
        ("bwd", bench_forward_backward),
        ("sdf", bench_sdf),
        ("media", bench_media),
        ("mesh", bench_mesh),
        ("mesh1k", bench_mesh1k),
    ):
        if only and name not in only.split(","):
            continue
        fn(on_tpu)
    return 0


if __name__ == "__main__":
    sys.exit(main())
