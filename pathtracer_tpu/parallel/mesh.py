"""Device-mesh parallelism: pixel-tile + sample-axis sharding.

The reference's only parallelism is rayon work-stealing over scanlines on
one CPU (rust-pathtracer/src/tracer.rs:24-32) with shared-memory `&mut`
slices. The TPU-native equivalent (SURVEY.md §2 parallelism table): a 2-D
`jax.sharding.Mesh` with axes

  - "tiles": data parallelism over pixels — each chip owns a contiguous
    block of the flat ray batch (the scanline-chunk analog, but static and
    compiler-visible);
  - "spp":   sample parallelism — the sample axis is sharded and the
    radiance mean is an XLA all-reduce over ICI (the psum accumulation of
    BASELINE's north star; the sharded-reduction-axis analog of sequence
    parallelism, SURVEY.md §5).

Scene parameters (materials, lights, camera) are tiny and stay replicated;
inverse-rendering gradients w.r.t. replicated params are all-reduced
automatically by XLA when the loss is differentiated under these shardings
(the GSPMD recipe: pick a mesh, annotate shardings with
`with_sharding_constraint`, let XLA insert collectives).

RNG stays bit-identical to the single-chip path: `jax.random` is
counter-based and partitionable (threefry), so sharding the [depth, N, 6]
uniform tensor over "tiles" yields exactly the values the single-device run
computes — the multi-chip render is numerically identical to single-chip,
which the reference's per-thread ThreadRng could never guarantee.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrator.tracer import (
    VERBATIM,
    Quirks,
    draw_uniforms,
    trace,
)
from ..models.camera import gen_ray, pixel_coords
from ..models.scene import Scene
from ..ops.vecmath import V2, V3


def make_mesh(n_tiles: int, n_spp: int = 1, devices=None) -> Mesh:
    """Build a ("tiles", "spp") mesh from the first n_tiles*n_spp devices.

    Both axes ride ICI on a pod slice; "tiles" is the outer (slower) axis so
    the spp all-reduce — the only hot collective — stays between mesh
    neighbors.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    need = n_tiles * n_spp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_tiles, n_spp)
    return Mesh(arr, ("tiles", "spp"))


def factor_mesh(n_devices: int, devices=None, n_spp: int | None = None) -> Mesh:
    """Factor n into (tiles, spp).

    n_spp=None (default heuristic): spp gets the largest power of two <= 2
    (1 or 2), tiles the rest — pixel DP dominates at render workloads.
    Pass n_spp explicitly (any divisor of n_devices: 1, 2, 4, ...) for
    high-spp configs where the sample axis deserves more of the mesh —
    every render then requires spp to be a multiple of n_spp."""
    if n_spp is None:
        n_spp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    if n_spp < 1 or n_devices % n_spp != 0:
        raise ValueError(
            f"n_spp={n_spp} must be a positive divisor of {n_devices}"
        )
    return make_mesh(n_devices // n_spp, n_spp, devices)


def _shard_v(mesh: Mesh, v, spec: P):
    """with_sharding_constraint over a pytree (V2/V3/arrays)."""
    s = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), v
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "quirks", "unroll", "detach", "remat",
    ),
)
def render_frame_sharded(
    scene: Scene,
    key,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int = 1,
    quirks: Quirks = VERBATIM,
    unroll: int | bool = 1,
    detach: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """Sharded render_frame: rays over "tiles", samples over "spp".

    Returns the same [H, W, 4] image as integrator.tracer.render_frame —
    bit-identical math, now SPMD over the mesh. The spp mean lowers to a
    psum over the "spp" axis; the image gathers over "tiles" only at the
    final reshape (keep consuming code under the same jit to avoid it).
    """
    dtype = scene.lights.radius.dtype
    n = width * height
    depth = scene.recursion_depth
    n_spp = mesh.shape["spp"]
    if spp % n_spp != 0:
        raise ValueError(f"spp={spp} not divisible by mesh spp axis {n_spp}")

    coords = _shard_v(mesh, pixel_coords(width, height, dtype), P("tiles"))

    def one_sample(k):
        cam_u, bounce_u = draw_uniforms(k, n, depth, dtype)
        cam_u = _shard_v(mesh, cam_u, P("tiles", None))
        bounce_u = _shard_v(mesh, bounce_u, P(None, "tiles", None))
        offset = V2(cam_u[:, 0], cam_u[:, 1])
        ro, rd = gen_ray(scene.camera, coords, offset, float(width), float(height))
        ro = _shard_v(mesh, ro, P("tiles"))
        rd = _shard_v(mesh, rd, P("tiles"))
        return trace(scene, ro, rd, bounce_u, quirks, unroll, detach, remat)

    if spp == 1:
        radiance = one_sample(key)
    else:
        keys = _shard_v(mesh, jax.random.split(key, spp), P("spp", None))
        acc = jax.vmap(one_sample)(keys)  # V3 of [spp, N]
        acc = _shard_v(mesh, acc, P("spp", "tiles"))
        radiance = V3(
            jnp.mean(acc.x, axis=0), jnp.mean(acc.y, axis=0), jnp.mean(acc.z, axis=0)
        )  # mean over the sharded spp axis -> XLA all-reduce over ICI

    radiance = _shard_v(mesh, radiance, P("tiles"))
    img = jnp.stack(
        [
            radiance.x.reshape(height, width),
            radiance.y.reshape(height, width),
            radiance.z.reshape(height, width),
            jnp.ones((height, width), dtype),
        ],
        axis=-1,
    )
    return img


def render_frame_sharded_pallas(
    scene: Scene,
    key,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int = 1,
    quirks: Quirks = VERBATIM,
    tile_rows: int = 16,
    uniforms: str = "inkernel",
    interpret: bool = False,
    media: bool | None = None,
    tiling: str = "auto",
) -> jnp.ndarray:
    """Sharded megakernel render: the fused Pallas path under shard_map.

    ALL devices of `mesh` (both axes flattened) form one tile axis; each
    device launches the megakernel over its contiguous range of global
    tiles. Because every tile's RNG stream depends only on (frame seed,
    GLOBAL tile id) — in-kernel PRNG is seeded per global tile, and hbm
    threefry rows are sliced by global tile — the sharded render computes
    the SAME sample sequence and pixel assignment as the single-device
    `render_frame_pallas` launch, whatever the device count (the property
    the reference's per-thread ThreadRng scanline pool could never have,
    rust-pathtracer/src/tracer.rs:29-44); images agree to f32 ulp level
    (XLA may round the packed scene floats differently across the two
    program shapes).

    Differentiable like the single-device path: shard_map's replicated
    in_specs make jax.grad psum the per-device packed-parameter cotangents
    from the backward kernel across the mesh automatically.

    Note: uniforms="hbm" materializes the full-frame threefry rows on every
    device before slicing — intended for parity validation at small sizes;
    the production mode is "inkernel" (zero uniform bandwidth).

    media=None (default) auto-detects volumetric media from the concrete
    material table BEFORE entering the jitted body — same behavior as the
    single-device render_frame_pallas. Pass an explicit bool when calling
    from inside an outer jit (the leaves are tracers there and
    auto-detection cannot see them).
    """
    from ..ops.megakernel import _detect_media, resolve_tiling

    if media is None:
        media = _detect_media(scene)
    return _render_frame_sharded_pallas_jit(
        scene, key, mesh=mesh, width=width, height=height, spp=spp,
        quirks=quirks, tile_rows=tile_rows, uniforms=uniforms,
        interpret=interpret, media=media,
        tiling=resolve_tiling(tiling, spp),
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "quirks", "tile_rows", "uniforms",
        "interpret", "media", "tiling",
    ),
)
def _render_frame_sharded_pallas_jit(
    scene: Scene,
    key,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int = 1,
    quirks: Quirks = VERBATIM,
    tile_rows: int = 16,
    uniforms: str = "inkernel",
    interpret: bool = False,
    media: bool = False,
    tiling: str = "flat",
) -> jnp.ndarray:
    from jax import shard_map

    from ..ops.megakernel import LANES, _render_tiles_pallas, _resolve_backend

    backend_name = _resolve_backend(scene).name
    devs = mesh.devices.reshape(-1)
    ndev = int(devs.size)
    flat_mesh = Mesh(devs, ("rays",))
    n = width * height * spp
    tile = tile_rows * LANES
    from ..ops.megakernel import _tile_geometry

    geom = _tile_geometry(tiling, tile_rows, spp)
    if geom is not None:
        nbx, nby = -(-width // geom[0]), -(-height // geom[1])
        total_tiles = nbx * nby
    else:
        total_tiles = -(-n // tile)
    local_tiles = -(-total_tiles // ndev)

    def shard_fn(scene, key):
        idx = jax.lax.axis_index("rays")
        base = (idx * local_tiles).astype(jnp.int32)
        return _render_tiles_pallas(
            scene, key, width, height, spp, quirks, tile_rows, uniforms,
            interpret, backend_name, tile_base=base, num_tiles=local_tiles,
            has_media=media, tiling=tiling,
        )

    r, g, b = shard_map(
        shard_fn,
        mesh=flat_mesh,
        in_specs=(P(), P()),
        out_specs=P("rays"),
        check_vma=False,
    )(scene, key)

    if geom is not None:
        bw, bh, sub = geom

        # ndev * local_tiles may exceed total_tiles: surplus tiles rendered
        # border-clamped duplicates; drop them before block reassembly.
        def finish(c):
            c = c[: total_tiles * tile_rows].reshape(
                nby, nbx, tile_rows, sub, bw, spp
            ).mean(axis=-1)
            c = c.transpose(0, 2, 3, 1, 4).reshape(nby * bh, nbx * bw)
            return c[:height, :width]
    else:
        def finish(c):
            c = c.reshape(-1)[:n].reshape(height * width, spp).mean(axis=1)
            return c.reshape(height, width)

    return jnp.stack(
        [finish(r), finish(g), finish(b), jnp.ones((height, width), jnp.float32)],
        axis=-1,
    )


def make_train_step_sharded(
    mesh: Mesh,
    select: Iterable[str],
    scene_template: Scene,
    width: int,
    height: int,
    spp: int,
    lr: float = 2e-2,
    quirks: Quirks = VERBATIM,
    kernel: str = "xla",
    tile_rows: int = 16,
    uniforms: str = "inkernel",
    interpret: bool = False,
):
    """Build a jitted full inverse-rendering training step over the mesh.

    The step: sharded differentiable render (detached estimator) -> MSE
    against the target (sharded over "tiles") -> grads w.r.t. the selected
    scene leaves (replicated; XLA all-reduces their gradients across the
    mesh) -> Adam update.

    kernel="xla" (default) renders through the GSPMD-sharded XLA integrator
    with per-bounce remat; kernel="pallas" renders through the sharded
    megakernel (render_frame_sharded_pallas) whose backward pass is the
    fused VJP kernel — the production fast path for inverse rendering at
    scale. tile_rows/uniforms/interpret apply to the pallas kernel only.

    Returns (step_fn, init_state, names) where
    step_fn(train, opt_state, target, key) -> (train, opt_state, loss).
    """
    if kernel not in ("xla", "pallas"):
        raise ValueError(f"unknown kernel {kernel!r}")
    import optax

    from ..integrator.inverse import select_leaves

    train0, rebuild, names = select_leaves(scene_template, select)
    opt = optax.adam(lr)

    @jax.jit
    def step(train, opt_state, target, key):
        target = _shard_v(mesh, target, P("tiles"))

        def loss_fn(tv):
            s = rebuild(tv)
            if kernel == "pallas":
                img = render_frame_sharded_pallas(
                    s, key, mesh, width, height, spp=spp, quirks=quirks,
                    tile_rows=tile_rows, uniforms=uniforms,
                    interpret=interpret,
                )
            else:
                img = render_frame_sharded(
                    s, key, mesh, width, height, spp=spp, quirks=quirks,
                    detach=True, remat=True,
                )
            flat = img[..., :3].reshape(-1, 3)
            flat = jax.lax.with_sharding_constraint(
                flat, NamedSharding(mesh, P("tiles", None))
            )
            return jnp.mean((flat - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(train)
        updates, opt_state = opt.update(grads, opt_state, train)
        train = optax.apply_updates(train, updates)
        return train, opt_state, loss

    return step, (train0, opt.init(train0)), names


__all__ = [
    "factor_mesh",
    "make_mesh",
    "make_train_step_sharded",
    "render_frame_sharded",
]
