"""KernelBackend is pluggable: a third backend registered FROM TEST CODE.

The reference's `trait Scene` (rust-pathtracer/src/scene.rs:5-90) lets any
downstream crate implement a new scene type; the in-kernel analog is
`ops.megakernel.KernelBackend` + `register_backend`. This file proves the
protocol is real: a one-primitive "toy" scene family (single sphere, sky
gradient, one spherical light) defined ENTIRELY here — XLA-side Scene fns
plus a KernelBackend — renders through `render_frame_pallas` with no edits
to `pathtracer_tpu/ops/` and matches the XLA integrator on identical
threefry uniforms.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.models.camera import default_pinhole
from pathtracer_tpu.models.light import spherical_light
from pathtracer_tpu.models.material import (
    default_material,
    gather_material,
    make_material,
    select_material,
    stack_materials,
)
from pathtracer_tpu.models.scene import Scene, SurfaceHit
from pathtracer_tpu.ops.intersect import MISS, ray_sphere
from pathtracer_tpu.ops.megakernel import (
    KernelBackend,
    _CommonScalars,
    _pick_material,
    _v3_list,
    pack_camera,
    pack_lights,
    pack_materials,
    register_backend,
    render_frame_pallas,
)
from pathtracer_tpu.ops.vecmath import V3, mix, safe_normalize, splat3, v3

W, H = 32, 16
KEY = jax.random.PRNGKey(11)


# --------------------------------------------------------------------------
# The toy scene family, XLA side (what a downstream package would write)
# --------------------------------------------------------------------------


class ToyParams(NamedTuple):
    center: V3  # scalar V3
    radius: jnp.ndarray
    materials: pt.Material  # [1]
    sky_horizon: V3
    sky_zenith: V3
    sky_scale: jnp.ndarray


def toy_background(p: ToyParams, rd: V3) -> V3:
    t = 0.5 * (rd.y + 1.0)
    return mix(p.sky_horizon, p.sky_zenith, t).to_linear() * splat3(p.sky_scale)


def toy_closest_hit(p: ToyParams, ro: V3, rd: V3) -> SurfaceHit:
    dtype = jnp.asarray(rd.x).dtype
    n = jnp.shape(rd.x)
    t = ray_sphere(ro, rd, p.center, p.radius)
    hit = jnp.isfinite(t)
    hp = ro + rd * jnp.where(hit, t, 0.0)
    normal = safe_normalize(hp - p.center)
    mat = gather_material(p.materials, jnp.zeros(n, jnp.int32))
    mat = select_material(hit, mat, default_material(n, dtype))
    return SurfaceHit(t=jnp.where(hit, t, MISS), normal=normal, material=mat)


def toy_any_hit(p: ToyParams, ro: V3, rd: V3, max_dist) -> jnp.ndarray:
    t = ray_sphere(ro, rd, p.center, p.radius)
    return jnp.isfinite(t) & (t < max_dist)


def make_toy_scene(dtype=jnp.float32, recursion_depth: int = 3) -> Scene:
    mat = make_material(dtype, rgb=(0.8, 0.25, 0.2), roughness=0.6)
    return Scene(
        params=ToyParams(
            center=v3(0.0, 0.0, 0.0, dtype=dtype),
            radius=jnp.asarray(1.0, dtype),
            materials=stack_materials([mat]),
            sky_horizon=v3(1.0, 1.0, 1.0, dtype=dtype),
            sky_zenith=v3(0.6, 0.7, 0.9, dtype=dtype),
            sky_scale=jnp.asarray(0.6, dtype),
        ),
        camera=default_pinhole(dtype),
        lights=spherical_light((3.0, 2.0, 2.0), 1.0, (3.0, 3.0, 3.0), dtype=dtype),
        background_fn=toy_background,
        closest_hit_fn=toy_closest_hit,
        any_hit_fn=toy_any_hit,
        recursion_depth=recursion_depth,
    )


# --------------------------------------------------------------------------
# The toy KernelBackend (in-kernel twin on packed scalars)
# --------------------------------------------------------------------------


def toy_pack(scene: Scene, width: int, height: int,
             with_medium: bool = True) -> jnp.ndarray:
    p: ToyParams = scene.params
    vals = pack_camera(scene, width, height)
    vals += _v3_list(p.center) + [p.radius]
    vals += _v3_list(p.sky_horizon) + _v3_list(p.sky_zenith) + [p.sky_scale]
    vals += pack_lights(scene)
    vals += pack_materials(p.materials, with_medium)
    return jnp.stack([jnp.asarray(x, jnp.float32) for x in vals])[None, :]


class _ToyScalars(_CommonScalars):
    def __init__(self, ref, meta):
        n_lights, with_medium = meta
        self._ref = ref
        self._off = 0
        get = self._get
        self._read_camera()
        self.center = V3(get(), get(), get())
        self.radius = get()
        self.sky_horizon = V3(get(), get(), get())
        self.sky_zenith = V3(get(), get(), get())
        self.sky_scale = get()
        self._read_lights(n_lights)
        self._read_materials(1, with_medium)


def _toy_view(ref, meta):
    return _ToyScalars(ref, meta)


def _toy_kernel_closest_hit(sc: _ToyScalars, ro: V3, rd: V3):
    shape = jnp.shape(rd.x)
    t = ray_sphere(ro, rd, sc.center, sc.radius)
    hit = jnp.isfinite(t)
    hp = ro + rd * jnp.where(hit, t, 0.0)
    normal = safe_normalize(hp - sc.center)
    mat = _pick_material(sc, jnp.zeros(shape, jnp.int32), shape)
    defaults = default_material(shape, jnp.float32)
    mat = jax.tree_util.tree_map(lambda a, b: jnp.where(hit, a, b), mat, defaults)
    return jnp.where(hit, t, jnp.inf), normal, mat


def _toy_kernel_any_hit(sc: _ToyScalars, ro: V3, rd: V3, max_dist):
    t = ray_sphere(ro, rd, sc.center, sc.radius)
    return jnp.isfinite(t) & (t < max_dist)


def _toy_kernel_background(sc: _ToyScalars, rd: V3) -> V3:
    t = 0.5 * (rd.y + 1.0)
    return mix(sc.sky_horizon, sc.sky_zenith, t).to_linear() * splat3(sc.sky_scale)


TOY_BACKEND = KernelBackend(
    name="toy",
    pack=toy_pack,
    meta_of=lambda scene: (scene.lights.count,),
    view=_toy_view,
    closest_hit=_toy_kernel_closest_hit,
    any_hit=_toy_kernel_any_hit,
    background=_toy_kernel_background,
    matches=lambda scene: scene.closest_hit_fn is toy_closest_hit,
)

register_backend(TOY_BACKEND)


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------


def test_plugin_backend_dispatch():
    """_resolve_backend claims the toy scene for the test-registered backend
    and still routes the builtin scenes to their own backends."""
    from pathtracer_tpu.models.sdf import make_scene as make_sdf_scene
    from pathtracer_tpu.ops.megakernel import _resolve_backend

    assert _resolve_backend(make_toy_scene()).name == "toy"
    assert _resolve_backend(pt.make_analytical_scene()).name == "analytical"
    assert _resolve_backend(make_sdf_scene(dtype=jnp.float32)).name == "sdf"


def test_plugin_backend_renders_and_matches_xla():
    """The toy backend runs through render_frame_pallas (generic path loop,
    NEE/MIS/Disney all shared) and matches the XLA integrator on identical
    hbm threefry uniforms."""
    scene = make_toy_scene(recursion_depth=3)
    img_xla = pt.render_frame(scene, KEY, W, H, spp=1)
    img_pal = render_frame_pallas(
        scene, KEY, W, H, spp=1, uniforms="hbm", tile_rows=8, interpret=True
    )
    assert np.isfinite(np.asarray(img_pal)).all()
    np.testing.assert_allclose(
        np.asarray(img_pal), np.asarray(img_xla), rtol=1e-4, atol=1e-5
    )
