"""SDF backend tests: sphere-traced distances vs closed form, analytic
normals, implicit-function gradients of the hit distance, and an
end-to-end differentiable render."""

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.models.sdf import (
    default_params,
    make_scene,
    scene_sdf,
    sdf_normal,
    sphere_trace,
)
from pathtracer_tpu.ops.vecmath import V3, v3


def _head_on_ray(dtype=jnp.float64):
    """Ray from (-1.3, 0, 5) toward -z: hits only the demo sphere
    (center (-1.3,0,0), r=1) at t = 4."""
    ro = v3(jnp.full((1,), -1.3, dtype), jnp.zeros((1,), dtype), jnp.full((1,), 5.0, dtype))
    rd = v3(jnp.zeros((1,), dtype), jnp.zeros((1,), dtype), jnp.full((1,), -1.0, dtype))
    return ro, rd


def test_sphere_trace_matches_closed_form():
    p = default_params(jnp.float64)
    ro, rd = _head_on_ray()
    t, hit = sphere_trace(p, ro, rd)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 4.0, atol=5e-3)


def test_sdf_normal_analytic():
    p = default_params(jnp.float64)
    x = v3(
        jnp.full((1,), -1.3, jnp.float64),
        jnp.zeros((1,), jnp.float64),
        jnp.full((1,), 1.0, jnp.float64),
    )
    n = sdf_normal(p, x)
    np.testing.assert_allclose(
        [float(n.x[0]), float(n.y[0]), float(n.z[0])], [0.0, 0.0, 1.0], atol=1e-6
    )


def test_hit_distance_gradient_implicit():
    # Head-on ray: t(r) = 5 - r exactly, so dt/dr = -1. The marched t is
    # stop-gradiented; the Newton reattachment must recover the implicit
    # derivative.
    base = default_params(jnp.float64)
    ro, rd = _head_on_ray()

    def t_of_r(r):
        p = base._replace(sphere_radius=jnp.full((1,), r, jnp.float64))
        t, _hit = sphere_trace(p, ro, rd)
        return t[0]

    g = jax.grad(t_of_r)(jnp.asarray(1.0, jnp.float64))
    np.testing.assert_allclose(float(g), -1.0, atol=1e-4)


def test_hit_distance_gradient_center():
    # Moving the sphere toward the camera by dz shortens t one-for-one.
    base = default_params(jnp.float64)
    ro, rd = _head_on_ray()

    def t_of_cz(cz):
        c = base.sphere_center
        p = base._replace(sphere_center=V3(c.x, c.y, jnp.full((1,), cz, jnp.float64)))
        t, _hit = sphere_trace(p, ro, rd)
        return t[0]

    g = jax.grad(t_of_cz)(jnp.asarray(0.0, jnp.float64))
    np.testing.assert_allclose(float(g), -1.0, atol=1e-4)


def test_scene_sdf_plane_distance():
    p = default_params(jnp.float64)
    x = v3(
        jnp.full((1,), 10.0, jnp.float64),
        jnp.full((1,), 2.5, jnp.float64),
        jnp.full((1,), -10.0, jnp.float64),
    )
    # Far from all solids, the union distance is the plane's y + 1.
    np.testing.assert_allclose(float(scene_sdf(p, x)[0]), 3.5, atol=0.6)


def test_sdf_render_smoke_and_grads():
    scene = make_scene(dtype=jnp.float64, recursion_depth=2)
    key = jax.random.PRNGKey(0)
    img = pt.render_frame(scene, key, 16, 12, spp=1)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a[..., :3].std() > 0.01  # scene structure, not a constant field

    # Differentiable end to end: gradients to SDF geometry + materials.
    def loss(th):
        p = scene.params._replace(sphere_radius=scene.params.sphere_radius * th)
        s = scene.replace(params=p)
        img = pt.render_frame(s, key, 16, 12, spp=1, detach=True, remat=True)
        return jnp.mean(img[..., :3] ** 2)

    g = jax.grad(loss)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(float(g))
    assert float(g) != 0.0


def test_sdf_scene_runs_at_depth8():
    # BASELINE config 3 shape check (tiny resolution).
    scene = make_scene(dtype=jnp.float32, recursion_depth=8)
    img = pt.render_frame(scene, jax.random.PRNGKey(1), 8, 6, spp=2)
    assert np.isfinite(np.asarray(img)).all()
