"""Intersection tests vs closed forms (analytical.rs:163-213 semantics)."""

import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops import intersect as isec
from pathtracer_tpu.ops.vecmath import V3, normalize, v3


def _v(x, y, z):
    return v3(float(x), float(y), float(z), dtype=jnp.float64)


def test_sphere_head_on():
    t = isec.ray_sphere(_v(0, 0, 3), _v(0, 0, -1), _v(0, 0, 0), 1.0)
    assert float(t) == 2.0


def test_sphere_miss():
    t = isec.ray_sphere(_v(0, 0, 3), _v(0, 1, 0), _v(0, 0, 0), 1.0)
    assert np.isinf(float(t))


def test_sphere_from_inside_takes_t1():
    t = isec.ray_sphere(_v(0, 0, 0), _v(0, 0, -1), _v(0, 0, 0), 1.0)
    assert float(t) == 1.0


def test_sphere_behind_is_miss():
    t = isec.ray_sphere(_v(0, 0, 3), _v(0, 0, 1), _v(0, 0, 0), 1.0)
    assert np.isinf(float(t))


def test_sphere_grazing():
    # tangent ray: d2 == r2 boundary is a hit (strict > rejects)
    t = isec.ray_sphere(_v(1, 0, 3), _v(0, 0, -1), _v(0, 0, 0), 1.0)
    assert np.isfinite(float(t))
    assert float(t) == 3.0


def test_plane_closed_form():
    normal = _v(0, 1, 0)
    point = _v(0, -1, 0)
    t = isec.ray_plane(_v(0, 1, 0), normalize(_v(1, -1, 0)), normal, point)
    np.testing.assert_allclose(float(t), 2.0 * np.sqrt(2.0), rtol=1e-12)


def test_plane_parallel_is_miss():
    t = isec.ray_plane(_v(0, 1, 0), _v(1, 0, 0), _v(0, 1, 0), _v(0, -1, 0))
    assert np.isinf(float(t))


def test_plane_behind_is_miss():
    t = isec.ray_plane(_v(0, 1, 0), _v(0, 1, 0), _v(0, 1, 0), _v(0, -1, 0))
    assert np.isinf(float(t))


def test_batched_shapes():
    n = 17
    ro = V3(*[jnp.zeros(n, jnp.float64) for _ in range(3)])
    rd = V3(
        jnp.zeros(n, jnp.float64),
        jnp.zeros(n, jnp.float64),
        -jnp.ones(n, jnp.float64),
    )
    ro = ro._replace(z=jnp.full(n, 3.0, jnp.float64))
    t = isec.ray_sphere(ro, rd, _v(0, 0, 0), 1.0)
    assert t.shape == (n,)
    np.testing.assert_allclose(np.asarray(t), 2.0)
