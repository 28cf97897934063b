"""Unit tests for the L0 math layer (ops/vecmath.py) vs closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops import vecmath as vm


def rand_v3(rng, n=64):
    a = rng.standard_normal((3, n))
    return vm.V3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2]))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_dot_cross_length(rng):
    a, b = rand_v3(rng), rand_v3(rng)
    an, bn = np.asarray(a.stack()), np.asarray(b.stack())
    np.testing.assert_allclose(vm.dot(a, b), np.sum(an * bn, -1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(vm.cross(a, b).stack()), np.cross(an, bn), rtol=1e-12
    )
    np.testing.assert_allclose(
        vm.length(a), np.linalg.norm(an, axis=-1), rtol=1e-12
    )


def test_normalize_unit(rng):
    a = rand_v3(rng)
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.length(n), 1.0, rtol=1e-12)


def test_safe_normalize_zero_is_zero():
    z = vm.zeros3((4,), jnp.float64)
    out = vm.safe_normalize(z)
    assert not np.any(np.isnan(np.asarray(out.stack())))
    np.testing.assert_array_equal(np.asarray(out.stack()), 0.0)


def test_mix_smoothstep_pow(rng):
    a, b = rand_v3(rng), rand_v3(rng)
    t = 0.3
    np.testing.assert_allclose(
        np.asarray(vm.mix(a, b, t).stack()),
        np.asarray(a.stack()) * 0.7 + np.asarray(b.stack()) * 0.3,
        rtol=1e-12,
    )
    # smoothstep endpoints & midpoint (math.rs:48-52)
    assert float(vm.smoothstep(0.0, 1.0, -1.0)) == 0.0
    assert float(vm.smoothstep(0.0, 1.0, 2.0)) == 1.0
    assert float(vm.smoothstep(0.0, 1.0, 0.5)) == pytest.approx(0.5)
    p = vm.pow3(vm.v3(2.0, 3.0, 4.0), vm.v3(2.0, 0.5, 0.0))
    np.testing.assert_allclose(
        np.asarray(p.stack()), [4.0, np.sqrt(3.0), 1.0], rtol=1e-12
    )


def test_reflect_refract_closed_form():
    n = vm.v3(0.0, 0.0, 1.0)
    i = vm.normalize(vm.v3(1.0, 0.0, -1.0))
    r = vm.reflect(i, n)
    np.testing.assert_allclose(
        np.asarray(r.stack()), np.asarray(vm.normalize(vm.v3(1.0, 0.0, 1.0)).stack()),
        atol=1e-12,
    )
    # refraction at normal incidence is pass-through
    t = vm.refract(vm.v3(0.0, 0.0, -1.0), n, 0.9)
    np.testing.assert_allclose(np.asarray(t.stack()), [0.0, 0.0, -1.0], atol=1e-12)
    # total internal reflection -> zeros (tracer.rs:470-472)
    t = vm.refract(vm.normalize(vm.v3(0.99, 0.0, -0.1)), n, 1.8)
    np.testing.assert_array_equal(np.asarray(t.stack()), 0.0)


def test_onb_orthonormal(rng):
    n = vm.normalize(rand_v3(rng))
    t, b = vm.onb(n)
    np.testing.assert_allclose(vm.dot(t, n), 0.0, atol=1e-12)
    np.testing.assert_allclose(vm.dot(b, n), 0.0, atol=1e-12)
    np.testing.assert_allclose(vm.dot(t, b), 0.0, atol=1e-12)
    np.testing.assert_allclose(vm.length(t), 1.0, rtol=1e-12)
    np.testing.assert_allclose(vm.length(b), 1.0, rtol=1e-12)


def test_local_world_roundtrip(rng):
    n = vm.normalize(rand_v3(rng))
    t, b = vm.onb(n)
    w = rand_v3(rng)
    back = vm.to_world(t, b, n, vm.to_local(t, b, n, w))
    np.testing.assert_allclose(
        np.asarray(back.stack()), np.asarray(w.stack()), rtol=1e-10, atol=1e-12
    )


def test_gamma_roundtrip(rng):
    a = vm.V3(*[jnp.abs(jnp.asarray(rng.random(16))) for _ in range(3)])
    rt = a.to_linear().to_gamma()
    np.testing.assert_allclose(np.asarray(rt.stack()), np.asarray(a.stack()), rtol=1e-10)


def test_hex_color():
    c = vm.hex_color("#FF8000", dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(c.stack()), [1.0, 128 / 255.0, 0.0], rtol=1e-12
    )


def test_luminance_rec709():
    assert float(vm.luminance(vm.v3(1.0, 1.0, 1.0))) == pytest.approx(1.0)


def test_v2_full_surface(rng):
    """V2 carries the reference F2's whole method surface (fx.rs:19-205):
    normalize/div/floor/fract/abs/max_f + the F3-producing swizzles."""
    a = vm.V2(jnp.asarray(rng.random(8) + 0.5), jnp.asarray(rng.random(8) + 0.5))
    b = vm.V2(jnp.asarray(rng.random(8) + 0.5), jnp.asarray(rng.random(8) + 0.5))

    n = a.normalize()
    np.testing.assert_allclose(np.asarray(n.length()), 1.0, rtol=1e-6)

    d = a / b
    np.testing.assert_allclose(np.asarray(d.x), np.asarray(a.x / b.x), rtol=1e-7)
    s = 2.0 / a
    np.testing.assert_allclose(np.asarray(s.y), 2.0 / np.asarray(a.y), rtol=1e-7)

    fr = a.fract()
    np.testing.assert_allclose(
        np.asarray(fr.x), np.asarray(a.x) - np.floor(np.asarray(a.x)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.floor().y), np.floor(np.asarray(a.y))
    )
    assert (np.asarray(a.max_f(1.2).x) >= 1.2).all()
    np.testing.assert_allclose(np.asarray((a * -1.0).abs().x), np.asarray(a.x))

    sw = a.xyy()
    assert isinstance(sw, vm.V3)
    np.testing.assert_allclose(np.asarray(sw.z), np.asarray(a.y))
    np.testing.assert_allclose(np.asarray(a.yxy().x), np.asarray(a.y))
    np.testing.assert_allclose(np.asarray(a.xxx().z), np.asarray(a.x))
    np.testing.assert_allclose(np.asarray(a.mult_f(3.0).x), np.asarray(a.x) * 3.0)
