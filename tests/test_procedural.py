"""Procedural material hook (Scene.procedural_fn): the working realization
of the reference's dormant rhai scripting surface (Material.procedural,
material.rs:77 — an FnPtr its tracer never invokes). Here the hook is a
pure JAX function of (params, hit, ro, rd), applied post-hit and
differentiable through params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.ops.vecmath import V3, splat3


def _stripes(params, hit, ro, rd):
    """Albedo stripes along x at the forward hit point — the kind of
    pattern the reference intended script callbacks to produce."""
    fhp_x = ro.x + rd.x * jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
    band = (jnp.floor(fhp_x * 4.0) % 2.0) < 1.0
    m = hit.material
    rgb = V3(
        jnp.where(band, m.rgb.x, 0.05),
        jnp.where(band, m.rgb.y, 0.05),
        jnp.where(band, m.rgb.z, 0.05),
    )
    return m._replace(rgb=rgb)


def test_procedural_hook_changes_image():
    base = pt.make_analytical_scene(dtype=jnp.float64)
    hooked = base.replace(procedural_fn=_stripes)
    key = jax.random.PRNGKey(0)
    a = np.asarray(pt.render_frame(base, key, 32, 24))
    b = np.asarray(pt.render_frame(hooked, key, 32, 24))
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # the hook visibly changed shading


def test_procedural_hook_differentiable():
    """Hook reads scene params -> procedural patterns get gradients."""

    def tinted(params, hit, ro, rd):
        m = hit.material
        # tint by the checker albedo parameter so grads flow through params
        return m._replace(rgb=m.rgb * splat3(params.checker_albedo[0] * 4.0))

    scene = pt.make_analytical_scene(dtype=jnp.float64).replace(
        procedural_fn=tinted
    )

    def loss(albedo0):
        p = scene.params._replace(
            checker_albedo=scene.params.checker_albedo.at[0].set(albedo0)
        )
        img = pt.render_frame(
            scene.replace(params=p), jax.random.PRNGKey(0), 8, 6, detach=True
        )
        return jnp.mean(img[..., :3])

    g = jax.grad(loss)(jnp.asarray(0.25, jnp.float64))
    assert np.isfinite(float(g)) and float(g) > 0.0


def test_megakernel_procedural_parity():
    """Procedural hooks trace straight into the megakernel (the params
    view is rebuilt from the packed scalars): identical image to the XLA
    integrator on identical threefry uniforms."""
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    scene = pt.make_analytical_scene(dtype=jnp.float32).replace(
        procedural_fn=_stripes
    )
    key = jax.random.PRNGKey(5)
    a = np.asarray(pt.render_frame(scene, key, 32, 24))
    b = np.asarray(
        render_frame_pallas(
            scene, key, 32, 24, uniforms="hbm", interpret=True, tile_rows=8
        )
    )
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)


def test_megakernel_procedural_params_read():
    """A hook that reads scene params through the in-kernel _ScalarRow
    view produces the same image as the XLA path."""
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    def tinted(params, hit, ro, rd):
        m = hit.material
        return m._replace(rgb=m.rgb * splat3(params.checker_albedo[0] * 4.0))

    scene = pt.make_analytical_scene(dtype=jnp.float32).replace(
        procedural_fn=tinted
    )
    key = jax.random.PRNGKey(6)
    a = np.asarray(pt.render_frame(scene, key, 16, 16))
    b = np.asarray(
        render_frame_pallas(
            scene, key, 16, 16, uniforms="hbm", interpret=True, tile_rows=8
        )
    )
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)
