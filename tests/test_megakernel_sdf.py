"""SDF megakernel backend validation (ops/megakernel_sdf.py).

The sphere-traced SDF scene — the reference's stated thesis
(/root/reference/Readme.md:76-84), which round 1 served only through the
XLA integrator — now renders through the fused Pallas path. With
uniforms="hbm" the kernel consumes the XLA integrator's exact threefry
rows, so forward images must match the XLA SDF render (itself validated
against the f64 oracle in tests/test_sdf.py) and gradients must match the
XLA detached estimator (implicit-function hit-distance derivative included).

Runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.models.sdf import make_scene as make_sdf_scene
from pathtracer_tpu.ops.megakernel import render_frame_pallas

W, H = 32, 16
KEY = jax.random.PRNGKey(3)


@pytest.fixture(scope="module")
def scene():
    return make_sdf_scene(dtype=jnp.float32, recursion_depth=2)


def test_sdf_forward_matches_xla(scene):
    img_xla = pt.render_frame(scene, KEY, W, H, spp=1)
    img_pal = render_frame_pallas(
        scene, KEY, W, H, spp=1, uniforms="hbm", tile_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(img_pal), np.asarray(img_xla), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_sdf_forward_depth_default(scene):
    """Depth-4 (the reference default, scene.rs:28-30) parity."""
    s = make_sdf_scene(dtype=jnp.float32, recursion_depth=4)
    img_xla = pt.render_frame(s, KEY, W, H, spp=1)
    img_pal = render_frame_pallas(
        s, KEY, W, H, spp=1, uniforms="hbm", tile_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(img_pal), np.asarray(img_xla), rtol=1e-4, atol=1e-5
    )


def test_sdf_grad_matches_xla(scene):
    """Geometry gradients (sphere radius, torus major) through the
    in-kernel Newton-reattached sphere trace vs the XLA SDF backend."""

    def mk(rad, major):
        return scene.replace(
            params=scene.params._replace(sphere_radius=rad, torus_major=major)
        )

    def loss_pal(rad, major):
        img = render_frame_pallas(
            mk(rad, major), KEY, W, H, spp=1, uniforms="hbm", tile_rows=8,
            interpret=True,
        )
        return jnp.mean(img[..., :3] ** 2)

    def loss_xla(rad, major):
        img = pt.render_frame(
            mk(rad, major), KEY, W, H, spp=1, detach=True, remat=True
        )
        return jnp.mean(img[..., :3] ** 2)

    rad = scene.params.sphere_radius
    major = scene.params.torus_major
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(rad, major)
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(rad, major)
    fp = np.concatenate([np.ravel(np.asarray(g)) for g in g_pal])
    fx = np.concatenate([np.ravel(np.asarray(g)) for g in g_xla])
    np.testing.assert_allclose(fp, fx, rtol=5e-3, atol=1e-7)
    assert np.abs(fp).max() > 1e-7
