"""Volumetric media: Absorb (Beer-Lambert) and Emissive segments.

The reference declares Medium/MediumType (material.rs:8-34) and its README
lists media as TODO (Readme.md:13); the integrator never reads them. Here
they are implemented (GLSL-original semantics) in the XLA integrator and
the f64 oracle: a ray transmitted through a surface whose material carries
a medium picks it up; while inside, Absorb attenuates throughput by
exp(-(1-color)·density·t) per segment and Emissive adds color·density·t.
Scatter performs HG-phase single scattering: exponential free-flight
sampling, NEE at the scatter point with the phase function, HG-sampled
continuation (integrator.tracer scatter block + cpu_oracle mirror). The
Pallas megakernel runs all three media types fused in-kernel (a static
has_media flag elides the code for media-free scenes); parity is proven by
test_megakernel_media_parity below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.oracle import cpu_oracle as O
from oracle_cache import cached_render

W, H = 24, 16


def _glass_scene(dtype, med_type=None, density=0.8, color=(0.9, 0.2, 0.1),
                 anisotropy=0.0):
    """Analytical scene with sphere1 made transmissive (glass), optionally
    filled with a participating medium."""
    scene = pt.make_analytical_scene(dtype=dtype, recursion_depth=6)
    mats = scene.params.materials
    mats = mats._replace(
        spec_trans=mats.spec_trans.at[1].set(1.0),
        metallic=mats.metallic.at[1].set(0.0),
        roughness=mats.roughness.at[1].set(0.05),
        ior=mats.ior.at[1].set(1.5),
    )
    if med_type is not None:
        med = mats.medium
        med = med._replace(
            medium_type=med.medium_type.at[1].set(med_type),
            density=med.density.at[1].set(density),
            color=med.color._replace(
                x=med.color.x.at[1].set(color[0]),
                y=med.color.y.at[1].set(color[1]),
                z=med.color.z.at[1].set(color[2]),
            ),
            anisotropy=med.anisotropy.at[1].set(anisotropy),
        )
        mats = mats._replace(medium=med)
    return scene.replace(params=scene.params._replace(materials=mats))


def _oracle_render(scene, key, depth=6):
    cam_u, bounce_u = pt.draw_uniforms(key, W * H, depth, jnp.float64)
    osc = O.OracleScene(
        scene.params, scene.lights, scene.camera, recursion_depth=depth
    )
    return cached_render(
        osc, W, H, np.asarray(cam_u, np.float64), np.asarray(bounce_u, np.float64)
    )


def test_absorb_parity_vs_oracle():
    scene = _glass_scene(jnp.float64, med_type=pt.MediumType.ABSORB)
    key = jax.random.PRNGKey(11)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H))
    img_oracle = _oracle_render(scene, key)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_emissive_parity_vs_oracle():
    scene = _glass_scene(
        jnp.float64, med_type=pt.MediumType.EMISSIVE, density=0.5,
        color=(0.2, 0.8, 0.3),
    )
    key = jax.random.PRNGKey(12)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H))
    img_oracle = _oracle_render(scene, key)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_medium_none_is_noop():
    # A declared-but-None medium must not change the image at all.
    base = _glass_scene(jnp.float64)
    noop = _glass_scene(jnp.float64, med_type=pt.MediumType.NONE, density=5.0)
    key = jax.random.PRNGKey(2)
    np.testing.assert_array_equal(
        np.asarray(pt.render_frame(base, key, W, H)),
        np.asarray(pt.render_frame(noop, key, W, H)),
    )


def test_absorb_darkens_emissive_brightens():
    key = jax.random.PRNGKey(4)
    base = np.asarray(pt.render_frame(_glass_scene(jnp.float64), key, W, H))
    dark = np.asarray(
        pt.render_frame(
            _glass_scene(
                jnp.float64, med_type=pt.MediumType.ABSORB, density=4.0,
                color=(0.0, 0.0, 0.0),
            ),
            key, W, H,
        )
    )
    bright = np.asarray(
        pt.render_frame(
            _glass_scene(
                jnp.float64, med_type=pt.MediumType.EMISSIVE, density=2.0,
                color=(1.0, 1.0, 1.0),
            ),
            key, W, H,
        )
    )
    assert dark[..., :3].sum() < base[..., :3].sum()
    assert bright[..., :3].sum() > base[..., :3].sum()
    assert np.isfinite(dark).all() and np.isfinite(bright).all()


def test_scatter_parity_vs_oracle():
    """HG single scattering: the XLA integrator and the scalar f64 oracle
    must agree exactly (same uniforms, same free-flight/phase math)."""
    scene = _glass_scene(
        jnp.float64, med_type=pt.MediumType.SCATTER, density=1.5,
        color=(0.8, 0.8, 0.9), anisotropy=0.4,
    )
    key = jax.random.PRNGKey(13)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H))
    img_oracle = _oracle_render(scene, key)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_scatter_parity_isotropic():
    """g = 0 exercises the uniform-sphere fallback of sample_hg."""
    scene = _glass_scene(
        jnp.float64, med_type=pt.MediumType.SCATTER, density=2.0,
        color=(1.0, 1.0, 1.0), anisotropy=0.0,
    )
    key = jax.random.PRNGKey(14)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H))
    img_oracle = _oracle_render(scene, key)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_scatter_brighter_than_absorb():
    """A white scatter medium redirects light instead of destroying it, so
    at equal density it must keep more energy than a black absorber, and
    (being attenuating + redirecting) stay finite."""
    key = jax.random.PRNGKey(5)
    spp = 8
    absorb = np.asarray(
        pt.render_frame(
            _glass_scene(
                jnp.float64, med_type=pt.MediumType.ABSORB, density=3.0,
                color=(0.0, 0.0, 0.0),
            ),
            key, W, H, spp=spp,
        )
    )
    scat = np.asarray(
        pt.render_frame(
            _glass_scene(
                jnp.float64, med_type=pt.MediumType.SCATTER, density=3.0,
                color=(1.0, 1.0, 1.0),
            ),
            key, W, H, spp=spp,
        )
    )
    assert np.isfinite(scat).all()
    assert scat[..., :3].sum() > absorb[..., :3].sum()


@pytest.mark.parametrize(
    "med_type",
    [pt.MediumType.ABSORB, pt.MediumType.EMISSIVE, pt.MediumType.SCATTER],
)
def test_megakernel_media_parity(med_type):
    """The megakernel's media path (compiled in when the material table
    declares a medium) matches the XLA integrator on identical threefry
    uniforms — Absorb, Emissive, and HG Scatter."""
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    aniso = 0.4 if med_type == pt.MediumType.SCATTER else 0.0
    scene = _glass_scene(jnp.float32, med_type=med_type, anisotropy=aniso)
    key = jax.random.PRNGKey(3)
    a = np.asarray(pt.render_frame(scene, key, W, H))
    b = np.asarray(
        render_frame_pallas(
            scene, key, W, H, uniforms="hbm", interpret=True, tile_rows=8
        )
    )
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)
