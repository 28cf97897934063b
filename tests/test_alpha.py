"""Alpha-mode pass-through (Blend/Mask).

The reference declares AlphaMode/opacity/alpha_cutoff (material.rs:38-44,
65-67) but never wires them into its integrator; this framework implements
them per the GLSL original's semantics (stochastic skip for Blend when the
alpha coin exceeds opacity, deterministic skip for Mask when opacity <
alpha_cutoff). Scope note: camera/bounce rays only — shadow rays (any_hit)
treat geometry as opaque, like the reference's own any_hit quirk surface.

Verified three ways: XLA integrator vs f64 oracle (exact), behavioral
(opacity-0 Blend surface is invisible; Opaque unchanged by alpha params),
and Pallas megakernel (hbm uniforms, interpret mode) vs XLA f32.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.oracle import cpu_oracle as O
from oracle_cache import cached_render

W, H = 24, 16


def _alpha_scene(dtype, *, blend0=None, mask1=None, depth=4):
    """Analytical scene with optional alpha overrides on the two spheres."""
    scene = pt.make_analytical_scene(dtype=dtype, recursion_depth=depth)
    mats = scene.params.materials
    if blend0 is not None:
        mats = mats._replace(
            alpha_mode=mats.alpha_mode.at[0].set(pt.AlphaMode.BLEND),
            opacity=mats.opacity.at[0].set(blend0),
        )
    if mask1 is not None:
        opacity, cutoff = mask1
        mats = mats._replace(
            alpha_mode=mats.alpha_mode.at[1].set(pt.AlphaMode.MASK),
            opacity=mats.opacity.at[1].set(opacity),
            alpha_cutoff=mats.alpha_cutoff.at[1].set(cutoff),
        )
    return scene.replace(params=scene.params._replace(materials=mats))


def _oracle_render(scene, key, depth):
    cam_u, bounce_u = pt.draw_uniforms(key, W * H, depth, jnp.float64)
    osc = O.OracleScene(
        scene.params, scene.lights, scene.camera, recursion_depth=depth
    )
    return cached_render(
        osc, W, H, np.asarray(cam_u, np.float64), np.asarray(bounce_u, np.float64)
    )


def test_alpha_parity_vs_oracle():
    # Blend sphere (opacity 0.4) + Mask sphere (skipped: 0.2 < 0.5): the
    # vectorized masked-lane implementation must match the scalar
    # `continue`-based oracle exactly in f64.
    scene = _alpha_scene(jnp.float64, blend0=0.4, mask1=(0.2, 0.5))
    key = jax.random.PRNGKey(7)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H))
    img_oracle = _oracle_render(scene, key, 4)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_opaque_ignores_alpha_params():
    # Opaque materials must render identically whatever opacity/cutoff say.
    base = pt.make_analytical_scene(dtype=jnp.float64)
    mats = base.params.materials
    weird = base.replace(
        params=base.params._replace(
            materials=mats._replace(
                opacity=jnp.zeros_like(mats.opacity),
                alpha_cutoff=jnp.ones_like(mats.alpha_cutoff),
            )
        )
    )
    key = jax.random.PRNGKey(0)
    a = np.asarray(pt.render_frame(base, key, W, H))
    b = np.asarray(pt.render_frame(weird, key, W, H))
    np.testing.assert_array_equal(a, b)


def test_blend_opacity_zero_is_invisible():
    # A fully transparent Blend sphere never shades: rays pass through to
    # whatever is behind it (plane or sky), so the sphere's metallic
    # highlight disappears and the image matches a no-alpha render only
    # away from the sphere.
    solid = _alpha_scene(jnp.float64)
    ghost = _alpha_scene(jnp.float64, blend0=0.0)
    key = jax.random.PRNGKey(1)
    img_solid = np.asarray(pt.render_frame(solid, key, W, H))
    img_ghost = np.asarray(pt.render_frame(ghost, key, W, H))
    assert np.abs(img_solid - img_ghost).max() > 1e-3  # sphere region changed
    # opacity 1.0 Blend == Opaque (coin in [0,1) never exceeds 1.0)
    blend_one = _alpha_scene(jnp.float64, blend0=1.0)
    img_one = np.asarray(pt.render_frame(blend_one, key, W, H))
    np.testing.assert_array_equal(img_solid, img_one)


def test_megakernel_alpha_parity():
    # Pallas kernel (hbm uniforms, interpret mode on CPU) vs XLA integrator
    # on an alpha scene, f32.
    from pathtracer_tpu.ops.megakernel import render_frame_pallas

    scene = _alpha_scene(jnp.float32, blend0=0.4, mask1=(0.2, 0.5), depth=3)
    key = jax.random.PRNGKey(3)
    img_xla = np.asarray(pt.render_frame(scene, key, W, H))
    img_pl = np.asarray(
        render_frame_pallas(
            scene, key, W, H, spp=1, uniforms="hbm", tile_rows=8, interpret=True
        )
    )
    np.testing.assert_allclose(img_pl, img_xla, rtol=2e-5, atol=2e-6)
