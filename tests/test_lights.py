"""Rectangular + distant light types: the reference declares all three
LightTypes (globals.rs:69-73) but implements only Spherical; this build
implements the other two per the GLSL original's conventions. Validation:
full-frame float64 parity against the scalar oracle (which mirrors the same
conventions scalar-wise), plus physical sanity checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.oracle import cpu_oracle as O
from oracle_cache import cached_render

W, H = 24, 16


def _parity(lights, depth=4, seed=0, quirks=pt.VERBATIM):
    scene = pt.make_analytical_scene(
        dtype=jnp.float64, recursion_depth=depth, lights=lights
    )
    key = jax.random.PRNGKey(seed)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H, quirks=quirks))
    cam_u, bounce_u = pt.draw_uniforms(key, W * H, depth, jnp.float64)
    osc = O.OracleScene(scene.params, scene.lights, scene.camera, recursion_depth=depth)
    img_oracle = cached_render(
        osc, W, H, np.asarray(cam_u), np.asarray(bounce_u),
        stale_emitter_gate=quirks.stale_emitter_gate,
        primary_mis=quirks.primary_mis,
    )
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)
    assert np.isfinite(img_jax).all()
    return img_jax


def _rect(dtype=jnp.float64):
    # 2x2 quad above the scene, facing down (u x v = -y).
    return pt.rect_light(
        (-1.0, 4.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), (4.0, 4.0, 4.0),
        dtype=dtype,
    )


def _distant(dtype=jnp.float64):
    return pt.distant_light((0.3, 0.8, 0.5), (2.0, 2.0, 2.0), dtype=dtype)


def test_rect_light_oracle_parity():
    _parity(_rect())


def test_distant_light_oracle_parity():
    _parity(_distant())


def test_mixed_lights_oracle_parity():
    lights = pt.concat_lights(
        pt.spherical_light((3.0, 2.0, 2.0), 1.0, (3.0, 3.0, 3.0), dtype=jnp.float64),
        _rect(),
        _distant(),
    )
    _parity(lights, seed=2)


def test_rect_light_illuminates():
    img = _parity(_rect(), seed=1)
    # sphere tops are lit from above; a lightless scene must be darker there
    dark = _parity(
        pt.rect_light(
            (-1.0, 4.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), (0.0, 0.0, 0.0),
            dtype=jnp.float64,
        ),
        seed=1,
    )
    assert img[..., :3].mean() > dark[..., :3].mean()


def test_rect_light_area_and_normal():
    lt = _rect()
    np.testing.assert_allclose(float(lt.area[0]), 4.0)  # |u x v| = 2*2
    assert int(lt.light_type[0]) == pt.LightType.RECTANGULAR


def test_rect_light_emitter_visible_when_facing():
    """A camera ray hitting the quad registers as an emitter (reference
    sample_lights semantics extended to rect): with FIXED quirks the quad
    renders its raw emission."""
    scene = pt.make_analytical_scene(
        dtype=jnp.float64, recursion_depth=2, lights=_rect()
    )
    cam = scene.camera.set(
        pt.v3(0.0, 5.5, 0.0, dtype=jnp.float64),
        pt.v3(0.0, 4.0, 0.0, dtype=jnp.float64),
    )
    scene = scene.replace(camera=cam)
    img = np.asarray(
        pt.render_frame(scene, jax.random.PRNGKey(0), 8, 8, quirks=pt.FIXED)
    )
    np.testing.assert_allclose(img[4, 4, :3], 4.0, rtol=1e-6)


def test_distant_light_never_an_emitter():
    """Distant lights have area 0: no emitter-pass hit, MIS weight 1."""
    scene = pt.make_analytical_scene(
        dtype=jnp.float64, recursion_depth=2, lights=_distant()
    )
    # aim at empty sky along the light direction: must render background,
    # not emission
    cam = scene.camera.set(
        pt.v3(0.0, 0.0, 3.0, dtype=jnp.float64),
        pt.v3(0.3, 0.8, 3.5, dtype=jnp.float64),
    )
    scene = scene.replace(camera=cam)
    img = np.asarray(
        pt.render_frame(scene, jax.random.PRNGKey(0), 8, 8, quirks=pt.FIXED)
    )
    assert np.all(img[..., :3] < 1.5)  # sky gradient, not emission 2.0


def test_distant_light_gradient():
    """Light emission keeps gradients through the type dispatch (inverse
    rendering recovers distant-light intensity too)."""
    lights = _distant()
    scene = pt.make_analytical_scene(dtype=jnp.float64, lights=lights)

    def loss(em_scale):
        s = scene.replace(
            lights=scene.lights._replace(emission=scene.lights.emission * em_scale)
        )
        img = pt.render_frame(s, jax.random.PRNGKey(0), 8, 6, detach=True)
        return jnp.mean(img[..., :3])

    g = jax.grad(loss)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(float(g)) and float(g) > 0.0
