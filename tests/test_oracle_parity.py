"""End-to-end parity: full-frame JAX float64 render vs the scalar CPU oracle.

This is the allclose gate SURVEY.md §4 prescribes: same scene parameters,
same threefry uniforms, two independent implementations (masked-lane
lax.scan vs sequential per-pixel breaks). Tight tolerances because both run
float64 here; the float32 production path is covered statistically in
test_precision.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.oracle import cpu_oracle as O
from oracle_cache import cached_render

W, H = 24, 16


def _uniforms_for(key, n, depth):
    cam, bounce = pt.draw_uniforms(key, n, depth, jnp.float64)
    return np.asarray(cam, np.float64), np.asarray(bounce, np.float64)


def _render_pair(quirks: pt.Quirks, depth=4, seed=0):
    scene = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=depth)
    key = jax.random.PRNGKey(seed)
    img_jax = np.asarray(pt.render_frame(scene, key, W, H, quirks=quirks))

    cam_u, bounce_u = _uniforms_for(key, W * H, depth)
    osc = O.OracleScene(
        scene.params, scene.lights, scene.camera, recursion_depth=depth
    )
    img_oracle = cached_render(
        osc, W, H, cam_u, bounce_u,
        stale_emitter_gate=quirks.stale_emitter_gate,
        primary_mis=quirks.primary_mis,
    )
    return img_jax, img_oracle


def test_frame_parity_verbatim():
    img_jax, img_oracle = _render_pair(pt.VERBATIM)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_frame_parity_fixed_quirks():
    img_jax, img_oracle = _render_pair(pt.FIXED)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_frame_parity_deeper_bounces():
    img_jax, img_oracle = _render_pair(pt.VERBATIM, depth=8, seed=3)
    np.testing.assert_allclose(img_jax, img_oracle, rtol=1e-9, atol=1e-11)


def test_frames_differ_by_seed():
    scene = pt.make_analytical_scene(dtype=jnp.float64)
    a = np.asarray(pt.render_frame(scene, jax.random.PRNGKey(0), W, H))
    b = np.asarray(pt.render_frame(scene, jax.random.PRNGKey(1), W, H))
    assert np.abs(a - b).max() > 0


def test_determinism_same_key():
    # Counter-based RNG upgrade over ThreadRng: same key -> bit-identical.
    scene = pt.make_analytical_scene(dtype=jnp.float64)
    a = np.asarray(pt.render_frame(scene, jax.random.PRNGKey(5), W, H))
    b = np.asarray(pt.render_frame(scene, jax.random.PRNGKey(5), W, H))
    np.testing.assert_array_equal(a, b)


def test_accumulate_running_mean():
    # tracer.rs:105-121 progressive mean: accumulating k frames equals the
    # arithmetic mean of the k frames.
    scene = pt.make_analytical_scene(dtype=jnp.float64)
    frames = [
        np.asarray(pt.render_frame(scene, jax.random.PRNGKey(s), W, H))
        for s in range(4)
    ]
    buf = jnp.zeros((H, W, 4), jnp.float64)
    count = jnp.asarray(0.0)
    for f in frames:
        buf, count = pt.accumulate(buf, jnp.asarray(f), count)
    np.testing.assert_allclose(
        np.asarray(buf), np.mean(frames, axis=0), rtol=1e-12
    )
    assert float(count) == 4.0


def test_fixed_quirks_make_light_visible():
    # With the stale-gate + primary-MIS quirks fixed, a camera ray aimed at
    # the light must return its emission; verbatim renders background there.
    scene = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=2)
    cam = scene.camera.set(
        pt.v3(3.0, 2.0, 6.0, dtype=jnp.float64),
        pt.v3(3.0, 2.0, 2.0, dtype=jnp.float64),
    )
    scene = scene.replace(camera=cam)
    img_verbatim = np.asarray(
        pt.render_frame(scene, jax.random.PRNGKey(0), 8, 8, quirks=pt.VERBATIM)
    )
    img_fixed = np.asarray(
        pt.render_frame(scene, jax.random.PRNGKey(0), 8, 8, quirks=pt.FIXED)
    )
    # center pixels look straight at the light (emission 3.0 each channel)
    c_fix = img_fixed[4, 4, :3]
    c_verb = img_verbatim[4, 4, :3]
    np.testing.assert_allclose(c_fix, 3.0, rtol=1e-6)
    assert np.all(c_verb < 1.0)
