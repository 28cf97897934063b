"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5): the sharded render must be numerically identical to
the single-device run (counter-based partitionable RNG guarantees it), and
the sharded inverse-rendering train step must execute end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.parallel.mesh import (
    factor_mesh,
    make_mesh,
    make_train_step_sharded,
    render_frame_sharded,
)

W, H = 32, 16
KEY = jax.random.PRNGKey(3)


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@requires_8
def test_sharded_render_matches_single_device():
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=3)
    mesh = make_mesh(n_tiles=4, n_spp=2)
    img_sharded = render_frame_sharded(scene, KEY, mesh, W, H, spp=4)
    img_single = pt.render_frame(scene, KEY, W, H, spp=4)
    # spp means are grouped differently (vmap-mean vs lax.map-mean): allow
    # one-ulp-scale float differences, nothing more.
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=2e-5, atol=2e-6
    )


@requires_8
def test_sharded_render_spp1_matches_single_device():
    # The threefry uniforms are bit-identical under partitioning; the only
    # differences are XLA fusing FP arithmetic differently per partition —
    # ulp-scale on a handful of pixels.
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=4)
    mesh = make_mesh(n_tiles=8, n_spp=1)
    img_sharded = render_frame_sharded(scene, KEY, mesh, W, H, spp=1)
    img_single = pt.render_frame(scene, KEY, W, H, spp=1)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=1e-5, atol=1e-6
    )


@requires_8
def test_factor_mesh_shapes():
    m = factor_mesh(8)
    assert m.shape["tiles"] * m.shape["spp"] == 8
    m1 = factor_mesh(1)
    assert m1.shape["tiles"] == 1 and m1.shape["spp"] == 1


@requires_8
def test_sharded_train_step_runs_and_descends():
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=2)
    mesh = make_mesh(n_tiles=4, n_spp=2)
    target = pt.render_frame(scene, jax.random.PRNGKey(9), W, H, spp=8)
    target_flat = jnp.asarray(np.asarray(target[..., :3]).reshape(-1, 3))

    # Perturb the light, then take steps back toward the target.
    start = scene.replace(
        lights=scene.lights._replace(emission=scene.lights.emission * 0.4)
    )
    step, (train, opt_state), names = make_train_step_sharded(
        mesh, ("lights.emission",), start, W, H, spp=8, lr=2e-1
    )
    assert any("emission" in n for n in names)

    # Common random numbers: one fixed key -> deterministic descent on the
    # surrogate; assertions are on parameter recovery, not the noisy loss.
    sub = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        train, opt_state, loss = step(train, opt_state, target_flat, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.85
    # emission recovered from 1.2 toward 3.0
    for leaf in train:
        assert float(np.ravel(np.asarray(leaf))[0]) > 2.0
