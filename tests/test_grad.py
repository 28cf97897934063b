"""Differentiability tests: finite differences vs VJP, and inverse
rendering recovery (SURVEY.md §4 item 4, BASELINE config 4).

FD comparisons use common random numbers (same key both sides). Parameters
that do not influence the sampling maps (sky, emission, checker albedo)
must match FD tightly in f64 — the estimator is a.s. differentiable there.
Parameters that steer sampling (roughness, rgb via lobe CDFs) are compared
statistically at high spp: both the FD of the estimator and the detached
VJP converge to the same expectation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.integrator.inverse import (
    clamp_material_params,
    inverse_render,
    render_loss,
    select_leaves,
)

W, H = 20, 14
KEY = jax.random.PRNGKey(11)


def _scene(dtype=jnp.float64):
    return pt.make_analytical_scene(dtype=dtype, recursion_depth=3)


def _loss_for(update_fn):
    """Build scalar-parameter loss: theta -> render_loss(scene(theta))."""
    base = _scene()
    target = jnp.zeros((H, W, 4), jnp.float64)

    def loss(theta):
        return render_loss(update_fn(base, theta), target, KEY, W, H, spp=2)

    return loss


def _fd(loss, theta0, h):
    return (loss(theta0 + h) - loss(theta0 - h)) / (2.0 * h)


def test_grad_sky_scale_matches_fd():
    def upd(s, th):
        return s.replace(params=s.params._replace(sky_scale=th))

    loss = _loss_for(upd)
    th0 = jnp.asarray(0.5, jnp.float64)
    g = jax.grad(loss)(th0)
    fd = _fd(loss, th0, 1e-5)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_grad_light_emission_matches_fd():
    def upd(s, th):
        lights = s.lights._replace(emission=s.lights.emission * th)
        return s.replace(lights=lights)

    loss = _loss_for(upd)
    th0 = jnp.asarray(1.0, jnp.float64)
    g = jax.grad(loss)(th0)
    fd = _fd(loss, th0, 1e-5)
    assert float(g) != 0.0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_grad_checker_albedo_matches_fd():
    # Albedo steers sampling at depth >= 2 (luminance -> lobe CDF), where
    # FD picks up sample-motion terms the detached estimator drops (they
    # integrate to zero). At depth 1 radiance is NEE-only and the estimator
    # is pointwise differentiable in albedo -> FD must match tightly.
    base = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=1)
    target = jnp.zeros((H, W, 4), jnp.float64)

    def loss(th):
        p = base.params._replace(checker_albedo=base.params.checker_albedo * th)
        return render_loss(base.replace(params=p), target, KEY, W, H, spp=2)

    th0 = jnp.asarray(1.0, jnp.float64)
    g = jax.grad(loss)(th0)
    fd = _fd(loss, th0, 1e-5)
    assert float(g) != 0.0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_grad_checker_albedo_statistical_depth3():
    # Depth-3: detached VJP and FD agree only in expectation; compare at
    # high spp with a loose tolerance (sampling-steering parameter).
    base = _scene()
    target = jnp.zeros((H, W, 4), jnp.float64)

    def loss(th, key):
        p = base.params._replace(checker_albedo=base.params.checker_albedo * th)
        return render_loss(base.replace(params=p), target, key, W, H, spp=64)

    _statistical_grad_check(loss)


def _statistical_grad_check(loss, seeds=tuple(range(4, 12)), h=5e-2, rtol=0.5):
    """Average detached-VJP and FD over several keys. FD noise scales with
    1/h (discrete lobe/coin flips under +-h are heavy-tailed): at h=3e-3 the
    FD sign is not even stable across seeds at spp 64, while h=5e-2 trades a
    small O(h^2) bias for a ~300x variance reduction. Both estimators are
    still noisy at spp 64, so the acceptance band is variance-aware: means
    must agree within max(rtol*|fd|, 3*SEM of the per-seed difference)."""
    th0 = jnp.asarray(1.0, jnp.float64)
    gs, fds = [], []
    for seed in seeds:
        key = jax.random.PRNGKey(seed)
        gs.append(float(jax.grad(loss)(th0, key)))
        fds.append(float((loss(th0 + h, key) - loss(th0 - h, key)) / (2 * h)))
    g, fd = np.mean(gs), np.mean(fds)
    assert g != 0.0
    assert np.sign(g) == np.sign(fd)
    diff_sem = np.std(np.asarray(gs) - np.asarray(fds), ddof=1) / np.sqrt(len(seeds))
    assert abs(g - fd) <= max(rtol * abs(fd), 3.0 * diff_sem), (
        f"mean VJP {g} vs mean FD {fd} (3*SEM {3 * diff_sem})"
    )


def test_grad_roughness_statistical():
    # Sampling-steering parameter: detached VJP and FD agree in
    # expectation; compare at spp 64 with generous tolerance.
    base = _scene()
    target = jnp.zeros((H, W, 4), jnp.float64)

    def loss(th, key):
        m = base.params.materials
        m = m._replace(roughness=m.roughness * th)
        s = base.replace(params=base.params._replace(materials=m))
        return render_loss(s, target, key, W, H, spp=64)

    _statistical_grad_check(loss)


def _float_grads(scene, loss_of_scene):
    """Gradient w.r.t. every float leaf of the scene (ints stay frozen)."""
    train, rebuild, names = select_leaves(scene, ("",))
    g = jax.grad(lambda tv: loss_of_scene(rebuild(tv)))(train)
    return g, names


def test_remat_matches_no_remat():
    scene = _scene()
    target = jnp.zeros((H, W, 4), jnp.float64)

    def loss(scene, remat):
        img = pt.render_frame(
            scene, KEY, W, H, spp=1, detach=True, remat=remat
        )
        return jnp.mean((img[..., :3] - target[..., :3]) ** 2)

    g1, _ = _float_grads(scene, lambda s: loss(s, False))
    g2, _ = _float_grads(scene, lambda s: loss(s, True))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


def test_grads_are_finite_everywhere():
    scene = _scene()
    target = jnp.full((H, W, 4), 0.2, jnp.float64)
    g, names = _float_grads(
        scene, lambda s: render_loss(s, target, KEY, W, H, spp=2)
    )
    for leaf, name in zip(g, names):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr)), f"non-finite gradient leaf {name}"


def test_select_leaves_paths():
    scene = _scene()
    train, rebuild, names = select_leaves(
        scene, ("materials.rgb", "lights.emission")
    )
    assert len(train) == 6  # rgb V3 (3 leaves) + emission V3 (3 leaves)
    assert all(
        "materials.rgb" in n or "lights.emission" in n for n in names
    )
    # rebuild with doubled leaves actually lands in the scene
    s2 = rebuild([t * 2.0 for t in train])
    np.testing.assert_allclose(
        np.asarray(s2.params.materials.rgb.x),
        np.asarray(scene.params.materials.rgb.x) * 2.0,
    )
    # integer leaves are never selected
    train2, _, names2 = select_leaves(scene, ("light_type", "emission"))
    assert all("light_type" not in n for n in names2)


@pytest.mark.slow
def test_inverse_rendering_recovers_params():
    # BASELINE config 4: recover albedo + light intensity from the target.
    scene = _scene(jnp.float64)
    key = jax.random.PRNGKey(0)
    # Target at spp 64 so the realization is close to the expected image;
    # the paired (two-render) loss in inverse_render then makes emission
    # recovery well-posed (single-sample MSE is biased dark: its optimum
    # trades bias^2 against Var(render), which grows with emission^2).
    target = pt.render_frame(scene, jax.random.PRNGKey(99), W, H, spp=64)

    # Perturb: darken right sphere, dim the light.
    m = scene.params.materials
    rgb = m.rgb
    rgb = pt.V3(
        rgb.x.at[1].set(0.3), rgb.y.at[1].set(0.6), rgb.z.at[1].set(0.8)
    )
    m2 = m._replace(rgb=rgb)
    lights2 = scene.lights._replace(emission=scene.lights.emission * 0.3)
    start = scene.replace(
        params=scene.params._replace(materials=m2), lights=lights2
    )

    res = inverse_render(
        start, target, key,
        select=("materials.rgb", "lights.emission"),
        width=W, height=H, steps=60, lr=5e-2, spp=8,
        param_transform=clamp_material_params,
    )
    # The loss floor is Monte-Carlo noise (target spp 8 vs render spp 8
    # with a different key); parameter recovery below is the real check.
    assert float(res.losses[-1]) < float(res.losses[0]) * 0.35

    # recovered right-sphere albedo near (1.0, 0.186, 0.0)
    rec = res.scene.params.materials.rgb
    np.testing.assert_allclose(float(rec.x[1]), 1.0, atol=0.15)
    np.testing.assert_allclose(float(rec.y[1]), 0.186, atol=0.15)
    np.testing.assert_allclose(float(rec.z[1]), 0.0, atol=0.15)
    # recovered light emission near 3.0
    np.testing.assert_allclose(
        float(res.scene.lights.emission.x[0]), 3.0, atol=0.8
    )
