"""Physics invariants (SURVEY.md §4 item 3): checks against closed forms and
estimator identities, NOT against the oracle.

The parity suite proves the TPU path equals the scalar oracle; these tests
prove the *math itself* is physically coherent — a correlated bug in both
(e.g. a factor of pi inherited from a shared misreading of tracer.rs) fails
here even though parity passes.

Covers (VERDICT round 1, weak #6/#7):
- background-only render equals the analytic sky integral per pixel,
- energy conservation bound in a unit-radiance furnace sky,
- MIS vs BSDF-only vs NEE-only estimator agreement at high spp,
- sampler/pdf/eval coherence of the full Disney BSDF (the identity MIS
  relies on): E[f_sample/pdf_sample] == integral of f_eval, per material,
- GTR1 and GGX-VNDF pdf normalization by Monte Carlo.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.models.material import finalize_material, make_material
from pathtracer_tpu.ops.bsdf import disney_eval, disney_sample
from pathtracer_tpu.ops.sampling import gtr1, sample_ggxvndf
from pathtracer_tpu.ops.vecmath import V3

W, H = 24, 16


def _v3b(x, y, z, n):
    f = lambda c: jnp.full((n,), c, jnp.float64)
    return V3(f(x), f(y), f(z))


# ---------------------------------------------------------------------------
# Rendering-equation level invariants
# ---------------------------------------------------------------------------


def test_background_only_matches_analytic_sky():
    """Rays that miss everything must return exactly
    0.5 * tolinear(lerp(white, (0.5,0.7,1.0), 0.5(dir.y+1)))
    (analytical.rs:28-32) — no Monte-Carlo noise involved."""
    scene = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=4)
    # Aim straight up: geometry (spheres at y=0, plane y=-1) and the light
    # (moved far below) are all behind the camera.
    cam = scene.camera.set(
        pt.v3(0.0, 5.0, 0.0, dtype=jnp.float64),
        pt.v3(0.0, 6.0, 0.0, dtype=jnp.float64),
    )
    lights = scene.lights._replace(
        position=pt.v3(
            jnp.asarray([0.0], jnp.float64),
            jnp.asarray([-500.0], jnp.float64),
            jnp.asarray([0.0], jnp.float64),
        )
    )
    scene = scene.replace(camera=cam, lights=lights)

    key = jax.random.PRNGKey(0)
    img = np.asarray(pt.render_frame(scene, key, W, H))

    # Reconstruct the exact ray directions (same uniforms) and the closed
    # form of the sky.
    from pathtracer_tpu.integrator.tracer import draw_uniforms
    from pathtracer_tpu.models.camera import gen_ray, pixel_coords
    from pathtracer_tpu.ops.vecmath import V2

    cam_u, _ = draw_uniforms(key, W * H, scene.recursion_depth, jnp.float64)
    coords = pixel_coords(W, H, jnp.float64)
    _, rd = gen_ray(cam, coords, V2(cam_u[:, 0], cam_u[:, 1]), float(W), float(H))
    t = 0.5 * (np.asarray(rd.y) + 1.0)
    expect = np.stack(
        [
            0.5 * (1.0 * (1.0 - t) + c * t) ** 2.2
            for c in (0.5, 0.7, 1.0)
        ],
        axis=-1,
    ).reshape(H, W, 3)
    np.testing.assert_allclose(img[..., :3], expect, rtol=1e-12, atol=1e-12)


def test_furnace_energy_bound():
    """Unit-radiance uniform sky, passive scene (no lights, albedo 0.8):
    every pixel must stay <= 1. A lost/extra factor of pi or cos in the
    throughput update would blow straight through this bound (or collapse
    the interior to ~0.25)."""
    scene = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=8)
    p = scene.params
    m = p.materials
    n3 = lambda c: jax.tree_util.tree_map(lambda a: jnp.full_like(a, c), m.rgb)
    mats = m._replace(
        rgb=n3(0.8),
        metallic=jnp.zeros_like(m.metallic),
        roughness=jnp.full_like(m.roughness, 0.2),
        clearcoat=jnp.zeros_like(m.clearcoat),
        sheen=jnp.zeros_like(m.sheen),
        spec_trans=jnp.zeros_like(m.spec_trans),
    )
    p = p._replace(
        materials=mats,
        checker_albedo=jnp.asarray([0.8, 0.8], jnp.float64),
        sky_horizon=pt.v3(1.0, 1.0, 1.0, dtype=jnp.float64),
        sky_zenith=pt.v3(1.0, 1.0, 1.0, dtype=jnp.float64),
        sky_scale=jnp.asarray(1.0, jnp.float64),
    )
    # Light far away with zero emission: radiometrically inert.
    lights = scene.lights._replace(
        position=pt.v3(
            jnp.asarray([0.0], jnp.float64),
            jnp.asarray([-500.0], jnp.float64),
            jnp.asarray([0.0], jnp.float64),
        ),
        emission=pt.v3(
            jnp.asarray([0.0], jnp.float64),
            jnp.asarray([0.0], jnp.float64),
            jnp.asarray([0.0], jnp.float64),
        ),
    )
    scene = scene.replace(params=p, lights=lights)

    img = np.asarray(
        pt.render_frame(
            scene, jax.random.PRNGKey(1), W, H, spp=64, quirks=pt.FIXED
        )
    )[..., :3]
    # <= 1 everywhere (tiny slack for the dielectric specular lobe's
    # uncoupled energy and MC noise at spp=64).
    assert img.max() <= 1.03, img.max()
    # and not collapsed: sky pixels are exactly 1, surfaces bounded below.
    assert img.mean() > 0.55, img.mean()
    assert img.min() > 0.15, img.min()


def test_estimator_agreement_mis_bsdf_nee():
    """E[MIS] == E[BSDF-only] == E[NEE-only]: the three direct-lighting
    estimators integrate the same rendering equation; any pdf or weight
    error breaks the identity. FIXED quirks (the verbatim stale-gate /
    primary-MIS quirks deliberately bias emitter hits)."""
    scene = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=3)
    m = scene.params.materials
    # Soften the speculars: NEE through a near-mirror lobe is unbiased but
    # needs astronomic spp to converge; this test is about expectation
    # agreement, not variance heroics.
    mats = m._replace(
        roughness=jnp.asarray([0.4, 0.5, 1.0], jnp.float64),
        clearcoat=jnp.zeros_like(m.clearcoat),
    )
    scene = scene.replace(params=scene.params._replace(materials=mats))

    imgs = {}
    for est in ("mis", "bsdf", "nee"):
        acc = jnp.zeros((H, W, 4), jnp.float64)
        count = jnp.asarray(0.0)
        for s in range(4):
            f = pt.render_frame(
                scene, jax.random.PRNGKey(100 + s), W, H, spp=256,
                quirks=pt.FIXED, estimator=est,
            )
            acc, count = pt.accumulate(acc, f, count)
        imgs[est] = np.asarray(acc)[..., :3]

    for a, b in (("mis", "bsdf"), ("mis", "nee"), ("bsdf", "nee")):
        # Image means agree tightly; per-pixel agreement within MC noise.
        np.testing.assert_allclose(
            imgs[a].mean(), imgs[b].mean(), rtol=0.02,
            err_msg=f"{a} vs {b} image mean",
        )
        err = np.abs(imgs[a] - imgs[b])
        scale = np.maximum(imgs[a], imgs[b]) + 0.05
        frac_bad = (err / scale > 0.25).mean()
        assert frac_bad < 0.02, f"{a} vs {b}: {frac_bad:.3f} pixels off >25%"


def test_estimator_agreement_scatter_medium():
    """MIS vs NEE-only agreement through an HG scattering medium: the
    scatter-point NEE (phase-function MIS) and the emitter-hit weighting
    must integrate to the same expectation — a pdf/weight error in either
    the free-flight sampling, the HG phase, or the scatter MIS breaks it.
    (Catches correlated oracle+implementation bugs that the exact-parity
    tests in test_medium.py cannot; SURVEY.md §4 item 3.)"""
    scene = pt.make_analytical_scene(dtype=jnp.float64, recursion_depth=6)
    m = scene.params.materials
    med = m.medium
    mats = m._replace(
        roughness=jnp.asarray([0.4, 0.3, 1.0], jnp.float64),
        clearcoat=jnp.zeros_like(m.clearcoat),
        spec_trans=m.spec_trans.at[1].set(1.0),
        metallic=m.metallic.at[1].set(0.0),
        ior=m.ior.at[1].set(1.1),
        medium=med._replace(
            medium_type=med.medium_type.at[1].set(pt.MediumType.SCATTER),
            density=med.density.at[1].set(1.0),
            color=med.color._replace(
                x=med.color.x.at[1].set(0.9),
                y=med.color.y.at[1].set(0.9),
                z=med.color.z.at[1].set(0.9),
            ),
            anisotropy=med.anisotropy.at[1].set(0.3),
        ),
    )
    scene = scene.replace(params=scene.params._replace(materials=mats))

    imgs = {}
    for est in ("mis", "nee"):
        acc = jnp.zeros((H, W, 4), jnp.float64)
        count = jnp.asarray(0.0)
        for s in range(4):
            f = pt.render_frame(
                scene, jax.random.PRNGKey(300 + s), W, H, spp=256,
                quirks=pt.FIXED, estimator=est,
            )
            acc, count = pt.accumulate(acc, f, count)
        imgs[est] = np.asarray(acc)[..., :3]

    np.testing.assert_allclose(
        imgs["mis"].mean(), imgs["nee"].mean(), rtol=0.03,
        err_msg="mis vs nee image mean (scatter medium)",
    )
    err = np.abs(imgs["mis"] - imgs["nee"])
    scale = np.maximum(imgs["mis"], imgs["nee"]) + 0.05
    frac_bad = (err / scale > 0.25).mean()
    assert frac_bad < 0.03, f"scatter mis vs nee: {frac_bad:.3f} pixels off >25%"


# ---------------------------------------------------------------------------
# BSDF-level invariants
# ---------------------------------------------------------------------------


def _uniform_hemisphere(rng, n):
    z = rng.random(n)
    phi = rng.random(n) * 2.0 * np.pi
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return V3(
        jnp.asarray(r * np.cos(phi)), jnp.asarray(r * np.sin(phi)), jnp.asarray(z)
    )


def _uniform_sphere(rng, n):
    z = rng.random(n) * 2.0 - 1.0
    phi = rng.random(n) * 2.0 * np.pi
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return V3(
        jnp.asarray(r * np.cos(phi)), jnp.asarray(r * np.sin(phi)), jnp.asarray(z)
    )


def test_gtr1_pdf_normalization():
    """GTR1 D(h)·cos(h) integrates to 1 over the hemisphere — for the
    natural-log form (the GLSL original). The reference's log2 port quirk
    (tracer.rs:239) breaks normalization by exactly ln(2); assert that too,
    so the quirk's magnitude is pinned."""
    rng = np.random.default_rng(0)
    n = 400_000
    h = _uniform_hemisphere(rng, n)
    for a in (0.25, 0.6):
        d_ln = np.asarray(gtr1(h.z, a, use_log2=False))
        est = (d_ln * np.asarray(h.z)).mean() * 2.0 * np.pi
        np.testing.assert_allclose(est, 1.0, rtol=0.02)
        # log2 variant = ln-variant / log2(e) -> integrates to ln(2)
        d_l2 = np.asarray(gtr1(h.z, a, use_log2=True))
        est2 = (d_l2 * np.asarray(h.z)).mean() * 2.0 * np.pi
        np.testing.assert_allclose(est2, np.log(2.0), rtol=0.02)


def test_ggxvndf_pdf_normalization():
    """The VNDF reflection pdf used by eval_spec_reflection,
    pdf(l) = G1·D/(4 v.z), must be a normalized density over reflected
    directions: E_{l~sampler}[g(l)/pdf(l)] == ∫ g(l) dl for a smooth test
    function g (computed by uniform-hemisphere MC)."""
    from pathtracer_tpu.ops.sampling import gtr2_aniso, smithg_aniso
    from pathtracer_tpu.ops.vecmath import reflect, safe_normalize

    rng = np.random.default_rng(1)
    n = 400_000
    ax = ay = 0.45
    v = _v3b(np.sin(0.9), 0.0, np.cos(0.9), n)  # 51.6 deg incidence

    r1 = jnp.asarray(rng.random(n))
    r2 = jnp.asarray(rng.random(n))
    h = sample_ggxvndf(v, ax, ay, r1, r2)
    l = safe_normalize(reflect(-v, h))
    d = gtr2_aniso(h.z, h.x, h.y, ax, ay)
    g1 = smithg_aniso(jnp.abs(v.z), v.x, v.y, ax, ay)
    pdf = g1 * d / (4.0 * v.z)

    g = lambda w: np.maximum(np.asarray(w.z), 0.0) ** 2  # vanishes at horizon
    est_sampler = np.where(np.asarray(pdf) > 0, g(l) / np.asarray(pdf), 0.0).mean()
    expect = 2.0 * np.pi / 3.0  # ∫ cos^2 over hemisphere
    np.testing.assert_allclose(est_sampler, expect, rtol=0.03)


def _consistency_check(mat_kwargs, eta_ior, seed, rtol, full_sphere=False):
    """E_{l~disney_sample}[f/pdf] must equal ∫ f_eval(l) dl (uniform MC):
    the identity that makes MIS and the throughput update unbiased.

    Returns (est_sample, est_eval) per channel for callers that need the
    raw values (the glass test pins a reference-inherited mismatch)."""
    n = 400_000
    rng = np.random.default_rng(seed)
    mat0 = make_material(jnp.float64, **mat_kwargs)
    mat = finalize_material(
        jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (n,)), mat0)
    )
    nrm = _v3b(0.0, 0.0, 1.0, n)
    v = _v3b(np.sin(0.7), 0.0, np.cos(0.7), n)
    prev_l = _v3b(0.3, -0.2, 0.93, n)  # arbitrary stale-l (cancels in E[])
    eta = jnp.full((n,), eta_ior, jnp.float64)

    u = jnp.asarray(rng.random((n, 3)))
    bs = disney_sample(mat, eta, v, nrm, prev_l, u)
    pdf = np.asarray(bs.pdf)
    ok = pdf > 1e-9
    est_sample = np.stack(
        [np.where(ok, np.asarray(c) / np.where(ok, pdf, 1.0), 0.0).mean()
         for c in (bs.f.x, bs.f.y, bs.f.z)]
    )

    l_unif = _uniform_sphere(rng, n) if full_sphere else _uniform_hemisphere(rng, n)
    f_eval, _ = disney_eval(mat, eta, v, nrm, l_unif)
    measure = 4.0 * np.pi if full_sphere else 2.0 * np.pi
    est_eval = np.stack(
        [np.asarray(c).mean() * measure for c in (f_eval.x, f_eval.y, f_eval.z)]
    )
    if rtol is not None:
        np.testing.assert_allclose(est_sample, est_eval, rtol=rtol, atol=5e-4)
    return est_sample, est_eval


def test_disney_sample_eval_consistency_diffuse_sheen():
    _consistency_check(
        dict(rgb=(0.7, 0.4, 0.2), roughness=0.6, sheen=0.8, sheen_tint=0.5),
        1.0 / 1.45, seed=2, rtol=0.02,
    )


def test_disney_sample_eval_consistency_rough_metal_aniso():
    _consistency_check(
        dict(rgb=(0.9, 0.7, 0.3), roughness=0.35, metallic=1.0, anisotropic=0.6),
        1.0 / 1.45, seed=3, rtol=0.03,
    )


def test_disney_sample_eval_consistency_clearcoat():
    _consistency_check(
        dict(rgb=(0.4, 0.1, 0.1), roughness=0.4, clearcoat=1.0,
             clearcoat_gloss=0.4),
        1.0 / 1.45, seed=4, rtol=0.03,
    )


def test_disney_sample_eval_consistency_glass():
    """spec_trans > 0 (full-sphere support). The refraction lobes of sample
    and eval are NOT exactly consistent — a reference-inherited quirk this
    test discovered and pins: eval_spec_refraction (tracer.rs:384-402,
    verbatim from GLSL_PathTracer's EvalDielectricRefraction) has no
    v.h > 0 gate, so for transmitted directions outside the image of
    refract(-v, h~VNDF, eta) — beyond the Snell cone — it still evaluates a
    nonzero f from the algebraically-recovered half vector. The uniform-MC
    eval integral therefore exceeds the sampler's estimate of the same lobe
    by ~5-7% at roughness 0.4 / ior 1.5 (measured: 0.9460-0.9571 ratio over
    seeds at n=2e6). The reflection+diffuse hemisphere agrees tightly. The
    renderer's estimators remain unbiased (f/pdf is self-consistent within
    each); the mismatch only perturbs MIS weights at glass NEE — exactly as
    in the reference."""
    est_s, est_e = _consistency_check(
        dict(rgb=(0.9, 0.9, 0.9), roughness=0.4, spec_trans=0.9, ior=1.5),
        1.0 / 1.5, seed=5, rtol=None, full_sphere=True,
    )
    ratio = est_s / est_e
    assert np.all(ratio > 0.90) and np.all(ratio < 1.0), ratio
