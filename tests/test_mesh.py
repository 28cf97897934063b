"""Triangle-mesh scene family (models/mesh.py + ops/megakernel_mesh.py).

The reference has no mesh support (analytic spheres + plane only,
renderer/src/analytical.rs:163-213); this family exceeds its scope through
the same Scene protocol and the generic KernelBackend seam. Validation
mirrors the SDF family's pattern: closed-form intersection unit tests, the
oracle-validated XLA integrator as the image anchor, and hbm-uniform
bit-parity between the fused kernel and the XLA path — plus vertex
gradients (mesh geometry is differentiable like sphere centers).
"""

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.models.mesh import make_scene as make_mesh_scene
from pathtracer_tpu.ops.intersect import ray_triangle
from pathtracer_tpu.ops.megakernel import _resolve_backend, render_frame_pallas
from pathtracer_tpu.ops.vecmath import v3

KEY = jax.random.PRNGKey(7)
W, H = 64, 32


def test_ray_triangle_closed_form():
    """Unit triangle in the z=0 plane: hits at the centroid, misses outside,
    two-sided (hit from behind too), miss when parallel."""
    tri = (v3(0.0, 0.0, 0.0), v3(1.0, 0.0, 0.0), v3(0.0, 1.0, 0.0))
    ro = v3(0.25, 0.25, 1.0)
    rd = v3(0.0, 0.0, -1.0)
    t = ray_triangle(ro, rd, *tri)
    np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)
    # from behind (two-sided)
    t2 = ray_triangle(v3(0.25, 0.25, -2.0), v3(0.0, 0.0, 1.0), *tri)
    np.testing.assert_allclose(float(t2), 2.0, rtol=1e-6)
    # outside the triangle
    assert not np.isfinite(float(ray_triangle(v3(0.9, 0.9, 1.0), rd, *tri)))
    # parallel ray
    assert not np.isfinite(
        float(ray_triangle(v3(0.2, 0.2, 1.0), v3(1.0, 0.0, 0.0), *tri))
    )


def test_mesh_scene_renders_and_dispatches():
    scene = make_mesh_scene(recursion_depth=2)
    assert _resolve_backend(scene).name == "mesh"
    img = np.asarray(pt.render_frame(scene, KEY, W, H, spp=1))
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.01  # scene is lit
    # closest-hit sanity: center row must hit geometry (not sky): a ray
    # through the pyramid/cube region returns a finite t
    p = scene.params
    hit = scene.closest_hit(
        v3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([6.0])),
        v3(jnp.asarray([0.2]), jnp.asarray([-0.05]), jnp.asarray([-1.0])).normalize(),
    )
    assert np.isfinite(float(hit.t[0]))


def test_mesh_kernel_matches_xla():
    """Fused mesh kernel vs the XLA integrator on identical threefry
    uniforms — the same gate the analytical/SDF backends pass."""
    scene = make_mesh_scene(recursion_depth=3)
    img_xla = pt.render_frame(scene, KEY, W, H, spp=1)
    img_pal = render_frame_pallas(
        scene, KEY, W, H, spp=1, uniforms="hbm", tile_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(img_pal), np.asarray(img_xla), rtol=1e-4, atol=1e-5
    )


def test_mesh_procedural_hook_in_kernel():
    """Scene.procedural_fn traced into the MESH kernel (the dormant rhai
    intent, material.rs:77): the hook reads the rebuilt MeshParams view and
    rewrites the surface material; kernel matches XLA on hbm uniforms."""

    def hook(params, hit, ro, rd):
        m = hit.material
        y = (ro + rd * jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)).y
        return m._replace(rgb=m.rgb * jnp.clip(0.5 + 0.25 * y, 0.2, 1.0))

    # the 3-tri scene: hook mechanics are per-material, not per-triangle,
    # and the small mesh keeps the interpret compile to ~1 min
    scene = _tiny_mesh_scene(recursion_depth=2).replace(procedural_fn=hook)
    img_xla = pt.render_frame(scene, KEY, W, H, spp=1)
    img_pal = render_frame_pallas(
        scene, KEY, W, H, spp=1, uniforms="hbm", tile_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(img_pal), np.asarray(img_xla), rtol=1e-4, atol=1e-5
    )


def _tiny_mesh_scene(recursion_depth=2):
    """3-triangle scene (ground quad + one standing triangle): keeps the
    interpret-mode BACKWARD kernel compile tractable — the full 20-tri demo
    mesh takes XLA-CPU ~20 min to compile the unrolled vjp chain, the
    3-tri version ~2 min; the math exercised per triangle is identical."""
    import dataclasses

    from pathtracer_tpu.models.mesh import MeshParams, default_params

    full = default_params(jnp.float32)
    s = 4.0
    verts = [(-s, -1.0, -s), (s, -1.0, -s), (s, -1.0, s), (-s, -1.0, s),
             (-0.8, -1.0, 0.0), (0.8, -1.0, 0.0), (0.0, 0.9, 0.0)]
    params = dataclasses.replace(
        full,
        vertices=pt.V3(
            jnp.asarray([p[0] for p in verts], jnp.float32),
            jnp.asarray([p[1] for p in verts], jnp.float32),
            jnp.asarray([p[2] for p in verts], jnp.float32),
        ),
        tri_idx=((0, 1, 2), (0, 2, 3), (4, 5, 6)),
        tri_mat=(0, 0, 2),
    )
    return make_mesh_scene(recursion_depth=recursion_depth, params=params)


def test_mesh_vertex_gradients_match_xla():
    """d(loss)/d(vertex positions) through the backward kernel vs the XLA
    detached estimator: mesh geometry is differentiable end to end."""
    scene = _tiny_mesh_scene(recursion_depth=2)

    def mk(vy):
        p = scene.params
        return scene.replace(
            params=p._replace(vertices=p.vertices._replace(y=vy))
        )

    def loss_pal(vy):
        img = render_frame_pallas(
            mk(vy), KEY, W, H, spp=1, uniforms="hbm", tile_rows=8,
            interpret=True,
        )
        return jnp.mean(img[..., :3] ** 2)

    def loss_xla(vy):
        img = pt.render_frame(mk(vy), KEY, W, H, spp=1, detach=True, remat=True)
        return jnp.mean(img[..., :3] ** 2)

    vy = scene.params.vertices.y
    g_pal = np.asarray(jax.grad(loss_pal)(vy))
    g_xla = np.asarray(jax.grad(loss_xla)(vy))
    np.testing.assert_allclose(g_pal, g_xla, rtol=5e-3, atol=1e-7)
    assert np.abs(g_pal).max() > 1e-6
