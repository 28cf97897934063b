"""Scene abstraction: the reference's trait-object backend as data + pure fns.

Replaces `trait Scene` (rust-pathtracer/src/scene.rs:5-90). The reference
dispatches virtually per ray per bounce; here a `Scene` is a pytree
(differentiable `params`, `camera`, `lights`) plus three static pure
functions over whole ray batches. jit specializes on the functions; the
params flow through grad — which is how the reference's dormant rhai
scripting intent ("materials/scene parameters are data") becomes first-class
and differentiable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.vecmath import V3
from .camera import Pinhole
from .light import Lights
from .material import Material


class SurfaceHit(NamedTuple):
    """Vectorized result of closest_hit over a ray batch.

    Replaces the reference's mutation of State.{hit_dist, normal, material}
    (scene.rs:12-13, renderer/src/analytical.rs:36-127). `t` is +inf on
    miss; `material` must be the Material::new defaults on missed lanes
    (the tracer resets state.material each bounce, tracer.rs:63).
    """

    t: jnp.ndarray  # [N], +inf on miss
    normal: V3  # [N]
    material: Material  # [N] fields


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Scene = differentiable data + static pure functions.

    - background_fn(params, rd: V3) -> V3           (scene.rs:10)
    - closest_hit_fn(params, ro: V3, rd: V3) -> SurfaceHit   (scene.rs:13)
    - any_hit_fn(params, ro: V3, rd: V3, max_dist) -> bool[N] (scene.rs:16)

    camera/lights mirror scene.rs:19-25; recursion_depth the default-method
    (scene.rs:28-30). Emitter intersection (the sample_lights default method,
    scene.rs:36-86) lives in the integrator, generic over `lights`.

    `procedural_fn(params, hit, ro, rd) -> Material` is the optional
    post-hit material hook — the working realization of the reference's
    dormant scriptable-material surface (Material.procedural rhai FnPtr,
    material.rs:77, never invoked by its tracer): a pure JAX function of
    the hit point/normal/incoming direction that rewrites the surface
    material before finalize. Because it reads `params`, procedural
    patterns are differentiable scene parameters like everything else.
    """

    params: Any
    camera: Pinhole
    lights: Lights
    background_fn: Callable = dataclasses.field(metadata=dict(static=True))
    closest_hit_fn: Callable = dataclasses.field(metadata=dict(static=True))
    any_hit_fn: Callable = dataclasses.field(metadata=dict(static=True))
    recursion_depth: int = dataclasses.field(default=4, metadata=dict(static=True))
    procedural_fn: Callable | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def background(self, rd: V3) -> V3:
        return self.background_fn(self.params, rd)

    def closest_hit(self, ro: V3, rd: V3) -> SurfaceHit:
        hit = self.closest_hit_fn(self.params, ro, rd)
        if self.procedural_fn is not None:
            hit = hit._replace(
                material=self.procedural_fn(self.params, hit, ro, rd)
            )
        return hit

    def any_hit(self, ro: V3, rd: V3, max_dist) -> jnp.ndarray:
        return self.any_hit_fn(self.params, ro, rd, max_dist)

    @property
    def num_lights(self) -> int:
        return self.lights.count

    def replace(self, **kw) -> "Scene":
        return dataclasses.replace(self, **kw)
