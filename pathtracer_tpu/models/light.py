"""Analytical lights as stacked differentiable arrays.

Replaces the reference's Light/LightType/AnalyticalLight
(rust-pathtracer/src/globals.rs:69-84, rust-pathtracer/src/light.rs:6-28).
A `Lights` pytree holds ALL scene lights as [L]-shaped arrays so the
integrator's uniform light pick (tracer.rs:136-141) is a gather, and light
parameters (position, radius, emission) are differentiable leaves for
inverse rendering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.vecmath import PI, V3, v3, zeros3


class LightType:
    """globals.rs:69-73. The reference integrator implements only SPHERICAL
    ("Only spherical analytical lights right now", Readme.md:16); this build
    implements all three declared types, following the conventions of the
    GLSL_PathTracer the reference is a port of (rect: uniform area sampling
    with pdf d^2/(area*|n.l|); distant: fixed direction, dist = inf,
    pdf = 1, never MIS-weighted since area = 0)."""

    RECTANGULAR = 0
    SPHERICAL = 1
    DISTANT = 2


class Lights(NamedTuple):
    """Stacked light records ([L]-shaped fields), globals.rs:75-84."""

    light_type: jnp.ndarray  # int32 [L]
    position: V3  # [L]
    emission: V3  # [L]
    u: V3  # [L] (rect lights; unused, parity)
    v: V3  # [L]
    radius: jnp.ndarray  # [L]
    area: jnp.ndarray  # [L]

    @property
    def count(self) -> int:
        return int(self.radius.shape[0])


def spherical_light(position, radius, emission, dtype=jnp.float32) -> Lights:
    """AnalyticalLight::spherical (light.rs:13-28): area = 4*pi*r^2."""
    pos = v3(*position, dtype=dtype) if not isinstance(position, V3) else position
    emi = v3(*emission, dtype=dtype) if not isinstance(emission, V3) else emission
    r = jnp.asarray(radius, dtype)
    one = lambda a: jnp.asarray(a)[None] if jnp.ndim(a) == 0 else jnp.asarray(a)
    lift = lambda w: V3(one(w.x), one(w.y), one(w.z))
    return Lights(
        light_type=jnp.asarray([LightType.SPHERICAL], jnp.int32),
        position=lift(pos),
        emission=lift(emi),
        u=zeros3((1,), dtype),
        v=zeros3((1,), dtype),
        radius=one(r),
        area=one(4.0 * PI * r * r),
    )


def _lift(w: V3) -> V3:
    one = lambda a: jnp.asarray(a)[None] if jnp.ndim(a) == 0 else jnp.asarray(a)
    return V3(one(w.x), one(w.y), one(w.z))


def rect_light(position, u, v_edge, emission, dtype=jnp.float32) -> Lights:
    """Rectangular area light spanned by edge vectors u, v from the corner
    `position`; area = |u x v|, normal = normalize(u x v). Fills the
    reference's declared-but-unimplemented LightType::Rectangular
    (globals.rs:70, Readme.md:17 TODO "More light types")."""
    pos = v3(*position, dtype=dtype) if not isinstance(position, V3) else position
    uu = v3(*u, dtype=dtype) if not isinstance(u, V3) else u
    vv = v3(*v_edge, dtype=dtype) if not isinstance(v_edge, V3) else v_edge
    emi = v3(*emission, dtype=dtype) if not isinstance(emission, V3) else emission
    area = uu.cross(vv).length()
    one = lambda a: jnp.asarray(a, dtype)[None]
    return Lights(
        light_type=jnp.asarray([LightType.RECTANGULAR], jnp.int32),
        position=_lift(pos),
        emission=_lift(emi),
        u=_lift(uu),
        v=_lift(vv),
        radius=one(0.0),
        area=one(area),
    )


def distant_light(direction, emission, dtype=jnp.float32) -> Lights:
    """Distant (directional) light: `direction` points FROM the shading
    point TOWARD the light (stored in `position` like the GLSL original).
    area = 0, so the integrator's `area > 0` MIS gate (tracer.rs:157-160)
    gives it weight 1 and the emitter pass never intersects it."""
    d = v3(*direction, dtype=dtype) if not isinstance(direction, V3) else direction
    emi = v3(*emission, dtype=dtype) if not isinstance(emission, V3) else emission
    one = lambda a: jnp.asarray(a, dtype)[None]
    return Lights(
        light_type=jnp.asarray([LightType.DISTANT], jnp.int32),
        position=_lift(d),
        emission=_lift(emi),
        u=zeros3((1,), dtype),
        v=zeros3((1,), dtype),
        radius=one(0.0),
        area=one(0.0),
    )


def concat_lights(*groups: Lights) -> Lights:
    """Combine light groups into one stacked table."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *groups
    )


def gather_light(lights: Lights, idx: jnp.ndarray) -> Lights:
    """Per-ray light selection (tracer.rs:141 `scene.light_at(index)`)."""
    return jax.tree_util.tree_map(lambda leaf: leaf[idx], lights)
