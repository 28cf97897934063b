"""Cameras as differentiable pytrees + pure batched ray generators.

Replaces the reference Camera3D trait and Pinhole impl
(rust-pathtracer/src/camera/mod.rs:7-18, camera/pinhole.rs:5-62). The trait's
mutating set()/set_fov() become _replace on an immutable NamedTuple; gen_ray
is vectorized over the whole pixel/sample batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.vecmath import V2, V3, cross, normalize, v3


class Pinhole(NamedTuple):
    """Pinhole camera (pinhole.rs:5-10). Fields are differentiable leaves."""

    origin: V3
    center: V3
    fov: jnp.ndarray  # degrees, horizontal (pinhole.rs:43)

    def set(self, origin: V3, center: V3) -> "Pinhole":
        """pinhole.rs:27-30."""
        return self._replace(origin=origin, center=center)

    def set_fov(self, fov) -> "Pinhole":
        """pinhole.rs:32-34."""
        return self._replace(fov=jnp.asarray(fov, self.fov.dtype))


def orbit(cam: Pinhole, dyaw: float, dpitch: float) -> Pinhole:
    """Rotate the eye around the look-at center (the interactive-viewer
    analog of the reference's stubbed mouse plumbing,
    renderer/src/main.rs:133-190, driving Camera3D::set,
    pinhole.rs:27-30). Angles in radians; pitch clamped off the poles;
    distance to center preserved exactly."""
    import numpy as _np

    v = cam.origin - cam.center
    r = jnp.sqrt(v.dot(v))
    yaw = jnp.arctan2(v.x, v.z) + dyaw
    pitch = jnp.arcsin(jnp.clip(v.y / jnp.maximum(r, 1e-8), -1.0, 1.0))
    pitch = jnp.clip(pitch + dpitch, -1.45, 1.45)  # ~83 deg off-pole
    cp = jnp.cos(pitch)
    origin = V3(
        cam.center.x + r * cp * jnp.sin(yaw),
        cam.center.y + r * jnp.sin(pitch),
        cam.center.z + r * cp * jnp.cos(yaw),
    )
    return cam.set(origin, cam.center)


def zoom(cam: Pinhole, factor) -> Pinhole:
    """Scale the eye's distance to the center (dolly); factor > 1 moves
    away, < 1 moves in, floor keeps the eye off the center."""
    v = cam.origin - cam.center
    r = jnp.sqrt(v.dot(v))
    s = jnp.maximum(r * factor, 1e-3) / jnp.maximum(r, 1e-8)
    return cam.set(cam.center + v * s, cam.center)


def default_pinhole(dtype=jnp.float32) -> Pinhole:
    """Pinhole::new defaults: origin (0,0,3), center (0,0,0), fov 80
    (pinhole.rs:14-25)."""
    return Pinhole(
        origin=v3(0.0, 0.0, 3.0, dtype=dtype),
        center=v3(0.0, 0.0, 0.0, dtype=dtype),
        fov=jnp.asarray(80.0, dtype),
    )


def gen_ray(cam: Pinhole, p: V2, offset: V2, width, height) -> tuple[V3, V3]:
    """Batched Pinhole::gen_ray (pinhole.rs:38-61).

    p: normalized pixel coords in [0,1)^2 (x right, y up — see the tracer's
    coord construction at tracer.rs:36-46); offset: sub-pixel jitter in
    [0,1)^2 scaled by pixel size. Returns (origin V3, direction V3) with
    origin broadcast to the batch shape.

    Verbatim parity notes: the horizontal FOV convention
    (half_width = tan(fov/2), half_height = half_width/aspect,
    pinhole.rs:43-44) and the UNNORMALIZED u = up x w basis vector
    (pinhole.rs:49) are reproduced exactly.
    """
    ratio = width / height
    pixel_size = V2(1.0 / width, 1.0 / height)

    half_width = jnp.tan(jnp.deg2rad(cam.fov) * 0.5)
    half_height = half_width / ratio

    up = v3(0.0, 1.0, 0.0, dtype=jnp.asarray(cam.fov).dtype)
    w = normalize(cam.origin - cam.center)
    u = cross(up, w)
    v = cross(w, u)

    lower_left = cam.origin - u * half_width - v * half_height - w
    horizontal = u * (half_width * 2.0)
    vertical = v * (half_height * 2.0)

    rd = (
        (lower_left - cam.origin)
        + horizontal * (pixel_size.x * offset.x + p.x)
        + vertical * (pixel_size.y * offset.y + p.y)
    )
    direction = normalize(rd)
    ones = jnp.ones_like(direction.x)
    origin = V3(cam.origin.x * ones, cam.origin.y * ones, cam.origin.z * ones)
    return origin, direction


def pixel_coords(width: int, height: int, dtype=jnp.float32) -> V2:
    """Flat [H*W] normalized coords matching the reference's index->coord map.

    The reference walks the buffer bottom-up via par_rchunks and computes
    coord = (x/width, 1 - (height - i/width)/height) (tracer.rs:36-46), which
    for image row y (0 = top) reduces to coord_y = (height - 1 - y)/height.
    Row-major flat order here is top-to-bottom, matching ColorBuffer layout.
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    cx = (xs / width).reshape(-1)
    cy = ((height - 1.0 - ys) / height).reshape(-1)
    return V2(cx, cy)
