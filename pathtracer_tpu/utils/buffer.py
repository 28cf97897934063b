"""ColorBuffer: the progressive accumulation target.

Replaces rust-pathtracer/src/buffer.rs:6-102. The reference holds a host
Vec<f32> mutated by rayon threads; here the buffer is a device-resident
[H, W, 4] array updated functionally (the running mean fold lives in
integrator.accumulate, tracer.rs:115,121). Conversion to u8 applies the
same gamma 1/2.2 ≈ 0.4545 encode on RGB with linear alpha
(buffer.rs:46,59).

The whole render state is (pixels, frames) — checkpoint/resume (which the
reference lists as an unimplemented TODO, Readme.md:74) is therefore a
two-array serialization; see utils/checkpoint.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ColorBuffer(NamedTuple):
    """RGBA accumulation buffer + frame counter (buffer.rs:6-14)."""

    pixels: jnp.ndarray  # [H, W, 4] linear RGBA
    frames: jnp.ndarray  # scalar float (frame count)

    @property
    def width(self) -> int:
        return int(self.pixels.shape[1])

    @property
    def height(self) -> int:
        return int(self.pixels.shape[0])

    def at(self, x: int, y: int) -> jnp.ndarray:
        """Pixel accessor (buffer.rs:29-32)."""
        return self.pixels[y, x]


def new_buffer(width: int, height: int, dtype=jnp.float32) -> ColorBuffer:
    """ColorBuffer::new (buffer.rs:18-26)."""
    return ColorBuffer(
        pixels=jnp.zeros((height, width, 4), dtype),
        frames=jnp.zeros((), dtype),
    )


def to_u8(pixels) -> np.ndarray:
    """Gamma-encode linear RGBA to u8 (buffer.rs:37-52 to_u8_vec /
    convert_to_u8): rgb^0.4545 * 255, alpha linear * 255, truncating cast
    like Rust's `as u8` (saturating at the ends)."""
    a = np.asarray(pixels, np.float64)
    out = np.empty_like(a)
    out[..., :3] = np.power(np.maximum(a[..., :3], 0.0), 0.4545) * 255.0
    out[..., 3] = a[..., 3] * 255.0
    # NaN -> 0 like Rust's saturating `as u8` cast (buffer.rs:46-50).
    return np.clip(np.nan_to_num(out), 0.0, 255.0).astype(np.uint8)


def blit_u8(
    src_pixels, frame: np.ndarray, at: tuple[int, int]
) -> np.ndarray:
    """Blit a buffer into a larger u8 frame at an offset — the reference's
    convert_to_u8_at (buffer.rs:67-102), which notably does NOT gamma-encode
    (parity preserved: linear * 255)."""
    a = np.asarray(src_pixels, np.float64)
    h, w = a.shape[:2]
    x0, y0 = at
    u8 = np.clip(a * 255.0, 0.0, 255.0).astype(np.uint8)
    frame[y0 : y0 + h, x0 : x0 + w, : a.shape[-1]] = u8
    return frame
