"""Native C++ runtime (native/runtime.cpp via utils/native.py): parity with
the pure-Python presentation path it accelerates.

The library auto-builds on first import (g++ + zlib); if the toolchain is
absent the whole module is skipped — the Python fallbacks in utils.buffer /
utils.image are covered by test_utils.py either way.
"""

import numpy as np
import pytest

from pathtracer_tpu.utils import buffer, image

native = pytest.importorskip("pathtracer_tpu.utils.native")


@pytest.fixture(scope="module")
def pixels():
    rng = np.random.default_rng(7)
    px = (rng.random((41, 67, 4)) * 1.5).astype(np.float32)
    px[0, 0] = [np.nan, -1.0, 2.0, 0.5]  # NaN / negative / overbright
    px[1, 1] = [0.0, 1.0, 0.9999, 1.0]
    return px


def test_tonemap_gamma_parity(pixels):
    assert np.array_equal(native.tonemap_u8(pixels, True), buffer.to_u8(pixels))


def test_tonemap_linear_parity(pixels):
    ref = np.clip(
        np.nan_to_num(pixels.astype(np.float64)) * 255.0, 0, 255
    ).astype(np.uint8)
    assert np.array_equal(native.tonemap_u8(pixels, False), ref)


def test_png_roundtrip(tmp_path, pixels):
    u8 = native.tonemap_u8(pixels, True)
    p = tmp_path / "native.png"
    p.write_bytes(native.encode_png(u8))
    assert np.array_equal(image.read_png(str(p)), u8)


def test_fused_tonemap_encode(tmp_path, pixels):
    p = tmp_path / "fused.png"
    p.write_bytes(native.tonemap_encode_png(pixels, True))
    assert np.array_equal(image.read_png(str(p)), buffer.to_u8(pixels))


def test_blit_parity(pixels):
    frame_n = np.zeros((60, 90, 4), np.uint8)
    native.blit_u8(pixels, frame_n, (11, 5))
    frame_p = np.zeros((60, 90, 4), np.uint8)
    buffer.blit_u8(np.nan_to_num(np.clip(pixels, 0, None)), frame_p, (11, 5))
    assert np.array_equal(frame_n, frame_p)


def test_blit_clips_at_frame_edge(pixels):
    frame = np.zeros((20, 20, 4), np.uint8)
    native.blit_u8(pixels, frame, (10, 10))  # src larger than remaining space
    assert frame[:10, :10].sum() == 0  # untouched region
    assert frame[10:, 10:].any()


def test_save_render_uses_native(tmp_path, pixels):
    p = tmp_path / "render.png"
    image.save_render(str(p), pixels)
    assert np.array_equal(image.read_png(str(p)), buffer.to_u8(pixels))
