"""ctypes bindings for the native C++ runtime (native/runtime.cpp).

The host-side presentation layer — threaded tonemap, blit, and PNG encode —
mirrors the reference's rayon-parallel buffer conversion
(rust-pathtracer/src/buffer.rs:37-102) as a C++ shared library. Python
falls back to the pure-NumPy implementations in utils.buffer/utils.image
whenever the library is absent and the toolchain can't build it, so the
framework stays importable in hermetic environments.

Importing this module raises ImportError if the library can't be loaded or
built; call sites treat that as "use the Python fallback".
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libptruntime.so")


def _build() -> None:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR],
        check=True,
        capture_output=True,
        timeout=120,
    )


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "runtime.cpp")
        if not os.path.exists(src):
            raise ImportError(f"native runtime source missing: {src}")
        try:
            _build()
        except Exception as e:  # toolchain absent / build failure
            raise ImportError(f"native runtime build failed: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)

    lib.pt_tonemap_u8.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pt_tonemap_u8.restype = None

    lib.pt_blit_u8.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.pt_blit_u8.restype = None

    lib.pt_png_bound.argtypes = [ctypes.c_int64] * 3
    lib.pt_png_bound.restype = ctypes.c_int64

    lib.pt_encode_png.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.pt_encode_png.restype = ctypes.c_int64

    lib.pt_tonemap_encode_png.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.pt_tonemap_encode_png.restype = ctypes.c_int64

    return lib


_lib = _load()


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def tonemap_u8(pixels: np.ndarray, gamma: bool = True) -> np.ndarray:
    """Threaded gamma/linear encode of a linear [H, W, 4] f32 buffer to u8
    (buffer.rs:37-64 convert_to_u8; gamma=False is the convert_to_u8_at
    linear variant)."""
    a = np.ascontiguousarray(pixels, np.float32)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError(f"expected [H,W,4] f32, got {a.shape}")
    out = np.empty(a.shape, np.uint8)
    _lib.pt_tonemap_u8(_f32ptr(a), a.shape[0] * a.shape[1], int(gamma), _u8ptr(out))
    return out


def blit_u8(src: np.ndarray, frame: np.ndarray, at: tuple[int, int]) -> np.ndarray:
    """Blit a linear [h, w, 4] f32 buffer into a u8 RGBA frame at (x0, y0),
    linear encode, clipped — convert_to_u8_at (buffer.rs:67-102). Mutates
    and returns `frame`."""
    a = np.ascontiguousarray(src, np.float32)
    if frame.dtype != np.uint8 or not frame.flags.c_contiguous:
        raise ValueError("frame must be contiguous uint8 [FH, FW, 4]")
    _lib.pt_blit_u8(
        _f32ptr(a), a.shape[0], a.shape[1],
        _u8ptr(frame), frame.shape[0], frame.shape[1],
        int(at[0]), int(at[1]),
    )
    return frame


def encode_png(rgba_u8: np.ndarray) -> bytes:
    """zlib PNG encode of an [H, W, 3|4] u8 image."""
    a = np.ascontiguousarray(rgba_u8)
    h, w, c = a.shape
    cap = int(_lib.pt_png_bound(h, w, c))
    out = np.empty(cap, np.uint8)
    n = int(_lib.pt_encode_png(_u8ptr(a), h, w, c, _u8ptr(out), cap))
    if n < 0:
        raise RuntimeError("pt_encode_png failed")
    return out[:n].tobytes()


def tonemap_encode_png(pixels: np.ndarray, gamma: bool = True) -> bytes:
    """Fused threaded tonemap + PNG encode of a linear [H, W, 4] buffer."""
    a = np.ascontiguousarray(pixels, np.float32)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError(f"expected [H,W,4] f32, got {a.shape}")
    h, w = a.shape[:2]
    cap = int(_lib.pt_png_bound(h, w, 4))
    out = np.empty(cap, np.uint8)
    n = int(_lib.pt_tonemap_encode_png(_f32ptr(a), h, w, int(gamma), _u8ptr(out), cap))
    if n < 0:
        raise RuntimeError("pt_tonemap_encode_png failed")
    return out[:n].tobytes()
