"""Live HTTP viewer (utils/viewer.py) + occupancy metric tests.

The viewer replaces the reference's windowed progressive display
(renderer/src/main.rs:34-194) with a multipart PNG stream; the occupancy
metric is the masking-economics measurement SURVEY.md §7 calls for.
"""

import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.utils.viewer import LiveViewer


def test_viewer_serves_page_and_frame():
    viewer = LiveViewer(port=0, host="127.0.0.1")
    try:
        # index page before any frame
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{viewer.port}/", timeout=10
        ).read()
        assert b"/stream" in page

        # publish a frame, fetch the snapshot endpoint
        pixels = np.zeros((8, 16, 4), np.float32)
        pixels[..., 0] = 0.5
        pixels[..., 3] = 1.0
        viewer.update(pixels)
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{viewer.port}/frame.png", timeout=10
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        from pathtracer_tpu.utils.image import read_png

        img = read_png_bytes(png)
        assert img.shape == (8, 16, 4)
        # 0.5 linear -> gamma 2.2 -> ~186
        assert abs(int(img[0, 0, 0]) - int(0.5 ** (1 / 2.2) * 255)) <= 2
    finally:
        viewer.close()


def read_png_bytes(data: bytes):
    import io
    import os
    import tempfile

    from pathtracer_tpu.utils.image import read_png

    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return read_png(path)
    finally:
        os.unlink(path)


def test_occupancy_monotone_decay():
    """Alive-lane fraction starts at 1 and can only fall (no russian
    roulette, no respawn — tracer.rs:61-103's breaks are one-way)."""
    from pathtracer_tpu.integrator.tracer import measure_occupancy

    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=4)
    occ = np.asarray(
        measure_occupancy(scene, jax.random.PRNGKey(0), 64, 48)
    )
    assert occ.shape == (4,)
    assert occ[0] == 1.0
    assert np.all(np.diff(occ) <= 0.0)
    assert np.all((occ >= 0.0) & (occ <= 1.0))


def test_control_post_roundtrip():
    """POST /control JSON messages are drained by pop_controls() in order
    (the browser-to-render-loop half of the interactive viewer)."""
    import json
    import urllib.request

    from pathtracer_tpu.utils.viewer import LiveViewer

    v = LiveViewer(port=0, host="127.0.0.1")
    try:
        for msg in ({"orbit": [3, -2]}, {"zoom": 0.9}, {"reset": True}):
            req = urllib.request.Request(
                f"http://127.0.0.1:{v.port}/control",
                data=json.dumps(msg).encode(),
                method="POST",
            )
            assert urllib.request.urlopen(req, timeout=10).status == 204
        msgs = v.pop_controls()
        assert msgs == [{"orbit": [3, -2]}, {"zoom": 0.9}, {"reset": True}]
        assert v.pop_controls() == []
        # malformed body -> 400, not queued
        req = urllib.request.Request(
            f"http://127.0.0.1:{v.port}/control", data=b"not json",
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert v.pop_controls() == []
    finally:
        v.close()


def test_orbit_zoom_camera_math():
    """orbit preserves the center distance; zoom scales it; both keep the
    look-at center fixed (Camera3D::set semantics, pinhole.rs:27-30)."""
    import jax.numpy as jnp

    from pathtracer_tpu.models.camera import default_pinhole, orbit, zoom

    cam = default_pinhole()
    c2 = orbit(cam, 0.4, 0.2)
    v0 = cam.origin - cam.center
    v1 = c2.origin - c2.center
    r0 = float(jnp.sqrt(v0.dot(v0)))
    r1 = float(jnp.sqrt(v1.dot(v1)))
    assert abs(r0 - r1) < 1e-5
    assert float(jnp.abs(c2.center.x - cam.center.x)) == 0.0
    # the eye actually moved
    assert float(jnp.abs(c2.origin.x - cam.origin.x)) > 1e-3

    c3 = zoom(cam, 0.5)
    v2 = c3.origin - c3.center
    assert abs(float(jnp.sqrt(v2.dot(v2))) - 0.5 * r0) < 1e-5
    # pitch clamps off the pole
    c4 = orbit(cam, 0.0, 99.0)
    v4 = c4.origin - c4.center
    assert float(v4.y) / r0 < 0.9951  # sin(1.45) ~ 0.9927
