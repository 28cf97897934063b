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
