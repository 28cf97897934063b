"""Scene description files (utils/sceneio): JSON round-trip, overrides,
error surface, CLI wiring. Anchor: the reference's dormant scene-scripting
intent (/root/reference/rust-pathtracer/src/fx.rs:124-166) realized as a
parameter file over the scene pytree."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.utils.sceneio import (
    load_scene,
    save_scene,
    scene_from_dict,
    scene_to_dict,
)

KEY = jax.random.PRNGKey(0)


def test_roundtrip_renders_identically(tmp_path):
    scene = pt.make_analytical_scene(recursion_depth=2)
    p = str(tmp_path / "scene.json")
    save_scene(scene, p, "analytical")
    s2 = load_scene(p)
    a = pt.render_frame(scene, KEY, 48, 32)
    b = pt.render_frame(s2, KEY, 48, 32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_description_overrides_defaults():
    scene = pt.make_analytical_scene(recursion_depth=2)
    desc = {
        "family": "analytical",
        "recursion_depth": 2,
        "params": {".sphere_radius": [0.25, 1.0]},
        "lights": {".emission.x": [9.0]},
    }
    s2 = scene_from_dict(desc)
    assert float(s2.params.sphere_radius[0]) == 0.25
    assert float(s2.lights.emission.x[0]) == 9.0
    # untouched leaves keep defaults
    np.testing.assert_array_equal(
        np.asarray(s2.params.sky_zenith.x), np.asarray(scene.params.sky_zenith.x)
    )
    a = pt.render_frame(scene, KEY, 48, 32)
    c = pt.render_frame(s2, KEY, 48, 32)
    assert (np.asarray(a) != np.asarray(c)).any()


def test_sdf_family_roundtrip(tmp_path):
    from pathtracer_tpu.models.sdf import make_scene

    scene = make_scene(recursion_depth=2)
    p = str(tmp_path / "sdf.json")
    save_scene(scene, p, "sdf")
    s2 = load_scene(p)
    a = pt.render_frame(scene, KEY, 32, 24)
    b = pt.render_frame(s2, KEY, 32, 24)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unknown_leaf_and_bad_shape_rejected():
    with pytest.raises(KeyError):
        scene_from_dict({"family": "analytical",
                         "params": {".sphere_radiuz": [1.0]}})
    with pytest.raises(ValueError):
        scene_from_dict({"family": "analytical",
                         "params": {".sphere_radius": [1.0, 2.0, 3.0]}})
    with pytest.raises(ValueError):
        scene_from_dict({"family": "no_such_family"})


def test_depth_argument_overrides_file():
    desc = scene_to_dict(pt.make_analytical_scene(recursion_depth=4),
                         "analytical")
    s2 = scene_from_dict(desc, recursion_depth=2)
    assert s2.recursion_depth == 2


def test_cli_file_scene(tmp_path):
    """app/render.py --scene file:PATH renders the described scene."""
    import subprocess
    import sys
    import os

    scene = pt.make_analytical_scene(recursion_depth=2)
    p = str(tmp_path / "scene.json")
    save_scene(scene, p, "analytical")
    out = str(tmp_path / "out.png")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "app", "render.py"),
         "--scene", f"file:{p}", "--width", "32", "--height", "16",
         "--frames", "1", "--depth", "2", "-o", out],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out)
