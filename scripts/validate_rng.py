#!/usr/bin/env python
"""Validate the megakernel's in-kernel TPU PRNG on hardware and record an
artifact (RNG_VALIDATION.json) — the witnesses VERDICT round 1 asked for
beyond the bench itself:

1. KS uniformity of the 24-bit uniform stream (per tile and pooled).
2. Cross-tile and cross-seed stream independence (max |corr|, collisions).
3. hbm-vs-inkernel estimator agreement: the same frame rendered with
   threefry uniforms (oracle-validated) and with the in-kernel PRNG must
   agree in expectation — mean image difference within MC error at the
   measured per-pixel variance.

Run on a TPU host: python scripts/validate_rng.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def ks_stat(flat: np.ndarray) -> float:
    n = flat.size
    s = np.sort(flat.astype(np.float64))
    grid = np.arange(1, n + 1) / n
    return float(np.max(np.maximum(np.abs(s - grid), np.abs(s - grid + 1.0 / n))))


def main() -> int:
    import pathtracer_tpu as pt
    from pathtracer_tpu.ops.megakernel import debug_uniform_stream, render_frame_pallas

    on_tpu = jax.devices()[0].platform != "cpu"
    result = {"platform": jax.devices()[0].platform}

    # --- 1/2: raw stream statistics ---
    num_tiles, n_uniforms, tile_rows = 16, 16, 8
    out = np.asarray(
        debug_uniform_stream(1234, num_tiles, n_uniforms, tile_rows,
                             interpret=not on_tpu)
    )
    flat = out.reshape(-1)
    n = flat.size
    result["stream"] = {
        "n": int(n),
        "min": float(flat.min()),
        "max": float(flat.max()),
        "mean": float(flat.mean()),
        "var": float(flat.var()),
        "ks": ks_stat(flat),
        "ks_critical_1pct": float(1.63 / np.sqrt(n)),
    }
    tiles = out.reshape(num_tiles, -1).astype(np.float64)
    corrs = [
        abs(float(np.corrcoef(tiles[i], tiles[j])[0, 1]))
        for i in range(num_tiles)
        for j in range(i + 1, num_tiles)
    ]
    other = np.asarray(
        debug_uniform_stream(1235, num_tiles, n_uniforms, tile_rows,
                             interpret=not on_tpu)
    )
    result["independence"] = {
        "max_cross_tile_abs_corr": max(corrs),
        "cross_seed_collision_rate": float(np.mean(out == other)),
        "per_tile_ks_max": max(
            ks_stat(tiles[i]) for i in range(num_tiles)
        ),
    }

    # --- 3: hbm-vs-inkernel estimator agreement ---
    W, H, frames = 160, 120, 64
    scene = pt.make_analytical_scene(dtype=jnp.float32, recursion_depth=4)

    def avg(mode, base_seed):
        acc = jnp.zeros((H, W, 4), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(base_seed), frames)
        per_frame = []
        for i in range(frames):
            f = render_frame_pallas(
                scene, keys[i], W, H, uniforms=mode, interpret=not on_tpu,
                tile_rows=8,
            )
            per_frame.append(np.asarray(f[..., :3]))
            acc = acc + f
        mean = np.asarray(acc)[..., :3] / frames
        var = np.var(np.stack(per_frame), axis=0)
        return mean, var

    m_hbm, v_hbm = avg("hbm", 0)
    m_ink, v_ink = avg("inkernel", 1)
    diff = m_ink - m_hbm
    # standard error of the difference of two frame-averaged means
    se = np.sqrt((v_hbm + v_ink) / frames) + 1e-6
    z = diff / se
    result["estimator_agreement"] = {
        "frames": frames,
        "mean_image_hbm": float(m_hbm.mean()),
        "mean_image_inkernel": float(m_ink.mean()),
        "mean_abs_diff": float(np.abs(diff).mean()),
        "z_abs_p99": float(np.percentile(np.abs(z), 99)),
        "z_abs_max": float(np.abs(z).max()),
        "frac_abs_z_gt_4": float((np.abs(z) > 4).mean()),
    }

    ok = (
        result["stream"]["ks"] < result["stream"]["ks_critical_1pct"]
        and result["stream"]["max"] < 1.0
        and result["stream"]["min"] >= 0.0
        and abs(result["stream"]["mean"] - 0.5) < 0.005
        and result["independence"]["max_cross_tile_abs_corr"] < 0.05
        and result["independence"]["cross_seed_collision_rate"] < 0.01
        and abs(
            result["estimator_agreement"]["mean_image_inkernel"]
            - result["estimator_agreement"]["mean_image_hbm"]
        ) < 0.003
        and result["estimator_agreement"]["frac_abs_z_gt_4"] < 0.005
    )
    result["ok"] = bool(ok)

    out_path = os.path.join(os.path.dirname(__file__), "..", "RNG_VALIDATION.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
