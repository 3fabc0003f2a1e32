"""Generate the checked-in warp goldens (FIXTURES.md §6): a standalone float64
evaluation of the warp recipe for a grid of (image, projection, filter) cases.
The pipeline (which runs float32) must agree with these at PSNR ≥ 50 dB.

    PYTHONPATH=. python tools/make_goldens.py   # writes tests/goldens/warp_golden.npz
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projcl_ray.images import synth_pixels
from projcl_ray.proj import ProjParams, prepare
from projcl_ray.warp import GeoRef, SAMPLERS, default_warp_window, dest_grid

CASES = [
    # (seed, w, h, proj, params_kw)
    (0, 64, 64, "mercator", dict(spheroid="WGS_84")),
    (1, 96, 64, "transverse_mercator", dict(spheroid="WGS_84")),
    (2, 64, 96, "albers_equal_area", dict(spheroid="SPHERE", rlat1=30, rlat2=60)),
    (3, 80, 80, "winkel_tripel", dict(spheroid="SPHERE")),
]
FILTERS = ("nearest", "bilinear", "bicubic", "quasi_bicubic")


def golden_warp_f64(img, georef, proj_name, params_kw, filt):
    """Float64 end-to-end warp — NO float32 shortcuts, no banding."""
    prepped = prepare(proj_name, ProjParams(**params_kw))
    h, w = img.shape[:2]
    ox, oy, sx, sy = default_warp_window(prepped, georef, w, h)
    gx, gy = dest_grid(ox, oy, sx, sy, w, h)
    with np.errstate(all="ignore"):
        lon, lat = prepped.inverse(gx, gy)  # float64 in → float64 path
    px, py = georef.to_pixels(lon, lat)
    return SAMPLERS[filt](np.asarray(img, np.float64), px, py)


def main():
    out = {}
    for seed, w, h, proj, kw in CASES:
        img = synth_pixels(seed, w, h)
        georef = GeoRef(lon0=5.0 + seed, lat0=47.0 - seed, px_deg=0.01)
        for filt in FILTERS:
            g = golden_warp_f64(img, georef, proj, kw, filt)
            out[f"{proj}_{seed}_{filt}"] = np.clip(g, 0, 255).astype(np.uint8)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "goldens", "warp_golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {len(out)} goldens to {path}")


if __name__ == "__main__":
    main()
