"""Single-core projection throughput over the reference's own 200k-point
corpus (grid+circle, test/projcl_test.c:460-467) — the direct analogue of the
benchmark ProjCL runs against Proj.4. Pure NumPy, no Ray (the distributed
path adds linear scaling on top; see bench.py).

    PYTHONPATH=. python tools/bench_projections.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from projcl_ray.proj import prepare

def corpus(n=200_000, width=500):
    half = n // 2
    rows = half // width
    lon_g, lat_g = np.meshgrid(np.linspace(-60, 60, width), np.linspace(-40, 80, rows))
    k = np.arange(half)
    return (
        np.concatenate([lon_g.ravel(), -40 * np.cos(2 * np.pi * k / (half - 1))]),
        np.concatenate([lat_g.ravel(), -40 * np.sin(2 * np.pi * k / (half - 1))]),
    )

CASES = [
    ("mercator", dict(spheroid="SPHERE")),
    ("mercator", dict(spheroid="WGS_84")),
    ("transverse_mercator", dict(spheroid="SPHERE")),
    ("transverse_mercator", dict(spheroid="WGS_84")),
    ("lambert_conformal_conic", dict(spheroid="WGS_84", rlat1=30, rlat2=60)),
    ("albers_equal_area", dict(spheroid="WGS_84", rlat1=30, rlat2=60)),
    ("lambert_azimuthal_equal_area", dict(spheroid="WGS_84")),
    ("oblique_stereographic", dict(spheroid="WGS_84")),
    ("robinson", dict(spheroid="SPHERE")),
    ("winkel_tripel", dict(spheroid="SPHERE")),
    ("american_polyconic", dict(spheroid="WGS_84")),
]

def main():
    lon, lat = corpus()
    n = len(lon)
    out = {}
    for name, kw in CASES:
        p = prepare(name, **kw)
        with np.errstate(all="ignore"):
            p.forward(lon[:1000], lat[:1000])  # warm
            t0 = time.perf_counter(); x, y = p.forward(lon, lat); t_f = time.perf_counter() - t0
            p.inverse(x[:1000], y[:1000])
            t0 = time.perf_counter(); p.inverse(x, y); t_i = time.perf_counter() - t0
        key = f"{name}_{'s' if kw['spheroid']=='SPHERE' else 'e'}"
        out[key] = {"fwd_Mpts_s": round(n / t_f / 1e6, 2), "inv_Mpts_s": round(n / t_i / 1e6, 2)}
    print(json.dumps({"corpus_points": n, "single_core": out}, indent=1))

if __name__ == "__main__":
    main()
