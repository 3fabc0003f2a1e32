"""Tiled-mosaic sampling parity, grid ops, mosaic-warp Ray stage, media stubs,
fixed-angle geodesic trace, and a real hot-cell salting exercise."""

import numpy as np
import pyarrow as pa
import pytest

from projcl_ray import ops
from projcl_ray.images import decode_image, encode_image, synth_pixels
from projcl_ray.index import cut_tiles, cell_id
from projcl_ray.media import (
    audio_features,
    decode_audio,
    decode_video_frames,
    sample_video_frames,
    synth_audio_table,
    synth_video_table,
)
from projcl_ray.proj import ProjParams, prepare
from projcl_ray.warp import (
    MOSAIC_SAMPLERS,
    SAMPLERS,
    TiledMosaic,
    GeoRef,
    WarpSpec,
    default_warp_window,
    project_grid,
    transform_grid,
    warp_image,
)


def test_mosaic_sampling_matches_whole_image():
    """Cross-tile gathers must agree exactly with whole-image sampling —
    the array kernels' per-pixel tile arithmetic (pl_sample_*_array)."""
    img = synth_pixels(7, 96, 64).astype(np.float32)
    tiles = {(tx, ty): t.astype(np.float32) for tx, ty, _, t in cut_tiles(img, 32)}
    m = TiledMosaic.from_tiles(tiles, 32)
    rng = np.random.default_rng(0)
    px = rng.uniform(1.5, 94.0, 200)
    py = rng.uniform(1.5, 62.0, 200)
    for f in SAMPLERS:
        np.testing.assert_array_equal(MOSAIC_SAMPLERS[f](m, px, py), SAMPLERS[f](img, px, py))


def test_transform_and_project_grid():
    gx, gy = np.meshgrid(np.linspace(0, 10, 5), np.linspace(0, 4, 3))
    tx_, ty_ = transform_grid(gx, gy, 2.0, 0.0, 1.0, 0.0, 3.0, -1.0)
    np.testing.assert_allclose(tx_, 2 * gx + 1)
    np.testing.assert_allclose(ty_, 3 * gy - 1)
    p = prepare("mercator", spheroid="SPHERE")
    px_, py_ = project_grid(p, gx, gy)
    ex, ey = p.forward(gx, gy)
    np.testing.assert_array_equal(px_, ex)
    np.testing.assert_array_equal(py_, ey)


def test_warp_tiled_mosaic_stage_matches_direct_warp(ray_session):
    import ray.data as rd

    img = synth_pixels(3, 96, 96)
    georef = GeoRef(10.0, 50.0, 0.01)
    rows = []
    for tx, ty, tidx, tile in cut_tiles(img, 32):
        rows.append(
            {
                "image_id": "imgA", "tile_col": tx, "tile_row": ty, "tile_size": 32,
                "bytes": encode_image(tile), "fmt": "raw", "w": 96, "h": 96,
                "lon0": georef.lon0, "lat0": georef.lat0, "px_deg": georef.px_deg,
            }
        )
    out = ops.warp_tiled_mosaic(rd.from_items(rows), "mercator", ProjParams(spheroid="WGS_84"),
                                filter="bilinear").to_pandas()
    assert len(out) == 1
    got = decode_image(out.iloc[0]["bytes"], 96, 96, "raw")
    # direct whole-image warp for comparison
    prepped = prepare("mercator", spheroid="WGS_84")
    ox, oy, sx, sy = default_warp_window(prepped, georef, 96, 96)
    spec = WarpSpec("mercator", ProjParams(spheroid="WGS_84"), ox, oy, sx, sy, 96, 96)
    direct = np.clip(warp_image(img, georef, spec), 0, 255).astype(np.uint8)
    assert np.mean(np.abs(got.astype(int) - direct.astype(int))) < 1.0
    assert (got == direct).mean() > 0.95


def test_audio_stub_and_features(ray_session):
    import ray.data as rd

    tbl = synth_audio_table(6)
    x = decode_audio(tbl["bytes"][0].as_py(), "pcm16")
    assert x.dtype == np.float32 and len(x) == 4000
    with pytest.raises(NotImplementedError):
        decode_audio(b"", "mp3")
    feats = audio_features(rd.from_arrow(tbl)).to_pandas()
    assert len(feats) == 6
    assert ((feats["rms"] > 0.2) & (feats["rms"] < 0.5)).all()  # 0.5·sine ≈ 0.35 rms
    assert (feats["duration_s"] == 0.25).all()
    assert "bytes" not in feats.columns  # payload dropped before any shuffle


def test_video_stub_and_frame_sampling(ray_session):
    import ray.data as rd

    tbl = synth_video_table(3, n_frames=20)
    frames = decode_video_frames(tbl["bytes"][0].as_py(), 32, 24, 20, "rawv")
    assert frames.shape == (20, 24, 32, 4)
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"", 1, 1, 1, "mp4")
    sampled = sample_video_frames(rd.from_arrow(tbl), every_n=5).to_pandas()
    assert len(sampled) == 3 * 4  # frames 0,5,10,15
    img = decode_image(sampled.iloc[0]["bytes"], 32, 24, "raw")
    np.testing.assert_array_equal(img, frames[0])


def test_fixed_angle_trace_stage(ray_session):
    import ray.data as rd

    from projcl_ray.geodesic import haversine

    dists = rd.from_items([{"distance_m": float(d)} for d in (1e4, 1e5, 1e6, 5e6)])
    out = ops.forward_geodesic_fixed_angle(dists, 10.0, 20.0, 45.0).to_pandas()
    d = haversine(10.0, 20.0, out["lon2"], out["lat2"])
    np.testing.assert_allclose(d, out["distance_m"], atol=1e-6)


def test_salting_on_skewed_cells(ray_session):
    """Real skew: Zipf-clustered image centers → hot cells; the pre-pass count
    finds them and salting fans exactly those out."""
    import ray.data as rd

    from projcl_ray.images import synth_images_table

    tbl = synth_images_table(400, seed=42)
    ds = rd.from_arrow(tbl.select(["image_id", "lon0", "lat0"]))
    ds = ops.assign_cells(ds, lon_col="lon0", lat_col="lat0", res_deg=10.0)

    counts = ds.groupby("cell_id").count().to_pandas()
    assert counts["count()"].max() > 4 * counts["count()"].median()  # skew exists
    hot = {int(r["cell_id"]): 8 for _, r in counts.iterrows() if r["count()"] >= 40}
    assert hot, "expected at least one hot cell from Zipf clustering"

    def add_hash(batch):
        batch["row_hash"] = np.array([hash(s) & 0x7FFFFFFF for s in batch["image_id"]], np.int64)
        return batch

    hashed = ds.map_batches(add_hash, batch_format="numpy")
    salted = ops.salt_hot_keys(hashed, "cell_id", hot, hash_col="row_hash").to_pandas()
    fan = salted.groupby("cell_id")["salted_key"].nunique()
    for cid, n in fan.items():
        if cid in hot:
            assert n > 1  # hot cell split across sub-keys
        else:
            assert n == 1
    # salted keys partition the original key space: cell recoverable
    assert (salted["salted_key"] // 8 == salted["cell_id"]).all()
