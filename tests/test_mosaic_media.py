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
    with pytest.raises(ValueError):  # not even a valid MPEG container
        decode_audio(b"", "mp3")
    from projcl_ray import media as _media
    from projcl_ray.mp3 import synth_mp3_bytes
    if _media._soundfile() is None:  # valid container, no DSP library
        with pytest.raises(NotImplementedError):
            decode_audio(synth_mp3_bytes(3), "mp3")
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


def test_wav_codec_roundtrip_and_variants():
    """In-repo RIFF/WAVE codec: pcm16 round-trip must be sample-exact; 24-bit,
    float32, unsigned-8-bit and stereo-to-mono variants decode correctly; odd
    chunk lengths pad per spec; garbage rejected."""
    import struct

    import pytest

    from projcl_ray.media import decode_audio, decode_wav, encode_wav

    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32768, 1000, dtype=np.int16)
    x, sr = decode_wav(encode_wav(pcm, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(x, pcm.astype(np.float32) / 32768.0)
    # decode_audio fmt="wav" must equal the pcm16 path on the same samples
    np.testing.assert_array_equal(
        decode_audio(encode_wav(pcm, 16000), "wav"),
        decode_audio(pcm.astype("<i2").tobytes(), "pcm16"),
    )
    # stereo averages to mono
    st = np.stack([pcm, -pcm], axis=1)
    xm, _ = decode_wav(encode_wav(st, 8000))
    np.testing.assert_allclose(xm, (pcm.astype(np.float32) - pcm) / 2 / 32768.0, atol=1e-7)

    def wav(fmt_code, bits, data, ch=1, sr=8000, extensible=False):
        if extensible:
            # cbSize=22, validBits, channelMask(4B), then the SubFormat GUID
            # whose first 2 bytes are the real format code (spec layout)
            fmt = (struct.pack("<HHIIHH", 0xFFFE, ch, sr, 0, 0, bits)
                   + struct.pack("<HHI", 22, bits, 0)
                   + struct.pack("<H", fmt_code) + b"\x00" * 14)
        else:
            fmt = struct.pack("<HHIIHH", fmt_code, ch, sr, 0, 0, bits)
        return (b"RIFF" + struct.pack("<I", 4 + 16 + len(fmt) + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd chunk pads
                + b"data" + struct.pack("<I", len(data)) + data)

    f32 = rng.uniform(-1, 1, 64).astype("<f4")
    x, _ = decode_wav(wav(3, 32, f32.tobytes()))
    np.testing.assert_array_equal(x, f32)
    u8 = rng.integers(0, 256, 64, dtype=np.uint8)
    x, _ = decode_wav(wav(1, 8, u8.tobytes()))
    np.testing.assert_array_equal(x, (u8.astype(np.float32) - 128.0) / 128.0)
    v24 = rng.integers(-(1 << 23), 1 << 23, 64, dtype=np.int32)
    b3 = np.zeros((64, 3), np.uint8)
    u = np.where(v24 < 0, v24 + (1 << 24), v24)
    b3[:, 0], b3[:, 1], b3[:, 2] = u & 255, (u >> 8) & 255, (u >> 16) & 255
    x, _ = decode_wav(wav(1, 24, b3.tobytes()))
    np.testing.assert_array_equal(x, v24.astype(np.float32) / 8388608.0)
    # WAVE_FORMAT_EXTENSIBLE wrapper unwraps to PCM16
    x, _ = decode_wav(wav(1, 16, pcm.tobytes(), extensible=True))
    np.testing.assert_array_equal(x, pcm.astype(np.float32) / 32768.0)
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_flac_codec_roundtrip_matrix():
    """In-repo FLAC codec (projcl_ray/flac.py, RFC 9639): encode→decode must
    be bit-exact for every predictor/residual path the encoder can choose —
    CONSTANT (silence/DC), FIXED, LPC (tonal), VERBATIM + raw-escape
    partitions (full-range noise), wasted bits (shifted samples),
    multi-partition blocks (silence→burst), all three stereo decorrelation
    modes, multichannel, and 8/16/24-bit depths; output is deterministic and
    junk is rejected."""
    from projcl_ray.flac import decode_flac, encode_flac

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(12000) / sr
    x = np.clip((0.5 * np.sin(2 * np.pi * 220 * t)
                 + 0.05 * rng.normal(size=len(t))) * 32767,
                -32768, 32767).astype(np.int16)
    mono_cases = [
        x,                                                # tonal → LPC
        np.zeros(5000, np.int16),                         # constant
        np.full(100, 123, np.int16),
        rng.integers(-32768, 32767, 7).astype(np.int16),  # sub-block frame
        rng.integers(-32768, 32767, 5000).astype(np.int16),   # noise
        (rng.integers(-2048, 2048, 5000) * 16).astype(np.int16),  # wasted bits
        np.concatenate([np.zeros(3000, np.int16), x[:1096]]),  # partitions
    ]
    for sig in mono_cases:
        out, sr2, bps = decode_flac(encode_flac(sig, 8000))
        assert sr2 == 8000 and bps == 16
        np.testing.assert_array_equal(out[:, 0], sig.astype(np.int32))
    # stereo: correlated (mid/side), identical (zero side), independent
    for st in (
        np.stack([x, (x * 0.9).astype(np.int16)], 1),
        np.stack([x, x], 1),
        np.stack([x, rng.integers(-32768, 32767, len(x)).astype(np.int16)], 1),
    ):
        out, _, _ = decode_flac(encode_flac(st, sr))
        np.testing.assert_array_equal(out, st.astype(np.int32))
    mc = np.stack([x[:4000], np.roll(x[:4000], 1), np.roll(x[:4000], 2)], 1)
    out, _, _ = decode_flac(encode_flac(mc, sr))
    np.testing.assert_array_equal(out, mc.astype(np.int32))
    for bps, lim in ((8, 1 << 7), (24, 1 << 23)):
        sig = rng.integers(-lim, lim, 3000)
        out, _, b2 = decode_flac(encode_flac(sig, 8000, bps=bps))
        assert b2 == bps
        np.testing.assert_array_equal(out[:, 0], sig)
    assert encode_flac(x, sr) == encode_flac(x, sr)  # deterministic
    with pytest.raises(ValueError):
        decode_flac(b"definitely not flac")


def test_flac_fastcodec_c_parity():
    """The compiled Rice/LPC/CRC path (projcl_ray/fastcodec.py) must decode
    bit-identically to the pure-Python loops across predictor types, stereo
    modes and bit depths. Skipped where no C compiler is available."""
    import os

    import pytest

    from projcl_ray import fastcodec
    from projcl_ray.flac import decode_flac, encode_flac

    old = os.environ.get("PROJCL_NO_FASTCODEC")
    try:
        os.environ["PROJCL_NO_FASTCODEC"] = ""
        if fastcodec.lib() is None:
            pytest.skip("no C compiler in this environment")
        rng = np.random.default_rng(17)
        for trial in range(8):
            n = int(rng.integers(1, 9000))
            ch = int(rng.integers(1, 3))
            bps = [8, 16, 24][trial % 3]
            amp = 2 ** (bps - 2)
            sig = np.clip(
                amp * 0.6 * np.sin(2 * np.pi * 300 * np.arange(n) / 44100)
                + rng.normal(0, amp * 0.05, n),
                -2 ** (bps - 1), 2 ** (bps - 1) - 1).astype(np.int64)
            pcm = np.stack([sig, -sig // 2], -1)[:, :ch].astype(np.int32)
            buf = encode_flac(pcm if ch > 1 else pcm[:, 0], 44100, bps=bps)
            os.environ["PROJCL_NO_FASTCODEC"] = "1"
            pure = decode_flac(buf)
            # encode parity: the C residual planner (flac_plan_full) must
            # pick the identical plan, hence identical bytes
            assert encode_flac(pcm if ch > 1 else pcm[:, 0],
                               44100, bps=bps) == buf
            os.environ["PROJCL_NO_FASTCODEC"] = ""
            fast = decode_flac(buf)
            np.testing.assert_array_equal(fast[0], pure[0])
            assert fast[1:] == pure[1:]
    finally:
        if old is None:
            os.environ.pop("PROJCL_NO_FASTCODEC", None)
        else:
            os.environ["PROJCL_NO_FASTCODEC"] = old


def test_flac_features_query_matches_wav(ray_session):
    """media_flac_features must produce bit-identical feature rows to
    media_wav_features: both containers are lossless over the same pcm16
    clips, so rms/peak/zcr/duration agree exactly."""
    from projcl_ray.queries import QUERIES

    wav = QUERIES["media_wav_features"]("unused").to_pandas()
    flac = QUERIES["media_flac_features"]("unused").to_pandas()
    a = wav.sort_values("clip_id").reset_index(drop=True)
    b = flac.sort_values("clip_id").reset_index(drop=True)
    assert len(a) == len(b) == 32
    for col in ("rms", "peak", "zcr", "duration_s"):
        np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy())


def test_avi_mjpeg_codec_roundtrip():
    """MJPEG-AVI container round-trip: dimensions/fps from the headers,
    every frame decodes, pixels match the sources at JPEG fidelity, and the
    encode is deterministic. A dropped (zero-length) frame chunk repeats the
    previous frame, matching player behavior."""
    from projcl_ray import avi
    from projcl_ray.images import synth_pixels

    frames = np.stack([synth_pixels(i, 48, 32) for i in range(6)])
    buf = avi.encode_avi_mjpeg(frames, fps=12, quality=92)
    assert avi.encode_avi_mjpeg(frames, fps=12, quality=92) == buf
    dec, fps = avi.decode_avi_mjpeg(buf)
    assert fps == 12.0 and dec.shape == frames.shape
    mse = ((dec[..., :3].astype(float) - frames[..., :3].astype(float)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 30.0  # JPEG-lossy fidelity

    # zero-length '00dc' chunk (dropped frame) repeats the previous frame
    import struct
    movi_at = buf.find(b"movi")
    first_sz = struct.unpack_from("<I", buf, movi_at + 8)[0]
    skip = movi_at + 4 + 8 + first_sz + (first_sz & 1)
    dropped = buf[:skip] + b"00dc" + struct.pack("<I", 0) + buf[skip:]
    dec2, _ = avi.decode_avi_mjpeg(dropped)
    assert dec2.shape[0] == 7
    np.testing.assert_array_equal(dec2[1], dec2[0])

    with pytest.raises(ValueError):
        avi.decode_avi_mjpeg(b"RIFFxxxxWAVE")


def test_avi_frame_sampling_matches_rawv(ray_session):
    """sample_video_frames over fmt="avi" clips yields the same rows as the
    rawv path on the same synthetic frames, pixel-equal up to JPEG loss."""
    import ray.data as rd

    raw_tbl = synth_video_table(3, n_frames=20)
    avi_tbl = synth_video_table(3, n_frames=20, fmt="avi")
    a = sample_video_frames(rd.from_arrow(raw_tbl), every_n=5).to_pandas()
    b = sample_video_frames(rd.from_arrow(avi_tbl), every_n=5).to_pandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert list(a["image_id"]) == list(b["image_id"])
    assert len(b) == 3 * 4
    for i in range(len(a)):
        pa_ = decode_image(a.iloc[i]["bytes"], 32, 24, "raw").astype(float)
        pb_ = decode_image(b.iloc[i]["bytes"], 32, 24, "raw").astype(float)
        mse = ((pa_[..., :3] - pb_[..., :3]) ** 2).mean()
        assert 10 * np.log10(255.0**2 / max(mse, 1e-9)) > 30.0


def test_wav_g711_ulaw_alaw():
    """G.711 companded WAV (format codes 7/6): decode LUTs match the
    canonical anchor values, container round-trips stay within the G.711
    segment quantization (max step 1024 → error <= 512), and re-encoding a
    decoded signal is idempotent."""
    from projcl_ray import media

    lut = media._ULAW_DEC
    assert (lut[0xFF], lut[0x7F]) == (0, 0)
    assert (lut[0x00], lut[0x80]) == (-32124, 32124)
    alut = media._ALAW_DEC
    assert (alut[0x55], alut[0xD5]) == (-8, 8)
    assert (alut[0x2A], alut[0xAA]) == (-32256, 32256)

    rng = np.random.default_rng(1)
    pcm = (rng.uniform(-1, 1, 4000) * 30000).astype(np.int16)
    for codec in ("ulaw", "alaw"):
        buf = media.encode_wav(pcm, 8000, codec=codec)
        x, sr = media.decode_wav(buf)
        assert sr == 8000 and len(x) == len(pcm)
        assert np.abs(x * 32768.0 - pcm).max() <= 512.0
        # decode is a fixed point of encode∘decode (nearest-code companding)
        again = media.encode_wav(np.round(x * 32768).astype(np.int16), 8000,
                                 codec=codec)
        assert again == buf
        # and the features stage accepts it through fmt="wav"
        feats = media.audio_features(
            __import__("ray").data.from_items([{
                "clip_id": "c0", "bytes": buf, "sample_rate": 8000,
                "n_samples": len(pcm), "fmt": "wav"}])).to_pandas()
        assert len(feats) == 1 and 0.0 < feats.iloc[0]["rms"] < 1.0


def test_wav_ima_adpcm_roundtrip():
    """IMA ADPCM WAV (format 0x11): block-parallel vectorized decode; our
    encoder (greedy reference quantizer, per-block slope-estimated initial
    step index) round-trips a band-limited signal at > 24 dB SNR in mono and
    stereo, deterministic bytes, fact-chunk tail truncation honored."""
    from projcl_ray import media

    rng = np.random.default_rng(2)
    sr = 16000
    tt = np.arange(sr) / sr
    sig = (0.6 * np.sin(2 * np.pi * 440 * tt)
           + 0.2 * np.sin(2 * np.pi * 1230 * tt)
           + 0.02 * rng.normal(size=len(tt)))
    pcm = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
    for x_in in (pcm, np.stack([pcm, (pcm // 2).astype(np.int16)], axis=1)):
        buf = media.encode_wav_ima_adpcm(x_in, sr)
        assert media.encode_wav_ima_adpcm(x_in, sr) == buf
        x, got_sr = media.decode_wav(buf)
        ref = x_in.astype(np.float32) / 32768.0
        if ref.ndim == 2:
            ref = ref.mean(axis=1)
        assert got_sr == sr and len(x) == len(ref)  # fact truncates padding
        snr = 10 * np.log10((ref**2).mean() / ((x - ref) ** 2).mean())
        assert snr > 24.0


def test_ima_adpcm_fastcodec_c_parity():
    """The compiled per-row IMA ADPCM walks (fastcodec.ima_encode_rows /
    ima_decode_rows) must be nibble- and sample-exact with the lockstep
    numpy loops, mono and stereo, including a ragged tail block. Skipped
    where no C compiler is available."""
    import os

    import pytest

    from projcl_ray import fastcodec, media

    old = os.environ.get("PROJCL_NO_FASTCODEC")
    try:
        os.environ["PROJCL_NO_FASTCODEC"] = ""
        if fastcodec.lib() is None:
            pytest.skip("no C compiler in this environment")
        rng = np.random.default_rng(5)
        for n, ch in [(1017 * 3, 1), (5000, 2), (300, 1)]:
            tt = np.arange(n)
            sig = np.clip(9000 * np.sin(tt * 0.02)
                          + rng.normal(0, 800, n), -32768, 32767)
            pcm = sig.astype(np.int16)
            x = (pcm if ch == 1
                 else np.stack([pcm, (-pcm // 3).astype(np.int16)], axis=1))
            fast_buf = media.encode_wav_ima_adpcm(x, 8000)
            fast_dec = media.decode_wav(fast_buf)
            os.environ["PROJCL_NO_FASTCODEC"] = "1"
            assert media.encode_wav_ima_adpcm(x, 8000) == fast_buf
            pure_dec = media.decode_wav(fast_buf)
            os.environ["PROJCL_NO_FASTCODEC"] = ""
            np.testing.assert_array_equal(fast_dec[0], pure_dec[0])
            assert fast_dec[1] == pure_dec[1]
    finally:
        if old is None:
            os.environ.pop("PROJCL_NO_FASTCODEC", None)
        else:
            os.environ["PROJCL_NO_FASTCODEC"] = old


def test_avi_selective_decode_matches_full():
    """frame_indices decoding returns exactly the full-decode frames at
    those indices, including across dropped-frame chunks, and tolerates
    repeated/unordered index lists."""
    import struct

    from projcl_ray import avi
    from projcl_ray.images import synth_pixels

    frames = np.stack([synth_pixels(i, 48, 32) for i in range(8)])
    buf = avi.encode_avi_mjpeg(frames, fps=10, quality=92)
    full, _ = avi.decode_avi_mjpeg(buf)
    sel, _ = avi.decode_avi_mjpeg(buf, frame_indices=[0, 5, 2, 5])
    np.testing.assert_array_equal(sel, full[[0, 5, 2, 5]])

    # insert a dropped frame after frame 0 → index 1 repeats frame 0
    movi_at = buf.find(b"movi")
    first_sz = struct.unpack_from("<I", buf, movi_at + 8)[0]
    skip = movi_at + 4 + 8 + first_sz + (first_sz & 1)
    dropped = buf[:skip] + b"00dc" + struct.pack("<I", 0) + buf[skip:]
    full2, _ = avi.decode_avi_mjpeg(dropped)
    sel2, _ = avi.decode_avi_mjpeg(dropped, frame_indices=[1, 3])
    np.testing.assert_array_equal(sel2, full2[[1, 3]])

    with pytest.raises(IndexError):
        avi.decode_avi_mjpeg(buf, frame_indices=[99])


def test_soundfile_encode_swapin_wiring(monkeypatch):
    """The audio encoder swap-in hook (media._soundfile) must route a plain
    int16/default encode through the library and fall through to the
    in-repo encoder for every shape the library cannot express (wider bit
    depths, custom block sizes, fixed-only prediction). Runs against a
    stub module so the wiring is testable in library-free environments;
    the real-library parity lives in test_soundfile_encode_swapin_parity."""
    import sys

    from projcl_ray import flac, media

    calls = []

    class _StubSF:
        @staticmethod
        def write(bio, data, sr, format=None, subtype=None):
            calls.append((np.asarray(data).dtype, sr, format, subtype))
            bio.write(b"STUB-" + format.encode())

    monkeypatch.setattr(media, "_SF_MOD", _StubSF)
    monkeypatch.delenv("PROJCL_PURE_CODECS", raising=False)
    x = (np.sin(np.arange(2000) / 7.0) * 12000).astype(np.int16)

    assert flac.encode_flac(x, 8000) == b"STUB-FLAC"
    assert calls[-1] == (np.dtype(np.int16), 8000, "FLAC", "PCM_16")
    assert media.encode_wav_ima_adpcm(x, 8000) == b"STUB-WAV"
    assert calls[-1][2:] == ("WAV", "IMA_ADPCM")

    # non-default shapes keep the in-repo range-checked encoder
    buf = flac.encode_flac(x.astype(np.int32), 8000, bps=24)
    assert buf.startswith(b"fLaC")
    out, sr, bps = flac.decode_flac(buf)
    np.testing.assert_array_equal(out[:, 0], x.astype(np.int32))

    # PROJCL_PURE_CODECS disables the hook entirely
    monkeypatch.setenv("PROJCL_PURE_CODECS", "1")
    assert flac.encode_flac(x, 8000).startswith(b"fLaC")


def test_soundfile_encode_swapin_parity():
    """Real-library parity (skipped unless soundfile/libsndfile is
    importable): FLAC is lossless, so the swapped-in encode must decode —
    via the IN-REPO decoder — back to the exact input; IMA ADPCM is lossy
    but must still track a band-limited signal at high SNR."""
    import pytest

    pytest.importorskip("soundfile")
    from projcl_ray import flac, media

    assert media._soundfile() is not None
    t = np.arange(16000) / 16000.0
    x = np.clip(0.5 * np.sin(2 * np.pi * 440 * t) * 32767,
                -32768, 32767).astype(np.int16)

    buf = flac.encode_flac(x, 16000)
    out, sr, bps = flac.decode_flac(buf)
    assert (sr, bps) == (16000, 16)
    np.testing.assert_array_equal(out[:, 0], x.astype(np.int32))

    wav = media.encode_wav_ima_adpcm(x, 16000)
    y, sr2 = media.decode_wav(wav)
    ref = x.astype(np.float32) / 32768.0
    y = y[: len(ref)]
    snr = 10 * np.log10((ref[: len(y)] ** 2).mean()
                        / ((y - ref[: len(y)]) ** 2).mean())
    assert sr2 == 16000 and snr > 20.0


def test_stream_audio_bitexact_and_features(ray_session):
    """Block-streamed decode (media.stream_audio): for every container
    (pcm16, wav PCM/G.711/IMA-ADPCM mono+stereo, FLAC mono+stereo) and
    several chunk sizes, the concatenated chunks equal the whole-clip
    decode BIT-EXACTLY, and features_from_chunks is chunking-invariant on
    the corpus (VERDICT r4 #5 'identical feature output'). Also pins the
    audio_features stage: chunked == whole rows."""
    from projcl_ray import media
    from projcl_ray.flac import encode_flac

    rows = media.synth_audio_table(4).to_pylist()
    variants = []
    for r in rows:
        pcm = np.frombuffer(r["bytes"], "<i2")
        st = np.stack([pcm, (pcm // 2).astype(np.int16)], axis=1)
        variants += [
            (r["bytes"], "pcm16"),
            (media.encode_wav(pcm, 16000), "wav"),
            (media.encode_wav(pcm, 16000, codec="ulaw"), "wav"),
            (media.encode_wav_ima_adpcm(pcm, 16000), "wav"),
            (encode_flac(pcm, 16000), "flac"),
            (media.encode_wav(st, 16000), "wav"),
            (encode_flac(st, 16000), "flac"),
        ]
    for chunk in (257, 1000, 4096):
        for buf, fmt in variants:
            whole = media.decode_audio(buf, fmt)
            cat = np.concatenate(list(media.stream_audio(buf, fmt, chunk)))
            np.testing.assert_array_equal(cat, whole)
            assert (media.features_from_chunks([whole])
                    == media.features_from_chunks(media.stream_audio(buf, fmt, chunk)))

    import ray.data as rd
    tbl = media.synth_audio_table(6)
    a = media.audio_features(rd.from_arrow(tbl)).to_pandas().sort_values("clip_id")
    b = media.audio_features(rd.from_arrow(tbl), chunk_samples=999
                             ).to_pandas().sort_values("clip_id")
    for col in ("rms", "peak", "zcr", "duration_s"):
        np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy())


def test_stream_audio_long_clip_memory():
    """A long clip streams in bounded memory: features over a 16M-sample
    WAV (32 MB payload; whole-clip decode would allocate ≥64 MB of float32
    plus temporaries) peak below 12 MB of allocations when streamed with
    256k-sample chunks, and match the whole-clip features exactly."""
    import tracemalloc

    from projcl_ray import media

    n = 16_000_000
    t = np.arange(n, dtype=np.float64)
    pcm = (12000 * np.sin(2 * np.pi * 440 * t / 48000)).astype("<i2")
    buf = media.encode_wav(pcm, 48000)
    del t, pcm
    whole = media.features_from_chunks([media.decode_audio(buf, "wav")])

    tracemalloc.start()
    streamed = media.features_from_chunks(
        media.stream_audio(buf, "wav", chunk_samples=1 << 18))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert streamed == whole
    assert peak < 12 * 1024 * 1024, f"streamed peak {peak / 1e6:.1f} MB"


def test_mp3_frame_parser_exact():
    """MPEG-1 Layer III container walk (projcl_ray/mp3.py): frame sizes
    follow the spec formula (144*br/sr + padding) with the exact 44.1 kHz
    padding cadence, ID3v2 tags skip by syncsafe size, CRC flag decodes,
    VBR streams report min/max/avg bitrate, resync skips leading garbage,
    and non-MPEG bytes are rejected."""
    from projcl_ray import mp3

    buf = mp3.synth_mp3_bytes(49, bitrate_kbps=128, sample_rate=44100)
    frames = mp3.parse_mp3_frames(buf)
    assert len(frames) == 49
    assert {f.size for f in frames} == {417, 418}  # padding cadence at 44.1k
    assert sum(f.size for f in frames) == len(buf)
    assert sum(f.padding for f in frames) == round(49 * (144 * 128000 % 44100) / 44100)
    info = mp3.mp3_stream_info(buf)
    assert info["n_samples"] == 49 * 1152
    assert info["bitrate_mode"] == "cbr" and info["mode"] == "stereo"
    assert abs(info["avg_bitrate_kbps"] - 128.0) < 0.5

    # 48 kHz divides exactly: no padding, fixed 288-byte frames at 96 kbps
    buf48 = mp3.synth_mp3_bytes(12, bitrate_kbps=96, sample_rate=48000)
    f48 = mp3.parse_mp3_frames(buf48)
    assert all(f.size == 288 and not f.padding for f in f48)

    # ID3v2 + CRC + VBR mono
    v = mp3.synth_mp3_bytes(30, bitrate_kbps=96, vbr_alternate=192,
                            mono=True, id3_bytes=257, crc=True, seed=9)
    fv = mp3.parse_mp3_frames(v)
    assert fv[0].offset == 10 + 257  # ID3v2 header + syncsafe body skipped
    assert fv[0].has_crc and fv[0].mode == "mono"
    iv = mp3.mp3_stream_info(v)
    assert iv["bitrate_mode"] == "vbr"
    assert (iv["min_bitrate_kbps"], iv["max_bitrate_kbps"]) == (96, 192)

    # resync over leading garbage; rejection when nothing syncs
    assert len(mp3.parse_mp3_frames(b"\x01\x02" * 50 + buf48)) == 12
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(bytes(2000))


def test_mp3_decode_contract_and_scan_query(ray_session):
    """Sample decode prefers the library swap-in; without one it raises the
    documented NotImplementedError that CARRIES the parsed container
    metadata (proving the container layer ran). The catalog-scan query
    runs distributed and its values match direct mp3_stream_info calls."""
    from projcl_ray import media
    from projcl_ray.queries import QUERIES

    buf = media.synth_mp3_table(1)["bytes"][0].as_py()
    if media._soundfile() is None:
        with pytest.raises(NotImplementedError) as ei:
            media.decode_audio(buf, "mp3")
        assert "frames" in str(ei.value)  # metadata made it into the message
    else:  # real decode path (library present)
        x = media.decode_audio(buf, "mp3")
        assert x.dtype == np.float32

    out = QUERIES["media_mp3_frame_scan"]("unused").to_pandas()
    assert len(out) == 32
    tbl = media.synth_mp3_table(32)
    from projcl_ray.mp3 import mp3_stream_info
    exp = [mp3_stream_info(b.as_py()) for b in tbl["bytes"]]
    got = out.set_index("clip_id").loc[tbl["clip_id"].to_pylist()]
    assert (got["n_frames"].to_numpy() == [e["n_frames"] for e in exp]).all()
    assert (got["duration_ms"].to_numpy()
            == [int(np.floor(e["duration_s"] * 1000 + 0.5)) for e in exp]).all()
    assert (got["bitrate_mode"].to_numpy()
            == np.array([e["bitrate_mode"] for e in exp])).all()


def test_mp3_soundfile_decode_parity():
    """Real-library parity (skipped unless soundfile/libsndfile>=1.1 with
    mp3 support): encode the synthetic pcm16 signal to mp3 via the
    library, decode through media.decode_audio, and require the lossy
    round-trip to track the source (rms within 10%, high correlation)."""
    import io

    sf = pytest.importorskip("soundfile")
    if "MP3" not in getattr(sf, "available_formats", lambda: {})():
        pytest.skip("libsndfile without mp3 support")
    from projcl_ray import media

    rows = media.synth_audio_table(2).to_pylist()
    pcm = np.frombuffer(rows[0]["bytes"], "<i2")
    bio = io.BytesIO()
    sf.write(bio, pcm, 16000, format="MP3")
    x = media.decode_audio(bio.getvalue(), "mp3")
    ref = pcm.astype(np.float32) / 32768.0
    n = min(len(x), len(ref))
    corr = np.corrcoef(x[:n], ref[:n])[0, 1]
    assert corr > 0.9
    assert abs(np.sqrt((x[:n] ** 2).mean()) / np.sqrt((ref[:n] ** 2).mean()) - 1) < 0.1
