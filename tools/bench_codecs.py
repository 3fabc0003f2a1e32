"""Single-core throughput of the in-repo pure-Python codecs.

Regenerates BENCH/codec_throughput_r{N}.json. Deterministic synthetic
payloads (seeded numpy), best-of-REPS wall time per codec direction,
throughput reported as MB/s of RAW (decoded) payload so encode and decode
are comparable across codecs.

Usage: PYTHONPATH=. python tools/bench_codecs.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from projcl_ray import avi, bmp, fastcodec, flac, gif, jpeg, media, png, tiff

REPS = 3


def _best(fn, *a, **kw):
    best = float("inf")
    out = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        best = min(best, time.perf_counter() - t0)
    return out, best


def _image(px: int, seed: int = 7) -> np.ndarray:
    """Natural-ish test raster: smooth gradients + seeded texture."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:px, 0:px].astype(np.float32)
    base = 96 + 64 * np.sin(x / 19.0) + 48 * np.cos(y / 13.0)
    tex = rng.normal(0, 12, (px, px)).astype(np.float32)
    r = np.clip(base + tex, 0, 255)
    g = np.clip(base[::-1] + tex, 0, 255)
    b = np.clip(0.5 * (base + base[::-1]), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _pcm(n: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    sig = (
        9000 * np.sin(2 * np.pi * 440 * t / 44100)
        + 3000 * np.sin(2 * np.pi * 1310 * t / 44100)
        + rng.normal(0, 180, n)
    )
    return np.clip(sig, -32768, 32767).astype(np.int16)


def main(out_path: str) -> None:
    res: dict[str, dict] = {}
    img = _image(256)
    raw_mb = img.nbytes / 1e6

    def record(name, enc_fn, dec_fn, payload_mb):
        buf, te = _best(enc_fn)
        _, td = _best(dec_fn, buf)
        res[name] = {
            "enc_MBps": round(payload_mb / te, 2),
            "dec_MBps": round(payload_mb / td, 2),
            "encoded_bytes": len(buf),
        }
        print(f"{name:22s} enc {res[name]['enc_MBps']:8.2f} MB/s   "
              f"dec {res[name]['dec_MBps']:8.2f} MB/s   "
              f"({len(buf)} bytes)")

    def record_cfast(name, enc_fn, dec_fn, payload_mb):
        """Re-measure with the compiled fastcodec paths enabled (base rows
        measure the pure-Python oracle loops under PROJCL_NO_FASTCODEC=1)."""
        if fastcodec.lib() is None:
            return
        os.environ["PROJCL_NO_FASTCODEC"] = ""
        try:
            record(name, enc_fn, dec_fn, payload_mb)
        finally:
            os.environ["PROJCL_NO_FASTCODEC"] = "1"

    # base rows measure the PURE-python loops (the determinism oracle);
    # _cfast rows re-measure decode with the compiled entropy/Rice paths
    # (projcl_ray/fastcodec.py) when a compiler exists
    os.environ["PROJCL_NO_FASTCODEC"] = "1"
    record("png_f4", lambda: png.encode_png(img, filter_type=4),
           png.decode_png, raw_mb)
    record_cfast("png_f4_cfast", lambda: png.encode_png(img, filter_type=4),
                 png.decode_png, raw_mb)
    record("jpeg_q90", lambda: jpeg.encode_jpeg(img, quality=90),
           jpeg.decode_jpeg, raw_mb)
    record("jpeg_progressive",
           lambda: jpeg.encode_jpeg(img, quality=90, progressive=True),
           jpeg.decode_jpeg, raw_mb)
    record_cfast("jpeg_q90_cfast", lambda: jpeg.encode_jpeg(img, quality=90),
                 jpeg.decode_jpeg, raw_mb)
    record_cfast("jpeg_progressive_cfast",
                 lambda: jpeg.encode_jpeg(img, quality=90, progressive=True),
                 jpeg.decode_jpeg, raw_mb)
    # GIF is palette-based: quantize to 4 levels/channel (64 colors), RGBA.
    img64 = ((img >> 6) << 6) + 32
    rgba = np.dstack([img64, np.full(img.shape[:2], 255, np.uint8)])
    record("gif_64col", lambda: gif.encode_gif(rgba), gif.decode_gif, raw_mb)
    record_cfast("gif_64col_cfast", lambda: gif.encode_gif(rgba),
                 gif.decode_gif, raw_mb)
    record("bmp", lambda: bmp.encode_bmp(img), bmp.decode_bmp, raw_mb)
    record("tiff_deflate_pred2",
           lambda: tiff.encode_tiff(img, compression="deflate", predictor=2),
           tiff.decode_tiff, raw_mb)
    record("tiff_lzw", lambda: tiff.encode_tiff(img, compression="lzw"),
           tiff.decode_tiff, raw_mb)
    record_cfast("tiff_lzw_cfast",
                 lambda: tiff.encode_tiff(img, compression="lzw"),
                 tiff.decode_tiff, raw_mb)

    pcm = _pcm(64000)
    pcm_mb = pcm.nbytes / 1e6
    record("wav_pcm16", lambda: media.encode_wav(pcm, 44100),
           media.decode_wav, pcm_mb)
    record("wav_ulaw", lambda: media.encode_wav(pcm, 44100, codec="ulaw"),
           media.decode_wav, pcm_mb)
    record("wav_ima_adpcm", lambda: media.encode_wav_ima_adpcm(pcm, 44100),
           media.decode_wav, pcm_mb)
    record_cfast("wav_ima_adpcm_cfast",
                 lambda: media.encode_wav_ima_adpcm(pcm, 44100),
                 media.decode_wav, pcm_mb)
    record("flac", lambda: flac.encode_flac(pcm, 44100), flac.decode_flac,
           pcm_mb)
    record_cfast("flac_cfast", lambda: flac.encode_flac(pcm, 44100),
                 flac.decode_flac, pcm_mb)

    frames = np.stack([np.roll(_image(64, seed=s), s, axis=1)
                       for s in range(12)])
    record("avi_mjpeg", lambda: avi.encode_avi_mjpeg(frames, fps=12),
           avi.decode_avi_mjpeg, frames.nbytes / 1e6)
    record_cfast("avi_mjpeg_cfast",
                 lambda: avi.encode_avi_mjpeg(frames, fps=12),
                 avi.decode_avi_mjpeg, frames.nbytes / 1e6)
    os.environ.pop("PROJCL_NO_FASTCODEC", None)

    out = {
        "metric": ("single-core codec throughput (in-repo pure-Python "
                   "codecs, MB/s of raw payload)"),
        "codecs": res,
        "note": ("regenerated by tools/bench_codecs.py; best-of-%d per "
                 "direction on a 256px synthetic raster / 64k-sample PCM "
                 "/ 12x64px MJPEG clip" % REPS),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "BENCH/codec_throughput_r5.json")
