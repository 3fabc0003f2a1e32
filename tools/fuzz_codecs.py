"""Deep corrupt-input fuzz of every in-repo decoder.

Truncates / bit-flips / garbage-injects a valid stream N times per format
and asserts the documented contract: decode either succeeds or raises
ValueError / NotImplementedError — never a foreign exception type, never a
crash. This is the harness that found the round-5 memory-safety bugs
(GIF LZW table overflow, progressive-JPEG spectral-band overwrite); the
quick 60-trial version runs in pytest (tests/test_codec_property.py), this
script is the deep sweep.

Usage: PYTHONPATH=. python tools/fuzz_codecs.py [trials_per_format=4000] [seed=0]
Each format runs in a SUBPROCESS so a memory-safety crash (SIGSEGV/SIGABRT)
is reported as CRASH for that format instead of killing the sweep.
"""
from __future__ import annotations

import subprocess
import sys

FORMATS = ["jpeg", "jpeg_prog", "png", "gif", "bmp", "tiff", "flac", "wav",
           "adpcm", "avi", "mp3"]

_CHILD = r"""
import sys
import numpy as np
from projcl_ray import avi, bmp, flac, gif, jpeg, media, mp3, png, tiff
from projcl_ray.images import synth_pixels

name, trials = sys.argv[1], int(sys.argv[2])
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
img = synth_pixels(3, 48, 32)
img64 = ((img >> 6) << 6) + 32
pcm = (3000 * np.sin(np.arange(20000) * 0.01)).astype(np.int16)
frames = np.stack([synth_pixels(i, 32, 24) for i in range(4)])
samples = {
    "jpeg": (jpeg.encode_jpeg(img), jpeg.decode_jpeg),
    "jpeg_prog": (jpeg.encode_jpeg(img, progressive=True), jpeg.decode_jpeg),
    "png": (png.encode_png(img), png.decode_png),
    "gif": (gif.encode_gif(img64), gif.decode_gif),
    "bmp": (bmp.encode_bmp(img[..., :3]), bmp.decode_bmp),
    "tiff": (tiff.encode_tiff(img[..., :3], compression="lzw"),
             tiff.decode_tiff),
    "flac": (flac.encode_flac(pcm, 16000), flac.decode_flac),
    "wav": (media.encode_wav(pcm, 16000), media.decode_wav),
    "adpcm": (media.encode_wav_ima_adpcm(pcm, 16000), media.decode_wav),
    "avi": (avi.encode_avi_mjpeg(frames, fps=10), avi.decode_avi_mjpeg),
    "mp3": (mp3.synth_mp3_bytes(seed=1, n_frames=20),
            lambda b: mp3.mp3_stream_info(b)),
}
buf, dec = samples[name]
rng = np.random.default_rng(seed)
leaks = 0
for trial in range(trials):
    b = bytearray(buf)
    mode = trial % 3
    if mode == 0 and len(b) > 8:
        b = b[: rng.integers(1, len(b))]
    elif mode == 1:
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
    else:
        pos = rng.integers(0, len(b))
        b = (b[:pos]
             + bytes(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
             + b[pos:])
    try:
        dec(bytes(b))
    except (ValueError, NotImplementedError):
        pass
    except Exception as exc:
        leaks += 1
        if leaks <= 3:
            print(f"LEAK {name} trial {trial}: "
                  f"{type(exc).__name__}: {exc}", flush=True)
print(f"{name}: {'CLEAN' if leaks == 0 else f'{leaks} leaks'}", flush=True)
sys.exit(1 if leaks else 0)
"""


def main(trials: int, seed: int = 0) -> int:
    failed = 0
    for name in FORMATS:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, name, str(trials), str(seed)],
            capture_output=True, text=True)
        out = proc.stdout.strip()
        if proc.returncode != 0 and not out.endswith("leaks"):
            print(f"{name}: CRASH (exit {proc.returncode}) "
                  f"{proc.stderr.strip()[-120:]}")
            failed += 1
        else:
            print(out or f"{name}: no output (exit {proc.returncode})")
            failed += proc.returncode != 0
    print(f"\n{len(FORMATS) - failed}/{len(FORMATS)} formats clean "
          f"at {trials} trials each (seed {seed})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000,
                  int(sys.argv[2]) if len(sys.argv) > 2 else 0))
