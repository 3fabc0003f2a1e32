"""MJPEG-in-AVI video container codec, implemented from the public
Microsoft RIFF/AVI specification (AVIMAINHEADER / AVISTREAMHEADER /
BITMAPINFOHEADER layouts and the 'movi'/'idx1' chunk grammar are the
published file format). Frames are ordinary baseline JFIF images, so the
in-repo JPEG codec (jpeg.py, with the PIL swap-in via images.decode_image)
does all pixel work — this module is pure container plumbing.

This makes ``fmt="avi"`` a first-class video format for the media pipeline
(the reference ingests arbitrary images via OpenCL image buffers,
/root/reference/src/projcl_warp.c:68-107; MJPEG-AVI is the spec-
implementable video analogue available without a DSP codec library —
mp4/webm stay documented stubs in media.py).

Scope:
- encode: (n, h, w, 4) uint8 RGBA frames → AVI with one 'vids'/'MJPG'
  stream, per-frame '00dc' chunks (keyframe-indexed in 'idx1'),
  deterministic bytes for a given (frames, fps, quality).
- decode: any MJPEG AVI with a single video stream — reads dimensions and
  fps from the headers, decodes every '00dc'/'00db' chunk; 'rec ' LISTs
  inside 'movi' are flattened; zero-length (dropped-frame) chunks repeat
  the previous frame, matching player behavior.
"""

from __future__ import annotations

import struct

import numpy as np

from ._corrupt import corrupt_guard

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames: np.ndarray, *, fps: int = 30,
                     quality: int = 90) -> bytes:
    """(n, h, w, 4)|(n, h, w, 3)|(n, h, w) uint8 → MJPEG AVI bytes."""
    from .jpeg import encode_jpeg

    frames = np.ascontiguousarray(frames, np.uint8)
    if frames.ndim == 3:
        frames = frames[..., None].repeat(3, axis=-1)
    n, h, w = frames.shape[:3]
    blobs = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
    max_len = max((len(b) for b in blobs), default=0)

    avih = struct.pack(
        "<14I",
        int(round(1_000_000 / max(fps, 1))),  # dwMicroSecPerFrame
        max_len * fps,                        # dwMaxBytesPerSec
        0,                                    # dwPaddingGranularity
        _AVIF_HASINDEX,                       # dwFlags
        n,                                    # dwTotalFrames
        0,                                    # dwInitialFrames
        1,                                    # dwStreams
        max_len,                              # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,                     # dwWidth, dwHeight, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", b"MJPG",
        0, 0, 0,        # dwFlags, wPriority, wLanguage
        0,              # dwInitialFrames
        1, max(fps, 1),  # dwScale, dwRate  (rate/scale = fps)
        0, n,           # dwStart, dwLength (frames)
        max_len,        # dwSuggestedBufferSize
        0xFFFFFFFF,     # dwQuality (default)
        0,              # dwSampleSize (0 = one sample per chunk)
        0, 0, w, h,     # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3,
        0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_payload = bytearray(b"movi")
    idx = bytearray()
    for b in blobs:
        # idx1 offsets are relative to the start of the 'movi' list kind tag
        idx += struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME,
                           len(movi_payload), len(b))
        movi_payload += _chunk(b"00dc", b)
    movi = _chunk(b"LIST", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_len) walking a RIFF chunk run.
    A lying chunk size (corrupt stream) is clamped to the bytes actually
    present so downstream fixed-size unpacks stay in bounds."""
    end = min(end, len(buf))
    while pos + 8 <= end:
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        size = min(size, len(buf) - (pos + 8))
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


@corrupt_guard("AVI")
def _parse_avi(buf: bytes) -> tuple[int, int, float, list[bytes]]:
    """Container walk: header fields + every video frame chunk. All the
    attacker-controlled offset arithmetic lives here, under the corrupt
    guard; decode_avi_mjpeg's argument validation stays outside it."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI (no RIFF/AVI header)")
    w = h = 0
    fps = 0.0
    jpegs: list[bytes] = []

    # explicit iterator stack (same depth-first chunk order as recursion
    # would give) — a crafted deeply-nested LIST chain must not be able to
    # blow the Python stack (RecursionError is not a corrupt-input error)
    stack = [_iter_chunks(buf, 12, len(buf))]
    while stack:
        try:
            tag, p, size = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if tag == b"LIST":
            kind = buf[p:p + 4]
            if kind in (b"hdrl", b"strl", b"movi", b"rec "):
                stack.append(_iter_chunks(buf, p + 4, p + size))
        elif tag == b"avih" and size >= 40:
            usec, _, _, _, _, _, _, _, aw, ah = struct.unpack_from("<10I", buf, p)
            w, h = aw, ah
            if usec:
                fps = 1_000_000 / usec
        elif tag == b"strh" and size >= 48:
            fcc, _handler = buf[p:p + 4], buf[p + 4:p + 8]
            if fcc == b"vids":
                scale, rate = struct.unpack_from("<II", buf, p + 20)
                if scale:
                    fps = rate / scale
        elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
            jpegs.append(buf[p:p + size])
    if not jpegs:
        raise ValueError("AVI contains no video frame chunks")
    return w, h, fps, jpegs


def decode_avi_mjpeg(buf: bytes, frame_indices=None) -> tuple[np.ndarray, float]:
    """MJPEG AVI bytes → ((n, h, w, 4) uint8 RGBA frames, fps).

    ``frame_indices`` decodes ONLY the requested frames (returned in the
    given order) — MJPEG frames are independent, so sampled reads cost
    O(sampled), not O(clip length); a dropped (zero-length) chunk resolves
    to the nearest earlier real frame, matching the full-decode output."""
    from .images import decode_image

    w, h, fps, jpegs = _parse_avi(buf)
    if frame_indices is not None:
        # resolve dropped frames to the nearest earlier real chunk, then
        # decode each needed chunk once (dedup repeated/shared sources)
        resolved = []
        for fi in frame_indices:
            if not 0 <= fi < len(jpegs):
                raise IndexError(f"frame {fi} out of range 0..{len(jpegs) - 1}")
            while fi >= 0 and len(jpegs[fi]) == 0:
                fi -= 1
            if fi < 0:
                raise ValueError("AVI starts with a dropped frame")
            resolved.append(fi)
        cache: dict[int, np.ndarray] = {}
        for fi in resolved:
            if fi not in cache:
                cache[fi] = decode_image(jpegs[fi], w, h, "jpeg")
        out = np.stack([cache[fi] for fi in resolved])
        if w and h and (out.shape[2] != w or out.shape[1] != h):
            raise ValueError(
                f"AVI header says {w}x{h} but frames decode to "
                f"{out.shape[2]}x{out.shape[1]}")
        return out, float(fps)
    frames = []
    prev = None
    for b in jpegs:
        if len(b) == 0:  # dropped frame: players repeat the previous one
            if prev is None:
                raise ValueError("AVI starts with a dropped frame")
            frames.append(prev)
            continue
        prev = decode_image(b, w, h, "jpeg")
        frames.append(prev)
    out = np.stack(frames)
    if w and h and (out.shape[2] != w or out.shape[1] != h):
        raise ValueError(
            f"AVI header says {w}x{h} but frames decode to "
            f"{out.shape[2]}x{out.shape[1]}")
    return out, float(fps)
