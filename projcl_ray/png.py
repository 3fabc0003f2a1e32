"""Pure-Python PNG codec (stdlib ``zlib`` + ``struct`` + numpy).

The reference ingests arbitrary images through OpenCL image buffers
(/root/reference/src/projcl_warp.c:68-107); this container ships no image
libraries, so PNG support is implemented from the PNG specification (RFC
2083 / W3C PNG) directly — no PIL/cv2 required. This makes ``fmt="png"`` a
first-class ingest/egress format for the warp/tile pipelines.

Scope (everything a pipeline producer in this repo, and the common crop of
real-world PNGs, needs):
- decode: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/Average/
  Paeth); tRNS transparency for palette and for gray/RGB colorkey;
  non-interlaced only (Adam7 rejected with a clear error). Output is always
  (h, w, 4) uint8 RGBA — the engine's pixel model.
- encode: RGBA/RGB/gray from a numpy array, selectable scanline filter
  (default 0 = None: deterministic bytes, fastest; Sub/Up/Average/Paeth are
  implemented vectorized — filtering on encode has no sequential dependency
  — and exist mainly so every decode branch is round-trip testable).

Determinism: encoding the same array with the same arguments yields the
same bytes on any platform (zlib with a fixed level, fixed filter choice).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _filtered_stream(raw: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """raw: (h, stride) uint8 original scanlines → filtered stream."""
    h, stride = raw.shape
    r16 = raw.astype(np.int16)
    left = np.zeros_like(r16)
    left[:, bpp:] = r16[:, :-bpp]
    up = np.zeros_like(r16)
    up[1:] = r16[:-1]
    ul = np.zeros_like(r16)
    ul[1:, bpp:] = r16[:-1, :-bpp]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:  # Sub
        filt = ((r16 - left) & 0xFF).astype(np.uint8)
    elif filter_type == 2:  # Up
        filt = ((r16 - up) & 0xFF).astype(np.uint8)
    elif filter_type == 3:  # Average
        filt = ((r16 - (left + up) // 2) & 0xFF).astype(np.uint8)
    elif filter_type == 4:  # Paeth
        pred = _paeth(left, up, ul)
        filt = ((r16 - pred) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"unknown PNG filter {filter_type}")
    out = np.empty((h, stride + 1), np.uint8)
    out[:, 0] = filter_type
    out[:, 1:] = filt
    return out.tobytes()


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec pseudocode, vectorized; int16-safe)."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, *, level: int = 6, filter_type: int = 0) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 → PNG bytes."""
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape} for PNG encode")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = arr.reshape(h, w * ch)
    stream = _filtered_stream(raw, ch, filter_type)
    idat = zlib.compress(stream, level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(stream: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. Filter 0/2 are fully vectorized per
    row; Sub uses a wrap-around uint8 cumsum (exact mod-256 semantics);
    Average/Paeth have an intra-row byte dependency and run a per-pixel
    loop vectorized across the row's byte lanes (bpp at a time)."""
    rows = stream.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        raw = data[y]
        if f == 0:
            rec = raw.copy()
        elif f == 1:  # Sub: rec[x] = raw[x] + rec[x-bpp]  (mod 256)
            rec = raw.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = raw + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            rec = np.empty(stride, np.uint8)
            rec[:bpp] = raw[:bpp] + prev[:bpp] // 2
            for x in range(bpp, stride, bpp):
                sl = slice(x, x + bpp)
                avg = (rec[x - bpp : x].astype(np.int16) + prev[sl]) // 2
                rec[sl] = raw[sl] + avg.astype(np.uint8)
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            pb = prev[:bpp].astype(np.int16)
            rec[:bpp] = raw[:bpp] + _paeth(
                np.zeros(bpp, np.int16), pb, np.zeros(bpp, np.int16)
            ).astype(np.uint8)
            prev16 = prev.astype(np.int16)
            for x in range(bpp, stride, bpp):
                sl = slice(x, x + bpp)
                a = rec[x - bpp : x].astype(np.int16)
                rec[sl] = raw[sl] + _paeth(
                    a, prev16[sl], prev16[x - bpp : x]
                ).astype(np.uint8)
        else:
            raise ValueError(f"corrupt PNG: filter {f}")
        out[y] = rec
        prev = rec
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 4) uint8 RGBA."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        # ancillary chunks ignored
    if ihdr is None:
        raise ValueError("corrupt PNG: no IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG: unknown compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    ch = _CHANNELS[color]
    stride = w * ch
    stream = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(stream) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong IDAT length")
    px = _unfilter(stream, h, stride, ch).reshape(h, w, ch)

    out = np.empty((h, w, 4), np.uint8)
    if color == 6:  # RGBA
        out[:] = px
    elif color == 2:  # RGB (+ optional colorkey tRNS)
        out[..., :3] = px
        out[..., 3] = 255
        if trns is not None and len(trns) >= 6:
            key = struct.unpack(">HHH", trns[:6])
            mask = np.all(px == np.array(key, np.uint16)[None, None, :] % 256, axis=2)
            out[..., 3] = np.where(mask, 0, 255)
    elif color == 0:  # gray
        out[..., 0] = out[..., 1] = out[..., 2] = px[..., 0]
        out[..., 3] = 255
        if trns is not None and len(trns) >= 2:
            (key,) = struct.unpack(">H", trns[:2])
            out[..., 3] = np.where(px[..., 0] == key % 256, 0, 255)
    elif color == 4:  # gray + alpha
        out[..., 0] = out[..., 1] = out[..., 2] = px[..., 0]
        out[..., 3] = px[..., 1]
    elif color == 3:  # palette
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("corrupt PNG: palette index out of range")
        out[..., :3] = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            out[..., 3] = alpha[idx]
        else:
            out[..., 3] = 255
    return out
