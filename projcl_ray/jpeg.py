"""Pure-Python baseline JPEG codec (stdlib ``struct`` + numpy).

Like :mod:`projcl_ray.png`, this removes an environment-forced codec stub:
the reference ingests arbitrary images (projcl_warp.c:68-107) and this
container ships no image libraries, so baseline JFIF support is implemented
from the JPEG specification (ITU T.81) directly.

Scope:
- decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components, any
  sampling factors in {1, 2} (4:4:4 / 4:2:2 / 4:2:0), standard or custom
  DQT/DHT tables, restart markers (DRI/RSTn), 0xFF00 byte unstuffing.
  Progressive (SOF2) and arithmetic coding are rejected with a clear error.
  Output is (h, w, 4) uint8 RGBA.
- encode: gray/RGB/RGBA → baseline JFIF with the Annex-K standard
  quantization (libjpeg quality scaling) and Huffman tables; 4:4:4 by
  default, optional 4:2:0 (``subsample=True``). Deterministic bytes.

Numerics: FDCT/IDCT are exact orthonormal 8×8 DCT-II matrices applied to all
blocks at once with einsum (float64) — vectorized where it matters; only the
entropy coding walks symbols in Python (a few per block).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constant tables (ITU T.81 Annex K) -------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.float64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.float64).reshape(8, 8)

# standard Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8×8 DCT-II matrix
_k = np.arange(8)[:, None]
_n = np.arange(8)[None, :]
_C = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * np.sqrt(2.0 / 8.0)
_C[0] /= np.sqrt(2.0)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (T.81 C.2)."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]):
    """16-bit-prefix lookup tables: prefix → (symbol, code length)."""
    sym = np.zeros(1 << 16, np.uint8)
    ln = np.zeros(1 << 16, np.uint8)
    for s, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


def _quality_tables(quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip(np.floor((QUANT_LUMA * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((QUANT_CHROMA * scale + 50) / 100), 1, 255)
    return qy, qc


def _to_ycbcr(arr: np.ndarray):
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _plane_blocks(plane: np.ndarray, bx: int | None = None,
                  by: int | None = None) -> np.ndarray:
    """(H, W) → (n_blocks, 8, 8) row-major, edge-replicated to the target
    block grid (bx × by blocks; defaults to ceil(dim/8) — interleaved scans
    need the MCU-aligned grid, which can exceed that)."""
    h, w = plane.shape
    W = (bx or -(-w // 8)) * 8
    H = (by or -(-h // 8)) * 8
    if (H, W) != (h, w):
        p = np.empty((H, W), plane.dtype)
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1 : h, :]
        p[:h, w:] = plane[:, w - 1 : w]
        p[h:, w:] = plane[h - 1, w - 1]
        plane = p
    return plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _fdct_quant(blocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    f = np.einsum("ij,njk,lk->nil", _C, blocks - 128.0, _C)
    return np.round(f / qtbl).astype(np.int32)


def _idct(coeffs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, coeffs, _C) + 128.0


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = int(abs(diff)).bit_length()
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        bitsval = diff if diff > 0 else diff + (1 << size) - 1
        w.write(bitsval, size)
    nz = np.nonzero(zz[1:])[0] + 1
    prev = 0
    for idx in nz:
        run = int(idx) - prev - 1
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        v = int(zz[idx])
        size = int(abs(v)).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        prev = int(idx)
    if prev != 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def encode_jpeg(arr: np.ndarray, *, quality: int = 90,
                subsample: bool = False) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 → baseline JFIF
    bytes. RGBA alpha is dropped (JPEG has no alpha). ``subsample=True``
    emits 4:2:0 chroma (smaller files, exercises the decoder's interleaved
    MCU path); default is 4:4:4."""
    arr = np.ascontiguousarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy, qc = _quality_tables(quality)
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        y, cb, cr = _to_ycbcr(arr)
        if subsample:
            # 2×2 box-mean chroma (pad odd dims by edge replication first)
            def ds(p):
                H, W = -(-h // 2) * 2, -(-w // 2) * 2
                q = np.empty((H, W))
                q[:h, :w] = p
                q[h:, :w] = p[h - 1 : h, :]
                q[:h, w:] = q[:h, w - 1 : w]
                q[h:, w:] = q[h - 1, w - 1]
                return q.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))

            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coeffs = []  # per component: (blocks_zz, blocks_per_row)
    for (p, q, (hi, vi)) in zip(planes, ([qy, qc, qc] if not gray else [qy]), samp):
        # interleaved MCUs require the component's block grid to cover the
        # FULL MCU lattice (mcus_x·h_i × mcus_y·v_i), not just ceil(dim/8)
        blocks = _plane_blocks(p, mcus_x * hi, mcus_y * vi)
        zz = _fdct_quant(blocks, q).reshape(-1, 64)[:, ZIGZAG]
        coeffs.append((zz, mcus_x * hi))

    # --- headers -----------------------------------------------------------
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate([qy] if gray else [qy, qc]):
        zzq = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xFF\xDB" + struct.pack(">HB", 3 + 64, tid) + zzq
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        hv = (samp[i][0] << 4) | samp[i][1]
        out += struct.pack("BBB", i + 1, hv, 0 if i == 0 else 1)
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        hts += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in hts:
        out += b"\xFF\xC4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += struct.pack("BB", i + 1, 0x00 if i == 0 else 0x11)
    out += b"\x00\x3F\x00"

    # --- entropy-coded data (interleaved MCUs) ------------------------------
    wtr = _BitWriter()
    preds = [0] * ncomp
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                zz, bpr = coeffs[ci]
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bidx = (my * vi + by) * bpr + (mx * hi + bx)
                        preds[ci] = _encode_block(
                            wtr, zz[bidx], preds[ci], *tables[ci]
                        )
    wtr.flush()
    out += wtr.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    """Bit reader over the unstuffed entropy bytes (MSB first)."""

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.pos = 0  # bit position

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = int.from_bytes(self.data[byte : byte + 4], "big")
        return (chunk >> (16 - (self.pos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        byte = self.pos >> 3
        chunk = int.from_bytes(self.data[byte : byte + 5], "big")
        v = (chunk >> (40 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.take(size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 4) uint8 RGBA."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtbl: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    restart_interval = 0
    frame = None
    scan = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                q = np.zeros(64, np.float64)
                q[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], np.uint8)
                qtbl[tid] = q.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, tid)] = _decode_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 15})
            break  # entropy data follows at `pos`
        # APPn/COM/others: skipped
    if frame is None or scan is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")
    fh, fw, comps = frame
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        s.update(by_id[s["id"]])

    # split entropy stream at RST markers, unstuff 0xFF00
    segments = []
    cur = bytearray()
    p = pos
    while p < len(buf):
        b = buf[p]
        if b == 0xFF:
            nxt = buf[p + 1] if p + 1 < len(buf) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    # per-component coefficient storage
    store = {}
    for c in comps:
        bpr = mcus_x * c["h"]
        bpc = mcus_y * c["v"]
        store[c["id"]] = np.zeros((bpc * bpr, 64), np.float64)

    seg_i = 0
    r = _BitReader(segments[0])
    preds = {s["id"]: 0 for s in scan}
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            r = _BitReader(segments[seg_i])
            preds = {s["id"]: 0 for s in scan}
        my, mx = divmod(m, mcus_x)
        for s in scan:
            dsym, dlen = huff[(0, s["dc"])]
            asym, alen = huff[(1, s["ac"])]
            bpr = mcus_x * s["h"]
            for by in range(s["v"]):
                for bx in range(s["h"]):
                    zz = np.zeros(64, np.float64)
                    pk = r.peek16()
                    size, ln = int(dsym[pk]), int(dlen[pk])
                    if ln == 0:
                        raise ValueError("corrupt JPEG: bad DC Huffman code")
                    r.pos += ln
                    preds[s["id"]] += _receive_extend(r, size)
                    zz[0] = preds[s["id"]]
                    k = 1
                    while k < 64:
                        pk = r.peek16()
                        rs, ln = int(asym[pk]), int(alen[pk])
                        if ln == 0:
                            raise ValueError("corrupt JPEG: bad AC Huffman code")
                        r.pos += ln
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        zz[k] = _receive_extend(r, rs & 15)
                        k += 1
                    bidx = (my * s["v"] + by) * bpr + (mx * s["h"] + bx)
                    store[s["id"]][bidx] = zz

    # dequantize + IDCT per component (vectorized), assemble planes
    planes = {}
    for c in comps:
        bpr = mcus_x * c["h"]
        bpc = mcus_y * c["v"]
        coeff = store[c["id"]][:, UNZIGZAG].reshape(-1, 8, 8) * qtbl[c["tq"]]
        px = _idct(coeff)
        plane = px.reshape(bpc, bpr, 8, 8).transpose(0, 2, 1, 3).reshape(bpc * 8, bpr * 8)
        # upsample to full resolution (nearest), crop
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes[c["id"]] = plane[:fh, :fw]

    out = np.empty((fh, fw, 4), np.uint8)
    if len(comps) == 1:
        g = np.clip(np.round(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)
        out[..., 0] = out[..., 1] = out[..., 2] = g
    else:
        y = planes[comps[0]["id"]]
        cb = planes[comps[1]["id"]] - 128.0
        cr = planes[comps[2]["id"]] - 128.0
        out[..., 0] = np.clip(np.round(y + 1.402 * cr), 0, 255).astype(np.uint8)
        out[..., 1] = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255).astype(np.uint8)
        out[..., 2] = np.clip(np.round(y + 1.772 * cb), 0, 255).astype(np.uint8)
    out[..., 3] = 255
    return out
