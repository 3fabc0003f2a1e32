"""Multimodal (audio/video) column plumbing — Ray-side schema, batch sizing
and actor signatures are real, and so are the codecs for wav/flac audio and
MJPEG-AVI video (in-repo, spec-implemented — same policy as png/jpeg in
images.py). mp3 is split in two layers: the CONTAINER (frame walk, exact
duration/bitrate/mode metadata — projcl_ray/mp3.py) is real and tested;
SAMPLE decode auto-prefers libsndfile (soundfile, decodes mp3 since 1.1)
via the encoder/decoder swap-in hook and otherwise stays an explicit stub
(the Layer III DSP tables are empirical spec data underivable offline —
rationale in mp3.py). mp4/webm remain explicit stubs (inter-frame DSP
codecs).

Layout conventions:
- audio rows:  (clip_id: string, bytes: binary, sample_rate: int32,
  n_samples: int64, fmt: string)  — fmt="pcm16" (raw int16 LE), "wav"
  (in-repo RIFF codec below) and "flac" (in-repo lossless codec,
  projcl_ray/flac.py) are first-class; "mp3" decodes via the library
  swap-in when importable, else raises NotImplementedError carrying the
  parsed container metadata.
- video rows:  (video_id: string, bytes: binary, w: int32, h: int32,
  n_frames: int32, fmt: string) — fmt="rawv" = n_frames raw RGBA frames
  concatenated; "avi" = MJPEG-in-AVI (in-repo container codec,
  projcl_ray/avi.py, frames via the in-repo JPEG codec); "mp4"/"webm"
  stubs (DSP-heavy inter-frame codecs).

Feature extraction runs as small-batch ``map_batches`` stages (media rows are
wide, so batch_size stays small and blocks narrow — same rule as images).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from ._corrupt import corrupt_guard

_SF_MOD = None  # probed once per process (0 = probed, absent)


def _soundfile():
    """libsndfile (``soundfile``) swap-in probe — the audio mirror of
    images._pil. Returns the module when importable and not disabled via
    ``PROJCL_PURE_CODECS`` (same off-spellings contract as images._pil).
    Used by the ENCODE sinks only (encode_flac, encode_wav_ima_adpcm):
    the in-repo pure-Python encoders are the measured per-core ceilings
    (FLAC 1.6-2.2 MB/s, IMA 2.6 MB/s — BENCH/codec_throughput_r4.json),
    while decode already has the C fastcodec twins. The in-repo encoders
    stay as the always-available fallback and determinism oracle."""
    global _SF_MOD
    if os.environ.get("PROJCL_PURE_CODECS", "").lower() not in (
            "", "0", "false", "no", "off"):
        return None
    if _SF_MOD is None:
        try:
            import soundfile as sf  # noqa: PLC0415

            _SF_MOD = sf
        except Exception:
            _SF_MOD = 0
    return _SF_MOD or None


def decode_audio(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "pcm16":
        return np.frombuffer(buf, dtype="<i2").astype(np.float32) / 32768.0
    if fmt == "wav":
        return decode_wav(buf)[0]
    if fmt == "flac":
        from .flac import decode_flac

        samples, _sr, bps = decode_flac(buf)
        x = samples.astype(np.float32) / float(1 << (bps - 1))
        return x.mean(axis=1).astype(np.float32) if x.shape[1] > 1 else x[:, 0]
    if fmt == "mp3":
        sf = _soundfile()
        if sf is not None:  # libsndfile >= 1.1 decodes MPEG Layer III
            import io

            data, _sr = sf.read(io.BytesIO(buf), dtype="float32",
                                always_2d=True)
            return (data.mean(axis=1).astype(np.float32)
                    if data.shape[1] > 1 else data[:, 0])
        from .mp3 import mp3_stream_info

        info = mp3_stream_info(buf)  # container layer is real (mp3.py)
        raise NotImplementedError(
            "mp3 SAMPLE decode needs either a codec library (soundfile/"
            "libsndfile>=1.1 is auto-preferred when importable) or the "
            "ISO 11172-3 empirical DSP tables (Huffman B.7 / scalefactor "
            "bands B.8 / synthesis window B.3), which cannot be derived "
            "offline — see projcl_ray/mp3.py. Container metadata parsed "
            f"fine: {info['n_frames']} frames, {info['duration_s']:.2f}s "
            f"@ {info['sample_rate']} Hz {info['mode']}."
        )
    raise ValueError(f"unknown audio format {fmt!r}")


# ---------------------------------------------------------------------------
# G.711 µ-law / A-law companding (ITU-T G.711; the Sun/CCITT reference
# algorithm expressed as 256-entry decode LUTs and vectorized encoders) —
# telephony-recorded WAVs in the wild commonly carry format codes 7/6.
# ---------------------------------------------------------------------------

def _ulaw_lut() -> np.ndarray:
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_lut() -> np.ndarray:
    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108,
                 (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_DEC = _ulaw_lut()
_ALAW_DEC = _alaw_lut()
# encoders: nearest-code via searchsorted over each LUT's sorted decode values
_ULAW_ORDER = np.argsort(_ULAW_DEC, kind="stable").astype(np.uint8)
_ULAW_SORTED = _ULAW_DEC[_ULAW_ORDER]
_ALAW_ORDER = np.argsort(_ALAW_DEC, kind="stable").astype(np.uint8)
_ALAW_SORTED = _ALAW_DEC[_ALAW_ORDER]


def _compand_encode(pcm16: np.ndarray, sorted_vals: np.ndarray,
                    order: np.ndarray) -> np.ndarray:
    """Vectorized nearest-neighbor companding: int16 → 8-bit code whose
    decode value is closest to the input (ties toward the lower value)."""
    x = pcm16.astype(np.int32)
    hi = np.searchsorted(sorted_vals, x)
    hi = np.clip(hi, 1, len(sorted_vals) - 1)
    lo = hi - 1
    pick = np.where(np.abs(sorted_vals[hi].astype(np.int32) - x)
                    < np.abs(x - sorted_vals[lo].astype(np.int32)), hi, lo)
    return order[pick]


def encode_wav(pcm: np.ndarray, sample_rate: int, *, codec: str = "pcm16") -> bytes:
    """int16 PCM (1-D mono or (n, ch)) → RIFF/WAVE bytes. ``codec``:
    "pcm16" (format 1, 16-bit), "ulaw"/"alaw" (G.711 formats 7/6, 8-bit
    companded). Pure stdlib+numpy — deterministic output, no codec library."""
    import struct

    pcm = np.ascontiguousarray(pcm, "<i2")
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    if codec == "pcm16":
        fmt_code, bits, data = 1, 16, pcm.tobytes()
    elif codec == "ulaw":
        fmt_code, bits = 7, 8
        data = _compand_encode(pcm.reshape(-1), _ULAW_SORTED, _ULAW_ORDER).tobytes()
    elif codec == "alaw":
        fmt_code, bits = 6, 8
        data = _compand_encode(pcm.reshape(-1), _ALAW_SORTED, _ALAW_ORDER).tobytes()
    else:
        raise ValueError(f"unknown WAV codec {codec!r}")
    bytes_per = ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate,
                      sample_rate * bytes_per, bytes_per, bits)
    # RIFF chunks are word-aligned: an odd-length data chunk (8-bit G.711
    # mono with an odd sample count) carries a pad byte NOT counted in the
    # chunk size but counted in the RIFF size
    pad = b"\x00" if len(data) & 1 else b""
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + len(pad))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data + pad)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format code 0x11; IMA ADPCM reference algorithm).
# The predictor/step-index chain is sequential WITHIN a block, but blocks
# are independent — so decode walks nibble positions in lockstep across ALL
# blocks at once (numpy state vectors), ~block_count-way vectorized.
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767], np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, np.int32)


def _ima_step_nibbles(nibs: np.ndarray, pred: np.ndarray, idx: np.ndarray):
    """One vectorized IMA step for a vector of nibbles with per-element
    (pred, idx) state. Returns the new (pred, idx)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    diff += np.where(nibs & 1, step >> 2, 0)
    diff += np.where(nibs & 2, step >> 1, 0)
    diff += np.where(nibs & 4, step, 0)
    pred = np.clip(pred + np.where(nibs & 8, -diff, diff), -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX_ADJ[nibs], 0, 88)
    return pred, idx


def _ima_decode(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM payload → (n, ch) int16. Standard WAV block layout: per
    channel a 4-byte header (int16 predictor, uint8 step index, pad), then
    4-byte (8-nibble) groups interleaved per channel. A short final block
    (data not a multiple of nBlockAlign — a layout the WAVE spec permits)
    decodes as its own smaller block rather than being silently dropped."""
    raw = np.frombuffer(data, np.uint8)
    tail = len(raw) % block_align
    if tail:
        hdr_len = 4 * ch
        if tail < hdr_len:
            raise ValueError("truncated IMA ADPCM final block (no header)")
        # keep the header plus whole interleaved group sets; dangling
        # partial-group bytes are undecodable nibble fragments
        usable = hdr_len + (tail - hdr_len) // hdr_len * hdr_len
        head = _ima_decode(data[: len(raw) - tail], ch, block_align) \
            if len(raw) > tail else np.empty((0, ch), np.int16)
        return np.vstack([head,
                          _ima_decode(data[len(raw) - tail:
                                           len(raw) - tail + usable],
                                      ch, usable)])
    n_blocks = len(raw) // block_align
    blocks = raw.reshape(n_blocks, block_align)
    spb = (block_align - 4 * ch) * 2 // ch + 1  # samples per block per channel

    hdr = blocks[:, : 4 * ch].reshape(n_blocks, ch, 4)
    pred = (hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
    idx = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)

    body = blocks[:, 4 * ch:]  # (n_blocks, groups*4*ch) — 4-byte groups per ch
    grp = body.reshape(n_blocks, -1, ch, 4)  # group g, channel c, 4 bytes
    lo = grp & 0x0F
    hi = grp >> 4
    # nibble stream per (block, channel): byte order within group, lo then hi
    nibs = np.empty(grp.shape[:3] + (8,), np.uint8)
    nibs[..., 0::2] = lo
    nibs[..., 1::2] = hi
    nibs = nibs.transpose(0, 2, 1, 3).reshape(n_blocks, ch, -1)

    flat_pred = pred.reshape(-1)
    flat_idx = idx.reshape(-1)
    flat_nibs = np.ascontiguousarray(nibs.reshape(n_blocks * ch, -1))
    from . import fastcodec

    rows = fastcodec.ima_decode_rows(flat_nibs, flat_pred, flat_idx)
    if rows is not None:  # per-row C walk (sample-exact with the loop below)
        out = rows.reshape(n_blocks, ch, spb)
    else:
        out = np.empty((n_blocks, ch, spb), np.int16)
        out[:, :, 0] = pred.astype(np.int16)
        for t in range(spb - 1):  # lockstep across all blocks & channels
            flat_pred, flat_idx = _ima_step_nibbles(
                flat_nibs[:, t], flat_pred, flat_idx)
            out[:, :, t + 1] = flat_pred.reshape(n_blocks, ch).astype(np.int16)
    return out.transpose(0, 2, 1).reshape(-1, ch)


def _ima_encode(pcm: np.ndarray, block_samples: int = 1017) -> tuple[bytes, int]:
    """(n, ch) int16 → (IMA ADPCM payload, block_align). Greedy reference
    quantizer, vectorized across blocks in the same lockstep fashion."""
    pcm = pcm.reshape(-1, 1) if pcm.ndim == 1 else pcm
    n, ch = pcm.shape
    # pad the tail block; samples-per-block ≡ 1 (mod 8) keeps groups whole
    spb = block_samples - (block_samples - 1) % 8
    n_blocks = (n + spb - 1) // spb
    padded = np.zeros((n_blocks * spb, ch), np.int16)
    padded[:n] = pcm
    samp = padded.reshape(n_blocks, spb, ch).transpose(0, 2, 1)  # (b, ch, s)

    flat = samp.reshape(n_blocks * ch, spb).astype(np.int32)
    pred = flat[:, 0].copy()
    # initial step index per block ≈ the block's mean slope over its VALID
    # samples (tail-block padding would dilute the estimate to near zero);
    # blocks are encoded in parallel, so the running index can't carry
    # across them — this estimate avoids the slow ramp-up from index 0
    adiff = np.abs(np.diff(flat, axis=1)).astype(np.float64)
    valid_per_block = np.full(n_blocks, spb - 1, np.int64)
    last_valid = n - (n_blocks - 1) * spb  # real samples in the tail block
    valid_per_block[-1] = max(last_valid - 1, 1)
    mask = (np.arange(spb - 1)[None, :]
            < valid_per_block.repeat(ch)[:, None])
    slope = ((adiff * mask).sum(axis=1)
             / np.maximum(mask.sum(axis=1), 1)).astype(np.int32)
    idx0 = np.clip(np.searchsorted(_IMA_STEPS, slope), 0, 88).astype(np.int32)
    from . import fastcodec

    got = fastcodec.ima_encode_rows(np.ascontiguousarray(flat, np.int32), idx0)
    if got is not None:  # per-row C quantizer (nibble-exact with the loop)
        nibs = got
    else:
        idx = idx0.copy()
        nibs = np.empty((len(flat), spb - 1), np.uint8)
        for t in range(spb - 1):
            target = flat[:, t + 1]
            step = _IMA_STEPS[idx]
            diff = target - pred
            nib = np.where(diff < 0, 8, 0).astype(np.uint8)
            adiff = np.abs(diff)
            nib |= np.where(adiff >= step, 4, 0).astype(np.uint8)
            rem = adiff - np.where(adiff >= step, step, 0)
            nib |= np.where(rem >= step >> 1, 2, 0).astype(np.uint8)
            rem = rem - np.where(rem >= step >> 1, step >> 1, 0)
            nib |= np.where(rem >= step >> 2, 1, 0).astype(np.uint8)
            nibs[:, t] = nib
            pred, idx = _ima_step_nibbles(nib, pred, idx)

    block_align = 4 * ch + (spb - 1) * ch // 2
    groups = nibs.reshape(n_blocks, ch, -1, 8)
    packed = (groups[..., 0::2] | (groups[..., 1::2] << 4)).astype(np.uint8)
    packed = packed.transpose(0, 2, 1, 3).reshape(n_blocks, -1)
    hdr = np.zeros((n_blocks, ch, 4), np.uint8)
    first = samp[:, :, 0].astype(np.int32) & 0xFFFF
    hdr[:, :, 0] = first & 0xFF
    hdr[:, :, 1] = first >> 8
    hdr[:, :, 2] = idx0.reshape(n_blocks, ch).astype(np.uint8)
    out = np.concatenate([hdr.reshape(n_blocks, -1), packed], axis=1)
    return out.tobytes(), block_align


def encode_wav_ima_adpcm(pcm: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM (1-D mono or (n, ch)) → RIFF/WAVE with IMA ADPCM (format
    0x11) payload, incl. the required ``fact`` chunk. Prefers libsndfile
    when importable (see :func:`_soundfile` — IMA is lossy, so the two
    encoders differ in bytes but track the same signal; the smooth-signal
    property pytest holds for both)."""
    import struct

    sf = _soundfile()
    if sf is not None:
        import io

        bio = io.BytesIO()
        sf.write(bio, np.ascontiguousarray(pcm, np.int16), sample_rate,
                 format="WAV", subtype="IMA_ADPCM")
        return bio.getvalue()

    pcm = np.ascontiguousarray(pcm, "<i2")
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    n = pcm.shape[0]
    data, block_align = _ima_encode(pcm)
    spb = (block_align - 4 * ch) * 2 // ch + 1
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, sample_rate,
                      sample_rate * block_align // spb, block_align, 4, 2, spb)
    fact = struct.pack("<I", n)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(data)) + data)


def _parse_wav(buf: bytes):
    """RIFF walk shared by whole-clip decode and block streaming:
    (audio_fmt, ch, sr, bits, block_align, fact, data)."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_chunk = data = fact = None
    mv = memoryview(buf)  # chunk payloads stay zero-copy views: a streamed
    while pos + 8 <= len(buf):  # reader must not duplicate the data chunk
        tag = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        payload = mv[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt_chunk = payload
        elif tag == b"data":
            data = payload
        elif tag == b"fact" and ln >= 4:
            (fact,) = struct.unpack_from("<I", payload, 0)
        pos += 8 + ln + (ln & 1)  # chunks pad to even length
    if fmt_chunk is None or data is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_fmt, ch, sr, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt_chunk, 0)
    if audio_fmt == 0xFFFE and len(fmt_chunk) >= 26:  # EXTENSIBLE: real fmt inside
        (audio_fmt,) = struct.unpack_from("<H", fmt_chunk, 24)
    return audio_fmt, ch, int(sr), bits, block_align, fact, data


def _wav_payload_to_mono(audio_fmt: int, ch: int, bits: int, data: bytes) -> np.ndarray:
    """Sample payload bytes → float32 mono. Pure per-frame math, so slicing
    ``data`` at whole-frame boundaries and concatenating the outputs is
    bit-identical to one whole-buffer call (the streaming invariant)."""
    if audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:  # 8-bit WAV is unsigned
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 1 and bits == 24:
        b3 = np.frombuffer(data, np.uint8)[: (len(data) // 3) * 3].reshape(-1, 3)
        v = (b3[:, 0].astype(np.int32) | (b3[:, 1].astype(np.int32) << 8)
             | (b3[:, 2].astype(np.int32) << 16))
        x = np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.float32) / 8388608.0
    elif audio_fmt == 7 and bits == 8:  # G.711 µ-law (one LUT gather)
        x = _ULAW_DEC[np.frombuffer(data, np.uint8)].astype(np.float32) / 32768.0
    elif audio_fmt == 6 and bits == 8:  # G.711 A-law
        x = _ALAW_DEC[np.frombuffer(data, np.uint8)].astype(np.float32) / 32768.0
    else:
        raise NotImplementedError(f"WAV format {audio_fmt}/{bits}-bit unsupported")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1).astype(np.float32)
    return x


@corrupt_guard("WAV")
def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (float32 mono samples in [-1, 1], sample_rate). Pure
    stdlib + numpy (no codec libs): PCM 8/16/24/32-bit (format 1),
    float32 (format 3), G.711 µ/A-law, IMA ADPCM,
    WAVE_FORMAT_EXTENSIBLE unwrapping, odd-length chunk padding;
    multi-channel input averages to mono (the feature-extraction
    convention here)."""
    audio_fmt, ch, sr, bits, block_align, fact, data = _parse_wav(buf)
    if audio_fmt == 0x11 and bits == 4:  # IMA ADPCM (block-parallel decode)
        samples = _ima_decode(data, ch, block_align)
        if fact is not None:
            samples = samples[:fact]  # drop encoder padding in the tail block
        x = samples.reshape(-1).astype(np.float32) / 32768.0
        if ch > 1:
            x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1).astype(np.float32)
        return x, sr
    return _wav_payload_to_mono(audio_fmt, ch, bits, data), sr


def stream_audio(buf: bytes, fmt: str, chunk_samples: int = 1 << 20):
    """Block-streamed decode (VERDICT r4 #5): yield float32 mono chunks of
    ≤ ~chunk_samples such that ``np.concatenate(list(...))`` equals
    ``decode_audio(buf, fmt)`` BIT-EXACTLY, while holding only one chunk
    in memory — a multi-hour clip row no longer costs a multi-GB decode.
    Natural block units per container: raw slices (pcm16), whole sample
    frames (wav PCM/float/G.711), whole ADPCM blocks (each carries its
    own predictor/step header), FLAC frames (independently decodable per
    RFC 9639)."""
    if fmt == "pcm16":
        step = max(1, chunk_samples) * 2
        n2 = (len(buf) // 2) * 2
        for off in range(0, n2, step):
            yield (np.frombuffer(buf[off : min(off + step, n2)], "<i2")
                   .astype(np.float32) / 32768.0)
        return
    if fmt == "wav":
        audio_fmt, ch, sr, bits, block_align, fact, data = _parse_wav(buf)
        if audio_fmt == 0x11 and bits == 4:  # IMA ADPCM: whole blocks
            spb = (block_align - 4 * ch) * 2 // ch + 1
            blocks_per_chunk = max(1, chunk_samples // max(spb, 1))
            step = blocks_per_chunk * block_align
            remaining = fact  # per-channel sample budget (None = no fact)
            for off in range(0, len(data) // block_align * block_align, step):
                samples = _ima_decode(data[off : off + step], ch, block_align)
                if remaining is not None:
                    samples = samples[:remaining]
                    remaining -= len(samples)
                x = samples.reshape(-1).astype(np.float32) / 32768.0
                if ch > 1:
                    x = (x[: (len(x) // ch) * ch].reshape(-1, ch)
                         .mean(axis=1).astype(np.float32))
                if len(x):
                    yield x
            return
        frame_bytes = ch * (4 if bits == 32 else 3 if bits == 24
                            else 2 if bits == 16 else 1)
        usable = (len(data) // frame_bytes) * frame_bytes
        step = max(1, chunk_samples) * frame_bytes
        for off in range(0, usable, step):
            yield _wav_payload_to_mono(audio_fmt, ch, bits,
                                       data[off : min(off + step, usable)])
        return
    if fmt == "flac":
        from .flac import flac_stream_info, iter_flac_frames

        _pos, _sr, _ch, bps, _total = flac_stream_info(buf)
        for frame in iter_flac_frames(buf):
            x = frame.astype(np.float32) / float(1 << (bps - 1))
            yield (x.mean(axis=1).astype(np.float32) if x.shape[1] > 1
                   else x[:, 0])
        return
    # formats without a block structure (or stubs that raise): one chunk
    yield decode_audio(buf, fmt)


def decode_video_frames(buf: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    if fmt == "rawv":
        return np.frombuffer(buf, dtype=np.uint8).reshape(n_frames, h, w, 4)
    if fmt == "avi":  # MJPEG-in-AVI, in-repo container codec (avi.py)
        from .avi import decode_avi_mjpeg

        frames, _fps = decode_avi_mjpeg(buf)
        if frames.shape[:3] != (n_frames, h, w):
            raise ValueError(
                f"AVI decodes to {frames.shape[:3]}, metadata says "
                f"{(n_frames, h, w)}")
        return frames
    if fmt in ("mp4", "webm"):
        raise NotImplementedError(
            f"{fmt} decode requires a video codec library not present in this "
            "environment; use fmt='rawv' (concatenated raw RGBA frames) or "
            "fmt='avi' (in-repo MJPEG-AVI container codec)."
        )
    raise ValueError(f"unknown video format {fmt!r}")


def features_from_chunks(chunks) -> tuple[float, float, float]:
    """(rms, peak, zcr) from an iterable of float32 mono chunks — the
    canonical feature math for whole-clip AND streamed decode. Peak and
    zero crossings are exactly chunking-invariant (max / boundary-aware
    count); rms accumulates exact float64 squares of float32 samples per
    chunk and merges the partials with one compensated fsum — in-chunk
    pairwise association can in principle differ across chunkings at the
    last ulp, so the pytest PINS bit-equality across chunk sizes on the
    media corpus (168 format × chunk cases) and on the long-clip test."""
    import math

    partials: list[float] = []
    n = 0
    peak = 0.0
    crossings = 0
    last_sign = None
    for x in chunks:
        if not len(x):
            continue
        xx = x.astype(np.float64)
        partials.append(float((xx * xx).sum()))
        n += len(x)
        peak = max(peak, float(np.abs(x).max()))
        s = np.signbit(x)
        crossings += int(np.count_nonzero(s[1:] != s[:-1]))
        if last_sign is not None:
            crossings += int(bool(s[0]) != last_sign)
        last_sign = bool(s[-1])
    if n == 0:
        return 0.0, 0.0, 0.0
    rms = math.sqrt(math.fsum(partials) / n)
    zcr = crossings / (n - 1) if n > 1 else 0.0
    return rms, peak, zcr


def audio_features(ds: ray.data.Dataset, *, batch_size: int = 64,
                   chunk_samples: int | None = None) -> ray.data.Dataset:
    """Per-clip features: rms, peak, zero-crossing rate, duration_s.

    ``chunk_samples`` bounds per-row decode memory (VERDICT r4 #5): None
    decodes each clip whole (fine for short rows); an int streams the
    decode in ≤ ~chunk_samples blocks (FLAC frames / WAV sample frames /
    ADPCM blocks), holding one block in memory at a time — a 3-hour
    podcast row costs megabytes, not a multi-GB decode. Feature values
    are identical either way (chunking-invariant accumulators,
    :func:`features_from_chunks`; pinned bit-equal in pytest)."""

    def _feat(batch: pa.Table) -> pa.Table:
        rms, peak, zcr, dur = [], [], [], []
        for buf, fmt, sr, n in zip(
            batch["bytes"].to_pylist(), batch["fmt"].to_pylist(),
            batch["sample_rate"].to_pylist(), batch["n_samples"].to_pylist(),
        ):
            chunks = ([decode_audio(buf, fmt)] if chunk_samples is None
                      else stream_audio(buf, fmt, chunk_samples))
            r, p, z = features_from_chunks(chunks)
            rms.append(r)
            peak.append(p)
            zcr.append(z)
            dur.append(n / sr if sr else 0.0)
        out = batch.drop_columns(["bytes"])
        for name, vals in (("rms", rms), ("peak", peak), ("zcr", zcr), ("duration_s", dur)):
            out = out.append_column(name, pa.array(vals, pa.float64()))
        return out

    return ds.map_batches(_feat, batch_format="pyarrow", batch_size=batch_size)


def mp3_frame_scan(ds: ray.data.Dataset, *, batch_size: int = 64) -> ray.data.Dataset:
    """Per-clip MPEG audio CONTAINER metadata (projcl_ray/mp3.py frame
    walk — no payload decode, so it is exact for any real-world mp3):
    frame count, duration, sample layout, CBR/VBR bitrate statistics.
    The ingest stage a 100 TB scraped-audio catalog pass runs before
    deciding what to decode."""

    def _scan(batch: pa.Table) -> pa.Table:
        from .mp3 import mp3_stream_info

        cols: dict[str, list] = {
            "n_frames": [], "n_samples": [], "sample_rate": [], "channels": [],
            "mode": [], "layer": [], "duration_ms": [], "bitrate_mode": [],
            "min_bitrate_kbps": [], "max_bitrate_kbps": [], "avg_bitrate_kbps": [],
        }
        for buf in batch["bytes"].to_pylist():
            info = mp3_stream_info(buf)
            cols["n_frames"].append(info["n_frames"])
            cols["n_samples"].append(info["n_samples"])
            cols["sample_rate"].append(info["sample_rate"])
            cols["channels"].append(info["channels"])
            cols["mode"].append(info["mode"])
            cols["layer"].append(info["layer"])
            cols["duration_ms"].append(int(np.floor(info["duration_s"] * 1000 + 0.5)))
            cols["bitrate_mode"].append(info["bitrate_mode"])
            cols["min_bitrate_kbps"].append(info["min_bitrate_kbps"])
            cols["max_bitrate_kbps"].append(info["max_bitrate_kbps"])
            cols["avg_bitrate_kbps"].append(int(np.floor(info["avg_bitrate_kbps"] + 0.5)))
        out = batch.drop_columns(["bytes"])
        for name, vals in cols.items():
            typ = pa.string() if name in ("mode", "bitrate_mode") else pa.int64()
            out = out.append_column(name, pa.array(vals, typ))
        return out

    return ds.map_batches(_scan, batch_format="pyarrow", batch_size=batch_size)


def synth_mp3_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic structurally-valid MPEG-1 Layer III corpus mixing CBR /
    VBR, stereo/mono, 44.1/48/32 kHz, ID3v2 prefixes and CRC frames (see
    mp3.synth_mp3_bytes — headers and frame sizes are exact; payloads are
    filler the container layer never reads)."""
    from .mp3 import synth_mp3_bytes

    ids, bufs = [], []
    rates = (44100, 48000, 32000)
    brs = (96, 128, 160, 192)
    for i in range(n):
        ids.append(f"mp3_{i:06d}")
        bufs.append(synth_mp3_bytes(
            20 + 3 * (i % 7),
            bitrate_kbps=brs[i % len(brs)],
            sample_rate=rates[i % len(rates)],
            mono=bool(i % 3 == 0),
            vbr_alternate=(64 if i % 4 == 0 else None),
            id3_bytes=(200 + i if i % 5 == 0 else 0),
            crc=bool(i % 6 == 0),
            seed=seed + i,
        ))
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(bufs, pa.binary()),
        "fmt": pa.array(["mp3"] * n, pa.string()),
    })


def sample_video_frames(ds: ray.data.Dataset, every_n: int = 10, *,
                        batch_size: int = 8) -> ray.data.Dataset:
    """Frame sampling: emit every Nth frame as an image row (image_id =
    '<video_id>#<frame>'), ready for the warp/tile stages."""

    def _frames(batch: pa.Table) -> pa.Table:
        ids, bufs, ws, hs, fmts = [], [], [], [], []
        for vid, buf, w, h, nf, fmt in zip(
            batch["video_id"].to_pylist(), batch["bytes"].to_pylist(),
            batch["w"].to_pylist(), batch["h"].to_pylist(),
            batch["n_frames"].to_pylist(), batch["fmt"].to_pylist(),
        ):
            wanted = list(range(0, nf, every_n))
            if fmt == "avi":
                # MJPEG frames are independent: decode ONLY the sampled
                # frames — cost O(sampled), not O(clip length)
                from .avi import decode_avi_mjpeg

                sel, _fps = decode_avi_mjpeg(buf, frame_indices=wanted)
                # the rawv path validates dims inside decode_video_frames;
                # mirror that here so mislabeled w/h metadata fails loudly
                # instead of surfacing as a reshape error downstream
                if len(sel) and sel.shape[1:3] != (h, w):
                    raise ValueError(
                        f"video {vid!r}: AVI stream is {sel.shape[2]}x"
                        f"{sel.shape[1]} but row metadata says {w}x{h}")
            else:
                sel = decode_video_frames(buf, w, h, nf, fmt)[wanted]
            for fi, frame in zip(wanted, sel):
                ids.append(f"{vid}#{fi:06d}")
                bufs.append(np.ascontiguousarray(frame).tobytes())
                ws.append(w)
                hs.append(h)
                fmts.append("raw")
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(bufs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )

    return ds.map_batches(_frames, batch_format="pyarrow", batch_size=batch_size)


def synth_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic pcm16 clips (sine + seeded noise)."""
    rows = {"clip_id": [], "bytes": [], "sample_rate": [], "n_samples": [], "fmt": []}
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        sr = 16000
        t = np.arange(sr // 4) / sr  # 250 ms
        x = 0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t) + 0.05 * rng.normal(size=len(t))
        pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
        rows["clip_id"].append(f"clip{i:06d}")
        rows["bytes"].append(pcm.tobytes())
        rows["sample_rate"].append(sr)
        rows["n_samples"].append(len(pcm))
        rows["fmt"].append("pcm16")
    return pa.table(
        {
            "clip_id": pa.array(rows["clip_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
            "n_samples": pa.array(rows["n_samples"], pa.int64()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        }
    )


def synth_video_table(n: int, seed: int = 42, w: int = 32, h: int = 24,
                      n_frames: int = 20, fmt: str = "rawv") -> pa.Table:
    from .images import synth_pixels

    rows = {"video_id": [], "bytes": [], "w": [], "h": [], "n_frames": [], "fmt": []}
    for i in range(n):
        frames = np.stack([synth_pixels(seed + i * 100 + f, w, h) for f in range(n_frames)])
        if fmt == "avi":
            from .avi import encode_avi_mjpeg

            blob = encode_avi_mjpeg(frames, fps=10, quality=92)
        else:
            blob = frames.tobytes()
        rows["video_id"].append(f"vid{i:06d}")
        rows["bytes"].append(blob)
        rows["w"].append(w)
        rows["h"].append(h)
        rows["n_frames"].append(n_frames)
        rows["fmt"].append(fmt)
    return pa.table(
        {
            "video_id": pa.array(rows["video_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        }
    )
