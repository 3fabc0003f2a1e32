"""Text-analysis operators for training-data pipelines: language ID
(n-gram/stopword heuristic), quality scoring, token counting, document
fingerprinting (rolling hash). All vectorized-or-cheap per batch; regexes and
stopword tables are actor state (compiled once).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

TOKEN_RE = re.compile(r"\S+")
# ASCII letter runs (NOT unicode \w): matches RE2's semantics so the heuristic
# is reproducible verbatim in the DuckDB oracle; accented letters split words
# identically on both sides, which only matters for consistency — the
# stopword tables are pure ASCII.
WORD_RE = re.compile(r"[A-Za-z]+")
PUNCT_RE = re.compile(r"[.,;:!?'\"()\[\]{}\-]")

# process-stable md5-based token hash shared by simhash/fingerprint; identical
# to DuckDB's md5_number_upper(tok) (lower 8 digest bytes, little-endian) so
# both operators have exact SQL oracles
_TOKEN_HASH_CACHE: dict[str, int] = {}


def md5_token_hashes(tokens: list[str]) -> np.ndarray:
    out = np.empty(len(tokens), np.uint64)
    cache = _TOKEN_HASH_CACHE
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            if len(cache) > 1_000_000:  # bound worker memory on huge vocab
                cache.clear()
            h = cache[t] = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
        out[i] = h
    return out


# Production token hash: a fully-vectorized 64-bit polynomial hash + murmur3
# finalizer over the batch's flat byte buffer — no per-token Python at all.
# It does NOT match any SQL function, so the simhash/fingerprint DuckDB
# oracles pass hash_impl="md5" explicitly; everything else defaults to the
# vectorized path (measured 36-48x the md5 path on cold vocab and 1.3-2x on
# the cache-friendly synthetic corpus — BENCH/token_hash_r5.json). Override
# the default with env PROJCL_TOKEN_HASH=md5 (read once at import; workers
# inherit the env) or per call with ``impl=``/``hash_impl=``.
import os as _os

TOKEN_HASH_IMPL = _os.environ.get("PROJCL_TOKEN_HASH", "fast")

_POLY_P = np.uint64(0x100000001B3)  # FNV-1a prime, odd => full-period mod 2^64


def fast_token_hashes(tokens: list[str]) -> np.ndarray:
    """Vectorized 64-bit token hash: per-token polynomial over UTF-8 bytes
    (one matmul-style multiply-sum on a padded (n, maxlen) byte matrix),
    length-mixed through the murmur3 fmix64 finalizer so trailing padding
    cannot collide. ~50-100x the md5 path on cold vocab."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, np.uint64)
    bts = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bts), np.int64, n)
    flat = np.frombuffer(b"".join(bts), np.uint8).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    with np.errstate(over="ignore"):
        # weight byte i of a token by P^(offset within token); segmented over
        # the flat buffer so one pathological long token costs O(its bytes),
        # not an (n x maxlen) padded matrix
        maxlen = max(1, int(lens.max()))
        ppow = np.empty(maxlen, np.uint64)
        ppow[0] = np.uint64(1)
        for i in range(1, maxlen):  # maxlen is a token length — tiny loop
            ppow[i] = ppow[i - 1] * _POLY_P
        pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
        h = np.zeros(n, np.uint64)
        nz = lens > 0  # reduceat misbehaves on empty segments
        if flat.size:
            h[nz] = np.add.reduceat(flat * ppow[pos], starts[nz])
        h ^= lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        # murmur3 fmix64
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


_PY_WS_ASCII = np.zeros(256, np.bool_)
_PY_WS_ASCII[[9, 10, 11, 12, 13, 32]] = True  # str.split()'s ASCII class


def flat_ws_token_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token hashes for a whole batch with NO per-token Python:
    one encode of the '\\n'-joined batch, byte-mask token boundaries, and
    the same polynomial+fmix64 hash as :func:`fast_token_hashes` evaluated
    over the flat buffer. Returns ``(hashes, doc_offsets)`` with doc i's
    token hashes at ``hashes[doc_offsets[i]:doc_offsets[i+1]]``.

    Tokenization is byte-level ``str.split`` (ASCII \\t\\n\\v\\f\\r SPACE):
    identical to ``t.split()`` on ASCII-whitespace text; non-ASCII Unicode
    whitespace stays inside tokens (fine for a production hash — the md5
    oracle path keeps exact ``str.split`` semantics). Hashes equal
    ``fast_token_hashes(t.split())`` token-for-token on such text."""
    n_docs = len(texts)
    doc_offsets = np.zeros(n_docs + 1, np.int64)
    if n_docs == 0:
        return np.empty(0, np.uint64), doc_offsets
    bufs = [t.encode("utf-8") for t in texts]
    blob = b"\n".join(bufs) + b"\n"
    a = np.frombuffer(blob, np.uint8)
    nonws = ~_PY_WS_ASCII[a]
    tok_starts = np.flatnonzero(nonws & ~np.concatenate([[False], nonws[:-1]]))
    if tok_starts.size == 0:
        return np.empty(0, np.uint64), doc_offsets
    tok_ends = np.flatnonzero(nonws & ~np.concatenate([nonws[1:], [False]])) + 1
    lens = tok_ends - tok_starts
    # doc i spans bytes [doc_start_i, doc_start_i + len_i); separators are
    # whitespace, so a token never crosses a doc boundary
    doc_starts = np.concatenate(
        [[0], np.cumsum(np.fromiter((len(b) for b in bufs), np.int64,
                                    n_docs) + 1)[:-1]])
    doc_offsets[1:] = np.searchsorted(
        tok_starts, np.concatenate([doc_starts[1:], [len(blob)]]))
    # polynomial hash with per-token byte-position weights (== fast_token_hashes)
    maxlen = int(lens.max())
    ppow = np.empty(maxlen, np.uint64)
    ppow[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, maxlen):  # token length — tiny loop
            ppow[i] = ppow[i - 1] * _POLY_P
        tok_offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(tok_offs, lens)
        sel = np.repeat(tok_starts, lens) + idx
        h = np.add.reduceat(a[sel].astype(np.uint64) * ppow[idx], tok_offs)
        h ^= lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h, doc_offsets


def token_hashes(tokens: list[str], impl: str | None = None) -> np.ndarray:
    """Dispatch on ``impl`` (None → TOKEN_HASH_IMPL): "fast" (vectorized,
    the production default) or "md5" (exact DuckDB md5_number_upper
    replica — the simhash/fingerprint SQL oracle queries request it
    explicitly)."""
    if (impl or TOKEN_HASH_IMPL) == "md5":
        return md5_token_hashes(tokens)
    return fast_token_hashes(tokens)

# Tiny public stopword seeds per language (enough for a heuristic classifier
# over the synthetic corpus; real deployments would plug in fastText etc.)
STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por", "con", "para", "se"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im", "ein", "eine", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "est", "que", "dans", "pour", "qui", "au"},
}


# ---------------------------------------------------------------------------
# Byte-level tokenizer shared by the text heuristics. One numpy pass over the
# batch's raw UTF-8 buffer replaces per-string regex work entirely — the RE2
# kernels (split/count \S+) were the profile's hot spots at ~40 ms / 5k docs.
# Semantics are RE2's (= the DuckDB oracle's): \s = [\t\n\f\r ], word chars
# [A-Za-z] — both pure-ASCII classes, so byte masks are exact on UTF-8 (no
# multi-byte codepoint contains an ASCII byte).
# ---------------------------------------------------------------------------

_RE2_WS = np.zeros(256, np.bool_)
_RE2_WS[[9, 10, 12, 13, 32]] = True  # RE2 \s (no \v, no unicode spaces)
_RE2_NONWS = ~_RE2_WS
_ASCII_LETTER = np.zeros(256, np.bool_)
_ASCII_LETTER[ord("A"):ord("Z") + 1] = True
_ASCII_LETTER[ord("a"):ord("z") + 1] = True
_ASCII_UPPER = np.zeros(256, np.bool_)
_ASCII_UPPER[ord("A"):ord("Z") + 1] = True
_PUNCT_CLASS = np.zeros(256, np.bool_)
_PUNCT_CLASS[np.frombuffer(b""".,;:!?'"()[]{}-""", np.uint8)] = True
_UTF8_CONT = np.arange(256) & 0xC0 == 0x80  # continuation bytes (not codepoints)
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[ord("A"):ord("Z") + 1] += 32
# one combined class LUT: bit0 = non-whitespace, bit1 = punct, bit2 = letter —
# ONE 9M-byte gather instead of three
_CLASS_LUT = (_RE2_NONWS.astype(np.uint8)
              | (_PUNCT_CLASS.astype(np.uint8) << 1)
              | (_ASCII_LETTER.astype(np.uint8) << 2))


def _utf8_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data_bytes, offsets) zero-copy views of a non-null string array,
    normalized so offsets[0] == 0."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("text column contains nulls")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, np.uint8) if buf is not None else np.empty(0, np.uint8)
    data = data[offs[0] : offs[-1]]
    return data, offs - offs[0]


def _byte_runs(data: np.ndarray, offs: np.ndarray, mask: np.ndarray):
    """Maximal runs of mask==True that do NOT cross row boundaries.
    Returns (run_start, run_len, run_row)."""
    n = len(data)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    sm = np.empty(n, np.bool_)  # run-start flags
    sm[0] = mask[0]
    np.greater(mask[1:], mask[:-1], out=sm[1:])
    ds = offs[:-1]
    ds = ds[ds < n]
    sm[ds] = mask[ds]  # a run never continues across a row start
    em = np.empty(n, np.bool_)  # run-end flags
    em[-1] = mask[-1]
    np.greater(mask[:-1], mask[1:], out=em[:-1])
    de = offs[1:] - 1
    de = de[de >= 0]
    em[de] = mask[de]  # ...nor across a row end
    starts = np.nonzero(sm)[0]
    ends = np.nonzero(em)[0]
    # searchsorted beats a bool→int32 cumsum + repeat by ~2.5× here
    return starts, ends - starts + 1, np.searchsorted(offs, starts, "right") - 1


_SWAR_HIGH = np.uint64(0x8080808080808080)
_SWAR_L7 = np.uint64(0x7F7F7F7F7F7F7F7F)
_SWAR_GE_A = np.uint64(0x3F3F3F3F3F3F3F3F)  # +0x3F sets high bit iff byte ≥ 'A'
_SWAR_GT_Z = np.uint64(0x2525252525252525)  # +0x25 sets high bit iff byte > 'Z'
# zero-out mask for bytes beyond a token length (little-endian lane order)
_LEN_MASK = np.array([(1 << (8 * l)) - 1 for l in range(8)] + [(1 << 64) - 1],
                     np.uint64)


def _swar_lower(x: np.ndarray) -> np.ndarray:
    """Bytewise ASCII lowercase on packed uint64 lanes (branch-free SWAR):
    bytes in 'A'..'Z' with the high bit clear get |0x20; everything else —
    digits, punctuation, UTF-8 lead/continuation bytes — is untouched."""
    x7 = x & _SWAR_L7
    upper = (x7 + _SWAR_GE_A) & ~(x7 + _SWAR_GT_Z) & ~x & _SWAR_HIGH
    return x | (upper >> np.uint64(2))


def _pack8(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Pack byte runs into uint64 keys (zero-padded, ASCII-lowercased) — an
    EXACT key for short-token set membership: distinct ≤8-byte strings map to
    distinct uint64s, so membership against packed stopwords has no
    collisions. ONE unaligned uint64 gather per run (x86 handles unaligned
    loads natively), then SWAR lowercase + a length-mask LUT; runs longer
    than 8 bytes collapse to the all-ones sentinel (no ≤8-byte token packs
    to it: its lane 8 would need byte 0xFF after masking, which the length
    mask zeroes)."""
    if not len(starts):
        return np.empty(0, np.uint64)
    pad = np.empty(len(data) + 8, np.uint8)
    pad[:len(data)] = data
    pad[len(data):] = 0
    u64 = np.ndarray(buffer=pad, dtype=np.uint64, shape=(len(data) + 1,), strides=(1,))
    raw = u64[starts] & _LEN_MASK[np.minimum(lens, 8)]
    return np.where(lens <= 8, _swar_lower(raw), ~np.uint64(0))


def _pack_word(w: str) -> int:
    e = w.lower().encode("ascii")
    if len(e) > 8:
        raise ValueError(f"stopword {w!r} longer than 8 bytes")
    return int.from_bytes(e.ljust(8, b"\0"), "little")


def _row_sums(offs: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-row count of mask==True bytes (cumsum-diff; empty-row safe)."""
    cs = np.concatenate([[0], np.cumsum(mask, dtype=np.int32)])
    return (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)


class LangIdActor:
    """Heuristic language ID: CJK codepoint ratio → zh; else argmax stopword
    hit-rate over the language tables; 'und' when nothing matches.

    Fully vectorized at the byte level: letter-run extraction, lowercasing
    and stopword membership run as numpy passes over the batch's raw UTF-8
    buffer (≤8-byte runs pack exactly into uint64 keys; longer runs can't be
    stopwords). Only the CJK class stays an Arrow RE2 kernel. The round-2
    version looped Python per row per word."""

    LANGS = tuple(STOPWORDS)  # argmax tie order: first max wins (en,es,de,fr)

    def __init__(self, text_col: str = "text", out: str = "lang_pred"):
        self.text_col, self.out = text_col, out
        # one sorted union of packed stopwords + per-word language bitmask:
        # membership for ALL languages = ONE searchsorted + a bitmask LUT
        packs: dict[int, int] = {}
        for i, lang in enumerate(self.LANGS):
            for w in STOPWORDS[lang]:
                p = _pack_word(w)
                packs[p] = packs.get(p, 0) | (1 << i)
        self.union = np.sort(np.fromiter(packs, np.uint64, len(packs)))
        self.bits = np.array([packs[int(p)] for p in self.union], np.uint8)
        self.maxlen = max(len(w) for ws in STOPWORDS.values() for w in ws)
        self._names = np.array(list(self.LANGS) + ["und", "zh"])
        self._UND = np.int8(len(self.LANGS))
        self._ZH = np.int8(len(self.LANGS) + 1)

    def classify(self, text: str) -> str:
        import pandas as pd

        return self(pd.DataFrame({self.text_col: [text]}))[self.out].iloc[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        arr = pa.array(batch[self.text_col], pa.string())
        n = len(arr)
        data, offs = _utf8_view(arr)
        if (data > 0x7F).any():  # non-ASCII present: exact codepoint math
            n_cjk = pc.count_substring_regex(arr, "[一-鿿]").to_numpy(
                zero_copy_only=False).astype(np.int64)
            n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # pure-ASCII batch: bytes ARE codepoints, no CJK possible
            n_cjk = np.zeros(n, np.int64)
            n_chars = offs[1:] - offs[:-1]
        starts, lens, rows = _byte_runs(data, offs, _ASCII_LETTER[data])
        nw = np.bincount(rows, minlength=n)
        keep = np.flatnonzero(lens <= self.maxlen)  # longer can't be stopwords
        packed = _pack8(data, starts.take(keep), lens.take(keep))
        pos = np.searchsorted(self.union, packed)
        np.clip(pos, 0, len(self.union) - 1, out=pos)
        hit = self.union[pos] == packed
        hrows, hbits = rows.take(keep)[hit], self.bits[pos[hit]]
        scores = np.stack(
            [np.bincount(hrows[(hbits >> i) & 1 == 1], minlength=n)
             for i in range(len(self.LANGS))]
        ).astype(np.float64) / np.maximum(nw, 1)[None, :]
        # integer codes end-to-end; one fixed-width string gather at the end
        codes = np.argmax(scores, axis=0).astype(np.int8)  # first max wins
        codes[scores.max(axis=0) <= 0.0] = self._UND
        codes[nw == 0] = self._UND
        codes[n_cjk / np.maximum(n_chars, 1) > 0.05] = self._ZH
        codes[n_chars == 0] = self._UND
        batch[self.out] = self._names[codes]
        return batch


# token-count modes: plain whitespace runs, and a BPE-style pre-tokenization
# (letter runs / digit runs / punctuation runs — the lookahead-free variant of
# the GPT-2 pre-tokenizer, so Python re, Arrow RE2 and DuckDB RE2 all agree)
TOKEN_PATTERNS = {
    "whitespace": r"\S+",
    "bpe": r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+",
}


def add_token_count(ds: ray.data.Dataset, text_col: str = "text",
                    out: str = "n_tokens", method: str = "whitespace") -> ray.data.Dataset:
    """Token count — one vectorized Arrow RE2 kernel per batch (no per-row
    Python), identical semantics to DuckDB's
    len(regexp_extract_all(text, <pattern>)) oracle (both are RE2)."""
    import pyarrow.compute as pc

    pattern = TOKEN_PATTERNS[method]

    def _c(batch: pa.Table) -> pa.Table:
        counts = pc.cast(pc.count_substring_regex(batch[text_col], pattern), pa.int64())
        return batch.append_column(out, counts)

    return ds.map_batches(_c, batch_format="pyarrow")


class QualityScoreActor:
    """Length/punctuation/stopword quality features + composite score.

    Emits: n_chars_q (int64), n_tokens (int64), punct_ratio, stop_ratio,
    mean_token_len, quality (all float64).

    Fully vectorized at the byte level (ONE numpy pass over the batch's raw
    UTF-8 buffer): tokens are non-whitespace byte runs; whitespace counts
    fall out of run lengths (n_ws = row_bytes − token_bytes); punct bytes
    are sparse, so they count via nonzero + bincount; stopword membership
    packs ≤8-byte tokens into exact uint64 keys (packed equality IS exact
    string equality, so tokens containing punctuation can never match);
    mean token length uses the identity sum(len(token)) = n_chars −
    n_whitespace_chars (every non-token char is whitespace, and RE2 \\s
    chars are single-byte). The round-2 version ran Python regex findall
    per row.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = np.sort(np.array(
            [_pack_word(w) for w in frozenset().union(*STOPWORDS.values())],
            np.uint64,
        ))
        self.maxlen = max(len(w) for ws in STOPWORDS.values() for w in ws)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        arr = pa.array(batch[self.text_col], pa.string())
        n = len(arr)
        data, offs = _utf8_view(arr)
        if (data > 0x7F).any():
            n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # pure-ASCII batch: bytes ARE codepoints
            n_chars = offs[1:] - offs[:-1]
        classes = _CLASS_LUT[data]  # one gather: nonws | punct<<1 | letter<<2
        starts, lens, rows = _byte_runs(data, offs, classes & 1)
        n_tok = np.bincount(rows, minlength=n)
        tok_bytes = np.bincount(rows, weights=lens, minlength=n)
        n_ws = (offs[1:] - offs[:-1]) - tok_bytes.astype(np.int64)
        pp = np.flatnonzero(classes & 2)  # punct bytes are sparse
        punct = np.bincount(
            np.searchsorted(offs, pp, "right") - 1, minlength=n
        ).astype(np.float64)
        keep = np.flatnonzero(lens <= self.maxlen)
        packed = _pack8(data, starts.take(keep), lens.take(keep))
        pos = np.searchsorted(self.stop, packed)
        np.clip(pos, 0, len(self.stop) - 1, out=pos)
        stop = np.bincount(
            rows.take(keep)[self.stop[pos] == packed], minlength=n
        ).astype(np.float64)
        mean_len = np.where(n_tok > 0, (n_chars - n_ws) / np.maximum(n_tok, 1), 0.0)
        batch["n_chars_q"] = n_chars
        batch["n_tokens"] = n_tok
        batch["punct_ratio"] = punct / np.maximum(n_chars, 1)
        batch["stop_ratio"] = stop / np.maximum(n_tok, 1)
        batch["mean_token_len"] = mean_len
        # composite in [0,1]: enough text, some stopwords, sane token lengths
        batch["quality"] = (
            np.clip(n_chars / 200.0, 0, 1) * 0.4
            + np.clip(batch["stop_ratio"] * 5.0, 0, 1) * 0.3
            + np.clip(1.0 - np.abs(mean_len - 5.0) / 5.0, 0, 1) * 0.3
        )
        return batch


def fingerprint_batch(texts: list[str], window: int = 8,
                      hash_impl: str | None = None) -> np.ndarray:
    """Winnowing-style document fingerprints (Schleimer et al. 2003 selection
    rule): token hashes → per-window minima → XOR of the DISTINCT minima
    (the winnowed set), for a whole batch at once. Hashing is amortized over
    unique tokens, and the sliding-window minima run as ONE global NumPy pass
    over the batch's flat token-hash array. Default token hash = the
    vectorized production one; ``hash_impl="md5"`` reproduces DuckDB exactly
    (md5_number_upper + windowed MIN + bit_xor DISTINCT) and is what the
    text_fingerprint oracle query requests."""
    if (hash_impl or TOKEN_HASH_IMPL) == "md5":
        toks = [t.split() for t in texts]
        lens = np.array([len(t) for t in toks], np.int64)
        flat = token_hashes([w for ts in toks for w in ts], "md5")
        offsets = np.concatenate([[0], np.cumsum(lens)])
    else:  # flat-buffer path: no per-token Python at all
        flat, offsets = flat_ws_token_hashes(texts)
        lens = np.diff(offsets)
    wins = (
        np.lib.stride_tricks.sliding_window_view(flat, window).min(axis=1)
        if flat.size >= window
        else np.empty(0, np.uint64)
    )
    out = np.zeros(len(texts), np.uint64)
    for d in range(len(texts)):
        s, e = offsets[d], offsets[d + 1]
        n = e - s
        if n == 0:
            continue
        # w = min(window, n): short docs collapse to one whole-doc window
        mins = wins[s : e - window + 1] if n >= window else flat[s:e].min(keepdims=True)
        out[d] = np.bitwise_xor.reduce(np.unique(mins))
    return out.view(np.int64)


def fingerprint64(text: str, window: int = 8,
                  hash_impl: str | None = None) -> int:
    return int(fingerprint_batch([text], window, hash_impl)[0])


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                    out: str = "fingerprint",
                    hash_impl: str | None = None) -> ray.data.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out, pa.array(fingerprint_batch(batch[text_col].to_pylist(),
                                            hash_impl=hash_impl), pa.int64())
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def _json_rows_screen(col) -> bool:
    """True iff joining these JSON-string rows into one array is
    alignment-safe. Scanned standalone, every row must (a) end outside any
    string literal (even count of unescaped quotes, where a quote is
    unescaped iff preceded by an even run of backslashes) and (b) have
    brace/bracket depth, counted only outside string literals, that never
    dips negative and returns to zero.

    Every VALID JSON document satisfies (a)+(b), so clean batches always
    take the fast path. Conversely, an element of the joined array can span
    a row separator only if the separator sits inside a string (violates a)
    or at depth > 1 (some earlier row left net-open brackets — violates b);
    so when the screen passes, element i of a successful joined parse is
    exactly row i (a junk-but-balanced row like ``1 2`` then fails the
    joined parse outright, triggering the per-row fallback). Fully
    vectorized over the column's flat UTF-8 buffer; quotes, backslashes and
    brackets are ASCII so multi-byte codepoints can't alias them."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_string())
    bufs = arr.buffers()  # validity, offsets, data
    offs = np.frombuffer(bufs[1], np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = (np.frombuffer(bufs[2], np.uint8, count=offs[-1])
            if bufs[2] is not None else np.empty(0, np.uint8))
    data = data[offs[0]:]
    offs = offs - offs[0]
    if data.size == 0:
        return True
    idx = np.arange(data.size, dtype=np.int64)
    row_start = np.repeat(offs[:-1], np.diff(offs))
    # run of backslashes ending just before each position, reset at row starts
    non_bs_or_start = (data != 92) | (idx == row_start)
    last_stop = np.maximum.accumulate(np.where(non_bs_or_start, idx, -1))
    prev_stop = np.concatenate([[-1], last_stop[:-1]])  # last stop BEFORE i
    bs_run_before = idx - 1 - np.maximum(prev_stop, row_start - 1)
    np.maximum(bs_run_before, 0, out=bs_run_before)
    delim = (data == 34) & (bs_run_before % 2 == 0)
    # empty rows have no positions, so segments between consecutive
    # nonempty-row starts are exact (reduceat runs start[k]..start[k+1]-1)
    nonempty = np.diff(offs) > 0
    starts = offs[:-1][nonempty]
    ends = offs[1:][nonempty]
    # (a) per-row delimiter parity
    if (np.add.reduceat(delim, starts) % 2).any():
        return False
    # outside-string mask: parity of delimiters strictly before each
    # position, counted within the row
    cum_delim = np.concatenate([[0], np.cumsum(delim)[:-1]])
    outside = (cum_delim - cum_delim[row_start]) % 2 == 0
    step = np.zeros(data.size, np.int64)
    step[((data == 123) | (data == 91)) & outside] = 1    # { [
    step[((data == 125) | (data == 93)) & outside] = -1   # } ]
    depth = np.cumsum(step)
    rel = depth - (depth[row_start] - step[row_start])  # depth within the row
    return bool((rel[ends - 1] == 0).all()
                and (np.minimum.reduceat(rel, starts) >= 0).all())


def extract_json_field(ds: ray.data.Dataset, field: str, *, json_col: str = "props",
                       out: str | None = None) -> ray.data.Dataset:
    """Semi-structured extraction: pull one field out of a JSON-string column
    (malformed rows yield null). Output column is int64 when every value
    parses as an integer, else string — matching DuckDB's
    CAST(json_extract(...) AS BIGINT) for the oracle.

    The whole batch parses in ONE ``json.loads`` call (rows joined into a
    single JSON array → one pass of the C scanner) instead of a per-row
    Python loop; a batch containing malformed rows falls back to the per-row
    path so those rows alone yield null. The fast path is guarded by a
    vectorized structural screen (`_json_rows_screen`) because an element
    count match alone is NOT proof of alignment: a row with an unterminated
    string or unclosed bracket can absorb the array separator and its
    neighbor while another malformed row splits into two elements, keeping
    the count right but shifting values onto the wrong rows."""
    import json

    out = out or field

    def _parse_rows(raw: list) -> list:
        vals = []
        for s in raw:
            try:
                v = json.loads(s)
            except (ValueError, TypeError):
                v = None
            vals.append(v)
        return vals

    def _extract(batch: pa.Table) -> pa.Table:
        raw = batch[json_col].to_pylist()
        docs = None
        if _json_rows_screen(batch[json_col]):
            try:
                docs = json.loads(
                    "[" + ",".join("null" if s is None else s for s in raw) + "]"
                )
                if len(docs) != len(raw):
                    docs = None
            except (ValueError, TypeError):
                docs = None
        if docs is None:
            docs = _parse_rows(raw)
        vals = [d.get(field) if isinstance(d, dict) else None for d in docs]
        all_int = all(v is None or isinstance(v, int) for v in vals)
        arr = pa.array(vals, pa.int64()) if all_int else pa.array(
            [None if v is None else str(v) for v in vals], pa.string()
        )
        return batch.append_column(out, arr)

    return ds.map_batches(_extract, batch_format="pyarrow")
