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

# Tiny public stopword seeds per language (enough for a heuristic classifier
# over the synthetic corpus; real deployments would plug in fastText etc.)
STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las", "por", "con", "para", "se"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im", "ein", "eine", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "est", "que", "dans", "pour", "qui", "au"},
}


class LangIdActor:
    """Heuristic language ID: CJK codepoint ratio → zh; else argmax stopword
    hit-rate over the language tables; 'und' when nothing matches."""

    def __init__(self, text_col: str = "text", out: str = "lang_pred"):
        self.text_col, self.out = text_col, out
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
        if cjk / max(len(text), 1) > 0.05:
            return "zh"
        words = [w.lower() for w in WORD_RE.findall(text)]
        if not words:
            return "und"
        best, best_score = "und", 0.0
        for lang, table in self.tables.items():
            score = sum(1 for w in words if w in table) / len(words)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.0 else "und"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out] = [self.classify(t) for t in batch[self.text_col]]
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
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = frozenset().union(*STOPWORDS.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].tolist()
        n_chars = np.array([len(t) for t in texts], np.int64)
        toks = [TOKEN_RE.findall(t) for t in texts]
        n_tok = np.array([len(t) for t in toks], np.int64)
        punct = np.array([len(PUNCT_RE.findall(t)) for t in texts], np.float64)
        stop = np.array(
            [sum(1 for w in ts if w.lower() in self.stop) for ts in toks], np.float64
        )
        mean_len = np.array(
            [np.mean([len(w) for w in ts]) if ts else 0.0 for ts in toks], np.float64
        )
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


def fingerprint_batch(texts: list[str], window: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprints (Schleimer et al. 2003 selection
    rule): md5 token hashes → per-window minima → XOR of the DISTINCT minima
    (the winnowed set), for a whole batch at once. Hashing is amortized over
    unique tokens, and the sliding-window minima run as ONE global NumPy pass
    over the batch's flat token-hash array. Exactly reproducible in SQL
    (md5_number_upper + windowed MIN + bit_xor DISTINCT) → DuckDB oracle."""
    toks = [t.split() for t in texts]
    lens = np.array([len(t) for t in toks], np.int64)
    flat = md5_token_hashes([w for ts in toks for w in ts])
    offsets = np.concatenate([[0], np.cumsum(lens)])
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


def fingerprint64(text: str, window: int = 8) -> int:
    return int(fingerprint_batch([text], window)[0])


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                    out: str = "fingerprint") -> ray.data.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out, pa.array(fingerprint_batch(batch[text_col].to_pylist()), pa.int64())
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def extract_json_field(ds: ray.data.Dataset, field: str, *, json_col: str = "props",
                       out: str | None = None) -> ray.data.Dataset:
    """Semi-structured extraction: pull one field out of a JSON-string column
    (stdlib json per row; malformed rows yield null). Output column is int64
    when every value parses as an integer, else string — matching DuckDB's
    CAST(json_extract(...) AS BIGINT) for the oracle."""
    import json

    out = out or field

    def _extract(batch: pa.Table) -> pa.Table:
        vals = []
        all_int = True
        for s in batch[json_col].to_pylist():
            try:
                v = json.loads(s).get(field)
            except (json.JSONDecodeError, AttributeError, TypeError):
                v = None
            if v is not None and not isinstance(v, int):
                all_int = False
            vals.append(v)
        arr = pa.array(vals, pa.int64()) if all_int else pa.array(
            [None if v is None else str(v) for v in vals], pa.string()
        )
        return batch.append_column(out, arr)

    return ds.map_batches(_extract, batch_format="pyarrow")
