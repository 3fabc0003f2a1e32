"""Deduplication operators for large-scale text/image corpora (north-rule
additions, SURVEY §2.7 "Set ops / dedup"): exact content-hash dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification.

Scale shape:
- exact dedup = vectorized hash column + hash-partitioned groupby + first
  (one shuffle of (hash, id) pairs only — never the payload);
- MinHash-LSH = per-batch signature computation (stateless, vectorized) →
  explode to (band, band_hash) rows → groupby → candidate pairs → Jaccard
  verify. Signatures are mergeable sketches; payload never shuffles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_MERSENNE = (1 << 61) - 1


def md5_hex(texts) -> list[str]:
    """Row-wise md5 (matches DuckDB's md5() for the SQL oracle)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def add_content_hash(ds: ray.data.Dataset, text_col: str = "text",
                     out: str = "content_hash") -> ray.data.Dataset:
    def _h(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, pa.array(md5_hex(batch[text_col].to_pylist())))

    return ds.map_batches(_h, batch_format="pyarrow")


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id", *, keep_payload: bool = False,
                n_parts: int | None = None) -> ray.data.Dataset:
    """Keep the min-id row per identical content hash.

    Default (``keep_payload=False``): a NATIVE Ray aggregate
    ``groupby(content_hash).min(id)`` — the shuffle carries only (hash, id)
    pairs and no pandas group is ever materialized, so per-worker memory is
    flat in corpus size (Ray's sort-based aggregate spills as needed).
    Returns (content_hash, id) rows; recover payloads with a semi-join on id.

    ``keep_payload=True``: full rows flow through a bounded-group shuffle
    whose part count scales with corpus size (``n_parts`` adaptive from
    ``ds.count()`` unless given) so a part stays ~constant-sized."""
    hashed = add_content_hash(ds, text_col)

    if not keep_payload:
        from ray.data.aggregate import Min

        return hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))

    from .ops import _adaptive_parts, hash_key_u64

    if n_parts is None:
        n_parts = _adaptive_parts(ds.count())

    def add_part(batch: pa.Table) -> pa.Table:
        hh = np.array(
            [int(h[:8], 16) % n_parts for h in batch["content_hash"].to_pylist()],
            np.int64,
        )
        return batch.append_column("dedup_part", pa.array(hh))

    def keep_first(group):
        g = group.sort_values(id_col, kind="stable")
        return g.drop_duplicates("content_hash", keep="first").drop(columns=["dedup_part"])

    return (
        hashed.map_batches(add_part, batch_format="pyarrow")
        .groupby("dedup_part")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle 64-bit hashes (stable across processes)."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    view = np.frombuffer(data, dtype=np.uint8)
    n = len(view) - k + 1
    # polynomial rolling hash, vectorized over all windows
    weights = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64))
    windows = np.lib.stride_tricks.sliding_window_view(view, k).astype(np.uint64)
    return np.unique((windows * weights).sum(axis=1))


def minhash_signature(text: str, num_perm: int = 64, k: int = 5,
                      seed: int = 1) -> np.ndarray:
    """num_perm MinHash values via universal hashing a·h+b mod p."""
    h = _shingle_hashes(text, k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    vals = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


class _MinHashActor:
    """Stateful: permutation coefficients generated once per actor."""

    def __init__(self, num_perm: int, k: int, seed: int, text_col: str, id_col: str):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.k = k
        self.num_perm = num_perm
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.empty((batch.num_rows, self.num_perm), dtype=np.uint64)
        # vectorize across documents in sub-chunks: flatten all shingle hashes,
        # apply every permutation at once, per-doc min via minimum.reduceat
        chunk = max(1, (1 << 21) // self.num_perm)  # ~16 MB of uint64 temporaries
        for c0 in range(0, len(texts), chunk):
            hs = [_shingle_hashes(t, self.k) for t in texts[c0 : c0 + chunk]]
            flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
            offsets = np.cumsum([0] + [len(h) for h in hs])[:-1]
            vals = (flat[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
            sigs[c0 : c0 + len(hs)] = np.minimum.reduceat(vals, offsets, axis=0)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.array(list(sigs.astype(np.int64))),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 5,
    seed: int = 1,
    max_bucket: int = 128,
    n_parts: int | None = None,
    concurrency: int | tuple[int, int] = (2, 8),
) -> ray.data.Dataset:
    """MinHash → banded LSH: emit (band_id, band_hash, doc_id) rows, group by
    bucket, output candidate near-dup pairs (id_a < id_b). Jaccard-verify with
    :func:`jaccard_ngrams` downstream.

    Skew guard: buckets larger than ``max_bucket`` are emitted as a single
    truncated marker pair set over the first ``max_bucket`` ids instead of the
    full O(n²) blow-up — oversized buckets mean the banding is too coarse for
    the corpus (tune bands/rows), and at 100 TB an unguarded hot bucket is a
    straggler that stalls the whole shuffle."""
    rows_per_band = num_perm // bands
    from .ops import _adaptive_parts, _cached, hash_key_u64

    if n_parts is None:
        # one part ≈ 200k (band, bucket, id) rows regardless of corpus size
        n_parts = _adaptive_parts(ds.count() * bands)

    def _sig(batch):
        worker = _cached(("minhash", num_perm, k_shingle, seed, text_col, id_col),
                         lambda: _MinHashActor(num_perm, k_shingle, seed, text_col, id_col))
        return worker(batch)

    sig = ds.map_batches(_sig, batch_format="pyarrow")

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = np.stack([np.asarray(s) for s in batch["signature"].to_pylist()]).astype(np.uint64)
        n = len(ids)
        band_ids = np.tile(np.arange(bands), n)
        # hash each band's slice to one bucket value
        bh = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            sl = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * np.uint64(1099511628211) + sl[:, j]
            bh[:, b] = acc
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    buckets = sig.map_batches(explode_bands, batch_format="pyarrow")

    # Partition buckets into a BOUNDED number of groups (coarse hash of the
    # bucket key) so the shuffle has ~n_parts groups instead of one per bucket
    # — per-group Python overhead over millions of tiny buckets dominates
    # otherwise. Within each part, pair emission is one vectorized pandas
    # self-merge on the exact bucket key. n_parts scales with corpus size
    # (see _adaptive_parts) so one part's pandas frame stays ~constant.

    def add_part(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bi = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = bh * np.uint64(31) + bi
        return batch.append_column("part", pa.array((key % n_parts).astype(np.int64)))

    parted = buckets.map_batches(add_part, batch_format="pyarrow")

    def emit_pairs(group):
        import pandas as pd

        g = group[["band_id", "band_hash", id_col]].copy()
        # hot-bucket guard: cap rows per exact bucket (see docstring)
        g = g.groupby(["band_id", "band_hash"], sort=False).head(max_bucket)
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        out.columns = ["id_a", "id_b"]
        return out

    pairs = parted.groupby("part").map_groups(emit_pairs, batch_format="pandas")

    # global dedup of pairs found in multiple bands: again a bounded-group
    # partition + vectorized drop_duplicates per group (dtype-agnostic key
    # hash: string/UUID ids work too)
    pp_parts = max(64, n_parts // 4)

    def add_pair_part(batch: pa.Table) -> pa.Table:
        a = hash_key_u64(batch["id_a"].to_numpy(zero_copy_only=False))
        b = hash_key_u64(batch["id_b"].to_numpy(zero_copy_only=False))
        return batch.append_column(
            "pp", pa.array(((a * np.uint64(1000003) + b) % np.uint64(pp_parts)).astype(np.int64))
        )

    return (
        pairs.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(lambda g: g.drop_duplicates(["id_a", "id_b"]), batch_format="pandas")
        .drop_columns(["pp"])
    )


def verify_candidates(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    id_a: str = "id_a",
    id_b: str = "id_b",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of LSH candidate pairs — the second half of
    the near-dup pipeline (candidates → verified duplicates).

    Scale shape: the candidate id set (bounded by the LSH output, orders of
    magnitude smaller than the corpus) drives a payload-free semi-join that
    shrinks ``docs`` to candidate texts only; their shingle sets broadcast
    once via ``ray.put`` and every pair verifies against the broadcast —
    the corpus itself never shuffles. Emits (id_a, id_b, jaccard) for pairs
    with exact character-k-gram Jaccard ≥ threshold.
    """
    from .ops import _cached, semi_join_keys

    id_df = pairs.select_columns([id_a, id_b]).to_pandas()
    ids = np.unique(np.concatenate([id_df[id_a].to_numpy(), id_df[id_b].to_numpy()])) \
        if len(id_df) else np.empty(0, np.int64)
    cand = semi_join_keys(
        docs.select_columns([doc_id_col, text_col]), ids, doc_id_col
    ).to_pandas()
    shingles = {
        i: frozenset(_shingle_hashes(t, k).tolist())
        for i, t in zip(cand[doc_id_col], cand[text_col])
    }
    ref = ray.put(shingles)

    def _verify(batch: pa.Table) -> pa.Table:
        sh = _cached(("verify_shingles", ref.hex()), lambda: ray.get(ref))
        aa = batch[id_a].to_pylist()
        bb = batch[id_b].to_pylist()
        jac = np.array(
            [len(sh[x] & sh[y]) / len(sh[x] | sh[y]) for x, y in zip(aa, bb)],
            np.float64,
        ) if len(aa) else np.empty(0, np.float64)
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pa.array(jac >= threshold))

    return pairs.map_batches(_verify, batch_format="pyarrow")


def dup_components(
    ids_ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> ray.data.Dataset:
    """The keep/drop decision that ends a dedup pipeline: connected
    components over the (verified) duplicate-pair graph. Every id gets
    ``component_id`` = the minimum id reachable through duplicate pairs
    (singletons map to themselves); keep rule = ``id == component_id``.

    Scale shape: the pair graph is orders of magnitude smaller than the
    corpus (it only contains near-duplicates), so union-find runs driver-side
    over the collected pairs — bounded by the duplicate volume, like
    :func:`verify_candidates` — and the id→component relabeling broadcasts
    back through one vectorized ``map_batches`` over the full id column.
    """
    pdf = pairs.select_columns([pair_a, pair_b]).to_pandas()
    if pair_a not in pdf.columns:  # zero pairs: empty datasets lose columns
        pdf = pdf.reindex(columns=[pair_a, pair_b])
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf[pair_a], pdf[pair_b]):
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min id (the canonical representative)
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    label = {x: find(x) for x in list(parent)}
    ref = ray.put(label)

    def _relabel(batch: pa.Table) -> pa.Table:
        from .ops import _cached

        lbl = _cached(("dupcomp", ref.hex()), lambda: ray.get(ref))
        ids = batch[id_col].to_pylist()
        return batch.append_column(
            "component_id", pa.array([lbl.get(i, i) for i in ids],
                                     batch.schema.field(id_col).type)
        )

    return ids_ds.map_batches(_relabel, batch_format="pyarrow")


def jaccard_ngrams(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (the verify step for LSH
    candidates, and a standalone operator)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_SHIFTS64 = np.arange(64, dtype=np.uint64)


def _simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized SimHash for many documents: ONE flat token-hash array for
    the whole batch (md5 per *unique* token via the shared cache), bit votes
    summed per-document with ``np.add.reduceat`` — no per-token Python in the
    vote loop. Token hash = DuckDB md5_number_upper(tok), so the operator has
    an exact SQL oracle."""
    from .text import md5_token_hashes

    toks = [t.split() for t in texts]
    lens = np.array([len(t) for t in toks], np.int64)
    flat = md5_token_hashes([w for ts in toks for w in ts])
    acc = np.zeros((len(texts), 64), np.int64)
    if flat.size:
        votes = 2 * ((flat[:, None] >> _SHIFTS64[None, :]) & np.uint64(1)).astype(np.int64) - 1
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        nz = lens > 0  # reduceat misbehaves on empty segments
        acc[nz] = np.add.reduceat(votes, offsets[nz], axis=0)
    val = ((acc > 0).astype(np.uint64) << _SHIFTS64[None, :]).sum(axis=1, dtype=np.uint64)
    return val.view(np.int64)  # two's-complement reinterpret


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-based token hashes)."""
    return int(_simhash_batch([text])[0])


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (byte-LUT; NumPy <2 has no bitwise_count)."""
    a = np.ascontiguousarray(a, np.uint64)
    return _POP8[a.view(np.uint8).reshape(a.shape + (8,))].sum(axis=-1).astype(np.int64)


def simhash_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming`` —
    EXACT (100% recall) via pigeonhole banding: the 64 bits split into
    ``max_hamming + 1`` bands, and any pair within distance d must match at
    least one band exactly, so banded bucketing misses nothing. Buckets
    verify with a vectorized popcount. Only (id, simhash, band) rows shuffle
    — never text; bounded groups scale with corpus size.

    Emits (id_a, id_b, hamming) with id_a < id_b.
    """
    from .ops import _adaptive_parts, _cached, hash_key_u64

    bands = max_hamming + 1
    widths = [64 // bands + (1 if i < 64 % bands else 0) for i in range(bands)]
    offs = np.cumsum([0] + widths[:-1])
    if n_parts is None:
        n_parts = _adaptive_parts(ds.count() * bands)
    pp_parts = max(64, n_parts // 4)

    hashed = add_simhash(ds.select_columns([id_col, text_col]), text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_b, out_v = [], []
        for b in range(bands):
            mask = np.uint64((1 << widths[b]) - 1)
            out_b.append(np.full(len(h), b, np.int32))
            out_v.append(((h >> np.uint64(offs[b])) & mask).astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_b), pa.int32()),
                "band_val": pa.array(np.concatenate(out_v), pa.int64()),
                id_col: pa.array(np.tile(ids, bands)),
                "simhash": pa.array(np.tile(h, bands).view(np.int64), pa.int64()),
            }
        )

    buckets = hashed.map_batches(explode, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        key = (
            batch["band_val"].to_numpy(zero_copy_only=False).astype(np.uint64)
            * np.uint64(127)
            + batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return batch.append_column("part", pa.array((key % n_parts).astype(np.int64)))

    def emit(group):
        import pandas as pd

        g = group[["band", "band_val", id_col, "simhash"]]
        m = g.merge(g, on=["band", "band_val"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                                 "id_b": pd.Series([], dtype=g[id_col].dtype),
                                 "hamming": pd.Series([], dtype=np.int64)})
        hx = m["simhash_x"].to_numpy().view(np.uint64)
        hy = m["simhash_y"].to_numpy().view(np.uint64)
        hd = popcount64(np.bitwise_xor(hx, hy))
        m = m.assign(hamming=hd)[hd <= max_hamming]
        out = m[[f"{id_col}_x", f"{id_col}_y", "hamming"]].drop_duplicates(
            [f"{id_col}_x", f"{id_col}_y"]
        )
        out.columns = ["id_a", "id_b", "hamming"]
        return out

    pairs = buckets.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        emit, batch_format="pandas"
    )

    def add_pp(batch: pa.Table) -> pa.Table:
        a = hash_key_u64(batch["id_a"].to_numpy(zero_copy_only=False))
        b = hash_key_u64(batch["id_b"].to_numpy(zero_copy_only=False))
        return batch.append_column(
            "pp", pa.array(((a * np.uint64(1000003) + b) % np.uint64(pp_parts)).astype(np.int64))
        )

    return (
        pairs.map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(lambda g: g.drop_duplicates(["id_a", "id_b"]), batch_format="pandas")
        .drop_columns(["pp"])
    )


def add_simhash(ds: ray.data.Dataset, text_col: str = "text",
                out: str = "simhash") -> ray.data.Dataset:
    def _s(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out, pa.array(_simhash_batch(batch[text_col].to_pylist()), pa.int64())
        )

    return ds.map_batches(_s, batch_format="pyarrow")
