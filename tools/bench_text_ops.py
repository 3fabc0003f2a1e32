"""Single-core microbench for the text hot loops: vectorized batch paths
(shipped) vs the round-1 per-row/per-token implementations (inlined here as
the 'naive' baselines). Records docs/s and speedups →
BENCH/text_vectorization_r2.json. No Ray involved — this measures the
per-batch kernel that map_batches runs."""

import hashlib
import json
import re
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from projcl_ray.dedup import _simhash_batch
from projcl_ray.text import fingerprint_batch

TOKEN_RE = re.compile(r"\S+")


def naive_simhash(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.split():
        h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little"))
        acc += np.where(((h >> shifts) & np.uint64(1)) == 1, 1, -1)
    val = int(((acc > 0).astype(np.uint64) * (np.uint64(1) << shifts)).sum(dtype=np.uint64))
    return val - (1 << 64) if val >= (1 << 63) else val


def naive_fingerprint(text: str, window: int = 8) -> int:
    def _fnv(w):
        acc = 1469598103934665603
        for byt in w.encode():
            acc = ((acc * 1099511628211) ^ byt) & ((1 << 64) - 1)
        return acc & ((1 << 61) - 1)

    hs = np.array([np.uint64(_fnv(w)) for w in text.split()], dtype=np.uint64)
    if len(hs) == 0:
        return 0
    w = min(window, len(hs))
    mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
    acc = np.uint64(1469598103934665603)
    for m in mins:
        acc = np.uint64((int(acc) * 1099511628211 + int(m)) & ((1 << 64) - 1))
    return int(acc)


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    docs = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
    texts = docs["text"].to_pylist()
    arr = docs["text"].combine_chunks()
    n = len(texts)
    out = {"n_docs": n}

    t_naive = timeit(lambda: [naive_simhash(t) for t in texts])
    t_vec = timeit(lambda: _simhash_batch(texts))
    out["simhash"] = {"naive_docs_per_s": n / t_naive, "vectorized_docs_per_s": n / t_vec,
                      "speedup": t_naive / t_vec}

    t_naive = timeit(lambda: [naive_fingerprint(t) for t in texts])
    t_vec = timeit(lambda: fingerprint_batch(texts))
    out["fingerprint"] = {"naive_docs_per_s": n / t_naive, "vectorized_docs_per_s": n / t_vec,
                          "speedup": t_naive / t_vec}

    t_naive = timeit(lambda: [len(TOKEN_RE.findall(t)) for t in texts])
    t_vec = timeit(lambda: pc.count_substring_regex(arr, r"\S+"))
    out["token_count"] = {"naive_docs_per_s": n / t_naive, "vectorized_docs_per_s": n / t_vec,
                          "speedup": t_naive / t_vec}

    print(json.dumps(out, indent=2))
    with open("BENCH/text_vectorization_r2.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
