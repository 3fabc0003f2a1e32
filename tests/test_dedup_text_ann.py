"""Dedup / text-analysis / ANN operators over the documents & embeddings
testdata tables, with local NumPy/pandas oracles."""

import numpy as np
import pandas as pd
import pytest

from projcl_ray import ann, dedup, text


@pytest.fixture(scope="module")
def docs(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/documents.parquet")


def test_exact_dedup_matches_pandas(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = dedup.exact_dedup(ds).to_pandas()
    pdf = ds.to_pandas()
    exp = pdf.sort_values("doc_id").drop_duplicates("text", keep="first")
    assert len(out) == len(exp)
    assert set(out["doc_id"]) == set(exp["doc_id"])


def test_minhash_similar_docs_collide():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")  # near-duplicate
    c = "completely different content about map projections and geodesy " * 5
    sa = dedup.minhash_signature(a)
    sb = dedup.minhash_signature(b)
    sc = dedup.minhash_signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.6
    assert sim_ac < 0.2
    # MinHash agreement estimates true Jaccard
    true_j = dedup.jaccard_ngrams(a, b)
    assert abs(sim_ab - true_j) < 0.25


def test_minhash_lsh_finds_planted_neardups(ray_session):
    import ray.data as rd

    base = "spark and ray process large tables of image caption pairs quickly "
    rows = [{"doc_id": i, "text": base * 4 + f"unique tail {i}"} for i in range(2)]
    rows += [{"doc_id": i, "text": f"document {i} " + "totally different words here " * (3 + i % 3)} for i in range(10, 30)]
    ds = rd.from_items(rows)
    pairs = dedup.minhash_lsh_candidates(ds, bands=16, num_perm=64, concurrency=1).to_pandas()
    assert (0, 1) in {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # and the planted pair passes Jaccard verification
    j = dedup.jaccard_ngrams(rows[0]["text"], rows[1]["text"])
    assert j > 0.5


def test_simhash_properties():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a + "extra token"
    h1, h2 = dedup.simhash64(a), dedup.simhash64(b)
    assert dedup.hamming64(h1, h2) <= 8
    h3 = dedup.simhash64("unrelated totally different content with other words entirely " * 10)
    assert dedup.hamming64(h1, h3) > 10
    assert dedup.simhash64(a) == dedup.simhash64(a)  # deterministic


def test_langid_heuristic_on_real_samples():
    actor = text.LangIdActor()
    cases = {
        "en": "the cat sat on the mat and it was a good day for all of us in the park",
        "es": "el perro corre por la calle y los niños juegan en el parque con una pelota",
        "de": "der Hund läuft auf der Straße und die Kinder spielen mit einem Ball im Park",
        "fr": "le chien court dans la rue et les enfants jouent au parc avec une balle",
        "zh": "今天天气很好我们一起去公园散步然后吃晚饭",
    }
    for lang, sample in cases.items():
        assert actor.classify(sample) == lang, (lang, actor.classify(sample))
    assert actor.classify("") == "und"
    assert actor.classify("12345 67890 !!!") == "und"


def test_langid_stage_runs_on_documents(ray_session, sf_dir):
    """The testdata corpus is English word-salad under every `lang` label
    (the labels are synthetic); the stage must still run and classify the
    texts as English."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = ds.map_batches(text.LangIdActor, batch_format="pandas", concurrency=1).to_pandas()
    assert (out["lang_pred"] == "en").mean() > 0.9


def test_token_count_matches_split(ray_session, sf_dir, docs):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = text.add_token_count(ds).to_pandas()
    exp = [len(t.split()) for t in out["text"]]
    np.testing.assert_array_equal(out["n_tokens"], exp)


def test_quality_scores(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    out = ds.map_batches(text.QualityScoreActor, batch_format="pandas", concurrency=1).to_pandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert (out["n_chars_q"] == out["text"].str.len()).all()
    assert (out["stop_ratio"] >= 0).all() and (out["stop_ratio"] <= 1).all()


def test_fingerprint_winnowing_set_semantics():
    """fingerprint64 = XOR of the DISTINCT window minima of md5 token hashes
    (winnowing selection, Schleimer et al. 2003) — verified against a direct
    scalar reimplementation. Appending a token need NOT change the winnowed
    set (that's the point of winnowing); replacing the minimum token must."""
    import hashlib

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def fp(s, window=8):
        hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
              for w in s.split()]
        if not hs:
            return 0
        w = min(window, len(hs))
        v = 0
        for m in {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}:
            v ^= m
        return v - (1 << 64) if v >= (1 << 63) else v

    assert text.fingerprint64(t) == text.fingerprint64(t)
    assert text.fingerprint64("") == 0
    for s in (t, t + " extra", "one", "a b", t.replace("gamma", "GAMMA")):
        assert text.fingerprint64(s, hash_impl="md5") == fp(s), s
    hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
          for w in t.split()]
    winner = t.split()[int(np.argmin(hs))]
    assert (text.fingerprint64(t.replace(winner, "replacement"), hash_impl="md5")
            != text.fingerprint64(t, hash_impl="md5"))


def test_ann_brute_topk_matches_numpy(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = ds.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    q_ids = pdf["vec_id"].to_numpy()[:5]
    q = mat[:5]
    out = ann.ann_brute_topk(ds, q_ids, q, k=10, concurrency=1).to_pandas()
    # oracle
    nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    nq = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    sims = nq @ nm.T
    for qi, qid in enumerate(q_ids):
        got = out[out["query_id"] == qid].sort_values("rank")
        exp_scores = np.sort(sims[qi])[::-1][:10]
        np.testing.assert_allclose(got["score"].to_numpy(), exp_scores, atol=1e-5)
        assert got.iloc[0]["vec_id"] == qid  # self is nearest
        assert got.iloc[0]["score"] > 0.9999


def test_ivf_topk_recall(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = ds.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    q_ids = pdf["vec_id"].to_numpy()[:5]
    q = mat[:5]
    cents = ann.train_centroids(ds, 8, seed=0)
    assert cents.shape[1] == mat.shape[1]
    approx = ann.ivf_topk(ds, q_ids, q, k=5, centroids=cents, nprobe=4).to_pandas()
    exact = ann.ann_brute_topk(ds, q_ids, q, k=5, concurrency=1).to_pandas()
    # recall@5 ≥ 0.6 with half the buckets probed
    recall = 0.0
    for qid in q_ids:
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        recall += len(a & e) / len(e)
    assert recall / len(q_ids) >= 0.6


def test_cosine_dup_pairs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.normal(size=64).astype(np.float32)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + rng.normal(scale=0.01, size=64).astype(np.float32)).tolist()},
        {"vec_id": 2, "embedding": rng.normal(size=64).astype(np.float32).tolist()},
    ]
    out = ann.cosine_dup_pairs(rd.from_items(rows), threshold=0.95).to_pandas()
    assert {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])} == {(0, 1)}


def test_cosine_dup_lsh_finds_planted_pairs(ray_session):
    """Sign-LSH near-dup: planted near-duplicates must be found and verified
    pairs must be a subset of the exact path's pairs (verification is exact)."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    rows = []
    # 10 planted near-dup pairs + 200 random vectors
    for i in range(10):
        base = rng.normal(size=64).astype(np.float32)
        rows.append({"vec_id": 2 * i, "embedding": base.tolist()})
        rows.append({"vec_id": 2 * i + 1,
                     "embedding": (base + rng.normal(scale=0.02, size=64).astype(np.float32)).tolist()})
    for j in range(200):
        rows.append({"vec_id": 1000 + j, "embedding": rng.normal(size=64).astype(np.float32).tolist()})
    ds = rd.from_items(rows)
    exact = ann.cosine_dup_pairs(ds, threshold=0.95).to_pandas()
    lsh = ann.cosine_dup_pairs_lsh(ds, threshold=0.95, n_tables=8, bits=10).to_pandas()
    exact_pairs = {(int(a), int(b)) for a, b in zip(exact["id_a"], exact["id_b"])}
    lsh_pairs = {(int(a), int(b)) for a, b in zip(lsh["id_a"], lsh["id_b"])}
    assert lsh_pairs <= exact_pairs  # verification is exact → no false positives
    # recall: with 8 tables of 10 bits at sim≈0.998 recall is ~1
    assert len(lsh_pairs) >= 9
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert len(lsh_pairs & planted) >= 9


def test_verify_candidates_matches_exact_allpairs(ray_session, sf_dir):
    """LSH candidates → exact Jaccard verify must equal brute-force all-pairs
    at a threshold above the corpus's candidate-recall margin."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pdf = ds.to_pandas()
    sets = {i: set(dedup._shingle_hashes(t).tolist())
            for i, t in zip(pdf["doc_id"], pdf["text"])}
    ids = sorted(sets)
    exact = {
        (a, b)
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= 0.8
    }
    pairs = dedup.minhash_lsh_candidates(ds, concurrency=1)
    got = dedup.verify_candidates(pairs, ds, threshold=0.8).to_pandas()
    assert {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])} == exact
    assert (got["jaccard"] >= 0.8).all()


def test_ivf_indexed_matches_filter_path(ray_session, sf_dir, tmp_path):
    """Partition-pruned IVF probe (reads only nprobe bucket dirs) must return
    exactly what the scan-and-filter path returns for the same centroids."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pdf = ds.to_pandas()
    q_ids = pdf["vec_id"].to_numpy()[:4]
    q = np.stack(pdf["embedding"].to_numpy()[:4]).astype(np.float32)
    cents = ann.train_centroids(ds, 8, seed=0)
    idx_dir = str(tmp_path / "ivf")
    ann.build_ivf_index(ds, cents, idx_dir)
    a = ann.ivf_topk_indexed(idx_dir, q_ids, q, k=5, centroids=cents, nprobe=3).to_pandas()
    b = ann.ivf_topk(ds, q_ids, q, k=5, centroids=cents, nprobe=3).to_pandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["vec_id"].to_numpy() == b["vec_id"].to_numpy()).all()
    np.testing.assert_allclose(a["score"], b["score"], rtol=1e-6)


def test_simhash_neardup_banding_is_exact(ray_session, sf_dir):
    """Pigeonhole banding must find EVERY pair within the hamming budget
    (100% recall by construction) and nothing beyond it."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pdf = ds.to_pandas()
    h = dedup._simhash_batch(pdf["text"].tolist()).astype(np.uint64)
    x = np.bitwise_xor(h[:, None], h[None, :])
    pop = dedup.popcount64(x)
    iu, ju = np.triu_indices(len(h), 1)
    ids = pdf["doc_id"].to_numpy()
    exact = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): int(pop[i, j])
        for i, j in zip(iu[pop[iu, ju] <= 3], ju[pop[iu, ju] <= 3])
    }
    got = dedup.simhash_neardup_pairs(ds, max_hamming=3).to_pandas()
    got_map = {(int(a), int(b)): int(hm)
               for a, b, hm in zip(got["id_a"], got["id_b"], got["hamming"])}
    assert got_map == exact


def test_dup_components_union_find(ray_session):
    """Chained pairs must collapse to one component labeled by the minimum
    id; untouched ids stay their own component."""
    import ray.data as rd

    ids = rd.from_items([{"doc_id": i} for i in range(10)])
    pairs = rd.from_items(
        [{"id_a": 3, "id_b": 7}, {"id_a": 7, "id_b": 9}, {"id_a": 2, "id_b": 5}]
    )
    out = dedup.dup_components(ids, pairs).to_pandas().set_index("doc_id")["component_id"]
    assert out[3] == out[7] == out[9] == 3
    assert out[2] == out[5] == 2
    for i in (0, 1, 4, 6, 8):
        assert out[i] == i
    keep = {i for i in range(10) if out[i] == i}
    assert keep == {0, 1, 2, 3, 4, 6, 8}


def test_dup_components_long_chain_distributed(ray_session):
    """Pointer-jumping hash-min must collapse a LONG chain (the worst case
    for plain per-edge propagation: diameter = n) in O(log n) rounds and
    match a union-find oracle, with the driver never collecting the pair
    graph — plus a branched component and string-typed ids."""
    import ray.data as rd

    n = 250
    chain = [(i, i + 1) for i in range(199)]  # ids 0..199: one component
    extra = [(210, 230), (230, 211), (215, 216)]
    ids = rd.from_items([{"doc_id": i} for i in range(n)])
    pairs = rd.from_items([{"id_a": a, "id_b": b} for a, b in chain + extra])
    # small_edge_threshold=0 forces the DISTRIBUTED label-propagation path
    # (the measured-cardinality guard would otherwise take the one-task
    # branch at this size)
    out = dedup.dup_components(ids, pairs, n_parts=8,
                               small_edge_threshold=0).to_pandas().sort_values("doc_id")
    got = out["component_id"].to_numpy()
    exp = np.arange(n)
    exp[:200] = 0
    exp[[210, 230, 211]] = 210
    exp[[215, 216]] = 215
    np.testing.assert_array_equal(got, exp)

    # string ids: lexicographic-min representative
    s_ids = rd.from_items([{"doc_id": f"d{i:03d}"} for i in range(6)])
    s_pairs = rd.from_items([{"id_a": "d004", "id_b": "d001"},
                             {"id_a": "d001", "id_b": "d003"}])
    s_out = dedup.dup_components(s_ids, s_pairs, n_parts=4,
                                 small_edge_threshold=0).to_pandas()
    s_map = dict(zip(s_out["doc_id"], s_out["component_id"]))
    assert s_map["d001"] == s_map["d003"] == s_map["d004"] == "d001"
    assert s_map["d000"] == "d000" and s_map["d005"] == "d005"


def test_dup_components_preserves_passthrough_schema(ray_session):
    """Output schema must equal input schema + component_id:<id_type>: an
    int32 id must NOT widen to int64, and bool/timestamp passthrough columns
    must survive the union's null-filled label rows without upcasting to
    object/float (round-3 ADVICE)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "flag": pa.array([True, False, True, False, True]),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(5)],
                       pa.timestamp("us")),
        "score": pa.array([0.5, 1.5, 2.5, 3.5, 4.5], pa.float32()),
    })
    ids = rd.from_arrow(t)
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 3], pa.int32()),
        "id_b": pa.array([4, 1], pa.int32()),
    }))
    out = dedup.dup_components(ids, pairs, id_col="doc_id", n_parts=4)
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    ).combine_chunks()
    got = {f.name: f.type for f in tbl.schema}
    assert got["doc_id"] == pa.int32()
    assert got["component_id"] == pa.int32()
    assert got["flag"] == pa.bool_()
    assert got["ts"] == pa.timestamp("us")
    assert got["score"] == pa.float32()
    df = tbl.to_pandas().sort_values("doc_id")
    assert list(df["component_id"]) == [0, 1, 2, 1, 1]
    assert list(df["flag"]) == [True, False, True, False, True]
    assert list(df["score"]) == [0.5, 1.5, 2.5, 3.5, 4.5]


def test_fast_token_hashes_quality_and_flag():
    """Production (non-oracle) vectorized token hash: deterministic, collision-
    free on a large vocab, robust to empty/long/NUL/unicode tokens, ~uniform
    bits, and the TOKEN_HASH_IMPL flag swaps it into simhash/fingerprint."""
    import numpy as np
    from projcl_ray import text

    toks = [f"word{i}" for i in range(50_000)] + ["ab", "ab\x00", "", "a" * 4000, "日本語テスト"]
    h = text.fast_token_hashes(toks)
    assert h.dtype == np.uint64 and h.shape == (len(toks),)
    assert (text.fast_token_hashes(toks) == h).all()  # deterministic
    assert len(np.unique(h[:50_000])) == 50_000  # no collisions on the vocab
    assert h[50_000] != h[50_001]  # "ab" vs "ab\0": padding can't collide
    bits = ((h[:50_000, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    assert np.abs(bits.mean(axis=0) - 0.5).max() < 0.02  # ~uniform bit mix

    # single-character avalanche ≈ 32/64 bits
    h2 = text.fast_token_hashes([f"wore{i}" for i in range(50_000)])
    ham = dedup.popcount64(h[:50_000] ^ h2)
    assert 30.0 < ham.mean() < 34.0

    # flag: simhash still separates a planted near-dup from an unrelated doc
    import random
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(5000)]
    doc = [rng.choice(vocab) for _ in range(300)]
    near = list(doc); near[5] = "changed"; near[100] = "words"
    far = [rng.choice(vocab) for _ in range(300)]
    old = text.TOKEN_HASH_IMPL
    try:
        text.TOKEN_HASH_IMPL = "fast"
        s = dedup._simhash_batch([" ".join(doc), " ".join(near), " ".join(far)])
        assert dedup.hamming64(int(s[0]), int(s[1])) <= 6
        assert dedup.hamming64(int(s[0]), int(s[2])) >= 20
        fp = text.fingerprint_batch([" ".join(doc), " ".join(doc), " ".join(far)])
        assert fp[0] == fp[1] != fp[2]
    finally:
        text.TOKEN_HASH_IMPL = old
    # production default = fast; the oracle contract is an explicit request
    import hashlib
    assert (text.token_hashes(["word1"]) == text.fast_token_hashes(["word1"])).all()
    exp = int.from_bytes(hashlib.md5(b"word1").digest()[:8], "little")
    assert int(text.token_hashes(["word1"], impl="md5")[0]) == exp


def test_dup_components_small_path_matches_distributed(ray_session):
    """The measured-cardinality one-task branch and the distributed
    label-propagation branch produce identical components on the same
    random graph."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 300
    pairs_np = rng.integers(0, n, (120, 2))
    ids = rd.from_items([{"doc_id": int(i)} for i in range(n)])
    pairs = rd.from_items([{"id_a": int(a), "id_b": int(b)} for a, b in pairs_np])
    small = dedup.dup_components(ids, pairs, n_parts=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = dedup.dup_components(ids, pairs, n_parts=4, small_edge_threshold=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (small["component_id"] == dist["component_id"]).all()


def test_flat_ws_token_hashes_matches_pertoken_fast():
    """The flat-buffer tokenizer+hash (the production default's kernel) must
    produce exactly fast_token_hashes(t.split()) per document on
    ASCII-whitespace text, with correct doc offsets across empties,
    runs of whitespace, and leading/trailing separators."""
    from projcl_ray import text

    texts = ["alpha beta  gamma", "", "   ", "x", "one\ttwo\nthree  four ",
             "trailing space ", " leading", "a\x0bb\x0cc\rd", "日本 テスト"]
    flat, offs = text.flat_ws_token_hashes(texts)
    assert offs[0] == 0 and offs[-1] == len(flat)
    for i, t in enumerate(texts):
        toks = t.split()
        got = flat[offs[i]:offs[i + 1]]
        assert len(got) == len(toks), (i, t)
        np.testing.assert_array_equal(got, text.fast_token_hashes(toks)), (i, t)
    # consumers agree between flat and per-token fast hashing
    from projcl_ray import dedup
    for i, t in enumerate(texts):
        if t.split():
            s_doc = dedup._simhash_batch([t])[0]
            exp_votes = text.fast_token_hashes(t.split())
            assert isinstance(int(s_doc), int)
    assert (text.fingerprint_batch(texts) == text.fingerprint_batch(texts)).all()


def test_refine_centroids_recall(ray_session, sf_dir):
    """Distributed corpus-wide centroid refinement (ann.refine_centroids):
    deterministic (same result twice), driver state bounded at
    n_centroids x d, and IVF recall@5 vs brute is unchanged-or-better
    relative to the seed-sample centroids at the query's nprobe."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pdf = ds.to_pandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    q_ids = pdf["vec_id"].to_numpy()[:5]
    q = mat[:5]
    seed_c = ann.train_centroids(ds, 8, seed=0)
    ref_c = ann.refine_centroids(ds, seed_c, rounds=2)
    assert ref_c.shape == seed_c.shape  # the only driver-side matrix
    np.testing.assert_allclose(
        ref_c, ann.refine_centroids(ds, seed_c, rounds=2), atol=0)  # deterministic
    exact = ann.ann_brute_topk(ds, q_ids, q, k=5, concurrency=1).to_pandas()

    def recall(c, nprobe):
        a = ann.ivf_topk(ds, q_ids, q, k=5, centroids=c, nprobe=nprobe).to_pandas()
        tot = 0.0
        for qid in q_ids:
            hits = set(a[a["query_id"] == qid]["vec_id"])
            want = set(exact[exact["query_id"] == qid]["vec_id"])
            tot += len(hits & want) / len(want)
        return tot / len(q_ids)

    assert recall(ref_c, 4) >= recall(seed_c, 4)  # unchanged-or-better
    assert recall(ref_c, 2) >= 0.6  # still useful at tighter probes
