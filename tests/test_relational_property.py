"""Property tests (hypothesis) for the round-2 relational operators: each op
must match a direct pandas/NumPy oracle on randomized inputs."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from projcl_ray import ops


@pytest.fixture(autouse=True)
def _ray(ray_session):
    # hypothesis tests can't take fixtures as args; bind the shared session here
    yield


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 10_000), k=st.integers(1, 6))
def test_topk_per_group_property(seed, k):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 400))
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 6, n),
            "v": rng.choice([1.0, 2.0, 3.5, 3.5, 9.0], n),  # deliberate ties
            "tid": np.arange(n),
        }
    )
    got = ops.topk_per_group(rd.from_pandas(df), "g", "v", k, tie_col="tid").to_pandas()
    exp = (
        df.sort_values(["v", "tid"], ascending=[False, True], kind="stable")
        .groupby("g", sort=False).head(k)
    )
    key = ["g", "tid"]
    assert sorted(map(tuple, got[key].to_numpy())) == sorted(map(tuple, exp[key].to_numpy()))


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_range_join_property(seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    bounds = np.unique(rng.uniform(0, 100, 6))
    iv = [(f"i{j}", float(bounds[j]), float(bounds[j + 1])) for j in range(len(bounds) - 1)]
    v = rng.uniform(-10, 110, 200)
    got = ops.range_join(rd.from_pandas(pd.DataFrame({"v": v})), iv, "v").to_pandas()
    exp = {}
    for j, (iid, lo, hi) in enumerate(iv):
        for x in v[(v >= lo) & (v < hi)]:
            exp[round(float(x), 9)] = iid
    if len(got) == 0:
        assert not exp
    else:
        assert {round(float(x), 9): i for x, i in zip(got["v"], got["interval_id"])} == exp


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000), frac=st.floats(0.0, 1.0))
def test_stratified_sample_property(seed, frac):
    """Stratified keep-decision must equal the scalar hash formula per row,
    and per-stratum rates must apply independently."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 500
    df = pd.DataFrame({"k": rng.integers(0, 1 << 40, n), "s": rng.choice(["a", "b", "c"], n)})
    fr = {"a": frac, "b": 0.5}
    got = ops.stratified_sample(rd.from_pandas(df), "k", "s", fr, seed=3).to_pandas()
    thr = {s: np.uint64(int(f * 4294967296.0)) for s, f in fr.items()}
    h = ((df["k"].to_numpy().astype(np.uint64) + np.uint64(3) * np.uint64(2654435769))
         * np.uint64(2654435761)) % np.uint64(4294967296)
    keep = np.array([h[i] < thr.get(df["s"][i], np.uint64(0)) for i in range(n)])
    exp = df[keep]
    got_keys = set() if not len(got) else set(got["k"])
    assert got_keys == set(exp["k"])


def test_stratified_sample_null_strata():
    """Null strata must take the default fraction, not raise (round-3
    ADVICE: null dictionary indices came back as float NaN and broke the
    LUT gather)."""
    import ray.data as rd

    n = 400
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, n)
    strata = [None if i % 3 == 0 else ("a" if i % 2 else "b") for i in range(n)]
    df = pd.DataFrame({"k": keys, "s": pd.array(strata, dtype="string")})
    # default=1.0: every null-stratum row must survive
    got = ops.stratified_sample(
        rd.from_pandas(df), "k", "s", {"a": 0.0, "b": 0.0}, default=1.0, seed=3
    ).to_pandas()
    exp_nulls = {int(k) for k, s in zip(keys, strata) if s is None}
    assert set(got["k"].astype(np.int64)) == exp_nulls
    # default=0.0: null-stratum rows must all drop
    got0 = ops.stratified_sample(
        rd.from_pandas(df), "k", "s", {"a": 1.0, "b": 1.0}, default=0.0, seed=3
    ).to_pandas()
    exp_named = {int(k) for k, s in zip(keys, strata) if s is not None}
    assert set(got0["k"].astype(np.int64)) == exp_named


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_group_quantiles_property(seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 500))
    df = pd.DataFrame({"g": rng.integers(0, 4, n), "v": rng.normal(0, 10, n)})
    got = ops.group_quantiles(rd.from_pandas(df), "g", "v", [0.5, 0.9]).to_pandas()
    for _, row in got.iterrows():
        v = np.sort(df[df["g"] == row["g"]]["v"].to_numpy())
        for q, cname in ((0.5, "q50"), (0.9, "q90")):
            idx = min(max(int(np.ceil(q * len(v))) - 1, 0), len(v) - 1)
            assert row[cname] == v[idx]
