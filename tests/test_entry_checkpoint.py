"""Driver-contract smoke (entry/queries/oracle_sql) + checkpoint resume."""

import os

import numpy as np
import pytest


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    result = e.entry()
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    assert len(df) >= 0
    assert "cell_id" in df.columns and "n_tiles" in df.columns


def test_queries_oracle_keys_consistent():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    assert len(oracles) >= 20
    for sql in oracles.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


def test_checkpoint_resume(ray_session, tmp_path):
    import ray.data as rd

    from projcl_ray import checkpoint

    out = str(tmp_path / "out")
    calls = []

    def build(key: str):
        calls.append(key)
        return rd.range(10).map_batches(
            lambda b: {"id": b["id"], "part": np.full(len(b["id"]), key, dtype=object)},
            batch_format="numpy",
        )

    recs = checkpoint.run_partitioned(["a", "b"], build, out)
    assert [r["key"] for r in recs] == ["a", "b"]
    assert all(r["rows"] == 10 and r["done"] for r in recs)
    assert checkpoint.completed_keys(out) == {"a", "b"}

    # resume: nothing rebuilt
    calls.clear()
    recs2 = checkpoint.run_partitioned(["a", "b"], build, out)
    assert recs2 == [] and calls == []

    # a new key builds only itself
    recs3 = checkpoint.run_partitioned(["a", "b", "c"], build, out)
    assert [r["key"] for r in recs3] == ["c"] and calls == ["c"]

    # corrupt manifest → partition is rebuilt
    mpath = os.path.join(checkpoint.manifest_dir(out), "b.json")
    with open(mpath, "w") as f:
        f.write("{not json")
    recs4 = checkpoint.run_partitioned(["a", "b", "c"], build, out)
    assert [r["key"] for r in recs4] == ["b"]
    # output readable end-to-end
    total = rd.read_parquet(out + "/part=a").count() + rd.read_parquet(out + "/part=b").count()
    assert total == 20


def test_flagship_partitioned_resume(ray_session, tmp_path):
    """End-to-end resumable flagship: run → all shards manifested; delete one
    manifest (simulated crash) → rerun rebuilds exactly that shard; tile
    totals identical to a fresh run."""
    import ray.data as rd

    from projcl_ray import checkpoint
    from projcl_ray.pipelines import flagship_partitioned

    out = str(tmp_path / "flagship")
    recs = flagship_partitioned(out, n_images=24, n_shards=3)
    assert [r["key"] for r in recs] == ["0", "1", "2"]
    assert all(r["rows"] > 0 and r["wall_s"] >= 0 for r in recs)
    assert all("images[" in r["input"] for r in recs)  # lineage recorded
    total = rd.read_parquet(out + "/part=1").count() + sum(
        rd.read_parquet(out + f"/part={k}").count() for k in ("0", "2")
    )

    # resume: nothing to do
    assert flagship_partitioned(out, n_images=24, n_shards=3) == []

    # crash simulation: drop shard 1's manifest → only shard 1 rebuilds
    os.remove(os.path.join(checkpoint.manifest_dir(out), "1.json"))
    recs2 = flagship_partitioned(out, n_images=24, n_shards=3)
    assert [r["key"] for r in recs2] == ["1"]
    total2 = sum(rd.read_parquet(out + f"/part={k}").count() for k in ("0", "1", "2"))
    assert total2 == total
