"""Resumable partitioned output with per-partition lineage manifests
(north-rule: "resumable from checkpoint with per-partition lineage + metrics").

Layout::

    out_dir/
      part=<key>/ ...parquet files...
      _MANIFEST/<key>.json   {"key":…, "rows":…, "input":…, "wall_s":…, "done":true}

A partition is complete iff its manifest exists and says done. On resume,
completed keys are skipped entirely (their input is never read). Writes go to
a temp dir then rename — the manifest is written last, so a crash mid-write
leaves an incomplete dir that the next run overwrites.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import ray.data


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST")


def completed_keys(out_dir: str) -> set[str]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
                if m.get("done"):
                    done.add(m["key"])
            except (json.JSONDecodeError, KeyError, OSError):
                continue  # incomplete manifest = incomplete partition
    return done


def write_partition(ds: ray.data.Dataset, out_dir: str, key: str,
                    input_desc: str = "") -> dict:
    """Write one partition's Dataset atomically + its manifest. Returns the
    manifest record (includes rows + wall time as the per-partition metrics)."""
    part_dir = os.path.join(out_dir, f"part={key}")
    tmp_dir = part_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(part_dir, ignore_errors=True)
    t0 = time.time()
    ds.write_parquet(tmp_dir)
    rows = ray.data.read_parquet(tmp_dir).count()
    os.replace(tmp_dir, part_dir)
    record = {
        "key": key,
        "rows": rows,
        "input": input_desc,
        "wall_s": round(time.time() - t0, 3),
        "done": True,
    }
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    mpath = os.path.join(manifest_dir(out_dir), f"{key}.json")
    with open(mpath + ".tmp", "w") as fh:
        json.dump(record, fh)
    os.replace(mpath + ".tmp", mpath)
    return record


def run_partitioned(
    keys: list[str],
    build: Callable[[str], ray.data.Dataset],
    out_dir: str,
    *,
    input_desc: Callable[[str], str] = lambda k: k,
    resume: bool = True,
) -> list[dict]:
    """Run `build(key) → Dataset` for every partition key, skipping completed
    ones on resume. Each partition streams independently to its own dir, so a
    failed run loses at most one partition's work."""
    os.makedirs(out_dir, exist_ok=True)
    done = completed_keys(out_dir) if resume else set()
    records = []
    for key in keys:
        if key in done:
            continue
        records.append(write_partition(build(key), out_dir, key, input_desc(key)))
    return records
