"""Stream-shaped windowing over an ordered, partitioned log (the `events`
table). Ray Data is a batch engine with no event-time watermarks; the
reference is pure batch too (SURVEY §1.2 — no windows, no late data). These
operators implement the standard window families deterministically over a
bounded log, as `groupby(key).map_groups` over ts-sorted groups:

- tumbling: floor(ts / size) — expressible as a plain groupby (vectorized, no
  per-group sort needed);
- sliding:  one output row per (window_start, key) for every window the event
  falls in (hop ≤ size) — a controlled fan-out then groupby;
- session:  gap-based sessionization inside each key's ts-sorted group.

Ordering assumption: within a key, windowing happens AFTER an explicit sort of
that key's group; no cross-key ordering is assumed (blocks are unordered).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum


def _combined_agg(assigned: rd.Dataset, key_col: str, value_col: str) -> rd.Dataset:
    """Combiner for (key, window) aggregates: per-batch pandas groupby emits
    one partial row per group per batch, then the global groupby sums the
    partials — shrinks the shuffle by ~rows/groups-per-batch and keeps hot
    windows from dominating it."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby([key_col, "window_start"], as_index=False).agg(
            pn=(value_col, "size"), ps=(value_col, "sum")
        )
        return g

    partials = assigned.map_batches(partial, batch_format="pandas")
    return partials.groupby([key_col, "window_start"]).aggregate(
        Sum("pn", alias_name="n"), Sum("ps", alias_name="sum_value")
    )


def _ts_us(ts_col) -> np.ndarray:
    return np.asarray(ts_col, dtype="datetime64[us]").astype(np.int64)


def tumbling(
    ds: rd.Dataset,
    size_s: float,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """Tumbling windows: (key, window_start) → count + sum. Pure vectorized
    assignment + one groupby; no per-group Python."""
    size_us = int(size_s * 1_000_000)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        us = _ts_us(batch[ts_col])
        batch = batch[[key_col, value_col]].copy()
        batch["window_start"] = ((us // size_us) * size_us).astype("datetime64[us]")
        return batch

    return _combined_agg(ds.map_batches(assign, batch_format="pandas"), key_col, value_col)


def sliding(
    ds: rd.Dataset,
    size_s: float,
    hop_s: float,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """Sliding windows (size, hop): each event fans out to the ⌈size/hop⌉
    windows containing it (bounded fan-out inside map_batches), then one
    groupby aggregates. Equivalent SQL: join against generated window starts."""
    size_us = int(size_s * 1_000_000)
    hop_us = int(hop_s * 1_000_000)
    k = (size_us + hop_us - 1) // hop_us  # windows per event

    def fan(batch: pd.DataFrame) -> pd.DataFrame:
        us = _ts_us(batch[ts_col])
        # last window start containing the event, then step back by hop
        last = (us // hop_us) * hop_us
        starts = last[:, None] - np.arange(k)[None, :] * hop_us
        valid = (starts <= us[:, None]) & (us[:, None] < starts + size_us)
        rows, cols = np.nonzero(valid)
        return pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy()[rows],
                value_col: batch[value_col].to_numpy()[rows],
                "window_start": starts[rows, cols].astype("datetime64[us]"),
            }
        )

    return _combined_agg(ds.map_batches(fan, batch_format="pandas"), key_col, value_col)


def sessionize(
    ds: rd.Dataset,
    gap_s: float,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_parts: int | None = None,
) -> rd.Dataset:
    """Session windows: within each key's ts-sorted group, a new session starts
    when the gap to the previous event exceeds ``gap_s``. Emits one row per
    session: (key, session_start, session_end, n, sum_value).

    The per-key group is the unit of state (SURVEY §2.7: incremental state
    lives inside the keyed group); skewed keys are bounded by per-user volume.
    Keys may be any dtype (integer ids hash as themselves; strings/UUIDs via
    a stable siphash). ``n_parts`` scales with input size unless given, so a
    part's in-worker frame stays ~constant as the log grows.
    """
    from .ops import _adaptive_parts, hash_key_u64

    gap_us = int(gap_s * 1_000_000)
    if n_parts is None:  # bounded groups: one vectorized pandas pass per part,
        # not one Python call per user (millions of users = millions of calls)
        n_parts = _adaptive_parts(ds.count())

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["sess_part"] = (
            (hash_key_u64(batch[key_col].to_numpy()) * np.uint64(2654435761))
            % np.uint64(n_parts)
        ).astype(np.int64)
        return batch

    def sessions_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col], kind="stable")
        us = _ts_us(g[ts_col])
        keys = g[key_col].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (keys[1:] != keys[:-1]) | ((us[1:] - us[:-1]) > gap_us)
        sid = np.cumsum(new_session)
        agg = (
            pd.DataFrame(
                {
                    "sid": sid,
                    key_col: keys,
                    "_us": us,
                    value_col: g[value_col].to_numpy(),
                }
            )
            .groupby("sid", sort=False)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start": ("_us", "min"),
                    "session_end": ("_us", "max"),
                    "n": (value_col, "size"),
                    "sum_value": (value_col, "sum"),
                }
            )
            .reset_index(drop=True)
        )
        agg["session_start"] = agg["session_start"].astype("datetime64[us]")
        agg["session_end"] = agg["session_end"].astype("datetime64[us]")
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    parted = ds.map_batches(add_part, batch_format="pandas")
    return parted.groupby("sess_part").map_groups(sessions_part, batch_format="pandas")
