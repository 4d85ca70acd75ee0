"""Stream-shaped operators over the ``events`` table.

Ray Data is a batch engine (no watermarks); stream semantics are
expressed over the ordered log: tumbling windows as key-truncation
groupbys (partial per-batch aggregation first), sessionization as a
two-phase scan — per-chunk partials (first/last ts, internal gap
breaks) merged per user — so no task ever holds one user's full event
history (a power user spans chunks without breaking the bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up

_HOUR_US = 3_600_000_000


def _window_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial tumbling-hour aggregates.  Grouping key = (int
    dictionary code of event_type, window index): a two-key int lexsort
    — no per-element string allocation (the r2 version built compound
    strings via np.char.add: measured 5.3× slower on a 200k-row batch)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "window_start": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            }
        )
    ts = batch["ts"].cast(pa.int64()).to_numpy()
    win = (ts // _HOUR_US) * _HOUR_US
    et = batch["event_type"]
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    enc = et.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    val = batch["value"].to_numpy()
    wi = win // _HOUR_US
    order = np.lexsort((wi, codes))
    c, w, win_s, val_s = codes[order], wi[order], win[order], val[order]
    first = np.r_[True, (c[1:] != c[:-1]) | (w[1:] != w[:-1])]
    starts = np.flatnonzero(first)
    # O(groups) strings via the dictionary, not O(rows) boxed values
    et_groups = enc.dictionary.take(pa.array(c[starts], pa.int64()))
    return pa.table(
        {
            "event_type": et_groups.cast(pa.string()),
            "window_start": pa.array(win_s[starts], pa.int64()),
            "n": pa.array(np.diff(np.append(starts, len(c))).astype(np.int64)),
            "sum_value": pa.array(np.add.reduceat(val_s, starts), pa.float64()),
        }
    )


def events_windowed(sf_dir: str):
    """Tumbling 1-hour windows → (event_type, window_start:timestamp,
    n, sum_value rounded 4dp)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    agg = (
        ds.map_batches(_window_partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pa.compute.cast(t["window_start"], pa.timestamp("us")),
                "n": pa.compute.cast(t["n"], pa.int64()),
                "sum_value": pa.array(round_half_up(t["sum_value"].to_numpy(), 4)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _sessions_group(g: pa.Table, gap_minutes: int = 30) -> pa.Table:
    ts = g["ts"].cast(pa.int64()).to_numpy()
    eid = g["event_id"].to_numpy()
    order = np.lexsort((eid, ts))
    ts = ts[order]
    gaps = np.diff(ts) > gap_minutes * 60_000_000
    return pa.table(
        {
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_events": pa.array([len(ts)], pa.int64()),
            "n_sessions": pa.array([1 + int(gaps.sum())], pa.int64()),
        }
    )


def _session_partials(batch: pa.Table, gap_us: int) -> pa.Table:
    """Per-chunk session partials: one row per (user, chunk) with the
    chunk's first/last event ts, event count and INTERNAL gap breaks.
    The chunk never needs to be user-aligned — the merge step stitches
    chunk boundaries per user."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_breaks": pa.array([], pa.int64()),
            }
        )
    uid = batch["user_id"].to_numpy()
    ts = batch["ts"].cast(pa.int64()).to_numpy()
    eid = batch["event_id"].to_numpy()
    order = np.lexsort((eid, ts, uid))
    uid, ts = uid[order], ts[order]
    first = np.r_[True, uid[1:] != uid[:-1]]
    starts = np.flatnonzero(first)
    ends = np.r_[starts[1:], len(uid)]
    gaps = (np.diff(ts) > gap_us) & (uid[1:] == uid[:-1])
    cg = np.r_[0, np.cumsum(gaps)]
    return pa.table(
        {
            "user_id": pa.array(uid[starts], pa.int64()),
            "first_ts": pa.array(ts[starts], pa.int64()),
            "last_ts": pa.array(ts[ends - 1], pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "n_breaks": pa.array((cg[ends - 1] - cg[starts]).astype(np.int64)),
        }
    )


def _merge_session_partials(g: pa.Table, gap_us: int) -> pa.Table:
    """Merge one user's chunk partials (ts-ordered, non-overlapping after
    the global sort): sessions = 1 + internal breaks + boundary gaps."""
    order = np.argsort(g["first_ts"].to_numpy(), kind="stable")
    f = g["first_ts"].to_numpy()[order]
    l = g["last_ts"].to_numpy()[order]
    cross = (f[1:] - l[:-1]) > gap_us
    return pa.table(
        {
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_events": pa.array([int(g["n_events"].to_numpy().sum())], pa.int64()),
            "n_sessions": pa.array(
                [1 + int(g["n_breaks"].to_numpy().sum()) + int(cross.sum())],
                pa.int64(),
            ),
        }
    )


def user_sessions(sf_dir: str, gap_minutes: int = 30, chunked: bool = True):
    """Sessionization → (user_id, n_events, n_sessions) with a
    gap-threshold session split.

    ``chunked`` (default, the scale path): global sort by (user_id, ts,
    event_id) → per-chunk partials (first/last ts, internal breaks) →
    per-user merge of the tiny partial rows.  Peak per-task state is one
    CHUNK, not one user's history — a power user with 10^9 events costs
    O(chunks) partial rows, and the final merge only handles
    chunk-boundary gaps.  ``chunked=False`` keeps the one-group-per-user
    map_groups (simpler; bounded by the largest user)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    gap_us = gap_minutes * 60_000_000
    if not chunked:
        return ds.groupby("user_id").map_groups(
            _sessions_group, batch_format="pyarrow",
            fn_kwargs={"gap_minutes": gap_minutes},
        )
    parts = ds.sort(["user_id", "ts", "event_id"]).map_batches(
        _session_partials, batch_format="pyarrow", fn_kwargs={"gap_us": gap_us}
    )
    return parts.groupby("user_id").map_groups(
        _merge_session_partials, batch_format="pyarrow", fn_kwargs={"gap_us": gap_us}
    )
