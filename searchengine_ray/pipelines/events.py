"""Stream-shaped operators over the ``events`` table.

Ray Data is a batch engine (no watermarks); stream semantics are
expressed over the ordered log: tumbling windows as key-truncation
groupbys (partial per-batch aggregation first), sessionization as a
per-key ``map_groups`` over the ts-sorted group.  Ordering assumption:
events of one user fit one group and are sorted by (ts, event_id) —
the deterministic tie-break shared with the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up

_HOUR_US = 3_600_000_000


def _window_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial tumbling-hour aggregates."""
    ts = batch["ts"].cast(pa.int64()).to_numpy()
    win = (ts // _HOUR_US) * _HOUR_US
    et = batch["event_type"].to_numpy(zero_copy_only=False)
    val = batch["value"].to_numpy()
    key = np.char.add(et.astype("U"), np.char.zfill((win // _HOUR_US).astype("U"), 12))
    order = np.argsort(key, kind="stable")
    key, et, win, val = key[order], et[order], win[order], val[order]
    uniq, starts = np.unique(key, return_index=True)
    return pa.table(
        {
            "event_type": pa.array(et[starts], pa.string()),
            "window_start": pa.array(win[starts], pa.int64()),
            "n": pa.array(np.diff(np.append(starts, len(key))).astype(np.int64)),
            "sum_value": pa.array(np.add.reduceat(val, starts), pa.float64()),
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


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization → (user_id, n_events, n_sessions) with a
    gap-threshold session split."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return ds.groupby("user_id").map_groups(
        _sessions_group, batch_format="pyarrow", fn_kwargs={"gap_minutes": gap_minutes}
    )
