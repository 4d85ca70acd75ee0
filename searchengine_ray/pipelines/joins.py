"""Temporal joins over the event stream: as-of join and windowed range join.

Two of the classic operators Ray Data has no built-in for, expressed as
compositions the streaming executor can pipeline (map_batches +
groupby().map_groups), with the partitioning assumption made explicit:

- ``asof_prior_event``: for every LEFT event, attach the most recent
  RIGHT event of the same user at or before it (inner semantics — lefts
  with no prior are dropped, so no nullable columns reach the oracle
  compare).  Distributed WITHOUT ever needing a user's full history in
  one group: rights are pre-reduced to one last-right summary row per
  (user, time-bucket) — metadata-sized — a per-user prefix scan over
  those summaries emits "carry" rows targeted at the buckets that
  contain lefts, and the only full-data shuffle is a single
  groupby(user, bucket) whose group size is bounded by per-user
  PER-BUCKET activity, not per-user lifetime activity.

- ``follow_window_stats``: for every LEFT event, the count and value-sum
  of RIGHT events of the same user in the half-open window
  (l.ts, l.ts + W].  The textbook distributed range join: each right row
  is replicated into its own bucket and the previous one (bucket width
  == W, so two copies suffice), then one groupby(user, bucket) joins
  locally via sorted searchsorted + per-window reduceat sums.
  Right-side memory is exactly 2x, group size is again per-user
  per-bucket.

Tie semantics (pinned by the oracle and tests): a right at the same
timestamp as a left counts as "prior"; among rights sharing a timestamp
the one with the largest event_id wins — i.e. the scan order
(ts, side=right-first, event_id).  Window sums are computed member by
member over the sorted rights (np.add.reduceat — the same association
order the SQL oracle uses) and rounded with the shared half-up rule
(functions/rounding.py); identical operand order + identical rounding
keeps the compare stable.  Timestamps are asserted non-negative in
_tag (the -1 no-right sentinel depends on it).

The reference has no event stream; these extend its windowed-aggregate
surface (`Part C` has only whole-corpus passes) to the stream shapes a
training-data pipeline needs, alongside events.py's tumbling windows and
chunked sessionization.

Assumptions: timestamps are non-negative epoch-µs (the -1 no-right
sentinel in bucket summaries relies on it; _tag enforces it with a
vectorized check so a bad generator fails loudly).  In the as-of plan the
tagged scan feeds both the carry branch and the main union, so the
pruned events read executes TWICE — two streaming passes over a
column-pruned, type-filtered read, the any-scale default;
``materialize_tagged=True`` pins the tagged stream in the object store
instead (one scan) for when the filtered stream fits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up

_US_PER_DAY = 86_400_000_000

# tagged-event schema shared by both joins (and by the carry rows)
_TAGGED = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("value", pa.float64()),
        ("bucket", pa.int64()),
        ("side", pa.int8()),  # 0 = right, 1 = left
    ]
)

_SUMMARY = pa.schema(
    [
        ("user_id", pa.int64()),
        ("bucket", pa.int64()),
        ("has_left", pa.int8()),
        ("r_ts", pa.int64()),  # -1 sentinel: no right in this bucket
        ("r_eid", pa.int64()),
        ("r_value", pa.float64()),
    ]
)

ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("value", pa.float64()),
        ("prior_event_id", pa.int64()),
        ("prior_gap_us", pa.int64()),
        ("prior_value", pa.float64()),
    ]
)

FOLLOW_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("n_follow", pa.int64()),
        ("follow_value", pa.float64()),
    ]
)


def _read_events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )


def _tag(batch: pa.Table, left_type: str, right_type: str, bucket_us: int) -> pa.Table:
    """Filter to the two event types and tag side + time bucket."""
    if batch.num_rows == 0:
        return _TAGGED.empty_table()
    et = batch["event_type"]
    is_l = pa.compute.equal(et, left_type).to_numpy(zero_copy_only=False)
    is_r = pa.compute.equal(et, right_type).to_numpy(zero_copy_only=False)
    keep = is_l | is_r
    if not keep.any():
        return _TAGGED.empty_table()
    ts_us = batch["ts"].cast(pa.int64()).to_numpy()[keep]
    if len(ts_us) and ts_us.min() < 0:
        # the -1 no-right sentinel in bucket summaries relies on
        # non-negative epoch-µs timestamps; fail loudly instead of
        # silently treating a real prior right as "no right"
        raise ValueError(
            "temporal joins require non-negative epoch-us timestamps; "
            f"saw ts_us={int(ts_us.min())}"
        )
    return pa.table(
        {
            "event_id": pa.array(batch["event_id"].to_numpy()[keep], pa.int64()),
            "user_id": pa.array(batch["user_id"].to_numpy()[keep], pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "value": pa.array(batch["value"].to_numpy()[keep], pa.float64()),
            "bucket": pa.array(ts_us // bucket_us, pa.int64()),
            "side": pa.array(is_l[keep].astype(np.int8)),
        }
    )


def _summary_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (user, bucket) partial: left presence + last right.

    Output is metadata-sized (one row per user-bucket touched by the
    batch); the heavy event payload never enters the summary shuffle.
    """
    if batch.num_rows == 0 or "user_id" not in batch.schema.names:
        return _SUMMARY.empty_table()
    uid = batch["user_id"].to_numpy()
    bkt = batch["bucket"].to_numpy()
    ts = batch["ts_us"].to_numpy()
    eid = batch["event_id"].to_numpy()
    val = batch["value"].to_numpy()
    side = batch["side"].to_numpy()
    # group rows by (user, bucket): lexsort then run-length segments
    order = np.lexsort((eid, ts, bkt, uid))
    uid, bkt, ts, eid, val, side = (
        a[order] for a in (uid, bkt, ts, eid, val, side)
    )
    new = np.r_[True, (uid[1:] != uid[:-1]) | (bkt[1:] != bkt[:-1])]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], len(uid)]
    seg = np.cumsum(new) - 1
    has_left = np.zeros(len(starts), dtype=np.int8)
    np.maximum.at(has_left, seg, side)
    # last right per segment: rows are (ts, eid)-sorted within segment,
    # so the wanted right is the LAST side==0 row of each segment
    r_ts = np.full(len(starts), -1, dtype=np.int64)
    r_eid = np.zeros(len(starts), dtype=np.int64)
    r_val = np.zeros(len(starts), dtype=np.float64)
    rpos = np.flatnonzero(side == 0)
    if len(rpos):
        rseg = seg[rpos]
        # within rpos, order is already (ts, eid) ascending per segment →
        # the last occurrence per segment wins
        r_ts[rseg] = ts[rpos]
        r_eid[rseg] = eid[rpos]
        r_val[rseg] = val[rpos]
    return pa.table(
        {
            "user_id": pa.array(uid[starts], pa.int64()),
            "bucket": pa.array(bkt[starts], pa.int64()),
            "has_left": pa.array(has_left),
            "r_ts": pa.array(r_ts),
            "r_eid": pa.array(r_eid),
            "r_value": pa.array(r_val),
        }
    )


def _carries_for_user(g: pa.Table) -> pa.Table:
    """Per-user bucket merge + prefix scan over summary PARTIALS → carries.

    Input is one user's per-batch partial rows (possibly several per
    bucket) — O(active buckets × batches touched), never O(events).
    First merge partials per bucket (max (r_ts, r_eid) right wins; the
    -1 sentinel sorts below every real right), then, for each bucket
    containing a left event, emit the last right event from any STRICTLY
    EARLIER bucket as a synthetic RIGHT row in the tagged-event schema;
    rights inside the bucket itself ride the main groupby.  Doing both
    here keeps the as-of plan at two shuffles total (this metadata
    groupby + the full-data (user, bucket) groupby).
    """
    if g.num_rows == 0 or "bucket" not in g.schema.names:
        return _TAGGED.empty_table()
    order = np.lexsort(
        (g["r_eid"].to_numpy(), g["r_ts"].to_numpy(), g["bucket"].to_numpy())
    )
    bkt_all = g["bucket"].to_numpy()[order]
    # per-bucket segment ends: the last row holds the max (r_ts, r_eid)
    last = np.r_[bkt_all[1:] != bkt_all[:-1], True]
    seg_starts = np.r_[0, np.flatnonzero(last[:-1]) + 1]
    hl_all = g["has_left"].to_numpy()[order]
    has_left = np.maximum.reduceat(hl_all, seg_starts)
    bkt = bkt_all[last]
    r_ts = g["r_ts"].to_numpy()[order][last]
    r_eid = g["r_eid"].to_numpy()[order][last]
    r_val = g["r_value"].to_numpy()[order][last]
    # running "last right seen in buckets <= i" (exclusive for the carry)
    has_r = r_ts >= 0
    idx = np.where(has_r, np.arange(len(bkt)), -1)
    run = np.maximum.accumulate(idx)  # index of latest right-bearing bucket
    prev = np.r_[-1, run[:-1]]  # exclusive: strictly earlier buckets only
    want = (has_left == 1) & (prev >= 0)
    if not want.any():
        return _TAGGED.empty_table()
    src = prev[want]
    uid = g["user_id"][0].as_py()
    n = int(want.sum())
    return pa.table(
        {
            "event_id": pa.array(r_eid[src], pa.int64()),
            "user_id": pa.array(np.full(n, uid, dtype=np.int64)),
            "ts_us": pa.array(r_ts[src], pa.int64()),
            "value": pa.array(r_val[src], pa.float64()),
            "bucket": pa.array(bkt[want], pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        }
    )


def _asof_group(g: pa.Table) -> pa.Table:
    """Join one (user, bucket) group: lefts vs (in-bucket + carry) rights."""
    if g.num_rows == 0 or "side" not in g.schema.names:
        return ASOF_SCHEMA.empty_table()
    side = g["side"].to_numpy()
    ts = g["ts_us"].to_numpy()
    eid = g["event_id"].to_numpy()
    val = g["value"].to_numpy()
    lmask = side == 1
    if not lmask.any():
        return ASOF_SCHEMA.empty_table()
    r_order = np.lexsort((eid[~lmask], ts[~lmask]))
    r_ts = ts[~lmask][r_order]
    r_eid = eid[~lmask][r_order]
    r_val = val[~lmask][r_order]
    l_ts, l_eid, l_val = ts[lmask], eid[lmask], val[lmask]
    # rightmost right with r_ts <= l_ts; equal-ts rights all qualify and
    # the (ts, eid) sort makes the max-event_id one win — the pinned tie rule
    pos = np.searchsorted(r_ts, l_ts, side="right") - 1
    ok = pos >= 0
    if not ok.any():
        return ASOF_SCHEMA.empty_table()
    pos = pos[ok]
    return pa.table(
        {
            "event_id": pa.array(l_eid[ok], pa.int64()),
            "user_id": pa.array(
                np.full(int(ok.sum()), g["user_id"][0].as_py(), dtype=np.int64)
            ),
            "value": pa.array(l_val[ok], pa.float64()),
            "prior_event_id": pa.array(r_eid[pos], pa.int64()),
            "prior_gap_us": pa.array(l_ts[ok] - r_ts[pos], pa.int64()),
            "prior_value": pa.array(r_val[pos], pa.float64()),
        }
    )


def asof_prior_event(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    bucket_days: int = 7,
    materialize_tagged: bool = False,
):
    """As-of join → (event_id, user_id, value, prior_event_id,
    prior_gap_us, prior_value); one row per left event that HAS a prior.

    Scale shape: summary shuffle is metadata-sized; the per-user prefix
    scan touches O(active buckets) rows; the single full-data shuffle
    groups by (user, bucket) so no group ever holds a user's lifetime.

    The tagged scan feeds both the carry branch and the main union.  By
    default that is TWO streaming passes over the column-pruned,
    type-filtered read (no mid-pipeline state, works at any scale);
    with ``materialize_tagged=True`` the tagged stream is pinned in the
    object store once and both branches read it — one events scan, the
    right call when the filtered stream fits the cluster's object store
    (it is already down to 6 narrow columns × the two joined types).
    """
    bucket_us = bucket_days * _US_PER_DAY
    tagged = _read_events(sf_dir).map_batches(
        _tag,
        batch_format="pyarrow",
        fn_kwargs={
            "left_type": left_type,
            "right_type": right_type,
            "bucket_us": bucket_us,
        },
    )
    if materialize_tagged:
        tagged = tagged.materialize()
    carries = (
        tagged.map_batches(_summary_partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_carries_for_user, batch_format="pyarrow")
    )
    # NOTE an input with no left/right events at all yields a zero-block
    # Dataset whose schema vanishes through to_pandas() (Ray's sort emits
    # schema-less empties and map stages skip them) — the driver entry
    # (entry_ops.q_asof_join) pins ASOF_SCHEMA by collecting through
    # _collect_table, the q_dup_spans precedent
    return (
        tagged.union(carries)
        .groupby(["user_id", "bucket"])
        .map_groups(_asof_group, batch_format="pyarrow")
    )


def _replicate_rights(batch: pa.Table) -> pa.Table:
    """Range-join prep: rights get a second copy in the PREVIOUS bucket
    (window == bucket width, so every (l, r) pair with r in (l, l+W]
    lands in l's bucket exactly once); lefts pass through."""
    if batch.num_rows == 0 or "side" not in batch.schema.names:
        return _TAGGED.empty_table()
    side = batch["side"].to_numpy()
    rmask = side == 0
    if not rmask.any():
        return batch
    extra = batch.filter(pa.array(rmask))
    shifted = pa.compute.subtract(extra["bucket"], 1)
    extra = extra.set_column(
        extra.schema.get_field_index("bucket"), "bucket", shifted.cast(pa.int64())
    )
    return pa.concat_tables([batch, extra])


def _follow_group(g: pa.Table, window_us: int) -> pa.Table:
    """One (user, bucket) group: per-left count/sum of rights in
    (l.ts, l.ts + W] via sorted searchsorted + prefix sums."""
    if g.num_rows == 0 or "side" not in g.schema.names:
        return FOLLOW_SCHEMA.empty_table()
    side = g["side"].to_numpy()
    lmask = side == 1
    if not lmask.any():
        return FOLLOW_SCHEMA.empty_table()
    ts = g["ts_us"].to_numpy()
    eid = g["event_id"].to_numpy()
    val = g["value"].to_numpy()
    r_order = np.lexsort((eid[~lmask], ts[~lmask]))
    r_ts = ts[~lmask][r_order]
    r_val = val[~lmask][r_order]
    l_ts, l_eid = ts[lmask], eid[lmask]
    lo = np.searchsorted(r_ts, l_ts, side="right")
    hi = np.searchsorted(r_ts, l_ts + window_us, side="right")
    # per-window sums via np.add.reduceat over the sorted rights — the
    # same member-by-member summation the SQL oracle does, so no
    # prefix-sum cancellation can nudge a value across a 4dp rounding
    # boundary.  Interleaved [lo, hi) bounds; even slots are the window
    # sums (lo < hi guaranteed by the nz filter), odd slots discarded.
    # The 0.0 sentinel keeps hi == len(r_val) a valid reduceat index
    # without ever being summed (bounds are exclusive on the right).
    fv = np.zeros(len(l_ts), np.float64)
    nz = np.flatnonzero(hi > lo)
    if len(nz):
        bounds = np.stack([lo[nz], hi[nz]], axis=1).ravel()
        fv[nz] = np.add.reduceat(np.r_[r_val, 0.0], bounds)[::2]
    return pa.table(
        {
            "event_id": pa.array(l_eid, pa.int64()),
            "user_id": pa.array(
                np.full(int(lmask.sum()), g["user_id"][0].as_py(), dtype=np.int64)
            ),
            "n_follow": pa.array((hi - lo).astype(np.int64)),
            "follow_value": pa.array(round_half_up(fv, 4)),
        }
    )


def follow_window_stats(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    window_days: int = 7,
):
    """Windowed range join → (event_id, user_id, n_follow, follow_value):
    for every left event, the count and 4dp-rounded value-sum of right
    events of the same user in (l.ts, l.ts + W].  Every left appears
    (zero rows included).  Right side is replicated exactly 2x; the one
    shuffle groups by (user, bucket=W)."""
    window_us = window_days * _US_PER_DAY
    tagged = _read_events(sf_dir).map_batches(
        _tag,
        batch_format="pyarrow",
        fn_kwargs={
            "left_type": left_type,
            "right_type": right_type,
            "bucket_us": window_us,
        },
    )
    # same zero-block caveat as asof_prior_event: the driver entry pins
    # FOLLOW_SCHEMA via _collect_table
    return (
        tagged.map_batches(_replicate_rights, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(
            _follow_group, batch_format="pyarrow", fn_kwargs={"window_us": window_us}
        )
    )
