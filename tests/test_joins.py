"""Temporal joins (pipelines/joins.py): as-of prior-event and windowed
range join.  Covered: oracle conformance on planted data that forces the
cross-bucket carry path, bucket-size invariance (the carry logic must make
bucketing invisible), pinned tie rules, window boundary inclusivity, and
empty inputs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.functions.rounding import round_half_up
from searchengine_ray.pipelines.joins import asof_prior_event, follow_window_stats

US_PER_DAY = 86_400_000_000


def _write_events(tmp_path, tbl: pa.Table) -> str:
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def _planted(rng, n_users=8, n_per_user=80, span_days=60):
    """Events spread over span_days (many 7-day buckets → carries fire),
    with ts collisions planted both right-vs-left and right-vs-right."""
    rows = {k: [] for k in ("event_id", "ts", "user_id", "event_type", "value")}
    eid = 0
    base = 1_700_000_000_000_000
    for u in range(n_users):
        ts = np.sort(rng.integers(0, span_days * US_PER_DAY, n_per_user)) + base
        # plant exact collisions: every 10th event shares its ts with the next
        ts[1::10] = ts[0::10][: len(ts[1::10])]
        types = rng.choice(["purchase", "click", "view"], n_per_user, p=[0.3, 0.4, 0.3])
        for t, ty in zip(ts, types):
            rows["event_id"].append(eid)
            rows["ts"].append(int(t))
            rows["user_id"].append(u)
            rows["event_type"].append(str(ty))
            rows["value"].append(round(float(rng.random() * 100), 2))
            eid += 1
    return pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
        }
    )


def _brute_asof(tbl: pa.Table) -> dict[int, tuple[int, int, float]]:
    """Naive per-left scan with the pinned tie rule (max (ts, eid) right
    with r_ts <= l_ts)."""
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    eid = tbl["event_id"].to_numpy()
    uid = tbl["user_id"].to_numpy()
    val = tbl["value"].to_numpy()
    ety = tbl["event_type"].to_pylist()
    out = {}
    for i in range(len(eid)):
        if ety[i] != "purchase":
            continue
        best = None
        for j in range(len(eid)):
            if ety[j] != "click" or uid[j] != uid[i] or ts[j] > ts[i]:
                continue
            key = (ts[j], eid[j])
            if best is None or key > best[0]:
                best = (key, j)
        if best is not None:
            j = best[1]
            out[int(eid[i])] = (int(eid[j]), int(ts[i] - ts[j]), float(val[j]))
    return out


def test_asof_matches_brute_force_and_is_bucket_invariant(ray_session, tmp_path):
    rng = np.random.default_rng(42)
    tbl = _planted(rng)
    sf = _write_events(tmp_path, tbl)
    want = _brute_asof(tbl)
    got_by_bucket = {}
    for bucket_days in (1, 7, 1000):  # 1000d = single bucket (no carries)
        res = asof_prior_event(sf, bucket_days=bucket_days).to_pandas()
        got = {
            int(r.event_id): (int(r.prior_event_id), int(r.prior_gap_us), float(r.prior_value))
            for r in res.itertuples()
        }
        assert got == want, f"bucket_days={bucket_days}"
        got_by_bucket[bucket_days] = got
    # the 1-day run exercised carries (priors older than one bucket exist)
    assert any(gap > US_PER_DAY for (_, gap, _) in want.values())


def test_asof_tie_rules(ray_session, tmp_path):
    """Right at the left's exact ts counts as prior; among equal-ts rights
    the max event_id wins."""
    t0 = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([t0, t0, t0, t0 - 5], pa.timestamp("us")),
            "user_id": pa.array([0, 0, 0, 0], pa.int64()),
            "event_type": pa.array(["click", "click", "purchase", "click"]),
            "value": pa.array([1.0, 2.0, 9.0, 3.0], pa.float64()),
        }
    )
    res = asof_prior_event(_write_events(tmp_path, tbl)).to_pandas()
    assert len(res) == 1
    row = res.iloc[0]
    assert (int(row.event_id), int(row.prior_event_id), int(row.prior_gap_us)) == (3, 2, 0)
    assert row.prior_value == 2.0


def test_range_join_boundaries_and_cross_bucket(ray_session, tmp_path):
    """(l.ts, l.ts + W] is half-open: a click AT l.ts is excluded, one at
    exactly l.ts + W is included, and a click in the NEXT bucket (reached
    only via right replication) is counted."""
    W = 7 * US_PER_DAY
    t0 = 1_700_000_000_000_000
    t0 -= t0 % W  # bucket-aligned so "next bucket" is unambiguous
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(
                [t0, t0, t0 + W, t0 + W + 1, t0 + W - 1, t0 - 1],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([0] * 6, pa.int64()),
            "event_type": pa.array(
                ["purchase", "click", "click", "click", "click", "click"]
            ),
            "value": pa.array([0.0, 1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
        }
    )
    # click@t0 excluded (not strictly after), click@t0+W-1 and click@t0+W
    # included (the latter lives in the next bucket), t0+W+1 and t0-1 out
    res = follow_window_stats(_write_events(tmp_path, tbl)).to_pandas()
    assert len(res) == 1
    row = res.iloc[0]
    assert int(row.n_follow) == 2
    assert row.follow_value == 10.0


def test_range_join_matches_brute_force(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    tbl = _planted(rng, n_users=5, n_per_user=60, span_days=40)
    sf = _write_events(tmp_path, tbl)
    W = 7 * US_PER_DAY
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    eid = tbl["event_id"].to_numpy()
    uid = tbl["user_id"].to_numpy()
    val = tbl["value"].to_numpy()
    ety = np.asarray(tbl["event_type"].to_pylist())
    want = {}
    for i in np.flatnonzero(ety == "purchase"):
        m = (ety == "click") & (uid == uid[i]) & (ts > ts[i]) & (ts <= ts[i] + W)
        # brute sum in the engine's order (ts, eid) before rounding
        order = np.lexsort((eid[m], ts[m]))
        want[int(eid[i])] = (int(m.sum()), float(round_half_up(val[m][order].sum(), 4)))
    res = follow_window_stats(sf).to_pandas()
    got = {int(r.event_id): (int(r.n_follow), float(r.follow_value)) for r in res.itertuples()}
    assert got == want
    assert any(n > 0 for n, _ in want.values())


def test_carries_merge_partials_across_batches():
    """Pure-function property: _carries_for_user must merge SEVERAL
    partial rows per bucket (a bucket split across read batches) exactly
    as if the bucket had arrived whole — max (r_ts, r_eid) right wins,
    left presence ORs, and the -1 no-right sentinel never beats a real
    right."""
    from searchengine_ray.pipelines.joins import _carries_for_user, _summary_partial

    rng = np.random.default_rng(3)
    n = 400
    tagged = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "ts_us": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
            "value": pa.array(rng.random(n)),
            "bucket": pa.array(rng.integers(0, 6, n).astype(np.int64)),
            "side": pa.array(rng.integers(0, 2, n).astype(np.int8)),
        }
    )
    whole = _carries_for_user(_summary_partial(tagged))
    for n_chunks in (3, 17):
        bounds = np.linspace(0, n, n_chunks + 1).astype(int)
        parts = pa.concat_tables(
            [
                _summary_partial(tagged.slice(a, b - a))
                for a, b in zip(bounds[:-1], bounds[1:])
                if b > a
            ]
        )
        split = _carries_for_user(parts)
        assert split.sort_by("bucket").to_pydict() == whole.sort_by(
            "bucket"
        ).to_pydict(), n_chunks
    assert whole.num_rows > 0


def test_joins_empty_when_types_absent(ray_session, tmp_path):
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            "user_id": pa.array([0], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([1.0], pa.float64()),
        }
    )
    sf = _write_events(tmp_path, tbl)
    # the driver entries pin the schema through _collect_table (a fully
    # empty pipeline is a zero-block Dataset with no schema — see the
    # NOTE in joins.asof_prior_event)
    from searchengine_ray.pipelines.entry_ops import q_asof_join, q_range_join

    a = q_asof_join(sf).to_pandas()
    assert len(a) == 0 and sorted(a.columns) == sorted(
        ["event_id", "user_id", "value", "prior_event_id", "prior_gap_us", "prior_value"]
    )
    r = q_range_join(sf).to_pandas()
    assert len(r) == 0 and sorted(r.columns) == sorted(
        ["event_id", "user_id", "n_follow", "follow_value"]
    )


def test_asof_materialize_tagged_parity(ray_session, tmp_path):
    """materialize_tagged=True (one pinned events scan instead of two
    streaming passes) must be result-identical to the default plan."""
    rng = np.random.default_rng(7)
    sf = _write_events(tmp_path, _planted(rng, n_users=5, n_per_user=60))
    key = ["event_id", "user_id", "prior_event_id", "prior_gap_us"]
    base = asof_prior_event(sf, bucket_days=1).to_pandas().sort_values(key).reset_index(drop=True)
    mat = (
        asof_prior_event(sf, bucket_days=1, materialize_tagged=True)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert len(base) > 0
    assert mat.equals(base)
