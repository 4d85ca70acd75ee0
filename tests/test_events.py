"""Stream-shaped event operators: chunked sessionization must match the
one-group-per-user path even when a power user spans many chunks
(VERDICT r2 #7), and the int-key window partials must match a naive
per-row aggregation (#8)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.pipelines.events import (
    _merge_session_partials,
    _session_partials,
    _sessions_group,
    _window_partial,
    user_sessions,
)

GAP_US = 30 * 60_000_000


def _make_events(rng, n_users=20, power_user=3, power_n=5000, base_n=40):
    """Synthetic event log: one power user with power_n events (spans many
    chunks at any realistic batch size), gaps planted on both sides of the
    session threshold."""
    uids, tss = [], []
    for u in range(n_users):
        n = power_n if u == power_user else base_n
        # mixture of sub-gap and super-gap deltas, some exactly AT the gap
        deltas = rng.choice(
            [60_000_000, GAP_US, GAP_US + 1, 7_200_000_000], size=n, p=[0.7, 0.1, 0.1, 0.1]
        )
        ts = 1_700_000_000_000_000 + np.cumsum(deltas)
        uids.append(np.full(n, u, np.int64))
        tss.append(ts)
    uid = np.concatenate(uids)
    ts = np.concatenate(tss)
    order = rng.permutation(len(uid))  # arrival order is shuffled
    return pa.table(
        {
            "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
            "ts": pa.array(ts[order], pa.timestamp("us")),
            "user_id": pa.array(uid[order], pa.int64()),
            "event_type": pa.array(
                np.asarray(rng.choice(["a", "b", "c"], len(uid))), pa.string()
            ),
            "value": pa.array(rng.random(len(uid)), pa.float64()),
        }
    )


def test_chunked_partials_match_whole_group_any_split():
    """Pure-function property: splitting a user's sorted history at ANY
    chunk boundary and merging partials gives the same session count as
    scanning the whole history in one group."""
    rng = np.random.default_rng(7)
    tbl = _make_events(rng, n_users=6, power_n=800, base_n=50)
    # global sort, as user_sessions does before _session_partials
    tbl = tbl.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
    )
    for n_chunks in (1, 3, 17, 64):
        bounds = np.linspace(0, tbl.num_rows, n_chunks + 1).astype(int)
        parts = pa.concat_tables(
            [
                _session_partials(tbl.slice(a, b - a), GAP_US)
                for a, b in zip(bounds[:-1], bounds[1:])
                if b > a
            ]
        )
        for u in np.unique(tbl["user_id"].to_numpy()):
            g_parts = parts.filter(pa.compute.equal(parts["user_id"], int(u)))
            merged = _merge_session_partials(g_parts, GAP_US)
            whole = _sessions_group(
                tbl.filter(pa.compute.equal(tbl["user_id"], int(u))), gap_minutes=30
            )
            assert merged.to_pydict() == whole.to_pydict(), (n_chunks, u)


def test_user_sessions_chunked_matches_unchunked(ray_session, tmp_path):
    """End-to-end through Ray: the chunked (scale) path returns the same
    table as the one-group-per-user path on a skewed log where the power
    user is ~5× any batch size."""
    rng = np.random.default_rng(11)
    tbl = _make_events(rng, n_users=12, power_n=6000, base_n=30)
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    a = (
        user_sessions(str(tmp_path), chunked=True)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    b = (
        user_sessions(str(tmp_path), chunked=False)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["n_events"].sum() == tbl.num_rows
    assert (a["n_sessions"] > 1).any()  # the planted super-gap deltas split


def test_window_partial_matches_naive_and_handles_empty():
    rng = np.random.default_rng(3)
    tbl = _make_events(rng, n_users=4, power_n=500, base_n=100)
    out = _window_partial(tbl.select(["ts", "event_type", "value"]))
    # naive per-row reference
    ts = tbl["ts"].cast(pa.int64()).to_numpy()
    win = (ts // 3_600_000_000) * 3_600_000_000
    et = tbl["event_type"].to_numpy(zero_copy_only=False)
    val = tbl["value"].to_numpy()
    ref = {}
    for e, w, v in zip(et, win, val):
        n, s = ref.get((e, w), (0, 0.0))
        ref[(e, w)] = (n + 1, s + v)
    got = {
        (e, w): (n, s)
        for e, w, n, s in zip(
            out["event_type"].to_pylist(),
            out["window_start"].to_pylist(),
            out["n"].to_pylist(),
            out["sum_value"].to_pylist(),
        )
    }
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][0] == ref[k][0]
        assert got[k][1] == pytest.approx(ref[k][1])
    # empty batch must return the declared schema, zero rows
    empty = _window_partial(tbl.select(["ts", "event_type", "value"]).slice(0, 0))
    assert empty.num_rows == 0 and empty.column_names == out.column_names
    empty_s = _session_partials(tbl.slice(0, 0), GAP_US)
    assert empty_s.num_rows == 0


def test_conv_stats_partial_empty_batch():
    """Regression: np.r_[True, ...] on an empty code array seeded
    starts=[0] and reduceat raised IndexError, killing the whole
    conversation_stats job on any empty block."""
    import pyarrow as pa

    from searchengine_ray.pipelines.conversations import _conv_stats_partial

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )
    out = _conv_stats_partial(empty)
    assert out.num_rows == 0
    assert out.schema.names == [
        "conv_id", "n_turns", "n_user", "n_assistant", "n_tool", "total_chars"]
