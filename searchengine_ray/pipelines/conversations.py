"""Conversation-level operators over the transcripts table.

The transcript data model is multi-turn; training-data pipelines need
conversation-granularity views: per-conversation stats (partial
aggregation inside map_batches before the tiny groupby) and full
conversation reconstruction (groupby(conv_id) with within-group
turn-order sort — the stable (conv_id, turn_idx) ordering invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.transcripts import transcripts_from_documents

_CONV_STATS_SCHEMA = pa.schema(
    [("conv_id", pa.string())]
    + [(c, pa.int64())
       for c in ("n_turns", "n_user", "n_assistant", "n_tool", "total_chars")]
)


def _conv_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial per-conversation aggregates.  Grouping runs on
    int dictionary codes (one lexsort over int64), never on boxed
    strings — the object-dtype argsort/unique this replaces does a
    python string compare per element (events.py measured that pattern
    5.3× slower); conv_id strings are materialized O(groups) from the
    dictionary.  Role flags compare on codes too."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        # same guard as events._window_partial: np.r_[True, ...] on an
        # empty code array seeds starts=[0] and reduceat IndexErrors
        return _CONV_STATS_SCHEMA.empty_table()
    conv_col = batch["conv_id"]
    if isinstance(conv_col, pa.ChunkedArray):
        conv_col = conv_col.combine_chunks()
    enc = conv_col.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    role_col = batch["role"]
    if isinstance(role_col, pa.ChunkedArray):
        role_col = role_col.combine_chunks()
    renc = role_col.dictionary_encode()
    rcodes = renc.indices.to_numpy().astype(np.int64)
    rdict = renc.dictionary.to_pylist()
    rcode_of = {r: i for i, r in enumerate(rdict)}
    n_chars = pc.utf8_length(batch["text"]).to_numpy().astype(np.int64)
    order = np.argsort(codes, kind="stable")
    codes, rcodes, n_chars = codes[order], rcodes[order], n_chars[order]
    first = np.r_[True, codes[1:] != codes[:-1]]
    starts = np.flatnonzero(first)
    seg = np.append(starts, len(codes))
    uniq = enc.dictionary.take(pa.array(codes[starts], pa.int64()))

    def role_count(name: str) -> np.ndarray:
        code = rcode_of.get(name)
        if code is None:
            return np.zeros(len(starts), dtype=np.int64)
        return np.add.reduceat((rcodes == code).astype(np.int64), starts)

    out = {
        "n_turns": np.diff(seg),
        "n_user": role_count("user"),
        "n_assistant": role_count("assistant"),
        "n_tool": role_count("tool"),
        "total_chars": np.add.reduceat(n_chars, starts),
    }
    return pa.table(
        {
            "conv_id": uniq.cast(pa.string()),
            **{
                k: pa.array(out[k].astype(np.int64), pa.int64())
                for k in ("n_turns", "n_user", "n_assistant", "n_tool", "total_chars")
            },
        }
    )


def conversation_stats(sf_dir: str):
    """→ (conv_id, n_turns, n_user, n_assistant, n_tool, total_chars)."""
    from ray.data.aggregate import Sum

    ds = transcripts_from_documents(sf_dir)
    partial = ds.map_batches(_conv_stats_partial, batch_format="pyarrow")
    agg = partial.groupby("conv_id").aggregate(
        *[
            Sum(c, alias_name=c)
            for c in ("n_turns", "n_user", "n_assistant", "n_tool", "total_chars")
        ]
    )

    def cast(t: pa.Table) -> pa.Table:
        for c in ("n_turns", "n_user", "n_assistant", "n_tool", "total_chars"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pa.compute.cast(t[c], pa.int64()))
        return t

    return agg.map_batches(cast, batch_format="pyarrow")


def _concat_group(g: pa.Table) -> pa.Table:
    order = np.argsort(g["turn_idx"].to_numpy(), kind="stable")
    texts = g["text"].to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "conv_id": pa.array([g["conv_id"][0].as_py()], pa.string()),
            "n_turns": pa.array([g.num_rows], pa.int64()),
            "full_text": pa.array(["\n".join(texts)], pa.string()),
        }
    )


def conversation_text(sf_dir: str):
    """→ (conv_id, n_turns, full_text) — turns joined in turn_idx order."""
    ds = transcripts_from_documents(sf_dir)
    return ds.groupby("conv_id").map_groups(_concat_group, batch_format="pyarrow")
