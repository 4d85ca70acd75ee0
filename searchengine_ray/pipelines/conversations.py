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


def _conv_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial per-conversation aggregates."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    role = batch["role"].to_numpy(zero_copy_only=False)
    import pyarrow.compute as pc

    n_chars = pc.utf8_length(batch["text"]).to_numpy().astype(np.int64)
    order = np.argsort(conv, kind="stable")
    conv, role, n_chars = conv[order], role[order], n_chars[order]
    uniq, starts = np.unique(conv, return_index=True)
    seg = np.append(starts, len(conv))
    out = {
        "conv_id": uniq,
        "n_turns": np.diff(seg),
        "n_user": np.add.reduceat((role == "user").astype(np.int64), starts),
        "n_assistant": np.add.reduceat((role == "assistant").astype(np.int64), starts),
        "n_tool": np.add.reduceat((role == "tool").astype(np.int64), starts),
        "total_chars": np.add.reduceat(n_chars, starts),
    }
    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
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
