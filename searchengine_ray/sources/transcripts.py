"""Transcript-table sources.

The engine's input is a Parquet table of multi-turn conversation/agent
transcripts: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]).  One turn = one document (the reference's
"tweet" maps 1:1 onto "turn", cf. ``Part C/document.py``).

Two deterministic sources, no external data:

- ``transcripts_from_documents``: derives a transcript table from the
  driver's ``documents`` testdata table with a pure columnar mapping that
  the DuckDB oracles reproduce verbatim via ``TRANSCRIPTS_CTE`` — this is
  what the oracle-checked correctness queries run on.
- ``synth_transcripts``: seeded generator with hashtags/mentions/numbers/
  dates/URLs/case-variant entities and planted near-duplicates — used by
  the rank-identity tests (reference tokenizer coverage) and by bench.py
  to scale input size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EPOCH_2025 = 1735689600_000_000  # 2025-01-01T00:00:00 UTC in microseconds
N_CONVS = 50

# Keep in exact sync with transcripts_from_documents().
TRANSCRIPTS_CTE = f"""
transcripts AS (
    SELECT 'conv_' || lpad(CAST(doc_id % {N_CONVS} AS VARCHAR), 4, '0') AS conv_id,
           CAST(doc_id // {N_CONVS} AS INTEGER) AS turn_idx,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
           text,
           CASE WHEN doc_id % 3 = 2
                THEN 'tool_' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END AS tool,
           TIMESTAMP '2025-01-01 00:00:00' + (doc_id * INTERVAL 1 SECOND) AS ts
    FROM documents
)"""


def derive_transcripts_batch(batch: pa.Table) -> pa.Table:
    """Vectorized (doc_id, text) → transcript-row mapping (= TRANSCRIPTS_CTE)."""
    doc_id = batch["doc_id"].to_numpy()
    conv_num = doc_id % N_CONVS
    conv_id = np.char.add("conv_", np.char.zfill(conv_num.astype("U"), 4))
    role_idx = (doc_id % 3).astype(np.int64)
    roles = np.array(["user", "assistant", "tool"])[role_idx]
    tool = np.where(
        role_idx == 2, np.char.add("tool_", (doc_id % 7).astype("U")), ""
    )
    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array((doc_id // N_CONVS).astype(np.int32), type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": batch["text"],
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(_EPOCH_2025 + doc_id * 1_000_000, type=pa.timestamp("us")),
        }
    )


def transcripts_from_documents(sf_dir: str):
    """documents.parquet → transcript Dataset (lazy, column-pruned read)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(derive_transcripts_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded synthetic generator (identity tests + bench scaling)
# ---------------------------------------------------------------------------

_BASE_WORDS = (
    "query index batch stream shard merge token score rank filter vector "
    "table column partition shuffle actor worker cluster memory spill block "
    "搜索 データ"  # a couple of non-ascii tokens to exercise ascii filtering
).split()
_ENTITIES = [
    ("Donald", "Trump"), ("New", "York"), ("Ray", "Data"), ("Apache", "Arrow"),
    ("World", "Health"), ("Grand", "Canyon"),
]
_HASHTAGS = ["#CovidTracker", "#StayHome", "#ray_data", "#BigData2020"]
_MENTIONS = ["@who", "@cdc", "@raydev"]
_URLS = ["https://www.example.org/covid/stats", "https://docs.ray.io/data"]
_NUMBERS = ["35 Thousand", "12%", "10.6", "3 Million", "1/2", "2020"]
_DATES = ["Jun 2020", "January 2021", "Oct 19"]
_CASE_VARIANTS = ["Corona", "corona", "CORONA", "Virus", "virus"]


def synth_transcripts(
    n_convs: int = 20,
    turns_per_conv: int = 12,
    seed: int = 7,
    dup_fraction: float = 0.05,
    rich: bool = True,
    conv_prefix: str = "",
) -> pa.Table:
    """Deterministic transcript corpus with the token shapes the reference
    parser special-cases.  ``dup_fraction`` of turns are exact copies of an
    earlier turn (for dedup tests)."""
    rng = np.random.default_rng(seed)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    all_texts: list[str] = []
    for c in range(n_convs):
        for t in range(turns_per_conv):
            i = c * turns_per_conv + t
            if all_texts and rng.random() < dup_fraction:
                text = all_texts[int(rng.integers(0, len(all_texts)))]
            else:
                n = int(rng.integers(6, 18))
                words = list(rng.choice(_BASE_WORDS, size=n))
                if rich:
                    if rng.random() < 0.35:
                        e = _ENTITIES[int(rng.integers(0, len(_ENTITIES)))]
                        words.insert(int(rng.integers(0, len(words))), f"{e[0]} {e[1]}")
                    for pool, p in ((_HASHTAGS, 0.25), (_MENTIONS, 0.2),
                                    (_URLS, 0.15), (_NUMBERS, 0.3),
                                    (_DATES, 0.2), (_CASE_VARIANTS, 0.4)):
                        if rng.random() < p:
                            words.insert(int(rng.integers(0, len(words))),
                                         pool[int(rng.integers(0, len(pool)))])
                    if rng.random() < 0.1:
                        words.insert(0, "RT")
                text = " ".join(words)
            all_texts.append(text)
            conv_ids.append(f"{conv_prefix}sc{c:05d}")
            turn_idxs.append(t)
            roles.append(["user", "assistant", "tool"][i % 3])
            texts.append(text)
            tools.append(f"tool_{i % 5}" if i % 3 == 2 else "")
            tss.append(_EPOCH_2025 + i * 1_000_000)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idxs, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(tss, type=pa.timestamp("us")),
        }
    )


def write_synth_transcripts(path: str, n_files: int = 4, **kwargs) -> None:
    """Write the synthetic corpus as a directory of parquet shards (the
    unit of per-partition checkpointing in the build pipeline)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    tbl = synth_transcripts(**kwargs)
    n = tbl.num_rows
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(tbl.slice(i * per, per), f"{path}/part-{i:05d}.parquet")
