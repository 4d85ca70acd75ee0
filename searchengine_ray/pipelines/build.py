"""Index build pipeline (Ray-Data-native).

Rebuild of the reference's two build paths — the in-memory dict build
(``Part C/search_engine_1.py:29-49`` + ``indexer.py:22-87``) and the
external-memory BSBI build (``Part A/indexer.py`` + ``merger.py``) — as a
staged, resumable Ray Data pipeline:

  tokenize (per-partition, checkpointed)  → tokenized/   parquet
  docstats (column-pruned projection)     → docstats/    parquet
  postings (runs → salted merge shuffle)  → postings/    parquet, hive-partitioned by shard
  dictionary (tiny aggregate)             → dictionary/  parquet
  stats (N, avgdl, skew metrics)          → index_meta.json

Every stage is skipped on re-run when its manifest record is present and
the input partitions' fingerprints still match (see state/manifest.py).
The tokenize stage processes one input parquet file per task so a killed
build resumes at file granularity — the partition layout a 10^12-turn
build on a multi-node cluster needs (input files are the shards).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..profiles import get_profile
from ..stages.postings import (
    CHUNKS_SCHEMA,
    ExplodeEncodeStage,
    MergePostingsGroup,
    partial_merge_group,
)
from ..stages.tokenize import TOKENIZED_SCHEMA, TokenizeStage
from ..state.manifest import BuildManifest

_SCALAR_COLS = [c for c in TOKENIZED_SCHEMA.names if c not in ("terms", "tfs", "is_entity")]
_READ_COLS = ["conv_id", "turn_idx", "role", "tool", "text"]


class _TokenizePartition:
    """One task per input file: read → tokenize → checkpointed parquet part.

    Runs as an actor pool so the reference profile's compiled regex rule
    tables are built once per actor, not once per file.
    """

    def __init__(self, profile_name: str, index_dir: str, sub_batch: int = 65536):
        self.stage = TokenizeStage(profile_name)
        self.index_dir = index_dir
        self.sub_batch = sub_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"pid": [], "path": [], "rows_in": [], "docs_out": [], "bytes_out": []}
        for pid, path in zip(batch["pid"].to_pylist(), batch["path"].to_pylist()):
            src = pq.read_table(path, columns=_READ_COLS)
            parts = [
                self.stage(src.slice(off, self.sub_batch))
                for off in range(0, max(src.num_rows, 1), self.sub_batch)
            ]
            tok = pa.concat_tables(parts) if parts else TOKENIZED_SCHEMA.empty_table()
            dest = os.path.join(self.index_dir, "tokenized", f"{pid}.parquet")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            tmp = dest + ".tmp"
            pq.write_table(tok, tmp)
            os.replace(tmp, dest)
            out["pid"].append(pid)
            out["path"].append(path)
            out["rows_in"].append(src.num_rows)
            out["docs_out"].append(tok.num_rows)
            out["bytes_out"].append(os.path.getsize(dest))
        return pa.table(out)


def _input_files(source: str) -> list[str]:
    if os.path.isdir(source):
        return sorted(glob.glob(os.path.join(source, "*.parquet")))
    return [source]


def build_index(
    source,
    index_dir: str,
    profile="simple",
    n_shards: int = 16,
    chunk_docs: int = 131072,
    n_salts: int = 1,
    resume: bool = True,
    concurrency: int | None = None,
) -> dict:
    """Build a sharded inverted index under ``index_dir``.

    ``source`` is a parquet file/directory (per-partition checkpointed
    path) or an in-memory ``pyarrow.Table`` / Ray ``Dataset`` (streaming
    path, used by tests and the driver-facing queries).
    Returns the index stats dict (also persisted as index_meta.json).
    """
    import ray.data as rd

    prof = get_profile(profile)
    os.makedirs(index_dir, exist_ok=True)
    manifest = BuildManifest(index_dir)

    # ---- stage: tokenize -------------------------------------------------
    if isinstance(source, str):
        files = _input_files(source)
        pending = [
            (f"p{i:05d}", path)
            for i, path in enumerate(files)
            if not (resume and manifest.partition_done(f"p{i:05d}", path))
        ]
        if pending:
            ctrl = rd.from_items([{"pid": p, "path": f} for p, f in pending])
            pool = max(1, min(concurrency or 8, len(pending)))
            metrics = ctrl.map_batches(
                _TokenizePartition,
                fn_constructor_args=(prof.name, index_dir),
                batch_size=1,
                batch_format="pyarrow",
                concurrency=pool,
                num_cpus=1,
            ).take_all()
            for m in metrics:
                manifest.mark_partition(m["pid"], m["path"], {k: int(v) for k, v in m.items() if k not in ("pid", "path")})
            manifest.invalidate_downstream()
    else:
        if not manifest.stage_done("tokenize_stream"):
            ds = source if hasattr(source, "map_batches") else rd.from_arrow(source)
            tok = ds.map_batches(
                TokenizeStage,
                fn_constructor_args=(prof.name,),
                batch_format="pyarrow",
                concurrency=(1, concurrency or 8),
            )
            shutil.rmtree(os.path.join(index_dir, "tokenized"), ignore_errors=True)
            tok.write_parquet(os.path.join(index_dir, "tokenized"))
            manifest.mark_stage("tokenize_stream")

    tokenized_dir = os.path.join(index_dir, "tokenized")

    # ---- stage: docstats (scalar projection of tokenized) ---------------
    if not manifest.stage_done("docstats"):
        shutil.rmtree(os.path.join(index_dir, "docstats"), ignore_errors=True)
        rd.read_parquet(tokenized_dir, columns=_SCALAR_COLS).write_parquet(
            os.path.join(index_dir, "docstats")
        )
        manifest.mark_stage("docstats")

    # ---- stage: postings (runs → merge shuffle → sharded chunks) --------
    if not manifest.stage_done("postings"):
        tok = rd.read_parquet(
            tokenized_dir, columns=["doc_id", "doc_len", "terms", "tfs", "is_entity"]
        )
        runs = tok.map_batches(
            ExplodeEncodeStage(n_salts=n_salts), batch_format="pyarrow"
        )
        if n_salts > 1:
            runs = runs.groupby(["fold_key", "salt"]).map_groups(
                partial_merge_group, batch_format="pyarrow"
            )
        merger = MergePostingsGroup(
            n_shards=n_shards, chunk_docs=chunk_docs, case_folding=prof.case_folding
        )

        def merge_group(g: pa.Table) -> pa.Table:
            return merger(g)

        chunks = runs.groupby("fold_key").map_groups(merge_group, batch_format="pyarrow")
        shutil.rmtree(os.path.join(index_dir, "postings"), ignore_errors=True)
        chunks.write_parquet(
            os.path.join(index_dir, "postings"), partition_cols=["shard"]
        )
        manifest.mark_stage("postings", {"n_salts": n_salts, "n_shards": n_shards})

    # ---- stage: dictionary ----------------------------------------------
    if not manifest.stage_done("dictionary"):
        chunks_meta = rd.read_parquet(
            os.path.join(index_dir, "postings"),
            columns=["term", "shard", "chunk_idx", "df", "cf"],
        )
        def to_dictionary(t: pa.Table) -> pa.Table:
            t = t.filter(pa.compute.equal(t["chunk_idx"], 0)).drop_columns(["chunk_idx"])
            # hive partition values come back as strings from the read
            sh = pa.compute.cast(t["shard"], pa.int32())
            return t.set_column(t.schema.get_field_index("shard"), "shard", sh)

        dictionary = chunks_meta.map_batches(to_dictionary, batch_format="pyarrow")
        shutil.rmtree(os.path.join(index_dir, "dictionary"), ignore_errors=True)
        dictionary.write_parquet(os.path.join(index_dir, "dictionary"))
        manifest.mark_stage("dictionary")

    # ---- stage: corpus stats + skew metrics -----------------------------
    meta_path = os.path.join(index_dir, "index_meta.json")
    if not manifest.stage_done("stats") or not os.path.exists(meta_path):
        stats = _corpus_stats(index_dir, prof.name, n_shards)
        with open(meta_path + ".tmp", "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(meta_path + ".tmp", meta_path)
        manifest.mark_stage("stats", stats["skew"])
    with open(meta_path) as f:
        return json.load(f)


def _corpus_stats(index_dir: str, profile_name: str, n_shards: int) -> dict:
    """N / total_len / avgdl (reference indexer.py:17-18,50; searcher.py:22)
    plus skew metrics over the dictionary, via local DuckDB scans of the
    small metadata tables."""
    import duckdb

    con = duckdb.connect()
    n_docs, total_len, n_distinct = con.sql(
        f"SELECT count(*), COALESCE(sum(doc_len), 0), count(DISTINCT doc_id) "
        f"FROM read_parquet('{index_dir}/docstats/*.parquet')"
    ).fetchone()
    if n_distinct != n_docs:
        raise RuntimeError(
            f"doc_id hash collision: {n_docs} docs but {n_distinct} distinct ids; "
            "widen doc_id to 128 bits for this corpus"
        )
    n_terms, n_postings, max_df, p99_df = (0, 0, 0, 0)
    top_terms: list = []
    if glob.glob(f"{index_dir}/dictionary/*.parquet"):
        n_terms, n_postings, max_df, p99_df = con.sql(
            f"SELECT count(*), COALESCE(sum(df),0), COALESCE(max(df),0), "
            f"COALESCE(quantile_cont(df, 0.99),0) "
            f"FROM read_parquet('{index_dir}/dictionary/*.parquet')"
        ).fetchone()
        top_terms = [
            list(r)
            for r in con.sql(
                f"SELECT term, df FROM read_parquet('{index_dir}/dictionary/*.parquet') "
                f"ORDER BY df DESC, term LIMIT 10"
            ).fetchall()
        ]
    con.close()
    return {
        "profile": profile_name,
        "n_shards": n_shards,
        "n_docs": int(n_docs),
        "total_len": int(total_len),
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "n_terms": int(n_terms),
        "n_postings": int(n_postings),
        "skew": {
            "max_df": int(max_df),
            "p99_df": float(p99_df),
            "top_terms_by_df": top_terms,
        },
    }


def compute_doc_weights(index_dir: str) -> str:
    """Second corpus pass (reference I6, ``search_engine_2.py:90-105``):
    per-doc Σ(norm_tf·idf10)² with idf10 = log10(N/df).  Emitted once,
    rounded to 3 decimals at the end (the reference rounds after every
    accumulation, an order-dependent quirk we deliberately drop — the
    value only feeds the cosine term whose blend weight is 0).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.codec import decode_postings

    with open(os.path.join(index_dir, "index_meta.json")) as f:
        n_docs = json.load(f)["n_docs"]

    def explode_w2(batch: pa.Table) -> pa.Table:
        ids_all, w2_all = [], []
        for df, run in zip(batch["df"].to_pylist(), batch["run"].to_pylist()):
            ids, tfs, lens = decode_postings(run)
            w = (tfs / lens) * np.log10(n_docs / df)
            ids_all.append(ids)
            w2_all.append(w * w)
        if not ids_all:
            return pa.table({"doc_id": pa.array([], pa.int64()), "w2": pa.array([], pa.float64())})
        ids = np.concatenate(ids_all)
        w2 = np.concatenate(w2_all)
        # partial per-batch pre-aggregation before the groupby shuffle
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq))
        np.add.at(sums, inv, w2)
        return pa.table({"doc_id": pa.array(uniq, pa.int64()), "w2": pa.array(sums)})

    out_dir = os.path.join(index_dir, "doc_weights")
    import shutil as _sh

    _sh.rmtree(out_dir, ignore_errors=True)
    (
        rd.read_parquet(os.path.join(index_dir, "postings"), columns=["df", "run"])
        .map_batches(explode_w2, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("w2", alias_name="doc_weight_sq"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("doc_weight_sq"),
                "doc_weight_sq",
                pa.array(np.floor(t["doc_weight_sq"].to_numpy() * 1000 + 0.5) / 1000),
            ),
            batch_format="pyarrow",
        )
        .write_parquet(out_dir)
    )
    return out_dir
