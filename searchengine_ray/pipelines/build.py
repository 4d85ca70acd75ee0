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
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import range_shift
from ..profiles import get_profile
from ..stages.postings import (
    ExplodeEncodeStage,
    MergeFoldRangeGroup,
    markers_to_cogroup,
    resolve_fold_group,
    surface_partial_agg,
)
from ..stages.tokenize import TOKENIZED_SCHEMA, TokenizeStage
from ..state.manifest import BuildManifest

_SCALAR_COLS = [c for c in TOKENIZED_SCHEMA.names if c not in ("terms", "tfs", "is_entity")]
_READ_COLS = ["conv_id", "turn_idx", "role", "tool", "text"]


class _TokenizePartition:
    """One task per input file: read → tokenize → checkpointed parquet
    parts for tokenized, docstats AND partial posting runs (the
    per-partition posting-run construction happens here, on the same
    stateful actor pool, so the data is exploded/encoded while it is hot
    instead of in a separate read-back job).

    Runs as an actor pool so the reference profile's compiled regex rule
    tables are built once per actor, not once per file.
    """

    def __init__(self, profile_name: str, index_dir: str, n_ranges: int,
                 sub_batch: int = 65536):
        self.stage = TokenizeStage(profile_name)
        self.explode = ExplodeEncodeStage(n_ranges=n_ranges)
        self.index_dir = index_dir
        self.sub_batch = sub_batch
        self.shift = range_shift(n_ranges)

    def _write_by_range(self, sub: str, pid: str, tbl: pa.Table,
                        rng: np.ndarray, dirname: str = "range={u}") -> None:
        """Write ``tbl`` hash-partitioned by doc-id range at the SOURCE,
        so downstream stages (rangemap/docmap, posting merge) are
        shuffle-free per-range maps — moving payload through a groupby
        cost more than the rest of those stages combined.  Layout:
        {sub}/<dirname>/{pid}.parquet."""
        import glob as _glob

        for stale in _glob.glob(
            os.path.join(self.index_dir, sub, "*", f"{pid}.parquet")
        ):
            os.remove(stale)
        order = np.argsort(rng, kind="stable")
        tbl = tbl.take(pa.array(order))
        rs = rng[order]
        uniq, starts = np.unique(rs, return_index=True)
        bounds = np.append(starts, len(rs))
        for u, s, e in zip(uniq, bounds[:-1], bounds[1:]):
            dest = os.path.join(
                self.index_dir, sub, dirname.format(u=int(u)), f"{pid}.parquet"
            )
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            pq.write_table(tbl.slice(s, e - s), dest + ".tmp")
            os.replace(dest + ".tmp", dest)

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
            # side outputs while the table is hot: docstats projection and
            # the partition's encoded posting runs, both range-partitioned
            self._write_by_range(
                "docstats", pid, tok.select(_SCALAR_COLS),
                (tok["doc_id"].to_numpy() >> self.shift).astype(np.int32),
            )
            runs = self.explode(tok)
            # non-hive dir names (rNNNN): the range column stays INSIDE
            # the run files (the streaming fallback filters on it), so
            # hive-style names would make readers infer a duplicate column
            self._write_by_range("runs", pid, runs, runs["range"].to_numpy(),
                                 dirname="r{u:04d}")
            # per-pid surface partials, aggregated while the runs are hot:
            # the resolution job reads these few small files instead of
            # re-scanning every (pid, range) run file for metadata
            from ..stages.postings import surface_partial_agg as _spa

            meta_dest = os.path.join(self.index_dir, "runs_meta", f"{pid}.parquet")
            os.makedirs(os.path.dirname(meta_dest), exist_ok=True)
            pq.write_table(_spa(runs), meta_dest + ".tmp")
            os.replace(meta_dest + ".tmp", meta_dest)
            out["pid"].append(pid)
            out["path"].append(path)
            out["rows_in"].append(src.num_rows)
            out["docs_out"].append(tok.num_rows)
            out["bytes_out"].append(os.path.getsize(dest))
        return pa.table(out)


_TOK_CACHE: dict = {}


def _tokenize_partition_task(batch: pa.Table, profile_name: str,
                             index_dir: str, n_ranges: int) -> pa.Table:
    """Task-form tokenize partition: the stage object (compiled rule
    tables for the reference profile) is cached per worker PROCESS, so
    repeated tasks on a reused Ray worker pay construction once —
    actor-pool semantics without actor-spawn cost."""
    key = (profile_name, index_dir, n_ranges)
    tp = _TOK_CACHE.get(key)
    if tp is None:
        _TOK_CACHE.clear()  # one build at a time per worker; don't pile up
        tp = _TOK_CACHE[key] = _TokenizePartition(profile_name, index_dir, n_ranges)
    return tp(batch)


def _input_files(source: str) -> list[str]:
    if os.path.isdir(source):
        return sorted(glob.glob(os.path.join(source, "*.parquet")))
    return [source]


def build_index(
    source,
    index_dir: str,
    profile="simple",
    n_shards: int = 16,
    chunk_docs: int | None = None,
    n_ranges: int = 32,
    resume: bool = True,
    concurrency: int | None = None,
) -> dict:
    """Build a sharded inverted index under ``index_dir``.

    ``source`` is a parquet file/directory (per-partition checkpointed
    path) or an in-memory ``pyarrow.Table`` / Ray ``Dataset`` (streaming
    path, used by tests and the driver-facing queries).
    Returns the index stats dict (also persisted as index_meta.json).
    """
    import time as _time

    import ray.data as rd

    prof = get_profile(profile)
    os.makedirs(index_dir, exist_ok=True)
    manifest = BuildManifest(index_dir)
    stage_sec: dict[str, float] = {}
    _t0 = _time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        stage_sec[stage] = round(now - _t0, 3)
        _t0 = now

    # ---- stage: tokenize -------------------------------------------------
    if isinstance(source, str):
        files = _input_files(source)
        current = {f"p{i:05d}": path for i, path in enumerate(files)}
        # removed/renamed inputs shift the positional pids: drop stale
        # records + ghost checkpoint parts before anything globs them
        manifest.reconcile(current)
        pending = [
            (pid, path)
            for pid, path in current.items()
            if not (resume and manifest.partition_done(pid, path))
        ]
        if pending:
            ctrl = rd.from_items([{"pid": p, "path": f} for p, f in pending])
            pool = max(1, min(concurrency or 8, len(pending)))
            # plain tasks on the shared worker pool for BOTH profiles:
            # stage construction is ~5 ms even for the reference rule
            # tables (measured), and the per-process cache below makes it
            # once per worker — while a dedicated actor pool pays a fresh
            # process + package import per actor (seconds of spawn for a
            # stage whose real compute is ~250 ms/file)
            metrics = ctrl.map_batches(
                _tokenize_partition_task, batch_size=1, batch_format="pyarrow",
                num_cpus=1, concurrency=pool,
                fn_kwargs={"profile_name": prof.name, "index_dir": index_dir,
                           "n_ranges": n_ranges},
            ).take_all()
            for m in metrics:
                manifest.mark_partition(m["pid"], m["path"], {k: int(v) for k, v in m.items() if k not in ("pid", "path")})
            manifest.invalidate_downstream()
        _mark("tokenize")
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
        _mark("tokenize")

    tokenized_dir = os.path.join(index_dir, "tokenized")

    # ---- stage: docstats ------------------------------------------------
    # (partitioned builds emit docstats parts alongside tokenize; the
    # streaming path needs the explicit projection job).  Both paths
    # hash-partition by doc-id range — the key every downstream stage
    # (rangemap, docmap, merge) already uses — so those stages are
    # shuffle-free per-range maps.
    if not isinstance(source, str) and not manifest.stage_done("docstats"):
        shift = range_shift(n_ranges)

        def add_range(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            return t.append_column(
                "range", pa.array((ids >> shift).astype(np.int32), pa.int32())
            )

        shutil.rmtree(os.path.join(index_dir, "docstats"), ignore_errors=True)
        rd.read_parquet(tokenized_dir, columns=_SCALAR_COLS).map_batches(
            add_range, batch_format="pyarrow"
        ).write_parquet(os.path.join(index_dir, "docstats"), partition_cols=["range"])
        manifest.mark_stage("docstats")

    # ---- stage: runs ----------------------------------------------------
    # (partitioned builds emit run parts in the tokenize task; the
    # streaming path builds them in an explicit job)
    runs_dir = os.path.join(index_dir, "runs")
    if not isinstance(source, str) and not manifest.stage_done("runs"):
        tok = rd.read_parquet(
            tokenized_dir, columns=["doc_id", "doc_len", "terms", "tfs", "is_entity"]
        )
        shutil.rmtree(runs_dir, ignore_errors=True)
        tok.map_batches(
            ExplodeEncodeStage(n_ranges=n_ranges), batch_format="pyarrow"
        ).write_parquet(runs_dir)
        manifest.mark_stage("runs", {"n_ranges": n_ranges})

    # ---- stage: rangemap + docmap ---------------------------------------
    # One pass over docstats builds BOTH dense-id artifacts: the per-range
    # sorted id lists (rangemap — the merge stage's hash→dense translation)
    # and the doc_id-sorted serving table (docmap — one file per range,
    # small row groups, so query-time doc lookups read only the row groups
    # holding the final top-k ranks instead of the whole forward table).
    # Because docstats is already hash-partitioned by range, this is a
    # SHUFFLE-FREE map: one task per range reads only its partition's
    # files (no payload ever moves through a groupby).
    rangemap_dir = os.path.join(index_dir, "rangemap")
    docmap_dir = os.path.join(index_dir, "docmap")
    offsets_path = os.path.join(index_dir, "range_offsets.json")
    if not manifest.stage_done("rangemap"):
        from ..functions.codec import varbyte_encode
        from ..state.index_store import DOCMAP_ROW_GROUP

        docstats_dir = os.path.join(index_dir, "docstats")

        def encode_range_task(batch: pa.Table) -> pa.Table:
            out = {"range": [], "n": [], "total_len": []}
            for rng in batch["range"].to_pylist():
                files = glob.glob(
                    os.path.join(docstats_dir, f"range={rng}", "*.parquet")
                )
                if not files:
                    continue
                g = pa.concat_tables([pq.read_table(f) for f in files])
                order = np.argsort(g["doc_id"].to_numpy())
                g = g.take(pa.array(order))
                ids = g["doc_id"].to_numpy()
                if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
                    # ranges partition the id space, so a within-range
                    # duplicate IS a global collision
                    raise RuntimeError(
                        "doc_id hash collision detected; widen doc_id to "
                        "128 bits for this corpus"
                    )
                deltas = np.empty(len(ids), dtype=np.uint64)
                deltas[0] = ids[0]
                deltas[1:] = np.diff(ids).astype(np.uint64)
                # docmap side output while the sorted table is hot:
                # serving rows in dense-rank order, rank column carried
                # for row-group pruned point reads
                dm = g.append_column(
                    "rank", pa.array(np.arange(len(ids), dtype=np.int64))
                )
                dest = os.path.join(docmap_dir, f"r{rng:04d}.parquet")
                pq.write_table(dm, dest + ".tmp", row_group_size=DOCMAP_ROW_GROUP)
                os.replace(dest + ".tmp", dest)
                # rangemap side output, one DETERMINISTIC file per range:
                # the merge task point-reads rangemap/rNNNN.parquet instead
                # of filtering a pyarrow dataset (whose footer/statistics
                # machinery costs ~100-300 ms per task, dominating the
                # merge of small ranges)
                rm_dest = os.path.join(rangemap_dir, f"r{rng:04d}.parquet")
                pq.write_table(
                    pa.table(
                        {
                            "range": pa.array([rng], pa.int32()),
                            "ids_blob": pa.array(
                                [varbyte_encode(deltas).tobytes()],
                                pa.large_binary(),
                            ),
                        }
                    ),
                    rm_dest + ".tmp",
                )
                os.replace(rm_dest + ".tmp", rm_dest)
                out["range"].append(rng)
                out["n"].append(len(ids))
                out["total_len"].append(int(g["doc_len"].to_numpy().sum()))
            return pa.table(
                {
                    "range": pa.array(out["range"], pa.int32()),
                    "n": pa.array(out["n"], pa.int64()),
                    "total_len": pa.array(out["total_len"], pa.int64()),
                }
            )

        shutil.rmtree(rangemap_dir, ignore_errors=True)
        shutil.rmtree(docmap_dir, ignore_errors=True)
        os.makedirs(docmap_dir, exist_ok=True)
        os.makedirs(rangemap_dir, exist_ok=True)
        meta_rows = (
            rd.from_items([{"range": r} for r in range(n_ranges)])
            .map_batches(encode_range_task, batch_size=1, batch_format="pyarrow",
                         num_cpus=1,
                         **({"concurrency": concurrency} if concurrency else {}))
            .take_all()
        )
        counts = {r["range"]: r["n"] for r in meta_rows}
        total_len = int(sum(r["total_len"] for r in meta_rows))
        offsets = []
        acc = 0
        for rng_id in range(n_ranges):
            offsets.append(acc)
            acc += counts.get(rng_id, 0)
        with open(offsets_path + ".tmp", "w") as f:
            json.dump(
                {"offsets": offsets, "n_ranges": n_ranges, "n_docs": acc,
                 "total_len": total_len,
                 "docmap_row_group": DOCMAP_ROW_GROUP},
                f,
            )
        os.replace(offsets_path + ".tmp", offsets_path)
        manifest.mark_stage("rangemap", {"n_ranges": n_ranges})
    with open(offsets_path) as f:
        _off_payload = json.load(f)
        range_offsets = _off_payload["offsets"]
    if chunk_docs is None:
        # adaptive default: target ~64 block-max chunks for a term that
        # spans the whole corpus, so WAND/cold reads have skippable units
        # even at bench-sized corpora; capped at 262144 (the fixed chunk
        # size at the 10^12-doc design point, where every term has
        # thousands of chunks regardless).  Floor 4096 keeps per-chunk
        # metadata rows from outnumbering postings on tiny corpora.
        _nd = _off_payload.get("n_docs")
        chunk_docs = 262144 if _nd is None else int(
            min(262144, max(4096, 1 << int(np.ceil(np.log2(max(_nd / 64, 1))))))
        )
    _mark("rangemap_docmap")

    # ---- stage: postings (distributed resolve → (fold_key, range) merge)
    if not manifest.stage_done("postings"):
        # cap block count: the groupby sort creates map×reduce shuffle
        # objects, so hundreds of small blocks make it coordination-bound
        n_blocks = 2 * (concurrency or 8)

        # global case/entity resolution — metadata-only columns, fully
        # distributed (per-batch combiner → fold_key groupby); no
        # vocabulary-sized structure ever touches the driver.  Profiles
        # with neither case folding nor the entity rule (simple family)
        # resolve every surface to itself — the whole job is an identity
        # map, so it is SKIPPED (at a realistic vocabulary the fold_key
        # groupby is the only remaining all-to-all; not running it is
        # worth seconds per 100k turns)
        case_folding = prof.case_folding
        needs_resolution = prof.case_folding or prof.entity_rule

        def resolve_group(g: pa.Table) -> pa.Table:
            return resolve_fold_group(g, case_folding=case_folding)

        # job 1 — global surface resolution over runs METADATA only
        # (vocabulary-sized; the ONLY shuffle left in the build): partial
        # agg → fold_key groupby → marker rows written partitioned by
        # range so the merge tasks can read exactly their slice
        markers_dir = os.path.join(index_dir, "res_markers")
        shutil.rmtree(markers_dir, ignore_errors=True)
        if needs_resolution:
            if glob.glob(os.path.join(index_dir, "runs_meta", "*.parquet")):
                # partitioned path: per-pid partials were written by the
                # tokenize tasks while the runs were hot
                partials = rd.read_parquet(os.path.join(index_dir, "runs_meta"))
            else:
                # streaming path: derive partials from the flat run files
                partials = rd.read_parquet(
                    runs_dir,
                    columns=["fold_key", "surface", "is_cap", "is_entity", "df",
                             "doc_min", "range"],
                    override_num_blocks=n_blocks,
                ).map_batches(surface_partial_agg, batch_format="pyarrow")
            (
                partials.groupby("fold_key")
                .map_groups(resolve_group, batch_format="pyarrow")
                .map_batches(markers_to_cogroup, batch_format="pyarrow")
                .map_batches(lambda t: t.drop_columns(["run"]), batch_format="pyarrow")
                .write_parquet(markers_dir, partition_cols=["range"])
            )

        # job 2 — the merge itself, SHUFFLE-FREE: runs are already
        # hash-partitioned by range at the tokenize source, so one task
        # per range reads its runs + markers directly and merges the
        # whole range in one vectorized pass (decode-all → (term, doc)
        # lexsort → reduceat → segmented encode; memory bounded by range
        # size — the n_ranges knob).  The payload never moves through a
        # groupby, and there is no per-term Python.
        def merge_range_task(batch: pa.Table) -> pa.Table:
            import pyarrow.dataset as pads

            from ..functions.codec import varbyte_decode
            from ..stages.postings import CHUNKS_SCHEMA, merge_range_table

            outs = []
            for rng in batch["range"].to_pylist():
                rfiles = glob.glob(os.path.join(runs_dir, f"r{rng:04d}", "*.parquet"))
                rcols = ["surface", "df", "run"]
                if rfiles:
                    runs_tbl = pa.concat_tables(
                        [pq.read_table(f, columns=rcols) for f in rfiles]
                    )
                else:
                    # streaming layout: flat run files carry a range column
                    flat = glob.glob(os.path.join(runs_dir, "*.parquet"))
                    if not flat:
                        continue
                    runs_tbl = pads.dataset(flat).to_table(
                        columns=rcols, filter=pads.field("range") == rng,
                    )
                if runs_tbl.num_rows == 0:
                    continue
                mfiles = glob.glob(
                    os.path.join(markers_dir, f"range={rng}", "*.parquet")
                )
                mk = (
                    pa.concat_tables(
                        [pq.read_table(f, columns=["surface", "term", "dropped"])
                         for f in mfiles]
                    )
                    if mfiles else None
                )
                rm_path = os.path.join(rangemap_dir, f"r{rng:04d}.parquet")
                if os.path.exists(rm_path):  # deterministic per-range file
                    rm = pq.read_table(rm_path, columns=["ids_blob"])
                else:  # legacy layout: Ray-written parts with a range column
                    rm = pads.dataset(rangemap_dir).to_table(
                        filter=pads.field("range") == rng
                    )
                deltas = varbyte_decode(
                    np.frombuffer(rm["ids_blob"][0].as_py(), np.uint8)
                )
                sorted_ids = np.cumsum(deltas, dtype=np.uint64).astype(np.int64)
                outs.append(merge_range_table(
                    runs_tbl, mk, rng, n_shards, chunk_docs,
                    sorted_ids=sorted_ids, range_offset=range_offsets[rng],
                ))
            return pa.concat_tables(outs) if outs else CHUNKS_SCHEMA.empty_table()

        shutil.rmtree(os.path.join(index_dir, "postings"), ignore_errors=True)
        (
            rd.from_items([{"range": r} for r in range(n_ranges)])
            .map_batches(merge_range_task, batch_size=1, batch_format="pyarrow",
                         num_cpus=1,
                         **({"concurrency": concurrency} if concurrency else {}))
            .write_parquet(os.path.join(index_dir, "postings"),
                           partition_cols=["shard"])
        )
        manifest.mark_stage(
            "postings", {"n_ranges": n_ranges, "n_shards": n_shards}
        )
    _mark("postings")

    # ---- stage: compact + dictionary ------------------------------------
    # The merge writes one part file per (range task × shard): correct,
    # but a cold term read then opens every part in its shard (n_ranges
    # footers + scans per term).  One task per shard rewrites its chunk
    # rows TERM-SORTED into a single file with small row groups, so a
    # cold term fetch is one footer + a stats-pruned row-group read.
    # The same pass computes the shard's dictionary rows (a term lives in
    # exactly one crc32 shard, so per-shard term aggregates are final) —
    # no separate vocabulary re-scan.  At 10^12-posting scale each shard
    # task streams its own files only (shard count scales with corpus)
    # and would roll over to size-bounded sorted files.
    if not manifest.stage_done("dictionary"):
        from ..state.index_store import COMPACT_ROW_GROUP, DICT_SCHEMA, dict_shard_path

        postings_root = os.path.join(index_dir, "postings")
        dict_dir = os.path.join(index_dir, "dictionary")

        def compact_shard_task(batch: pa.Table) -> pa.Table:
            """Compact one posting shard AND write its dictionary slice
            as ``dictionary/sNNNNN.parquet`` — one file per crc32 term
            shard, so query-time readers can load exactly the shards
            their terms hash to (lazy + memoized per serving actor, the
            10^12-turn design point named by round-2 BASELINE).  Output
            rows are metadata-sized (shard, n_terms) markers."""
            import pyarrow.compute as _pc

            shards_done, terms_done = [], []
            for shard in batch["shard"].to_pylist():
                sdir = os.path.join(postings_root, f"shard={shard}")
                cpath = os.path.join(sdir, "compact.parquet")
                parts = [
                    f for f in glob.glob(os.path.join(sdir, "*.parquet"))
                    if os.path.basename(f) != "compact.parquet"
                ]
                # Retry/crash safety: compact.parquet is written by an
                # atomic os.replace AFTER reading every part, and the
                # postings stage rmtree's the dir before writing fresh
                # parts — so an existing compact is always complete and
                # authoritative.  A retry that lands mid part-deletion
                # must NOT rebuild from the surviving subset.
                if os.path.exists(cpath):
                    for f in parts:
                        os.remove(f)
                    tbl = pq.read_table(cpath, columns=["term", "df_chunk", "cf_chunk"])
                elif parts:
                    tbl = pa.concat_tables([pq.read_table(f) for f in parts])
                    order = _pc.sort_indices(
                        tbl,
                        sort_keys=[("term", "ascending"), ("chunk_idx", "ascending")],
                    )
                    tbl = tbl.take(order)
                    pq.write_table(tbl, cpath + ".tmp",
                                   row_group_size=COMPACT_ROW_GROUP)
                    os.replace(cpath + ".tmp", cpath)
                    for f in parts:
                        os.remove(f)
                else:
                    continue
                g = tbl.group_by("term").aggregate(
                    [("df_chunk", "sum"), ("cf_chunk", "sum")]
                )
                slice_tbl = pa.table({
                    "term": g["term"],
                    "df": g["df_chunk_sum"].cast(pa.int64()),
                    "cf": g["cf_chunk_sum"].cast(pa.int64()),
                    "shard": pa.array(
                        np.full(g.num_rows, shard, np.int32), pa.int32()
                    ),
                })
                dpath = dict_shard_path(dict_dir, shard)
                pq.write_table(slice_tbl, dpath + ".tmp")
                os.replace(dpath + ".tmp", dpath)  # same atomicity as compact
                shards_done.append(shard)
                terms_done.append(g.num_rows)
            return pa.table({
                "shard": pa.array(shards_done, pa.int64()),
                "n_terms": pa.array(terms_done, pa.int64()),
            })

        shutil.rmtree(dict_dir, ignore_errors=True)
        os.makedirs(dict_dir, exist_ok=True)
        written = (
            rd.from_items([{"shard": s} for s in range(n_shards)])
            .map_batches(compact_shard_task, batch_size=1, batch_format="pyarrow",
                         num_cpus=1,
                         **({"concurrency": concurrency} if concurrency else {}))
            .count()  # metadata-sized marker rows drive execution
        )
        if written == 0:
            # degenerate empty corpus: keep the dir a readable dataset
            pq.write_table(DICT_SCHEMA.empty_table(),
                           dict_shard_path(dict_dir, 0))
        manifest.mark_stage("dictionary")
    _mark("dictionary")

    # streaming builds drop the runs intermediate (resume restarts from
    # tokenized); partitioned builds keep run parts — they are the
    # per-partition checkpoints a partial re-run reuses
    if not isinstance(source, str) and manifest.stage_done("dictionary"):
        shutil.rmtree(runs_dir, ignore_errors=True)

    # ---- stage: corpus stats + skew metrics -----------------------------
    meta_path = os.path.join(index_dir, "index_meta.json")
    if not manifest.stage_done("stats") or not os.path.exists(meta_path):
        stats = _corpus_stats(index_dir, prof.name, n_shards)
        with open(meta_path + ".tmp", "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(meta_path + ".tmp", meta_path)
        manifest.mark_stage("stats", stats["skew"])
    _mark("stats")
    with open(meta_path) as f:
        out = json.load(f)
    out["stage_sec"] = stage_sec  # in-memory only: per-run wall times
    return out


def _corpus_stats(index_dir: str, profile_name: str, n_shards: int) -> dict:
    """N / total_len / avgdl (reference indexer.py:17-18,50; searcher.py:22)
    plus skew metrics over the dictionary, via local DuckDB scans of the
    small metadata tables."""
    import duckdb

    con = duckdb.connect()
    # corpus totals come from range_offsets.json — the rangemap tasks
    # already summed doc_len and checked id uniqueness per range while
    # they had the rows in hand, so no full docstats scan happens here
    # (legacy index dirs that predate the json keys fall back to the old
    # rangemap metadata scan)
    with open(os.path.join(index_dir, "range_offsets.json")) as f:
        _payload = json.load(f)
    n_docs, total_len = _payload.get("n_docs"), _payload.get("total_len")
    if n_docs is None or total_len is None:
        n_docs, total_len = con.sql(
            f"SELECT COALESCE(sum(n), 0), COALESCE(sum(total_len), 0) "
            f"FROM read_parquet('{index_dir}/rangemap/*.parquet')"
        ).fetchone()
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
        "dense_ids": True,
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


# per-process cache of one posting shard's dictionary slice (the
# shard-aligned join path of compute_doc_weights): a worker touches only
# the shards whose postings files it maps, so memory stays ~vocab/n_shards.
# Keys carry a driver-computed dictionary VERSION (file names/sizes/mtimes)
# so a long-lived worker never serves a stale df map after the index at
# the same path is rebuilt or incrementally extended; entries for other
# versions of the same dict_dir are evicted on insert and the cache is
# LRU-capped across distinct index dirs.
_DICT_SHARD_CACHE: "OrderedDict" = OrderedDict()
_DICT_SHARD_CACHE_MAX = 8


def _dict_dir_version(dict_dir: str) -> str:
    """Cheap content fingerprint of a dictionary directory: sorted
    (relpath, size, mtime_ns) of its parquet files.  Computed ONCE on the
    driver per pass — workers only compare the token.  Uses a stable
    digest, NOT built-in ``hash()``: that is PYTHONHASHSEED-salted per
    process, so identical content would version differently across driver
    runs and evict every long-lived worker's cache each time."""
    import hashlib

    import pyarrow.dataset as pads

    ents = []
    for f in pads.dataset(dict_dir).files:
        st = os.stat(f)
        ents.append((os.path.relpath(f, dict_dir), st.st_size, st.st_mtime_ns))
    blob = "\n".join(f"{p}\t{s}\t{m}" for p, s, m in sorted(ents))
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def _dict_shard_df(dict_dir: str, shard: int, version: str) -> dict:
    key = (dict_dir, version, shard)
    hit = _DICT_SHARD_CACHE.get(key)
    if hit is not None:
        _DICT_SHARD_CACHE.move_to_end(key)
        return hit
    import pyarrow.dataset as pads

    t = pads.dataset(dict_dir).to_table(
        columns=["term", "df"], filter=pads.field("shard") == shard
    )
    for k in [k for k in _DICT_SHARD_CACHE if k[0] == dict_dir and k[1] != version]:
        del _DICT_SHARD_CACHE[k]
    while len(_DICT_SHARD_CACHE) >= _DICT_SHARD_CACHE_MAX:
        _DICT_SHARD_CACHE.popitem(last=False)
    _DICT_SHARD_CACHE[key] = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
    return _DICT_SHARD_CACHE[key]


def compute_doc_weights(index_dir: str, driver_cap: int | None = None) -> str:
    """Second corpus pass (reference I6, ``search_engine_2.py:90-105``):
    per-doc Σ(norm_tf·idf10)² with idf10 = log10(N/df).  Emitted once,
    rounded to 3 decimals at the end (the reference rounds after every
    accumulation, an order-dependent quirk we deliberately drop — the
    value only feeds the cosine term whose blend weight is 0).

    Up to ``driver_cap`` dictionary rows (default
    ``$GRAFT_DF_BROADCAST_CAP`` or 2M) the term→df map is one
    ``ray.put`` broadcast.  Beyond it — the 10^12-turn vocabulary the
    round-2 BASELINE TODO named — the pass becomes a SHARD-ALIGNED
    MAP-SIDE JOIN with zero extra shuffle: postings are already
    hive-partitioned by the crc32 term shard and a term's dictionary
    row lives in exactly that shard, so each batch loads (per-process
    cached) only its own shard's dictionary slice.  Per-worker memory
    is ~vocab/n_shards, and n_shards scales with the corpus."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.codec import decode_postings

    with open(os.path.join(index_dir, "index_meta.json")) as f:
        n_docs = json.load(f)["n_docs"]
    import ray

    from ..functions.limits import df_broadcast_cap

    driver_cap = df_broadcast_cap(driver_cap)
    dict_dir = os.path.join(index_dir, "dictionary")
    use_join = pads.dataset(dict_dir).count_rows() > driver_cap
    if use_join:
        df_ref = None
        dict_version = _dict_dir_version(dict_dir)
    else:
        dict_version = 0
        dic = pads.dataset(dict_dir).to_table(columns=["term", "df"])
        # term → global df lookup: ray.put ONCE into the object store and
        # fetched zero-copy-shared per worker — not a closure dict
        # re-pickled into every task
        df_ref = ray.put(dict(zip(dic["term"].to_pylist(), dic["df"].to_pylist())))

    def explode_w2(batch: pa.Table) -> pa.Table:
        if df_ref is not None:
            df_of = ray.get(df_ref).__getitem__
        else:
            shards = np.unique(batch["shard"].to_numpy())
            maps = [_dict_shard_df(dict_dir, int(s), dict_version) for s in shards]

            def df_of(term, _maps=maps):
                for m in _maps:  # almost always exactly one shard per batch
                    if term in m:
                        return m[term]
                raise KeyError(term)

        ids_all, w2_all = [], []
        for df, run in zip(
            (df_of(t) for t in batch["term"].to_pylist()), batch["run"].to_pylist()
        ):
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
    cols = ["term", "run"] + (["shard"] if use_join else [])
    (
        rd.read_parquet(os.path.join(index_dir, "postings"), columns=cols)
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
