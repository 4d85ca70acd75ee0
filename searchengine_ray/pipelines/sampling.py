"""Training-mix operators: deterministic sampling and sequence packing.

- ``stratified_sample``: per-source sampling rates applied with a
  DETERMINISTIC keep rule — an affine hash of doc_id compared against
  the rate — so the sample is reproducible, join-free, and exactly
  reproducible in SQL (no RNG state anywhere).  This is the data-mixing
  primitive of a pretraining pipeline: one pass, no shuffle.

- ``pack_sequences``: greedy token-budget packing (which context-window
  "bin" each doc lands in when concatenating docs in doc_id order).
  The bin index needs the GLOBAL running token count — a prefix scan.
  Distributed shape: per-block partial sums (one small row per block)
  are collected, exclusive offsets are broadcast back, and each block
  assigns bins locally — the classic two-phase scan, so no stage ever
  sees more than its own block plus a block-count-sized offsets array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import SAMPLE_A, SAMPLE_M


def stratified_sample(sf_dir: str, fracs: dict[str, float], default: float = 0.0):
    """→ Dataset (doc_id, source) of docs kept by per-source rates.

    keep iff (doc_id * SAMPLE_A) mod 2^32 < frac(source) * 2^32 — the
    deterministic twin of a Bernoulli sample, exactly reproducible in
    SQL and stable under re-runs/resumes."""
    import ray.data as rd

    fracs = dict(fracs)

    def flt(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        src = t["source"].to_numpy(zero_copy_only=False)
        h = (ids * np.uint64(SAMPLE_A)) % np.uint64(SAMPLE_M)
        uniq, inv = np.unique(src, return_inverse=True)
        thresh = np.array(
            [int(fracs.get(s, default) * SAMPLE_M) for s in uniq.tolist()],
            dtype=np.uint64,
        )
        keep = h < thresh[inv]
        return t.filter(pa.array(keep)).select(["doc_id", "source"])

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return ds.map_batches(flt, batch_format="pyarrow")


def _count_tokens_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens) only — the token-count half of quality scoring
    without paying for the stopword/punct/quality work."""
    from .analysis import row_token_counts

    return pa.table(
        {"doc_id": batch["doc_id"],
         "n_tokens": pa.array(row_token_counts(batch), pa.int64())}
    )


def pack_sequences(sf_dir: str, budget: int = 512):
    """→ Dataset (doc_id, n_tokens, bin) — greedy concatenation-order
    packing: docs in doc_id order fill context windows of ``budget``
    tokens; a doc's bin = floor(exclusive-prefix-sum / budget).

    Two-phase distributed scan, with blocks staying in the object store
    throughout: phase 1 fetches only one (count, sum) pair per block;
    phase 2 ships each block its exclusive offset and assigns bins in a
    remote task.  The driver holds a block-count-sized offsets array —
    never the table."""
    import ray
    import ray.data as rd

    # token counts per doc, sorted blocks by doc_id (the sort keeps
    # blocks range-partitioned: block i holds smaller ids than block i+1)
    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_count_tokens_batch, batch_format="pyarrow")
        .sort("doc_id")
    )
    refs = counts.to_arrow_refs()
    if not refs:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "bin": pa.array([], pa.int64())})
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("bin", pa.int64())]
    )

    @ray.remote
    def block_sum(tbl: pa.Table) -> int:
        # Ray's sort can emit schema-LESS empty blocks (no columns at all)
        if tbl.num_rows == 0 or "n_tokens" not in tbl.schema.names:
            return 0
        return int(np.sum(tbl["n_tokens"].to_numpy()))

    @ray.remote
    def assign_bins(tbl: pa.Table, offset: int) -> pa.Table:
        if tbl.num_rows == 0 or "n_tokens" not in tbl.schema.names:
            return out_schema.empty_table()
        n = tbl["n_tokens"].to_numpy()
        excl = offset + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
                "bin": pa.array((excl // budget).astype(np.int64), pa.int64()),
            }
        )

    # phase 1: per-block sums only (ints) leave the object store
    sums = np.array(ray.get([block_sum.remote(r) for r in refs]), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if len(sums) else sums
    # phase 2: block-local assignment, results stay distributed
    out_refs = [assign_bins.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def _budget_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, source, n_tokens, hkey) rows — the sampling key is the
    same affine hash as ``stratified_sample``, so the per-source order
    is a deterministic shuffle both engines reproduce exactly."""
    from .analysis import row_token_counts

    ids = batch["doc_id"].to_numpy().astype(np.uint64)
    h = ((ids * np.uint64(SAMPLE_A)) % np.uint64(SAMPLE_M)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "n_tokens": pa.array(row_token_counts(batch), pa.int64()),
            "hkey": pa.array(h, pa.int64()),
        }
    )


def budget_sample(sf_dir: str, budgets: dict[str, int], default: int = 0):
    """Token-budget mixture sampling — the domain-mixing primitive that
    fills per-source TOKEN quotas instead of per-doc rates: docs stream
    in deterministic affine-hash order within their source, and a doc
    is kept iff the tokens taken from its source BEFORE it (exclusive
    prefix sum) are still under the source's budget.  → Dataset
    (doc_id, source, n_tokens) of the sampled mix.

    Distributed as an ordered per-source prefix scan, the
    ``pack_sequences`` two-phase shape generalized to keyed segments:
    sort on (source, hkey, doc_id) leaves each source contiguous and
    ordered across blocks; phase 1 fetches one (source, sum) row per
    block-segment; the driver folds those into per-(block, source)
    exclusive offsets (a blocks × sources-touched array, never data);
    phase 2 assigns keeps block-locally.  Blocks stay in the object
    store throughout."""
    import ray
    import ray.data as rd

    budgets = dict(budgets)
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("n_tokens", pa.int64())]
    )
    rows = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "text"])
        .map_batches(_budget_rows, batch_format="pyarrow")
        .sort(["source", "hkey", "doc_id"])
    )
    refs = rows.to_arrow_refs()
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    @ray.remote
    def segment_sums(tbl: pa.Table) -> list[tuple[str, int]]:
        # Ray's sort can emit schema-LESS empty blocks (no columns at all)
        if tbl.num_rows == 0 or "source" not in tbl.schema.names:
            return []
        src = tbl["source"].to_numpy(zero_copy_only=False)
        n = tbl["n_tokens"].to_numpy()
        out: list[tuple[str, int]] = []
        if len(src):
            bounds = np.r_[0, np.flatnonzero(src[1:] != src[:-1]) + 1, len(src)]
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                out.append((str(src[lo]), int(n[lo:hi].sum())))
        return out

    @ray.remote
    def assign_keep(tbl: pa.Table, offsets: dict[str, int]) -> pa.Table:
        if tbl.num_rows == 0 or "source" not in tbl.schema.names:
            return out_schema.empty_table()
        src = tbl["source"].to_numpy(zero_copy_only=False)
        n = tbl["n_tokens"].to_numpy().astype(np.int64)
        keep = np.zeros(len(src), dtype=bool)
        if len(src):
            bounds = np.r_[0, np.flatnonzero(src[1:] != src[:-1]) + 1, len(src)]
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                s = str(src[lo])
                excl = offsets.get(s, 0) + np.cumsum(n[lo:hi]) - n[lo:hi]
                keep[lo:hi] = excl < budgets.get(s, default)
        return tbl.filter(pa.array(keep)).select(
            ["doc_id", "source", "n_tokens"])

    # phase 1: one (source, sum) row per block-segment leaves the store
    sums = ray.get([segment_sums.remote(r) for r in refs])
    running: dict[str, int] = {}
    offsets_per_block: list[dict[str, int]] = []
    for segs in sums:
        offsets_per_block.append(
            {s: running.get(s, 0) for s, _ in segs}
        )
        for s, tot in segs:
            running[s] = running.get(s, 0) + tot
    # phase 2: block-local keep assignment, results stay distributed
    out_refs = [assign_keep.remote(r, off)
                for r, off in zip(refs, offsets_per_block)]
    return rd.from_arrow_refs(out_refs)
