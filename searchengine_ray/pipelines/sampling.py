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

from .analysis import quality_batch

# affine-hash sampling constants (public, arbitrary odd multiplier; the
# modulus is a power of two so the SQL twin is exact integer math)
SAMPLE_A = 2654435761  # Knuth multiplicative constant
SAMPLE_M = 1 << 32


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


def pack_sequences(sf_dir: str, budget: int = 512) -> pa.Table:
    """→ (doc_id, n_tokens, bin) — greedy concatenation order packing:
    docs in doc_id order fill context windows of ``budget`` tokens; a
    doc's bin = floor(exclusive-prefix-sum / budget).

    Two-phase distributed scan: phase 1 computes per-block token sums
    (tiny), phase 2 broadcasts the exclusive block offsets and assigns
    bins block-locally."""
    import ray
    import ray.data as rd

    # token counts per doc, sorted blocks by doc_id (sort keeps blocks
    # range-partitioned: block i holds smaller ids than block i+1)
    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            lambda t: quality_batch(t).select(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
        )
        .sort("doc_id")
    )
    blocks = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    if not blocks:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "bin": pa.array([], pa.int64())})
    # phase 1: per-block sums (block-count-sized driver work)
    sums = np.array([int(np.sum(b["n_tokens"].to_numpy())) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    # phase 2: block-local bin assignment with the broadcast offset
    parts = []
    for b, off in zip(blocks, offsets):
        n = b["n_tokens"].to_numpy()
        excl = off + np.cumsum(n) - n
        parts.append(
            pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
                    "bin": pa.array((excl // budget).astype(np.int64), pa.int64()),
                }
            )
        )
    return pa.concat_tables(parts)
