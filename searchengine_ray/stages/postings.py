"""Posting-run construction and merge — the wide part of the index build.

Reimagines the reference's external-memory build (per-letter posting
files + BSBI pairwise merge, ``Part A/indexer.py:47-51`` /
``Part A/merger.py:21-58``) as:

1. ``ExplodeEncodeStage`` (map_batches): tokenized rows → one encoded
   partial posting run per (fold_key, surface) per batch.  Runs are
   doc_id-sorted and delta+varbyte compressed before the shuffle, so the
   groupby moves compact binary blobs, not exploded rows.
2. optional ``partial_merge_group`` (groupby (fold_key, salt)): salted
   pre-merge for head-term skew — concatenates runs of the same surface
   so the final per-term group sees at most ``n_salts`` runs per surface.
3. ``merge_posting_group`` (groupby fold_key): resolves the reference's
   capital-letter case rule I2 (``Part C/indexer.py:59-74,126-150``)
   order-free, applies the ≥2-docs entity rule P15
   (``parser_module.py:501-534``) as a df filter, merges runs into
   doc_id-sorted posting lists and re-encodes them into bounded chunks
   with block-max metadata (max norm_tf) for WAND pruning.

fold_key = lower(term) when the term starts with an ASCII letter, else
the term itself — the order-free grouping under which the reference's
order-dependent case migration reaches the same final state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import decode_postings, encode_postings
from ..functions.hashing import term_shard

RUN_SCHEMA = pa.schema(
    [
        ("fold_key", pa.string()),
        ("surface", pa.string()),
        ("is_cap", pa.bool_()),      # first char ASCII uppercase (candidate for I2 folding)
        ("is_entity", pa.bool_()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_min", pa.int64()),
        ("run", pa.large_binary()),
    ]
)

CHUNKS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("chunk_idx", pa.int32()),
        ("df", pa.int64()),          # term-total df (stamped on every chunk)
        ("cf", pa.int64()),
        ("df_chunk", pa.int64()),
        ("doc_min", pa.int64()),
        ("doc_max", pa.int64()),
        ("max_ntf", pa.float64()),   # block-max norm_tf for WAND
        ("run", pa.large_binary()),
    ]
)

_ASCII_UPPER = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def fold_key_of(term: str) -> str:
    return term.lower() if term and term[0] in _ASCII_LETTERS else term


class ExplodeEncodeStage:
    """Tokenized batch → encoded partial posting runs (one per surface)."""

    def __init__(self, n_salts: int = 1):
        self.n_salts = n_salts

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if tbl.num_rows == 0:
            return RUN_SCHEMA.empty_table()
        terms = pc.list_flatten(tbl["terms"])
        parent = pc.list_parent_indices(tbl["terms"]).to_numpy()
        tfs = pc.list_flatten(tbl["tfs"]).to_numpy()
        ents = pc.list_flatten(tbl["is_entity"]).to_numpy(zero_copy_only=False)
        doc_ids = tbl["doc_id"].to_numpy()[parent]
        doc_lens = tbl["doc_len"].to_numpy()[parent]

        terms_np = terms.to_numpy(zero_copy_only=False)
        order = np.lexsort((doc_ids, terms_np))
        terms_np, tfs, ents, doc_ids, doc_lens = (
            terms_np[order], tfs[order], ents[order], doc_ids[order], doc_lens[order]
        )
        uniq, starts = np.unique(terms_np, return_index=True)
        bounds = np.append(starts, len(terms_np))

        out = {k: [] for k in RUN_SCHEMA.names}
        for i, surface in enumerate(uniq):
            s, e = bounds[i], bounds[i + 1]
            ids, tf, dl = doc_ids[s:e], tfs[s:e], doc_lens[s:e]
            out["fold_key"].append(fold_key_of(surface))
            out["surface"].append(surface)
            out["is_cap"].append(surface[0] in _ASCII_UPPER)
            out["is_entity"].append(bool(ents[s]))
            out["salt"].append(int(ids[0]) % self.n_salts if self.n_salts > 1 else 0)
            out["df"].append(e - s)
            out["cf"].append(int(tf.sum()))
            out["doc_min"].append(int(ids[0]))
            out["run"].append(encode_postings(ids, tf, dl))
        return pa.table(out, schema=RUN_SCHEMA)


def _merge_runs(runs: list[bytes]):
    """Merge doc_id-sorted runs → (ids, tfs, lens); duplicate doc_ids
    (same doc via two case-folded surfaces) sum their tfs."""
    parts = [decode_postings(r) for r in runs]
    ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    lens = np.concatenate([p[2] for p in parts])
    order = np.argsort(ids, kind="stable")
    ids, tfs, lens = ids[order], tfs[order], lens[order]
    uniq, starts = np.unique(ids, return_index=True)
    if len(uniq) != len(ids):
        tfs = np.add.reduceat(tfs, starts)
        lens = lens[starts]
        ids = uniq
    return ids, tfs, lens


def partial_merge_group(group: pa.Table) -> pa.Table:
    """Salted pre-merge: one run per surface within this (fold_key, salt)
    group.  Schema-preserving so the final merge is unchanged."""
    if group.num_rows <= 1:
        return group
    surfaces = group["surface"].to_numpy(zero_copy_only=False)
    runs = group["run"].to_pylist()
    out = {k: [] for k in RUN_SCHEMA.names}
    for surface in np.unique(surfaces):
        idx = np.flatnonzero(surfaces == surface)
        ids, tfs, lens = _merge_runs([runs[i] for i in idx])
        r0 = int(idx[0])
        out["fold_key"].append(group["fold_key"][r0].as_py())
        out["surface"].append(surface)
        out["is_cap"].append(group["is_cap"][r0].as_py())
        out["is_entity"].append(group["is_entity"][r0].as_py())
        out["salt"].append(group["salt"][r0].as_py())
        out["df"].append(len(ids))
        out["cf"].append(int(tfs.sum()))
        out["doc_min"].append(int(ids[0]))
        out["run"].append(encode_postings(ids, tfs, lens))
    return pa.table(out, schema=RUN_SCHEMA)


class MergePostingsGroup:
    """Final per-fold_key merge → index chunk rows (CHUNKS_SCHEMA)."""

    def __init__(self, n_shards: int = 16, chunk_docs: int = 131072,
                 case_folding: bool = False, entity_min_df: int = 2):
        self.n_shards = n_shards
        self.chunk_docs = chunk_docs
        self.case_folding = case_folding
        self.entity_min_df = entity_min_df

    def __call__(self, group: pa.Table) -> pa.Table:
        surfaces = group["surface"].to_numpy(zero_copy_only=False)
        is_cap = group["is_cap"].to_numpy(zero_copy_only=False)
        is_ent = group["is_entity"].to_numpy(zero_copy_only=False)
        runs = group["run"].to_pylist()
        fold_key = group["fold_key"][0].as_py()

        # --- resolve surfaces into index entries (order-free I2) ---------
        entries: dict[str, list[int]] = {}
        if not self.case_folding:
            for i, s in enumerate(surfaces):
                entries.setdefault(s, []).append(i)
        else:
            lower_form_exists = any(
                (not is_cap[i]) and surfaces[i] == fold_key for i in range(len(surfaces))
            )
            for i, s in enumerate(surfaces):
                if not is_cap[i]:
                    entries.setdefault(s, []).append(i)  # verbatim (incl. full-lower)
                elif lower_form_exists:
                    entries.setdefault(fold_key, []).append(i)
                else:
                    entries.setdefault(s.upper(), []).append(i)

        out = {k: [] for k in CHUNKS_SCHEMA.names}
        for term in sorted(entries):
            idx = entries[term]
            ids, tfs, lens = _merge_runs([runs[i] for i in idx])
            if any(is_ent[i] for i in idx) and len(ids) < self.entity_min_df:
                continue  # P15: entity seen in fewer than 2 docs
            df, cf = len(ids), int(tfs.sum())
            shard = int(term_shard([term], self.n_shards)[0])
            n_chunks = 0
            for s in range(0, df, self.chunk_docs):
                e = min(s + self.chunk_docs, df)
                cid, ctf, clen = ids[s:e], tfs[s:e], lens[s:e]
                out["term"].append(term)
                out["shard"].append(shard)
                out["chunk_idx"].append(n_chunks)
                out["df"].append(df)
                out["cf"].append(cf)
                out["df_chunk"].append(e - s)
                out["doc_min"].append(int(cid[0]))
                out["doc_max"].append(int(cid[-1]))
                out["max_ntf"].append(float((ctf / clen).max()))
                out["run"].append(encode_postings(cid, ctf, clen))
                n_chunks += 1
        return pa.table(out, schema=CHUNKS_SCHEMA)
