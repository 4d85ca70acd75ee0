"""Tokenize stage — transcript batches → per-turn tokenized rows.

This is the rebuild of the reference parse stage
(``Part C/parser_module.py:241-280`` parse_doc + ``indexer.py:22-48``
per-doc stats), expressed as one ``map_batches`` transform.  The stage is
a callable CLASS so the reference profile's compiled regexes / rule
tables are built once per actor (``__init__``), not once per batch.

Output schema (one row per non-empty turn):
    conv_id:str, turn_idx:int32, role:str, tool:str,
    doc_id:int64 (internal, 63-bit hash of the composite key),
    doc_len:int64 (Σtf, reference parser_module.py:275), n_terms:int64,
    max_tf:int64, n_singleton:int64, n_curses:int64
    (reference indexer.py:37-48),
    terms:list<string>, tfs:list<int64>, is_entity:list<bool>.

Turns whose token dict is empty are dropped and not counted in N,
matching reference ``indexer.py:31-33``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import doc_id_i64
from ..functions.tokenize import simple_tokenize_flat
from ..profiles import get_profile

TOKENIZED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("doc_id", pa.int64()),
        ("doc_len", pa.int64()),
        ("n_terms", pa.int64()),
        ("max_tf", pa.int64()),
        ("n_singleton", pa.int64()),
        ("n_curses", pa.int64()),
        ("terms", pa.list_(pa.string())),
        ("tfs", pa.list_(pa.int64())),
        ("is_entity", pa.list_(pa.bool_())),
    ]
)


class TokenizeStage:
    def __init__(self, profile="simple"):
        self.profile = get_profile(profile)
        self._ref = None
        if self.profile.tokenizer == "reference":
            from ..functions.reference_tokenizer import ReferenceTokenizer

            self._ref = ReferenceTokenizer(
                stemming=self.profile.stemming,
                lemmatization=self.profile.lemmatization,
            )

    # ------------------------------------------------------------------
    def __call__(self, tbl: pa.Table) -> pa.Table:
        if self._ref is None:
            rows, terms, tfs, ents = self._simple_flat(tbl)
        else:
            rows, terms, tfs, ents = self._reference_flat(tbl)
        return self._assemble(tbl, rows, terms, tfs, ents)

    # ------------------------------------------------------------------
    def _simple_flat(self, tbl):
        """Vectorized: flat tokens → per-(row, term) tf via Arrow group_by."""
        parent, flat = simple_tokenize_flat(tbl["text"])
        if self.profile.lemmatization:  # P17 over the simple tokens
            from ..functions.lemmatizer import lemmatize_array

            flat = lemmatize_array(flat)
        sub = pa.table({"row": pa.array(parent, type=pa.int64()), "term": flat})
        agg = sub.group_by(["row", "term"]).aggregate([([], "count_all")])
        rows = agg["row"].to_numpy()
        terms = agg["term"].to_numpy(zero_copy_only=False)
        tfs = agg["count_all"].to_numpy().astype(np.int64)
        ents = np.zeros(len(terms), dtype=bool)
        return rows, terms, tfs, ents

    @staticmethod
    def _term_codes(terms_arrow) -> tuple[np.ndarray, np.ndarray]:
        """Dictionary-encode a term column → (int codes, unique values);
        sorting by integer code replaces object-string lexsort in the hot
        path (order = first-appearance, deterministic for fixed input)."""
        d = terms_arrow.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return (
            d.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            d.dictionary.to_numpy(zero_copy_only=False),
        )

    def _reference_flat(self, tbl):
        """Per-row rule-based parse (compiled regexes held in actor state)."""
        texts = tbl["text"].to_pylist()
        rows_l, terms_l, tfs_l, ents_l = [], [], [], []
        for i, txt in enumerate(texts):
            counts, entity_terms = self._ref.parse_sentence(txt)
            if not counts:
                continue
            for term in counts:
                rows_l.append(i)
                terms_l.append(term)
                tfs_l.append(counts[term])
                ents_l.append(term in entity_terms)
        return (
            np.asarray(rows_l, dtype=np.int64),
            np.asarray(terms_l, dtype=object),
            np.asarray(tfs_l, dtype=np.int64),
            np.asarray(ents_l, dtype=bool),
        )

    # ------------------------------------------------------------------
    def _assemble(self, tbl, rows, terms, tfs, ents) -> pa.Table:
        if len(rows) == 0:
            return TOKENIZED_SCHEMA.empty_table()
        if len(terms) > 4096:
            codes, uniq = self._term_codes(pa.array(terms, type=pa.string()))
            # map first-appearance codes to LEXICOGRAPHIC ranks (one
            # small argsort over the batch vocabulary) so the emitted
            # per-doc term order is identical to the small path's string
            # lexsort — the tokenized artifact must not depend on how
            # Ray happened to split blocks (resume/diff reproducibility)
            lexrank = np.empty(len(uniq), dtype=np.int64)
            lexrank[np.argsort(uniq, kind="stable")] = np.arange(len(uniq))
            order = np.lexsort((lexrank[codes], rows))
        else:
            order = np.lexsort((terms, rows))  # deterministic (row, term) order
        rows, terms, tfs, ents = rows[order], terms[order], tfs[order], ents[order]
        present, starts = np.unique(rows, return_index=True)
        counts = np.diff(np.append(starts, len(rows)))

        doc_len = np.add.reduceat(tfs, starts)
        n_terms = counts.astype(np.int64)
        max_tf = np.maximum.reduceat(tfs, starts)
        n_singleton = np.add.reduceat((tfs == 1).astype(np.int64), starts)
        n_curses = np.add.reduceat((terms == "*CENSORED*").astype(np.int64), starts)

        present_idx = pa.array(present, type=pa.int64())
        conv = tbl["conv_id"].take(present_idx)
        turn = tbl["turn_idx"].take(present_idx)
        offsets = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": turn,
                "role": tbl["role"].take(present_idx),
                "tool": tbl["tool"].take(present_idx),
                "doc_id": pa.array(
                    doc_id_i64(
                        conv.to_numpy(zero_copy_only=False),
                        turn.to_numpy(zero_copy_only=False),
                    ),
                    type=pa.int64(),
                ),
                "doc_len": pa.array(doc_len, type=pa.int64()),
                "n_terms": pa.array(n_terms, type=pa.int64()),
                "max_tf": pa.array(max_tf, type=pa.int64()),
                "n_singleton": pa.array(n_singleton, type=pa.int64()),
                "n_curses": pa.array(n_curses, type=pa.int64()),
                "terms": pa.ListArray.from_arrays(offsets, pa.array(terms, type=pa.string())),
                "tfs": pa.ListArray.from_arrays(offsets, pa.array(tfs, type=pa.int64())),
                "is_entity": pa.ListArray.from_arrays(offsets, pa.array(ents, type=pa.bool_())),
            }
        )
