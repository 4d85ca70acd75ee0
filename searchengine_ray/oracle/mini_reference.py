"""Vendored mini-reference engine — sequential, dict-based, single
process.  Implements the reference's index/search semantics exactly as
the cited code does (``Part C/indexer.py``, ``searcher.py``,
``ranker.py``, ``search_engine_2.py``), including the ORDER-DEPENDENT
capital-letter migration (indexer.py:59-74,126-150), so the rank-identity
tests prove that the distributed Ray build's order-free reformulation
reaches the same final state on real corpora.

Shared deliberate deviations (mirrored by the Ray engine, see
functions/reference_tokenizer.py and stages/postings.py docstrings):
- entity terms: every candidate occurrence is counted and entities are
  kept iff df ≥ 2 (the reference skips the first-seen doc);
- same-doc case collisions sum tfs (the reference's dict overwrite);
- Σw² doc weights are rounded once at the end, not per accumulation;
- ties rank by (score rounded to 6dp desc, conv_id, turn_idx).

Docs are fed in stable (conv_id, turn_idx) order.
"""

from __future__ import annotations

import math

from ..functions.reference_tokenizer import ReferenceTokenizer
from ..functions.rounding import round_half_up


class MiniReferenceEngine:
    def __init__(self, stemming: bool = False, k1: float = 3.0, b: float = 0.6,
                 w_bm25: float = 0.9, w_inner: float = 0.1):
        self.tok = ReferenceTokenizer(stemming=stemming)
        self.k1, self.b = k1, b
        self.w_bm25, self.w_inner = w_bm25, w_inner
        self.inverted: dict[str, dict] = {}
        self.docs: dict[tuple, dict] = {}
        self.entity_df: dict[str, int] = {}
        self.n_docs = 0
        self.total_len = 0

    # -- build (sequential add_new_doc, indexer.py:22-87) ---------------
    def build(self, rows: list[tuple[str, int, str]]) -> None:
        for conv_id, turn_idx, text in sorted(rows, key=lambda r: (r[0], r[1])):
            counts, entities = self.tok.parse_sentence(text)
            if not counts:
                continue
            doc_key = (conv_id, turn_idx)
            counts = self._capital_letters(counts)
            doc_len = sum(counts.values())
            self.n_docs += 1
            self.total_len += doc_len
            self.docs[doc_key] = {
                "doc_len": doc_len,
                "max_tf": max(counts.values()),
                "n_singleton": sum(1 for v in counts.values() if v == 1),
                "n_curses": sum(1 for t in counts if t == "*CENSORED*"),
                "w2": 0.0,
            }
            for ent in entities:
                for form in (ent, ent.upper(), ent.lower()):
                    if form in counts:
                        self.entity_df[form] = self.entity_df.get(form, 0) + 1
                        break
            for term, tf in counts.items():
                if term not in self.inverted:
                    # indexer.py:59-68 — migrate UPPER entry to lower form.
                    # Gated on an ASCII-alpha first char, matching the Ray
                    # build's fold scope (stages/postings.py fold_key_of):
                    # non-alpha-first surfaces ('@who' vs '@WHO') are
                    # distinct terms in BOTH engines.
                    if (term and term[0].isascii() and term[0].isalpha()
                            and term.islower() and term.upper() in self.inverted):
                        self.inverted[term] = self.inverted.pop(term.upper())
                    else:
                        self.inverted[term] = {"df": 0, "cf": 0, "postings": {}}
                entry = self.inverted[term]
                entry["df"] += 1
                entry["cf"] += tf
                entry["postings"][doc_key] = (tf, doc_len)
        # entity ≥2-docs rule, order-free variant (df after case folding)
        forms = self._entity_forms()  # O(E) once, not per vocabulary term
        for term in list(self.inverted):
            if term in forms and self.inverted[term]["df"] < 2:
                del self.inverted[term]
        # I6 weighting pass (search_engine_2.py:90-105), rounded once
        for term, entry in self.inverted.items():
            idf10 = math.log10(self.n_docs / entry["df"])
            for doc_key, (tf, dl) in entry["postings"].items():
                w = (tf / dl) * idf10
                self.docs[doc_key]["w2"] += w * w
        for d in self.docs.values():
            d["w2"] = float(round_half_up([d["w2"]], 3)[0])

    def _entity_forms(self) -> set:
        forms = set()
        for e in self.entity_df:
            forms.update((e, e.upper(), e.lower()))
        return forms

    def _capital_letters(self, counts: dict[str, int]) -> dict[str, int]:
        """indexer.py:126-150, with same-doc collisions summed.

        Deviation (shared with the Ray engine): when a doc contains both a
        lowercase-initial form and a capitalized form of the same word,
        the capitalized occurrences fold into the lowercase entry with
        summed tf — the reference instead creates an UPPER entry and then
        double-counts df when its migration (indexer.py:61-68) later
        merges the two keys created by the same doc.
        """
        doc_lower = {
            t for t in counts if t and t[0].isascii() and t[0].isalpha() and t[0].islower()
        }
        out: dict[str, int] = {}
        for term, tf in counts.items():
            if not term or not term[0].isascii() or not term[0].isalpha():
                out[term] = out.get(term, 0) + tf
            elif term[0].islower():
                out[term] = out.get(term, 0) + tf
            else:
                lower = term.lower()
                if lower in self.inverted or lower in doc_lower:
                    key = lower
                else:
                    key = term.upper()
                out[key] = out.get(key, 0) + tf
        return out

    # -- search (searcher.py:26-112 + ranker.py) ------------------------
    def search(self, query: str, k: int | None = None) -> list[tuple[str, int, float]]:
        counts, _ = self.tok.parse_sentence(query)
        q_terms: dict[str, int] = {}
        for term, tf in counts.items():
            if term.lower() in self.inverted:
                term = term.lower()
            elif term.upper() in self.inverted:
                term = term.upper()
            else:
                continue
            q_terms[term] = q_terms.get(term, 0) + tf
        if not q_terms:
            return []
        avgdl = self.total_len / self.n_docs
        scores: dict[tuple, float] = {}
        for doc_key in {d for t in q_terms for d in self.inverted[t]["postings"]}:
            dl = self.docs[doc_key]["doc_len"]
            bm25 = inner = 0.0
            for t, q_tf in q_terms.items():
                post = self.inverted[t]["postings"].get(doc_key)
                if post is None:
                    continue
                ntf = post[0] / post[1]
                df = self.inverted[t]["df"]
                idf2 = math.log2(self.n_docs / df)
                bm25 += idf2 * (ntf * (ntf * (self.k1 + 1))) / (
                    ntf + self.k1 * (1 - self.b + self.b * dl / avgdl)
                )
                inner += q_tf * (ntf * math.log10(self.n_docs / df))
            scores[doc_key] = self.w_bm25 * bm25 + self.w_inner * inner
        ranked = sorted(
            scores.items(),
            key=lambda kv: (-round_half_up([kv[1]], 6)[0], kv[0][0], kv[0][1]),
        )
        if k is None:
            k = round(0.9 * len(ranked))  # ranker.py:39
        return [(c, t, s) for (c, t), s in ranked[:k]]
