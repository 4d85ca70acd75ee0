"""Query engine — BM25 + inner-product blend, exact reference semantics.

Reproduces the reference query path (``Part C/searcher.py:26-112`` +
``ranker.py:14-105``) with vectorized numpy scoring:

- query parse with the same tokenizer profile as the build (searcher.py:38),
- case resolution: try term.lower() then term.upper() against the
  dictionary (searcher.py:59-66),
- OR/union candidate semantics — docs matching ≥1 query term
  (searcher.py:50-112),
- BM25 (ranker.py:62-86): idf = log2(N/df), tf = norm_tf = tf/doc_len,
  numerator tf·(tf·(k+1)) [the reference's tf² quirk], denominator
  tf + k(1−b+b·dl/avgdl), k=3, b=0.6,
- inner product (ranker.py:45-59): Σ q_tf · (norm_tf · log10(N/df)),
- cosine (ranker.py:88-105) available but blend-weighted 0,
- blend 0.9·BM25 + 0.1·inner (ranker.py:32),
- default k = round(0.9·n_candidates) with Python banker's round
  (ranker.py:38-40),
- deterministic tie-break (rounded score desc, conv_id, turn_idx) —
  replaces the reference's dict-insertion-order-stable sort, which is
  not reproducible distributed.

``method="wand"`` is the block-max pruned fast path (chunk-granularity
upper bounds from max_ntf); the exact path is the conformance gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up
from ..profiles import get_profile
from ..state.index_store import IndexReader

RANK_DECIMALS = 6  # tie-break rounding for deterministic ordering


class QueryEngine:
    def __init__(self, index_dir: str, profile=None):
        self.reader = IndexReader(index_dir)
        self.profile = get_profile(profile or self.reader.meta["profile"])
        self._ref_tok = None
        if self.profile.tokenizer == "reference":
            from ..functions.reference_tokenizer import ReferenceTokenizer

            self._ref_tok = ReferenceTokenizer(stemming=self.profile.stemming)

    # ------------------------------------------------------------------
    def parse_query(self, query: str, expander=None) -> dict[str, float]:
        """Tokenize, optionally expand (Q14-Q17 plugin hook, applied before
        case resolution as the reference's searcher variants do), then
        case-resolve against the dictionary → {term: q_weight}."""
        if self._ref_tok is not None:
            counts, _ = self._ref_tok.parse_sentence(query)
            raw = {t: float(c) for t, c in counts.items()}
        else:
            from ..functions.tokenize import simple_tokenize_flat

            _, flat = simple_tokenize_flat(pa.array([query], type=pa.string()))
            raw = {}
            for t in flat.to_pylist():
                raw[t] = raw.get(t, 0.0) + 1.0
        if expander is not None:
            raw = expander(raw, self)
        resolved: dict[str, float] = {}
        for term, w in raw.items():
            if self.reader.has_term(term.lower()):
                term = term.lower()
            elif self.reader.has_term(term.upper()):
                term = term.upper()
            else:
                continue
            resolved[term] = resolved.get(term, 0.0) + w
        return resolved

    # ------------------------------------------------------------------
    def search(self, query: str, k: int | None = None, method: str = "exact",
               role: str | None = None, expander=None,
               max_candidates: int | None = None,
               anomaly_cut_std: float | None = None) -> pa.Table:
        """→ pa.Table (conv_id, turn_idx:int32, score:float64), ranked.

        ``role`` restricts candidates to turns with that role (a metadata
        filter the reference has no analogue for; scores are per-doc so
        filtering commutes with scoring).
        ``max_candidates`` is the Part A safety cap (searcher.py:19,75-82)
        — keep only the top-N candidates by score before ranking.
        ``anomaly_cut_std`` drops candidates scoring below
        mean − n·std (the reference's unused helper, ranker_glove.py:181-202).
        """
        q = self.parse_query(query, expander=expander)
        if not q:
            return _empty_result()
        # wand requires k (θ needs a target), no post-hoc candidate drop
        # (role), and a profile without the cosine term (its Σw² factor
        # is not covered by the per-term upper bounds)
        if method == "wand" and k is not None and role is None and not self.profile.w_cosine:
            ids, scores = self._score_wand(q, k)
        else:
            ids, scores = self._score_exact(q)
        if max_candidates is not None and len(ids) > max_candidates:
            keep = np.argpartition(scores, -max_candidates)[-max_candidates:]
            ids, scores = ids[keep], scores[keep]
        if anomaly_cut_std is not None and len(scores):
            keep = scores >= scores.mean() - anomaly_cut_std * scores.std()
            ids, scores = ids[keep], scores[keep]
        return self._rank(ids, scores, k, role=role)

    # ------------------------------------------------------------------
    def _fetch_postings(self, terms: list[str]) -> dict:
        """Fetch/decode postings for all query terms; cold terms in
        parallel threads (parquet reads release the GIL)."""
        cold = [t for t in terms if not self.reader._term_cis.get(t)]
        if len(cold) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(cold))) as ex:
                list(ex.map(self.reader.postings, cold))
        return {t: self.reader.postings(t) for t in terms}

    # ------------------------------------------------------------------
    def _term_scores(self, term: str, q_tf: int, ids, tfs, lens):
        """Per-posting (bm25, inner) contributions for one query term."""
        p = self.profile
        n, avgdl = self.reader.n_docs, self.reader.avgdl
        df = self.reader.df(term)
        ntf = tfs / lens
        idf2 = np.log2(n / df)
        bm25 = idf2 * (ntf * (ntf * (p.k1 + 1))) / (ntf + p.k1 * (1 - p.b + p.b * lens / avgdl))
        inner = q_tf * (ntf * np.log10(n / df))
        return bm25, inner

    def _score_exact(self, q: dict[str, int]):
        posted = self._fetch_postings(list(q))
        all_ids = np.concatenate([posted[t][0] for t in q])
        cand = np.unique(all_ids)
        bm25 = np.zeros(len(cand))
        inner = np.zeros(len(cand))
        for t, q_tf in q.items():
            ids, tfs, lens = posted[t]
            pos = np.searchsorted(cand, ids)
            b, i = self._term_scores(t, q_tf, ids, tfs, lens)
            bm25[pos] += b
            inner[pos] += i
        p = self.profile
        scores = p.w_bm25 * bm25 + p.w_inner * inner
        if p.w_cosine:
            scores += p.w_cosine * self._cosine(q, cand, inner)
        return cand, scores

    def _cosine(self, q, cand, inner):
        """ranker.py:88-105 — inner / sqrt(Σw²_doc · Σq_tf²)."""
        w_ids, w_sq = self.reader.doc_weights()
        pos = np.searchsorted(w_ids, cand)
        pos = np.clip(pos, 0, len(w_ids) - 1)
        dw = np.where(w_ids[pos] == cand, w_sq[pos], 0.0)
        qw = sum(v * v for v in q.values())
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = inner / np.sqrt(dw * qw)
        return np.where(np.isfinite(cos), cos, 0.0)

    # ------------------------------------------------------------------
    def _score_wand(self, q: dict[str, int], k: int):
        """Max-score pruning with block-max (chunk) skipping.

        Sound and rank-identical to the exact path:

        1. Terms are processed in descending upper-bound order (both
           scoring terms are monotone increasing in norm_tf, so a term's
           chunk-level ``max_ntf`` yields a valid per-posting bound).
        2. After processing a prefix of terms, any document not yet seen
           can score at most the sum of the remaining terms' bounds
           ``R``.  The candidate set closes only once ``R`` is below θ
           (current k-th best partial score — a lower bound on the final
           k-th score, since contributions are non-negative) by MORE
           than one rounding step of the final rank order: ranking
           rounds scores to RANK_DECIMALS before the (conv, turn)
           tie-break, and round() is monotone with grid 10^-d, so a
           pruned doc with exact score < θ - 10^-d rounds strictly below
           the k-th rounded score and can never win a tie.
        3. Surviving candidates are re-scored exactly (same summation
           order as the exact path), so within the returned top-k the
           ordering matches the exact path.
        """
        p = self.profile
        n, avgdl = self.reader.n_docs, self.reader.avgdl

        def term_ub(term, q_tf, max_ntf):
            df = self.reader.df(term)
            idf2 = np.log2(n / df)
            bm = idf2 * (max_ntf * (max_ntf * (p.k1 + 1))) / (
                max_ntf + p.k1 * (1 - p.b + p.b * 1.0 / avgdl)
            )
            return p.w_bm25 * bm + p.w_inner * q_tf * max_ntf * np.log10(n / df)

        metas = {t: self.reader.chunk_meta(t) for t in q}
        ubs = {t: float(term_ub(t, q[t], metas[t]["max_ntf"].max())) for t in q}
        terms_sorted = sorted(q, key=lambda t: -ubs[t])

        cand = np.empty(0, np.int64)
        bm25 = np.empty(0)
        inner = np.empty(0)
        posted: dict[str, tuple] = {}
        closed = False  # True once no new doc can reach the top-k
        for i, t in enumerate(terms_sorted):
            remaining = sum(ubs[t2] for t2 in terms_sorted[i:])
            if not closed and len(cand) >= k:
                theta = np.partition(p.w_bm25 * bm25 + p.w_inner * inner, -k)[-k]
                # full 10^-RANK_DECIMALS margin: guarantees a pruned
                # doc's ROUNDED score is strictly below the k-th rounded
                # score, so rounded-score tie-breaks cannot flip
                if remaining < theta - (10.0 ** -RANK_DECIMALS + 1e-12):
                    closed = True
            if closed:
                # block-max skip: only chunks overlapping current candidates
                m = metas[t]
                keep = set()
                for j in range(len(m["chunk_idx"])):
                    lo = np.searchsorted(cand, m["doc_min"][j], side="left")
                    hi = np.searchsorted(cand, m["doc_max"][j], side="right")
                    if hi > lo:
                        keep.add(int(m["chunk_idx"][j]))
                if not keep:
                    posted[t] = None
                    continue
                ids, tfs, lens = self.reader.postings(t, chunk_ids=keep)
                pos = np.searchsorted(cand, ids)
                pos_ok = np.clip(pos, 0, len(cand) - 1)
                hit = cand[pos_ok] == ids
                posted[t] = (ids[hit], tfs[hit], lens[hit])
                b, inn = self._term_scores(t, q[t], ids[hit], tfs[hit], lens[hit])
                bm25[pos_ok[hit]] += b
                inner[pos_ok[hit]] += inn
            else:
                ids, tfs, lens = self.reader.postings(t)
                posted[t] = (ids, tfs, lens)
                merged = np.unique(np.concatenate([cand, ids]))
                nb = np.zeros(len(merged))
                ni = np.zeros(len(merged))
                old = np.searchsorted(merged, cand)
                nb[old] = bm25
                ni[old] = inner
                pos = np.searchsorted(merged, ids)
                b, inn = self._term_scores(t, q[t], ids, tfs, lens)
                nb[pos] += b
                ni[pos] += inn
                cand, bm25, inner = merged, nb, ni

        # Final pass: re-accumulate in the exact path's term order (dict
        # insertion order of ``q``) so float summation order — and hence
        # every score bit — matches ``_score_exact`` for the survivors.
        bm25 = np.zeros(len(cand))
        inner = np.zeros(len(cand))
        for t, q_tf in q.items():
            if posted.get(t) is None:
                continue
            ids, tfs, lens = posted[t]
            pos = np.searchsorted(cand, ids)
            b, inn = self._term_scores(t, q_tf, ids, tfs, lens)
            bm25[pos] += b
            inner[pos] += inn
        return cand, p.w_bm25 * bm25 + p.w_inner * inner

    # ------------------------------------------------------------------
    def _rank(self, ids: np.ndarray, scores: np.ndarray, k: int | None,
              role: str | None = None) -> pa.Table:
        rounded = round_half_up(scores, RANK_DECIMALS)
        if role is not None:
            pos_all = self.reader.doc_positions(ids)
            keep = self.reader.roles(pos_all) == role
            ids, scores, rounded = ids[keep], scores[keep], rounded[keep]
        n = len(ids)
        if k is None:
            k = round(0.9 * n)  # ranker.py:39 (banker's round, as in Python)
        k = max(min(k, n), 0)
        # shrink to the top-score subset (plus rounded-score ties) BEFORE
        # the expensive doc-key lookup and string lexsort — candidates can
        # be nearly the whole corpus for head-term queries
        if 0 < k < n:
            thresh = np.partition(rounded, n - k)[n - k]
            sel = np.flatnonzero(rounded >= thresh)
        else:
            sel = np.arange(n)
        pos = self.reader.doc_positions(ids[sel])
        # point read: only the row groups holding these ranks are touched
        rows = self.reader.doc_rows(pos, columns=("conv_id", "turn_idx"))
        conv = rows["conv_id"]
        turn = rows["turn_idx"]
        order = np.lexsort((turn, conv, -rounded[sel]))[:k]
        return pa.table(
            {
                "conv_id": pa.array(conv[order], pa.string()),
                "turn_idx": pa.array(turn[order].astype(np.int32), pa.int32()),
                "score": pa.array(scores[sel][order], pa.float64()),
            }
        )


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "score": pa.array([], pa.float64()),
        }
    )
