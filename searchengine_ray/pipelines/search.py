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

            self._ref_tok = ReferenceTokenizer(
                stemming=self.profile.stemming,
                lemmatization=self.profile.lemmatization,
            )
        # per-term static score arrays (ids, ntf, bm25 element scores) —
        # query-independent for a fixed profile, so hot terms score with
        # two bincounts and zero recomputed math
        from collections import OrderedDict

        self._term_static_cache: OrderedDict = OrderedDict()
        self._term_static_entries = 0
        self.term_static_max_entries = 20_000_000

    # ------------------------------------------------------------------
    def parse_query(self, query: str, expander=None, has_term=None) -> dict[str, float]:
        """Tokenize, optionally expand (Q14-Q17 plugin hook, applied before
        case resolution as the reference's searcher variants do), then
        case-resolve against the dictionary → {term: q_weight}.

        ``has_term`` overrides the membership predicate — the
        multi-segment engine passes its UNION-vocabulary test so this
        single implementation serves both paths."""
        if has_term is None:
            has_term = self.reader.has_term
        if self._ref_tok is not None:
            counts, _ = self._ref_tok.parse_sentence(query)
            raw = {t: float(c) for t, c in counts.items()}
        else:
            from ..functions.tokenize import simple_tokenize_flat

            _, flat = simple_tokenize_flat(pa.array([query], type=pa.string()))
            if self.profile.lemmatization:  # P17: query terms lemmatize too
                from ..functions.lemmatizer import lemmatize_array

                flat = lemmatize_array(flat)
            raw = {}
            for t in flat.to_pylist():
                raw[t] = raw.get(t, 0.0) + 1.0
        if expander is not None:
            raw = expander(raw, self)
        resolved: dict[str, float] = {}
        for term, w in raw.items():
            if has_term(term.lower()):
                term = term.lower()
            elif has_term(term.upper()):
                term = term.upper()
            else:
                continue
            resolved[term] = resolved.get(term, 0.0) + w
        return resolved

    # ------------------------------------------------------------------
    def search(self, query: str, k: int | None = None, method: str = "exact",
               role: str | None = None, expander=None,
               max_candidates: int | None = None,
               anomaly_cut_std: float | None = None,
               role_boost: dict[str, float] | None = None,
               match_mode: str = "any") -> pa.Table:
        """→ pa.Table (conv_id, turn_idx:int32, score:float64), ranked.

        ``role`` restricts candidates to turns with that role (a metadata
        filter the reference has no analogue for; scores are per-doc so
        filtering commutes with scoring).
        ``max_candidates`` is the Part A safety cap (searcher.py:19,75-82)
        — keep only the top-N candidates by score before ranking.
        ``anomaly_cut_std`` drops candidates scoring below
        mean − n·std (the reference's unused helper, ranker_glove.py:181-202).
        ``role_boost`` is BM25F-style field weighting at the turn schema's
        natural field granularity: each turn IS one field occurrence, so
        the field weight multiplies the whole turn score (missing roles
        default to weight 1).
        ``match_mode="all"`` keeps only conjunctive matches — docs
        containing EVERY resolved query term (the reference is OR-only).
        """
        if match_mode not in ("any", "all"):
            raise ValueError(f"unknown match_mode {match_mode!r}")
        q = self.parse_query(query, expander=expander)
        if not q:
            return _empty_result()
        # wand requires k (θ needs a target), no post-hoc candidate drop
        # (role/boost/conjunction/anomaly-cut — they change the population
        # the cut/k applies to), non-negative query weights (the upper
        # bounds assume contributions can only add), and a profile
        # without the cosine term (its Σw² factor is not covered by the
        # per-term upper bounds)
        if (method == "wand" and k is not None and role is None
                and role_boost is None and match_mode == "any"
                and anomaly_cut_std is None
                and all(w >= 0 for w in q.values())
                and not self.profile.w_cosine):
            ids, scores = self._score_wand(q, k)
        else:
            ids, scores = self._score_exact(q)
        if match_mode == "all" and len(ids):
            ids, scores = self._conjunctive_filter(q, ids, scores)
        if role_boost is not None and len(ids):
            roles = self.reader.roles(self.reader.doc_positions(ids))
            uniq, inv = np.unique(roles, return_inverse=True)
            w_u = np.array([role_boost.get(r, 1.0) for r in uniq.tolist()])
            scores = scores * w_u[inv]
        if max_candidates is not None and len(ids) > max_candidates:
            keep = np.argpartition(scores, -max_candidates)[-max_candidates:]
            ids, scores = ids[keep], scores[keep]
        if anomaly_cut_std is not None and len(scores):
            keep = scores >= scores.mean() - anomaly_cut_std * scores.std()
            ids, scores = ids[keep], scores[keep]
        return self._rank(ids, scores, k, role=role)

    # ------------------------------------------------------------------
    def _conjunctive_filter(self, q: dict, ids: np.ndarray, scores: np.ndarray):
        """Keep candidates matched by EVERY query term (match counts via
        the cached per-term id arrays — one searchsorted per term)."""
        counts = np.zeros(len(ids), dtype=np.int64)
        for t in q:
            t_ids = self._term_static(t)[0]
            pos = np.searchsorted(t_ids, ids)
            pos_ok = np.clip(pos, 0, max(len(t_ids) - 1, 0))
            if len(t_ids):
                counts += (t_ids[pos_ok] == ids).astype(np.int64)
        keep = counts == len(q)
        return ids[keep], scores[keep]

    # ------------------------------------------------------------------
    def _fetch_postings(self, terms: list[str]) -> dict:
        """Fetch/decode postings for all query terms; cold terms go
        through ONE batched dataset scan (a scan per term re-opens the
        shard's files each time, and threads don't help — pyarrow's CPU
        pool is 1 thread under the cluster's OMP_NUM_THREADS=1)."""
        self.reader.fetch_terms(terms)
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
        # (q_tf·log10) scalar first, then ×ntf — the SAME association as
        # the vectorized exact path, so wand re-accumulation stays
        # bit-for-bit with it
        inner = (q_tf * np.log10(n / df)) * ntf
        return bm25, inner

    def _term_static(self, term: str):
        """(ids, ntf, bm25-element) arrays for one term — everything about
        its per-posting scores that does not depend on the query; LRU-
        cached so hot terms never recompute the score chain."""
        cached = self._term_static_cache.get(term)
        if cached is not None:
            self._term_static_cache.move_to_end(term)
            return cached
        ids, tfs, lens = self.reader.postings(term)
        p = self.profile
        n, avgdl = self.reader.n_docs, self.reader.avgdl
        idf2 = np.log2(n / self.reader.df(term))
        ntf = tfs / lens
        b_el = idf2 * (ntf * (ntf * (p.k1 + 1))) / (
            ntf + p.k1 * (1 - p.b + p.b * lens / avgdl)
        )
        out = (ids, ntf, b_el)
        self._term_static_cache[term] = out
        self._term_static_entries += len(ids)
        while (
            self._term_static_entries > self.term_static_max_entries
            and self._term_static_cache
        ):
            _, old = self._term_static_cache.popitem(last=False)
            self._term_static_entries -= len(old[0])
        return out

    def _score_exact(self, q: dict[str, int]):
        """Vectorized across ALL query terms.  Accumulation is term-major
        — exactly the order the sequential per-term ``+=`` loop used, so
        scores are bit-for-bit identical to that formulation (and to the
        wand re-accumulation pass)."""
        self._fetch_postings(list(q))  # threaded cold fetch
        terms = list(q)
        parts = [self._term_static(t) for t in terms]
        n = n_docs = self.reader.n_docs
        stream = sum(len(pt[0]) for pt in parts)
        if self.reader.meta.get("dense_ids") and n_docs <= max(4 * stream, 1 << 20):
            # dense ids ARE ranks in [0, n_docs): scatter-add straight
            # over the ids — no sort, no unique, no concatenation.
            # (Guarded to stream-comparable n_docs: a sharded serving
            # actor at extreme scale covers one doc range, so the dense
            # arrays stay node-sized.)
            bm25_f = np.zeros(n_docs)
            inner_f = np.zeros(n_docs)
            mask = np.zeros(n_docs, dtype=bool)
            for t, (ids, ntf, b_el) in zip(terms, parts):
                w = q[t] * np.log10(n / self.reader.df(t))
                bm25_f += np.bincount(ids, weights=b_el, minlength=n_docs)
                inner_f += np.bincount(ids, weights=w * ntf, minlength=n_docs)
                mask[ids] = True
            cand = np.flatnonzero(mask)
            bm25 = bm25_f[cand]
            inner = inner_f[cand]
        else:
            all_ids = np.concatenate([pt[0] for pt in parts])
            b_cat = np.concatenate([pt[2] for pt in parts])
            i_cat = np.concatenate(
                [
                    (q[t] * np.log10(n / self.reader.df(t))) * pt[1]
                    for t, pt in zip(terms, parts)
                ]
            )
            cand, inv = np.unique(all_ids, return_inverse=True)
            bm25 = np.bincount(inv, weights=b_cat, minlength=len(cand))
            inner = np.bincount(inv, weights=i_cat, minlength=len(cand))
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

        self.reader.fetch_metas(list(q))  # one batched scan for cold metas
        metas = {t: self.reader.chunk_meta(t) for t in q}
        ubs = {t: float(term_ub(t, q[t], metas[t]["max_ntf"].max())) for t in q}
        terms_sorted = sorted(q, key=lambda t: -ubs[t])
        n_docs = self.reader.n_docs
        stream_est = sum(self.reader.df(t) for t in q)
        if not (
            self.reader.meta.get("dense_ids")
            and n_docs <= max(4 * stream_est, 1 << 20)
        ):
            # legacy (hashed-id) indexes keep no dense rank space; exact
            # scoring is the correct (and now cheap) fallback
            return self._score_exact(q)

        # open phase over dense-rank score arrays: a term is a scatter-add
        # (ids are unique per term), never a sorted merge
        bm25_f = np.zeros(n_docs)
        inner_f = np.zeros(n_docs)
        mask = np.zeros(n_docs, dtype=bool)
        n_seen = 0
        cand = None
        posted: dict[str, tuple] = {}
        closed = False  # True once no new doc can reach the top-k
        processed_ub = 0.0
        for i, t in enumerate(terms_sorted):
            remaining = sum(ubs[t2] for t2 in terms_sorted[i:])
            # θ ≤ sum of processed bounds, so when remaining ≥ that sum the
            # close test cannot pass — skip the partition entirely
            if not closed and n_seen >= k and remaining < processed_ub:
                blend = p.w_bm25 * bm25_f + p.w_inner * inner_f
                theta = np.partition(blend[mask], -k)[-k]
                # full 10^-RANK_DECIMALS margin: guarantees a pruned
                # doc's ROUNDED score is strictly below the k-th rounded
                # score, so rounded-score tie-breaks cannot flip
                if remaining < theta - (10.0 ** -RANK_DECIMALS + 1e-12):
                    closed = True
                    cand = np.flatnonzero(mask)
            if closed:
                # block-max skip: only chunks overlapping current candidates
                m = metas[t]
                lo = np.searchsorted(cand, m["doc_min"], side="left")
                hi = np.searchsorted(cand, m["doc_max"], side="right")
                keep = {int(ci) for ci in m["chunk_idx"][hi > lo]}
                if not keep:
                    posted[t] = None
                    continue
                ids, tfs, lens = self.reader.postings(t, chunk_ids=keep)
                hit = mask[ids]
                ids_h = ids[hit]
                b, inn = self._term_scores(t, q[t], ids_h, tfs[hit], lens[hit])
                posted[t] = (ids_h, b, inn)
            else:
                ids, ntf, b = self._term_static(t)
                inn = (q[t] * np.log10(n / self.reader.df(t))) * ntf
                posted[t] = (ids, b, inn)
                bm25_f[ids] += b
                inner_f[ids] += inn
                mask[ids] = True
                n_seen = int(np.count_nonzero(mask))
            processed_ub += ubs[t]

        # Final pass: re-accumulate in the exact path's term order (dict
        # insertion order of ``q``) so float summation order — and hence
        # every score bit — matches ``_score_exact`` for the survivors
        # (per-element values come from the same cached b/inner arrays).
        if cand is None:
            cand = np.flatnonzero(mask)
        # every posted id is ∈ cand (open-phase ids are in mask; closed-
        # phase ids were filtered by it), so dense scatter-adds replace
        # per-term searchsorted into the candidate array
        bm25_f[:] = 0.0
        inner_f[:] = 0.0
        for t in q:
            if posted.get(t) is None:
                continue
            ids, b, inn = posted[t]
            bm25_f[ids] += b
            inner_f[ids] += inn
        return cand, p.w_bm25 * bm25_f[cand] + p.w_inner * inner_f[cand]

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


def _empty_conv_result() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "best_turn_idx": pa.array([], pa.int32()),
            "n_turns_matched": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def fetch_context_windows(results: pa.Table, source, window: int = 1) -> pa.Table:
    """Hydrate ranked hits with their surrounding turns: for each result
    row, the turns of the same conversation with |turn_idx − hit| ≤
    ``window`` (the context a reader or a reranker wants around a hit).

    ``source`` is the transcript parquet path/dir (or an in-memory
    table); the path read pushes a conv_id predicate down so only the
    hit conversations' row groups leave storage — O(hits · window),
    never a corpus scan.  → (conv_id, hit_turn_idx, turn_idx, role,
    text) ordered by (conv, hit, turn)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if results.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "hit_turn_idx": pa.array([], pa.int32()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
            }
        )
    convs = results["conv_id"].to_pylist()
    hits = results["turn_idx"].to_numpy()
    wanted = sorted(set(convs))
    if isinstance(source, pa.Table):
        t = source.filter(pc.is_in(source["conv_id"], value_set=pa.array(wanted))).select(
            ["conv_id", "turn_idx", "role", "text"]
        )
    else:
        t = pads.dataset(source).to_table(
            columns=["conv_id", "turn_idx", "role", "text"],
            filter=pads.field("conv_id").isin(wanted),
        )
    tc = t["conv_id"].to_numpy(zero_copy_only=False)
    tt = t["turn_idx"].to_numpy()
    order = np.lexsort((tt, tc))
    tc, tt = tc[order], tt[order]
    roles = t["role"].to_numpy(zero_copy_only=False)[order]
    texts = t["text"].to_numpy(zero_copy_only=False)[order]

    out = {"conv_id": [], "hit_turn_idx": [], "turn_idx": [], "role": [], "text": []}
    for conv, hit in sorted(zip(convs, (int(h) for h in hits))):
        lo = np.searchsorted(tc, conv, side="left")
        hi = np.searchsorted(tc, conv, side="right")
        seg = slice(lo, hi)
        sel = np.flatnonzero(np.abs(tt[seg] - hit) <= window) + lo
        for j in sel:
            out["conv_id"].append(conv)
            out["hit_turn_idx"].append(hit)
            out["turn_idx"].append(int(tt[j]))
            out["role"].append(roles[j])
            out["text"].append(texts[j])
    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "hit_turn_idx": pa.array(out["hit_turn_idx"], pa.int32()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
        }
    )


class ConversationSearch:
    """Conversation-level retrieval over the turn index.

    A conversation's score is its best turn's blend score (max-agg — the
    robust choice for long conversations, where sum-agg drowns relevance
    in length).  Scoring reuses the turn engine; the conv aggregation is
    a dictionary-encoded integer groupby over the candidate array (no
    string ever touches the hot path), and only the winning conversations
    have their conv_id strings materialized.
    """

    def __init__(self, engine: QueryEngine):
        self.engine = engine

    def search(self, query: str, k: int = 10, expander=None) -> pa.Table:
        """→ (conv_id, best_turn_idx, n_turns_matched, score), ranked by
        rounded score desc then conv_id; best turn = highest rounded turn
        score, smallest turn_idx on ties."""
        eng = self.engine
        q = eng.parse_query(query, expander=expander)
        if not q:
            return _empty_conv_result()
        ids, scores = eng._score_exact(q)
        if not len(ids):
            return _empty_conv_result()
        rounded = round_half_up(scores, RANK_DECIMALS)
        pos = eng.reader.doc_positions(ids)
        codes, turn_col, conv_strings = eng.reader.conv_codes()
        c = codes[pos].astype(np.int64)

        # per-conversation aggregation over integer codes: max rounded
        # score, count, and the best turn (max rounded, then min turn)
        order = np.argsort(c, kind="stable")
        cs = c[order]
        grp_starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        uniq_codes = cs[grp_starts]
        r_sorted = rounded[order]
        s_sorted = scores[order]
        # segments are contiguous after the sort: reduceat, not a slow
        # unbuffered maximum.at scatter
        best_r = np.maximum.reduceat(r_sorted, grp_starts)
        counts = np.diff(np.append(grp_starts, len(cs)))

        # the representative turn: among a conv's turns with rounded ==
        # best, the smallest turn_idx; its unrounded score is the output
        turns = turn_col[pos[order]]

        # rank conversations: rounded max desc, then conv_id string asc —
        # strings fetched only for the top set (k + rounded ties)
        n = len(uniq_codes)
        kk = min(k, n)
        if kk < n:
            thresh = np.partition(best_r, n - kk)[n - kk]
            top = np.flatnonzero(best_r >= thresh)
        else:
            top = np.arange(n)
        top_strings = conv_strings[uniq_codes[top]]
        top_order = np.lexsort((top_strings, -best_r[top]))[:kk]
        winners = top[top_order]

        grp_ends = np.append(grp_starts, len(cs))
        return self._finalize(
            winners, grp_starts, grp_ends, uniq_codes, conv_strings,
            counts, best_r, r_sorted, s_sorted, turns,
        )

    @staticmethod
    def _finalize(winners, grp_starts, grp_ends, uniq_codes, conv_strings,
                  counts, best_r, r_sorted, s_sorted, turns):
        out_conv, out_turn, out_cnt, out_score = [], [], [], []
        for w in winners:
            w = int(w)
            lo, hi = grp_starts[w], grp_ends[w + 1]
            seg_r = r_sorted[lo:hi]
            seg_t = turns[lo:hi]
            seg_s = s_sorted[lo:hi]
            best_mask = seg_r == best_r[w]
            cand_turns = seg_t[best_mask]
            j = int(np.argmin(cand_turns))
            out_conv.append(conv_strings[uniq_codes[w]])
            out_turn.append(int(cand_turns[j]))
            out_cnt.append(int(counts[w]))
            out_score.append(float(seg_s[best_mask][j]))
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "best_turn_idx": pa.array(out_turn, pa.int32()),
                "n_turns_matched": pa.array(out_cnt, pa.int64()),
                "score": pa.array(out_score, pa.float64()),
            }
        )
