"""Query-expansion plugins and embedding rerank (reference Q12, Q14-Q17).

The reference's plugins depend on external resources absent from both
its repo and this container (pyspellchecker dictionaries, NLTK
lin_thesaurus/WordNet corpora, the GloVe ``model/vectors.txt`` which is
listed in ``.MISSING_LARGE_BLOBS``).  The rebuild keeps the *semantics*
and swaps the resources for engine-owned ones:

- ``SpellExpansion`` (Q14, ``Part C/SpellChecker.py:9-24``): edit-
  distance candidate correction — against the index vocabulary itself
  instead of a frequency dictionary, preferring smaller distance then
  higher corpus frequency; whitelisted terms pass through.
- ``SynonymExpansion`` (Q15/Q16, ``Thesaurus.py:9-42`` /
  ``WordNet.py:9-52``): adds table-provided synonyms at weight 0.2.
- ``EmbeddingKNNExpansion`` (Q17, ``searcher_glove.py:68-100``): for
  queries with <5 terms, adds each term's 2 nearest vocabulary terms by
  euclidean distance; existing terms gain +0.1, new terms weight 1.
- ``HashWordVectors``: deterministic pseudo-embeddings (splitmix-seeded)
  standing in for the missing GloVe model — same shapes, same API.
- ``rerank_by_embedding`` (Q12, ``ranker_glove.py:53-99``): doc-vector
  euclidean rerank blended 0.95/0.05 with the tf-idf score.

An expander is a callable ``(raw_terms: dict[str, float], engine) ->
dict[str, float]`` applied to the parsed query BEFORE dictionary case
resolution, as the reference hooks its variants into the searcher.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import hash_str_u64, splitmix64

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


class HashWordVectors:
    """Deterministic dense vectors per word (GloVe stand-in)."""

    def __init__(self, dim: int = 50):
        self.dim = dim

    def __call__(self, words) -> np.ndarray:
        h = hash_str_u64(list(words))
        out = np.empty((len(h), self.dim), dtype=np.float64)
        state = h.copy()
        for j in range(self.dim):
            state = splitmix64(state)
            out[:, j] = (state.astype(np.float64) / 2**64) * 2.0 - 1.0
        return out


class TextWordVectors:
    """Word vectors loaded from the reference's text format — one
    ``word v1 v2 .. vD`` line per word (``Part C/search_engine_best.py:
    74-89``, GloVe text format).  Same callable API as
    ``HashWordVectors``; out-of-vocabulary words map to the zero vector
    (they contribute nothing to doc/query sums)."""

    def __init__(self, vocab: dict[str, int], matrix: np.ndarray):
        self._vocab = vocab
        self._matrix = matrix
        self.dim = matrix.shape[1] if matrix.size else 0

    def __call__(self, words) -> np.ndarray:
        out = np.zeros((len(words), self.dim), dtype=np.float64)
        idx = [self._vocab.get(w, -1) for w in words]
        hit = np.array(idx) >= 0 if idx else np.empty(0, bool)
        if hit.any():
            out[hit] = self._matrix[np.array(idx)[hit]]
        return out


def load_word_vectors(path: str, max_words: int = 100_000) -> TextWordVectors:
    """S5: load a ``word v1 .. vD`` text model file (the reference caps
    at 100k lines; so do we).  Returns the HashWordVectors-compatible
    callable used by ``EmbeddingKNNExpansion``, ``compute_doc_vectors``
    and ``rerank_by_embedding``."""
    vocab: dict[str, int] = {}
    rows = []
    dim = None
    with open(path) as f:
        for line in f:
            if len(rows) >= max_words:
                break
            # split() (not split(" ")): trailing spaces / tabs otherwise
            # produce empty tokens that crash the float parse.  Rows of
            # the wrong width are skipped — this also ignores the
            # "n_words dim" header line fastText-format files start with
            values = line.split()
            if len(values) < 2:
                continue
            if not rows and len(values) == 2 and all(v.isdigit() for v in values):
                continue  # fastText-style "n_words dim" header line
            if dim is None:
                dim = len(values) - 1
            if len(values) - 1 != dim:
                continue
            word = values[0]
            if word in vocab:
                continue
            vocab[word] = len(rows)
            rows.append(np.asarray(values[1:], dtype="float32"))
    matrix = np.stack(rows).astype(np.float64) if rows else np.zeros((0, 0))
    return TextWordVectors(vocab, matrix)


class SpellExpansion:
    def __init__(self, whitelist=("coronavirus",), max_distance: int = 2):
        self.whitelist = set(whitelist)
        self.max_distance = max_distance

    @staticmethod
    def _edits1(word: str) -> set[str]:
        splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
        deletes = {a + b[1:] for a, b in splits if b}
        transposes = {a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1}
        replaces = {a + c + b[1:] for a, b in splits if b for c in _ALPHABET}
        inserts = {a + c + b for a, b in splits for c in _ALPHABET}
        return deletes | transposes | replaces | inserts

    def __call__(self, raw: dict[str, float], engine) -> dict[str, float]:
        reader = engine.reader
        out: dict[str, float] = {}
        for term, w in raw.items():
            low = term.lower()
            if (
                low in self.whitelist
                or reader.has_term(low)
                or reader.has_term(term.upper())
            ):
                out[term] = out.get(term, 0) + w
                continue
            # probe both cases: entity-like terms live UPPERCASE in the
            # dictionary when no lowercase twin exists (postings fold
            # rule), and parse_query resolves them via term.upper() —
            # a lowercase-only probe could never correct their typos
            def known(c: str) -> str | None:
                if reader.has_term(c):
                    return c
                cu = c.upper()
                return cu if reader.has_term(cu) else None

            cands = {k for c in self._edits1(low) if (k := known(c))}
            if not cands and self.max_distance >= 2:
                for e1 in self._edits1(low):
                    cands.update(k for c in self._edits1(e1) if (k := known(c)))
            if cands:
                best = max(cands, key=lambda c: (reader.cf(c), c))  # cf, then term
                out[best] = out.get(best, 0) + w
            else:
                out[term] = out.get(term, 0) + w
        return out


class SynonymExpansion:
    def __init__(self, table: dict[str, list[str]], weight: float = 0.2):
        self.table = table
        self.weight = weight

    def __call__(self, raw: dict[str, float], engine) -> dict[str, float]:
        out = dict(raw)
        for term in list(raw):
            for syn in self.table.get(term.lower(), []):
                if syn not in out:
                    out[syn] = self.weight
        return out


class EmbeddingKNNExpansion:
    def __init__(self, vectors=None, k: int = 2, max_query_terms: int = 5,
                 new_weight: float = 1.0, existing_bonus: float = 0.1):
        self.vectors = vectors or HashWordVectors()
        self.k = k
        self.max_query_terms = max_query_terms
        self.new_weight = new_weight
        self.existing_bonus = existing_bonus

    def _vocab_matrix(self, reader):
        """Sorted vocab + embedding matrix, computed once per reader (the
        vocabulary is static for a reader's lifetime)."""
        cached = getattr(self, "_vm_cache", None)
        if cached is not None and cached[0] is reader:
            return cached[1], cached[2]
        vocab = sorted(reader.vocabulary())
        vmat = self.vectors(vocab) if vocab else np.zeros((0, self.vectors.dim))
        self._vm_cache = (reader, vocab, vmat)
        return vocab, vmat

    def __call__(self, raw: dict[str, float], engine) -> dict[str, float]:
        if len(raw) >= self.max_query_terms:
            return raw
        vocab, vmat = self._vocab_matrix(engine.reader)
        if not vocab:
            return raw
        out = dict(raw)
        qmat = self.vectors([t.lower() for t in raw])
        for i, term in enumerate(list(raw)):
            d = np.linalg.norm(vmat - qmat[i], axis=1)
            added = 0
            # nearest neighbours excluding the term itself, capped at k
            # new terms even when the term is out-of-vocabulary.
            # argpartition to the k+2 head (the loop consumes at most
            # k + the excluded self-forms) widened to ALL elements tied
            # with the boundary distance, then an index-stable sort of
            # that small set — O(V) instead of a full O(V log V) argsort
            # per query term on the serving hot path, and byte-identical
            # to the stable argsort it replaces (boundary ties included)
            head = min(self.k + 2, len(d))
            if head < len(d):
                part = np.argpartition(d, head - 1)[:head]
                cand_idx = np.flatnonzero(d <= d[part].max())
            else:
                cand_idx = np.arange(len(d))
            cand_idx = cand_idx[np.lexsort((cand_idx, d[cand_idx]))]
            for j in cand_idx:
                cand = vocab[int(j)]
                if cand == term or cand == term.lower():
                    continue
                if cand in out:
                    out[cand] += self.existing_bonus
                else:
                    out[cand] = self.new_weight
                added += 1
                if added >= self.k:
                    break
        return out


def compute_doc_vectors(index_dir: str, vectors=None, dim: int = 50,
                        out_name: str = "doc_vectors",
                        store_float64: bool = False) -> str:
    """I7 (``search_engine_best.py:129-141``): doc vector = Σ tf·vec(term)
    / doc_len, streamed over the tokenized checkpoint.

    ``store_float64`` keeps full precision on disk — required when the
    rerank must hash-match a DOUBLE-typed SQL oracle (float32 storage
    perturbs distances by ~1e-7, enough to flip 1e-6 rank keys)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    vectors = vectors or HashWordVectors(dim)
    vec_type = pa.float64() if store_float64 else pa.float32()

    def batch_vec(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat_terms = pc.list_flatten(t["terms"]).to_pylist()
        parent = pc.list_parent_indices(t["terms"]).to_numpy()
        tfs = pc.list_flatten(t["tfs"]).to_numpy().astype(np.float64)
        dls = t["doc_len"].to_numpy().astype(np.float64)
        n = t.num_rows
        acc = np.zeros((n, vectors.dim))
        if flat_terms:
            vecs = vectors(flat_terms) * tfs[:, None]
            np.add.at(acc, parent, vecs)
        acc /= np.maximum(dls, 1.0)[:, None]
        out = acc if store_float64 else acc.astype(np.float32)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "vec": pa.array(list(out), pa.list_(vec_type)),
            }
        )

    out_dir = os.path.join(index_dir, out_name)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    (
        rd.read_parquet(os.path.join(index_dir, "tokenized"),
                        columns=["doc_id", "doc_len", "terms", "tfs"])
        .map_batches(batch_vec, batch_format="pyarrow")
        .write_parquet(out_dir)
    )
    return out_dir


def rerank_by_embedding(engine, results, query: str, vectors=None,
                        w_rank: float = 0.95, w_score: float = 0.05,
                        vectors_dir: str = "doc_vectors"):
    """Q12: final = 0.95·(inv-euclid rank / max) + 0.05·(score / max).
    Final order ranks on the shared floor(score·1e6 + 0.5) key (ties by
    conv_id, turn_idx) so the DuckDB twin orders identically."""
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads

    vectors = vectors or HashWordVectors()
    if results.num_rows == 0:
        return results
    raw = engine.parse_query(query)
    if not raw:
        return results
    qvec = vectors(list(raw)).mean(axis=0)

    from ..functions.hashing import doc_id_i64

    conv = np.asarray(results["conv_id"].to_pylist(), dtype=object)
    turn = results["turn_idx"].to_numpy()
    rid = doc_id_i64(conv, turn)
    # read ONLY the k result docs' vectors (predicate pushdown), not the
    # whole doc_vectors table
    dv = pads.dataset(os.path.join(engine.reader.index_dir, vectors_dir)).to_table(
        filter=pads.field("doc_id").isin(sorted(set(int(r) for r in rid)))
    )
    ids = dv["doc_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in dv["vec"].to_pylist()])[order] \
        if dv.num_rows else np.zeros((0, vectors.dim))
    pos = np.searchsorted(ids, rid).clip(0, max(len(ids) - 1, 0))
    found = len(ids) > 0
    hit = (ids[pos] == rid) if found else np.zeros(len(rid), dtype=bool)
    dvecs = np.zeros((len(rid), mat.shape[1] if found else vectors.dim))
    if found:
        dvecs[hit] = mat[pos[hit]]
    dist = np.linalg.norm(dvecs - qvec, axis=1)
    # docs without a stored vector (e.g. appended after
    # compute_doc_vectors) rank LAST on the embedding half: infinite
    # distance, not the zero vector's ||q|| (which can beat real vectors
    # pointing away from the query)
    dist[~hit] = np.inf
    inv = 1.0 / np.maximum(dist, 1e-12)
    scores = results["score"].to_numpy()
    smax = max(scores.max(), 1e-12)
    rmax = max(inv.max(), 1e-12)
    final = w_rank * (inv / rmax) + w_score * (scores / smax)
    new_order = np.lexsort((turn, conv, -np.floor(final * 1e6 + 0.5)))
    return pa.table(
        {
            "conv_id": pa.array(conv[new_order], pa.string()),
            "turn_idx": pa.array(turn[new_order].astype(np.int32), pa.int32()),
            "score": pa.array(final[new_order], pa.float64()),
        }
    )
