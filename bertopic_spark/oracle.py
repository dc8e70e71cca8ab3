"""Local (single-node, numpy) oracle for the engine's math.

Independently re-implements, from the published algorithm (the c-TF-IDF
formula in BERTopic's docs/paper and the classic BM25 idf), the exact
arithmetic of ``ClassTfidfTransformer`` (reference
``bertopic/vectorizers/_ctfidf.py:54-115``):

  fit(X):   df[t]  = Σ_c X[c,t]                     (total term count)
            A      = int( mean_c( Σ_t X[c,t] ) )    (truncated avg class size)
            idf[t] = log(A / df[t] + 1)                       (default)
            idf[t] = log(1 + (A - df[t] + 0.5) / (df[t] + 0.5))  (bm25)
  transform(X): L1-normalize rows; if reduce_frequent_words, sqrt the
            normalized values; multiply by idf[t]. All float64.

This module is the term-for-term gate for the Spark implementation
(`operators/ctfidf.py`) — tests compare top-k keyword lists and scores at
1e-9. It is pure Python + numpy (no scipy/sklearn in the container), built
on dicts keyed by (class, term); fine at test scale.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, Hashable, Iterable, List, Sequence, Tuple

from bertopic_spark.tokenizer import tokenize_many

ClassKey = Hashable


def bow_per_class(
    docs: Sequence[str],
    classes: Sequence[ClassKey],
    mode: str = "ascii_code",
    ngram_range: tuple[int, int] = (1, 1),
) -> Dict[ClassKey, Counter]:
    """Class×term count 'matrix' as {class: Counter(term→tf)}."""
    x: Dict[ClassKey, Counter] = defaultdict(Counter)
    for toks, c in zip(tokenize_many(docs, mode, ngram_range), classes):
        x[c].update(toks)
    return x


def idf_vector(
    x: Dict[ClassKey, Counter], bm25_weighting: bool = False, clamp: float | None = None
) -> Dict[str, float]:
    """Per-term idf under either weighting variant.

    clamp: if set, the bm25 log argument is floored at this value (the
    engine's SQL-safe behavior; reference numpy would yield NaN instead).
    """
    df: Counter = Counter()
    for cnt in x.values():
        df.update(cnt)
    class_sizes = [sum(cnt.values()) for cnt in x.values()]
    avg_nr_samples = int(sum(class_sizes) / len(class_sizes))
    idf: Dict[str, float] = {}
    for t, d in df.items():
        if bm25_weighting:
            arg = 1.0 + (avg_nr_samples - d + 0.5) / (d + 0.5)
            if clamp is not None:
                arg = max(arg, clamp)
            idf[t] = math.log(arg) if arg > 0 else float("nan")
        else:
            idf[t] = math.log(avg_nr_samples / d + 1.0)
    return idf


def ctfidf_scores(
    x: Dict[ClassKey, Counter],
    bm25_weighting: bool = False,
    reduce_frequent_words: bool = False,
    clamp: float | None = None,
) -> Dict[ClassKey, Dict[str, float]]:
    """transform(X): L1 row-norm (+optional sqrt) × idf, float64."""
    idf = idf_vector(x, bm25_weighting, clamp)
    out: Dict[ClassKey, Dict[str, float]] = {}
    for c, cnt in x.items():
        total = float(sum(cnt.values()))
        row: Dict[str, float] = {}
        for t, tf in cnt.items():
            v = tf / total
            if reduce_frequent_words:
                v = math.sqrt(v)
            row[t] = v * idf[t]
        out[c] = row
    return out


def top_k_terms(
    scores: Dict[ClassKey, Dict[str, float]], k: int = 10
) -> Dict[ClassKey, List[Tuple[str, float]]]:
    """Per-class top-k terms, score desc, term asc tie-break (engine order)."""
    return {
        c: sorted(row.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for c, row in scores.items()
    }


def bm25_topk(
    docs: Sequence[str],
    doc_ids: Sequence[int],
    queries: Dict[int, str],
    k: int = 10,
    mode: str = "ascii_code",
    bm25_weighting: bool = True,
    reduce_frequent_words: bool = False,
    clamp: float | None = 1e-10,
) -> Dict[int, List[Tuple[int, float]]]:
    """Exhaustive doc-level retrieval oracle.

    Each document is its own class (the degenerate case of the class×term
    math), score(q,d) = Σ_{t ∈ tokens(q) distinct} ctfidf[d,t]; top-k by
    (score desc, doc_id asc).
    """
    x = {i: Counter(toks) for i, toks in zip(doc_ids, tokenize_many(docs, mode))}
    x = {i: c for i, c in x.items() if c}
    scores = ctfidf_scores(x, bm25_weighting, reduce_frequent_words, clamp)
    results: Dict[int, List[Tuple[int, float]]] = {}
    for qid, qtext in queries.items():
        qterms = sorted(set(tokenize_many([qtext], mode)[0]))
        acc: Dict[int, float] = defaultdict(float)
        for d, row in scores.items():
            s = 0.0
            hit = False
            for t in qterms:
                if t in row:
                    s += row[t]
                    hit = True
            if hit:
                acc[d] = s
        results[qid] = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return results
