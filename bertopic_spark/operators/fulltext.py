"""Fulltext query operators: positional postings, phrase match, boolean
queries.

The reference has no phrase/boolean query surface (BERTopic's retrieval is
bag-of-words c-TF-IDF / embedding similarity); these extend the engine's
fulltext-index tier the way any inverted-index engine does — the positional
relation here is the row form of what ``index/segments.py`` stores as
compressed blocks.

Every operator has two physical strategies:

* a **scan** path — one pass over the corpus, pure-JVM higher-order
  functions over the token array, zero shuffle. The right plan for one-off
  queries (Catalyst prunes to (id, text) and the whole predicate runs
  inside WholeStageCodegen).
* a **postings** path — consumes a (id, term, pos) / (id, term) relation
  (at 100 TB: materialized once, bucketed by term, filter on the query's
  terms pushed to the parquet scan so only those buckets are read). The
  right plan when many queries amortize one tokenization.

HOF-binding note: the token array is always bound as a higher-order-function
lambda variable (the ``F.get(F.transform(F.array(x), ...), 0)`` wrap) —
referencing a ``withColumn`` intermediate from many probes lets Catalyst's
CollapseProject inline the tokenizer regexp into every probe (measured 100×
slowdowns elsewhere in this engine; see operators/postings.py).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.tokenizer import tokenize_one, with_tokens


def _bound(col: F.Column, fn) -> F.Column:
    """Evaluate ``col`` once per row and pass it to ``fn`` as a lambda var."""
    return F.get(F.transform(F.array(col), fn), 0)


def doc_term_positions(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", mode: str = "ascii_code",
                       terms: Sequence[str] | None = None) -> DataFrame:
    """Positional postings: (id, term, pos), 0-based token position.

    With ``terms``, rows are pruned right after tokenization (before any
    shuffle); when reading a MATERIALIZED copy back, the same ``isin``
    filter is pushed to the parquet scan instead (see callers).
    """
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    out = toks.select(F.col(id_col),
                      F.posexplode("tokens").alias("pos", "term"))
    if terms is not None:
        out = out.filter(F.col("term").isin([str(t) for t in terms]))
    return out.select(id_col, "term", "pos")


def phrase_match(df: DataFrame, phrase: str, text_col: str = "text",
                 id_col: str = "doc_id", mode: str = "ascii_code") -> DataFrame:
    """Docs containing ``phrase`` as consecutive tokens: (id, n_matches).

    Scan path: n_matches = number of start positions (overlapping
    occurrences count), computed per row from the token array with one
    filter-over-sequence HOF — no shuffle, no UDF; the corpus streams
    through WholeStageCodegen once.
    """
    toks = tokenize_one(phrase, mode)
    if not toks:
        raise ValueError(f"phrase {phrase!r} has no tokens in mode {mode}")
    n = len(toks)

    def starts(tk):
        seq = F.when(F.size(tk) >= n,
                     F.sequence(F.lit(0), F.size(tk) - n)
                     ).otherwise(F.array().cast("array<int>"))
        return F.filter(seq, lambda i: reduce(
            lambda acc, j: acc & (F.get(tk, i + j) == F.lit(toks[j])),
            range(1, n), F.get(tk, i) == F.lit(toks[0])))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       F.size(_bound(F.col("tokens"), starts))
                       .cast("long").alias("n_matches"))
            .filter(F.col("n_matches") > 0))


def phrase_match_postings(positions: DataFrame, phrase_tokens: Sequence[str],
                          id_col: str = "doc_id") -> DataFrame:
    """Indexed phrase match over a (id, term, pos) relation: (id, n_matches).

    Plan: prune the postings to the phrase's terms (pushed to the scan when
    ``positions`` is a materialized source), collect per-doc position lists
    for the ≤ n distinct terms, then intersect with offsets per doc. Only
    docs containing EVERY phrase term reach the final HOF — the expensive
    adjacency check never sees the rest of the corpus. Worst case is an
    all-stop-term phrase, where the pruned relation is large; that is
    inherent to positional phrase evaluation (block-level skipping in the
    segment layer is the mitigation, not a different join).
    """
    toks = [str(t) for t in phrase_tokens]
    if not toks:
        raise ValueError("empty phrase")
    n, distinct = len(toks), sorted(set(toks))
    pruned = positions.filter(F.col("term").isin(distinct))
    per_term = pruned.groupBy(id_col, "term").agg(
        F.collect_list("pos").alias("ps"))
    per_doc = (per_term.groupBy(id_col)
               .agg(F.map_from_entries(
                   F.collect_list(F.struct("term", "ps"))).alias("pm"))
               .filter(F.size("pm") == len(distinct)))

    def starts(pm):
        return F.filter(
            F.element_at(pm, F.lit(toks[0])),
            lambda p: reduce(
                lambda acc, j: acc & F.array_contains(
                    F.element_at(pm, F.lit(toks[j])), p + j),
                range(1, n), F.lit(True)))

    return (per_doc.select(F.col(id_col),
                           F.size(_bound(F.col("pm"), starts))
                           .cast("long").alias("n_matches"))
            .filter(F.col("n_matches") > 0))


def boolean_match(df: DataFrame, must: Sequence[str] = (),
                  should: Sequence[str] = (), must_not: Sequence[str] = (),
                  min_should: int = 1, text_col: str = "text",
                  id_col: str = "doc_id", mode: str = "ascii_code") -> DataFrame:
    """Boolean term query (AND / OR / NOT): (id, n_matched).

    Matches docs containing every ``must`` term, at least ``min_should`` of
    ``should`` (vacuous when ``should`` is empty), and none of ``must_not``.
    ``n_matched`` = distinct must+should terms present. Scan path: one
    corpus pass, all set logic on the token array in JVM expressions.
    """
    must, should, must_not = list(must), list(should), list(must_not)
    if not must and not should:
        raise ValueError("need at least one must or should term")

    def verdict(tk):
        pos = F.array_intersect(
            F.array_distinct(tk),
            F.array(*[F.lit(t) for t in (*must, *should)]))
        ok = F.lit(True)
        for m in must:
            ok = ok & F.array_contains(tk, m)
        if should:
            n_should = F.size(F.array_intersect(
                F.array_distinct(tk), F.array(*[F.lit(t) for t in should])))
            ok = ok & (n_should >= min_should)
        if must_not:
            ok = ok & ~F.arrays_overlap(
                tk, F.array(*[F.lit(t) for t in must_not]))
        return F.struct(ok.alias("ok"),
                        F.size(pos).cast("long").alias("n_matched"))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    v = out.select(F.col(id_col), _bound(F.col("tokens"), verdict).alias("v"))
    return (v.filter(F.col("v.ok"))
            .select(id_col, F.col("v.n_matched").alias("n_matched")))


def boolean_match_postings(postings: DataFrame, must: Sequence[str] = (),
                           should: Sequence[str] = (),
                           must_not: Sequence[str] = (), min_should: int = 1,
                           id_col: str = "doc_id") -> DataFrame:
    """Boolean query over a (id, term[, ...]) posting relation.

    Plan: prune to the query's terms (pushed to the scan of a materialized
    index), one groupBy(id) collecting the matched-term set, then pure set
    predicates. NOT is evaluated against the pruned set — a doc whose only
    query terms are ``must_not`` terms appears in the agg and is rejected;
    a doc with no query terms at all never leaves the scan (correct, since
    must/should is required non-empty).
    """
    must, should, must_not = list(must), list(should), list(must_not)
    if not must and not should:
        raise ValueError("need at least one must or should term")
    terms = sorted({*must, *should, *must_not})
    hit = (postings.filter(F.col("term").isin(terms))
           .groupBy(id_col).agg(F.collect_set("term").alias("ts")))
    ok = F.lit(True)
    for m in must:
        ok = ok & F.array_contains("ts", m)
    if should:
        ok = ok & (F.size(F.array_intersect(
            "ts", F.array(*[F.lit(t) for t in should]))) >= min_should)
    if must_not:
        ok = ok & ~F.arrays_overlap(
            "ts", F.array(*[F.lit(t) for t in must_not]))
    pos_terms = F.array(*[F.lit(t) for t in (*must, *should)])
    return (hit.filter(ok)
            .select(id_col,
                    F.size(F.array_intersect("ts", pos_terms))
                    .cast("long").alias("n_matched")))
