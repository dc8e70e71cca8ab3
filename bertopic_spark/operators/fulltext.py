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

import re
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
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


def phrase_match_batch(positions: DataFrame, phrases,
                       id_col: str = "doc_id") -> DataFrame:
    """Batched indexed phrase match: (query_id, id, n_matches) for EVERY
    phrase in ONE plan — the phrase analog of the 40-query BM25 batch job.

    ``phrases`` maps query_id -> token sequence. The postings prune once to
    the union of all phrase terms; per-(doc, term) position lists build
    once and fan out to phrases via a broadcast (query_id, term) join, so N
    phrases share one scan + one shuffle instead of N jobs. The adjacency
    check is the same per-doc offset intersection as
    ``phrase_match_postings`` but driven by the phrase's token array
    (nested HOF lambdas — outer ``filter`` over first-term positions,
    inner ``aggregate`` over offsets), all JVM-side.
    """
    items = [(int(q), [str(t) for t in ts]) for q, ts in sorted(phrases.items())]
    if not items or any(not ts for _, ts in items):
        raise ValueError("need at least one phrase; phrases must be non-empty")
    spark = positions.sparkSession
    pt = spark.createDataFrame(
        [(q, t) for q, ts in items for t in sorted(set(ts))],
        "query_id long, term string")
    tk = spark.createDataFrame([(q, ts) for q, ts in items],
                               "query_id long, toks array<string>")
    all_terms = sorted({t for _, ts in items for t in ts})
    per_term = (positions.filter(F.col("term").isin(all_terms))
                .groupBy(id_col, "term")
                .agg(F.sort_array(F.collect_list("pos")).alias("ps")))
    cand = (per_term.join(F.broadcast(pt), "term")
            .groupBy("query_id", id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct("term", "ps"))).alias("pm"))
            .join(F.broadcast(tk), "query_id")
            .filter(F.size("pm") == F.size(F.array_distinct("toks"))))
    first = F.element_at(F.col("pm"), F.element_at(F.col("toks"), F.lit(1)))
    n_matches = F.when(F.size("toks") == 1, F.size(first)).otherwise(
        F.size(F.filter(first, lambda p: F.aggregate(
            F.sequence(F.lit(1), F.size(F.col("toks")) - F.lit(1)),
            F.lit(True),
            lambda acc, j: acc & F.array_contains(
                F.element_at(F.col("pm"),
                             F.element_at(F.col("toks"), j + F.lit(1))),
                p + j)))))
    return (cand.select("query_id", F.col(id_col),
                        n_matches.cast("long").alias("n_matches"))
            .filter(F.col("n_matches") > 0))


def bigram_counts(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  mode: str = "ascii_code") -> DataFrame:
    """Adjacent-token 2-shingle counts: (id, bigram, n) with
    bigram = "w1 w2". The Lucene ShingleFilter index relation — the
    prefilter tier of shingle-accelerated phrase queries
    (``phrase_match_shingled``). One scan + one two-phase agg; at scale
    this persists next to the positional tree and is ~|positions| rows
    pre-agg, vocabulary²-bounded after."""
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)

    def grams(tk):
        seq = F.when(F.size(tk) >= 2,
                     F.sequence(F.lit(0), F.size(tk) - 2)
                     ).otherwise(F.array().cast("array<int>"))
        return F.transform(seq, lambda i: F.concat_ws(
            " ", F.get(tk, i), F.get(tk, i + 1)))

    return (toks.select(F.col(id_col),
                        F.explode(_bound(F.col("tokens"), grams))
                        .alias("bigram"))
            .groupBy(id_col, "bigram")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def phrase_match_shingled(df: DataFrame, phrase: str,
                          text_col: str = "text", id_col: str = "doc_id",
                          mode: str = "ascii_code",
                          bigrams: DataFrame | None = None) -> DataFrame:
    """Shingle-accelerated phrase match — Lucene's "fast phrases" recipe
    (ShingleFilter / ES index_phrases): (id, n_matches), result-identical
    to ``phrase_match``/``phrase_match_postings`` (two physical
    strategies, one truth).

    A 2-token phrase is answered from the bigram index ALONE (its count
    is exactly the occurrence count — no positions touched). Longer
    phrases prefilter: candidates are the docs containing EVERY phrase
    bigram (one groupBy over the bigram-pruned shingle relation), then
    the exact adjacency HOF runs over only the candidate docs via a
    semi-join — on a web corpus the expensive positional verification
    sees orders of magnitude fewer docs than the rarest-single-term
    prune, because bigram selectivity compounds. Pass a persisted
    ``bigrams`` relation (``bigram_counts`` output) to skip rebuilding
    the index; the prefilter is sound (every true match contains all its
    bigrams), so recall is exact by construction."""
    toks = tokenize_one(phrase, mode)
    if len(toks) < 2:
        raise ValueError("shingled phrase match needs >= 2 tokens; use a "
                         "term query for single terms")
    bg = bigrams if bigrams is not None else bigram_counts(
        df, text_col, id_col, mode)
    grams = [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    if len(toks) == 2:
        return (bg.filter(F.col("bigram") == grams[0])
                .select(F.col(id_col), F.col("n").alias("n_matches")))
    distinct = sorted(set(grams))
    cand = (bg.filter(F.col("bigram").isin(distinct))
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("_k"))
            .filter(F.col("_k") == len(distinct))
            .select(id_col))
    sliced = df.select(id_col, text_col).join(cand, id_col, "left_semi")
    return phrase_match(sliced, phrase, text_col, id_col, mode)


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


# ---------------------------------------------------------------------------
# Term-dictionary expansion: prefix / wildcard / fuzzy queries.
#
# Lucene evaluates these as an automaton intersected with the term dictionary
# (a tiny relation next to the postings), then runs the expanded term set as
# a disjunction. Same architecture here: the dictionary is one distinct-agg
# over terms (at 100 TB it already exists — the segment layer's per-term
# stats relation, index/segments.py), the expansion is a filter over that
# small relation, and the expanded set (bounded by ``max_expand``) is taken
# to the driver and broadcast into the match as array literals. The corpus /
# postings are touched exactly once, by the final match pass.
# ---------------------------------------------------------------------------


def term_dictionary(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    mode: str = "ascii_code") -> DataFrame:
    """Distinct terms with document frequency: (term, df).

    One tokenize pass + one two-phase agg; partial aggregation collapses
    each partition to its local vocabulary before the shuffle, so the
    shuffle volume is O(|vocab| × partitions), not O(postings).
    """
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (toks.select(F.col(id_col),
                        F.explode(F.array_distinct("tokens")).alias("term"))
            .groupBy("term").agg(F.count("*").cast("long").alias("df")))


def expand_terms(dictionary: DataFrame, predicate: Column,
                 max_expand: int = 1000) -> list[str]:
    """Terms of the dictionary matching ``predicate``, sorted, bounded.

    Raises if the expansion exceeds ``max_expand`` — an unbounded expansion
    (e.g. prefix ``a*`` on a web corpus) must fail loudly, not broadcast a
    million-literal filter.
    """
    rows = (dictionary.filter(predicate).select("term")
            .limit(max_expand + 1).collect())
    if len(rows) > max_expand:
        raise ValueError(
            f"expansion exceeds max_expand={max_expand}; "
            "narrow the pattern or raise the cap")
    return sorted(r["term"] for r in rows)


def prefix_terms(dictionary: DataFrame, prefix: str,
                 max_expand: int = 1000) -> list[str]:
    """Dictionary terms starting with ``prefix``.

    The ``startswith`` predicate compiles to ``StartsWith``, which parquet
    sources push down when the dictionary is materialized sorted by term.
    """
    if not prefix:
        raise ValueError("empty prefix")
    return expand_terms(dictionary, F.col("term").startswith(prefix),
                        max_expand)


def wildcard_regex(pattern: str) -> str:
    """Translate a ``*``/``?`` wildcard pattern to an anchored regex."""
    out = []
    for ch in pattern:
        out.append(".*" if ch == "*" else "." if ch == "?" else re.escape(ch))
    return "^" + "".join(out) + "$"


def wildcard_terms(dictionary: DataFrame, pattern: str,
                   max_expand: int = 1000) -> list[str]:
    """Dictionary terms matching a ``*``/``?`` wildcard pattern."""
    if not pattern.strip("*?"):
        raise ValueError(f"pattern {pattern!r} matches everything")
    return expand_terms(
        dictionary, F.col("term").rlike(wildcard_regex(pattern)), max_expand)


def term_trigrams(dictionary: DataFrame, term_col: str = "term") -> DataFrame:
    """(term, gram) trigram postings over the TERM DICTIONARY, with ``^``
    and ``$`` anchor characters (the ES ``wildcard`` field / Lucene
    n-gram-acceleration design): built once beside the dictionary (the
    dictionary is ~10⁻³ of corpus bytes, its trigram relation ~10× that),
    so infix/leading-wildcard candidate generation becomes a gram-postings
    intersection instead of a full dictionary regex scan — at a 10⁹-term
    web dictionary that is the difference between touching every term and
    touching the gram buckets of the pattern's literals."""
    padded = dictionary.select(
        F.col(term_col).alias("term"),
        F.concat(F.lit("^"), F.col(term_col), F.lit("$")).alias("_p"))
    grams = F.transform(
        F.sequence(F.lit(1), F.length("_p") - 2),
        lambda i: F.substring(F.col("_p"), i, F.lit(3)))
    return padded.select("term",
                         F.explode(F.array_distinct(grams)).alias("gram"))


def _pattern_grams(pattern: str) -> list[str]:
    """Required trigrams implied by a wildcard pattern's literal runs
    (anchored at ends not covered by a wildcard). Empty list = no literal
    run reaches 3 chars → the gram index can't prune (caller falls back)."""
    runs = re.split(r"[*?]", pattern)
    if runs and not pattern.startswith(("*", "?")):
        runs[0] = "^" + runs[0]
    if runs and not pattern.endswith(("*", "?")):
        runs[-1] = runs[-1] + "$"
    grams = []
    for r in runs:
        grams.extend(r[i:i + 3] for i in range(len(r) - 2))
    return sorted(set(grams))


def wildcard_terms_indexed(dictionary: DataFrame, trigrams: DataFrame,
                           pattern: str, max_expand: int = 1000) -> list[str]:
    """``wildcard_terms`` served from the trigram index: candidate terms =
    the intersection of the pattern's required gram postings (one groupBy
    over the pruned gram rows), then the exact anchored regex verifies the
    survivors — result-identical to the dictionary-scan path
    (pytest-pinned). Patterns whose literal runs never reach 3 characters
    (e.g. ``a*b``) carry no usable gram and fall back to the scan path."""
    if not pattern.strip("*?"):
        raise ValueError(f"pattern {pattern!r} matches everything")
    grams = _pattern_grams(pattern)
    if not grams:
        return wildcard_terms(dictionary, pattern, max_expand)
    cand = (trigrams.filter(F.col("gram").isin(grams))
            .groupBy("term")
            .agg(F.count_distinct(F.col("gram")).alias("_g"))
            .filter(F.col("_g") == len(grams)))
    return expand_terms(cand, F.col("term").rlike(wildcard_regex(pattern)),
                        max_expand)


def fuzzy_terms(dictionary: DataFrame, term: str, max_dist: int = 1,
                max_expand: int = 1000) -> list[str]:
    """Dictionary terms within ``max_dist`` Levenshtein edits of ``term``.

    The length band ``| |t| - |term| | <= max_dist`` prunes the dictionary
    with one cheap comparison before the O(n·m) edit distance runs; Spark's
    three-arg ``levenshtein`` also early-exits above the threshold.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    band = F.abs(F.length("term") - F.lit(len(term))) <= max_dist
    close = F.levenshtein(F.col("term"), F.lit(term), max_dist) >= 0
    return expand_terms(dictionary, band & close, max_expand)


#: Regex constructs shared by Java regex (Spark ``rlike``) and RE2
#: (DuckDB / Lucene RegexpQuery): literals, char classes, ., *, +, ?,
#: {m,n}, alternation, grouping. Backrefs and lookaround are Java-only
#: (RE2 rejects them), so they are rejected here for portability — the
#: same subset Lucene's own RegExp automaton supports.
_REGEXP_FORBIDDEN = re.compile(r"\\[0-9]|\(\?<?[=!]")


def regexp_terms(dictionary: DataFrame, pattern: str,
                 max_expand: int = 1000) -> list[str]:
    """Dictionary terms matching an (anchored) regular expression —
    Lucene/ES ``regexp`` query. The pattern is compiled against the term
    dictionary only (never the corpus), bounded by ``max_expand``; the
    expanded set then runs as an ordinary disjunction over one corpus /
    postings pass, exactly like prefix/wildcard/fuzzy.

    Patterns are restricted to the Java-regex ∩ RE2 subset (no backrefs,
    no lookaround) so the expansion is engine-portable; like Lucene, the
    pattern is anchored — it must match the ENTIRE term."""
    if not pattern:
        raise ValueError("empty pattern")
    if _REGEXP_FORBIDDEN.search(pattern):
        raise ValueError(
            "backreferences and lookaround are not in the portable "
            f"RE2 subset: {pattern!r}")
    re.compile(pattern)  # fail fast on syntax errors, driver-side
    anchored = f"^(?:{pattern})$"
    return expand_terms(dictionary, F.col("term").rlike(anchored), max_expand)


def term_set_match(df: DataFrame, terms: Sequence[str],
                   text_col: str = "text", id_col: str = "doc_id",
                   mode: str = "ascii_code") -> DataFrame:
    """Docs containing ANY of ``terms``: (id, n_matches, n_terms).

    ``n_matches`` counts occurrences, ``n_terms`` distinct matched terms.
    Scan path: one corpus pass, the (expanded) term set as an array literal
    evaluated per row in WholeStageCodegen — the disjunction leg of a
    prefix/wildcard/fuzzy query after dictionary expansion.
    """
    ts = sorted(set(str(t) for t in terms))
    if not ts:
        raise ValueError("empty term set")
    lit = F.array(*[F.lit(t) for t in ts])

    def verdict(tk):
        hits = F.filter(tk, lambda t: F.array_contains(lit, t))
        return F.struct(
            F.size(hits).cast("long").alias("n_matches"),
            F.size(F.array_distinct(hits)).cast("long").alias("n_terms"))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    v = out.select(F.col(id_col), _bound(F.col("tokens"), verdict).alias("v"))
    return (v.filter(F.col("v.n_matches") > 0)
            .select(id_col, F.col("v.n_matches").alias("n_matches"),
                    F.col("v.n_terms").alias("n_terms")))


def term_set_match_postings(postings: DataFrame, terms: Sequence[str],
                            id_col: str = "doc_id") -> DataFrame:
    """``term_set_match`` over a (id, term[, pos]) relation.

    The ``isin`` prune is pushed to the scan of a materialized index, so
    only the expanded terms' postings are read — the plan Lucene executes
    for a wildcard query, expressed as a filter + one partial-agg groupBy.
    """
    ts = sorted(set(str(t) for t in terms))
    if not ts:
        raise ValueError("empty term set")
    return (postings.filter(F.col("term").isin(ts))
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.count_distinct("term").cast("long").alias("n_terms")))


# ---------------------------------------------------------------------------
# Snippets and facets.
# ---------------------------------------------------------------------------


def best_snippet(df: DataFrame, query_terms: Sequence[str], window: int = 8,
                 text_col: str = "text", id_col: str = "doc_id",
                 mode: str = "ascii_code") -> DataFrame:
    """Best highlight window per matching doc: (id, start, n_hits, snippet).

    The best window is the ``window``-token span holding the most query-term
    occurrences, anchored at a hit; ties break to the earliest start, so the
    result is deterministic. Everything is per-row JVM HOF algebra over the
    hit-position list (O(h²) per doc in the number of hits, h being small
    for real queries) — no shuffle, no UDF; the corpus streams through once.
    """
    ts = sorted(set(str(t) for t in query_terms))
    if not ts or window < 1:
        raise ValueError("need query terms and window >= 1")
    lit = F.array(*[F.lit(t) for t in ts])

    def pick(tk):
        pos = F.filter(F.sequence(F.lit(0), F.size(tk) - 1),
                       lambda i: F.array_contains(lit, F.get(tk, i)))
        counts = F.transform(pos, lambda p: F.size(
            F.filter(pos, lambda q: (q >= p) & (q < p + window))))
        best = F.array_max(counts)
        start = F.get(pos, F.array_position(counts, best) - 1)
        return F.when(F.size(pos) > 0, F.struct(
            start.cast("long").alias("start"),
            best.cast("long").alias("n_hits"),
            F.array_join(F.slice(tk, start + 1, window), " ").alias("snippet")))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    v = out.select(F.col(id_col), _bound(F.col("tokens"), pick).alias("v"))
    return (v.filter(F.col("v").isNotNull())
            .select(id_col, "v.start", "v.n_hits", "v.snippet"))


def top_snippets(df: DataFrame, query_terms: Sequence[str],
                 n_fragments: int = 3, window: int = 8,
                 text_col: str = "text", id_col: str = "doc_id",
                 mode: str = "ascii_code") -> DataFrame:
    """Multi-fragment highlighting — the ES ``number_of_fragments`` analog
    (fast-vector-highlighter fragmenting): (id, frag_rank, start, n_hits,
    snippet), up to ``n_fragments`` per matching doc.

    Fragments are FIXED TILES of ``window`` tokens (start = ⌊pos/window⌋ ×
    window) ranked by query-hit count, ties to the earliest tile — fully
    deterministic where ES fragment selection is analyzer/offset dependent,
    and non-overlapping by construction (``best_snippet`` keeps the
    hit-anchored single best window; this is the paginated variant).

    Per-row JVM HOF algebra over the token list — hit positions → tile
    ids → per-tile counts → comparator sort → top-n slice — then ONE
    posexplode of ≤ n_fragments structs per doc. No shuffle, no UDF; the
    corpus streams through once.
    """
    ts = sorted(set(str(t) for t in query_terms))
    if not ts or window < 1 or n_fragments < 1:
        raise ValueError("need query terms, window >= 1, n_fragments >= 1")
    lit = F.array(*[F.lit(t) for t in ts])
    w = int(window)

    def pick(tk):
        hitpos = F.filter(F.sequence(F.lit(0), F.size(tk) - 1),
                          lambda i: F.array_contains(lit, F.get(tk, i)))
        tiles = F.transform(hitpos, lambda p: (p / w).cast("long"))
        uniq = F.array_distinct(tiles)
        cand = F.transform(uniq, lambda t: F.struct(
            t.alias("tile"),
            F.size(F.filter(tiles, lambda x: x == t)).cast("long")
            .alias("n_hits")))
        ranked = F.array_sort(cand, lambda l, r: F.when(
            l["n_hits"] > r["n_hits"], F.lit(-1)).when(
            l["n_hits"] < r["n_hits"], F.lit(1)).otherwise(
            F.when(l["tile"] < r["tile"], F.lit(-1)).when(
                l["tile"] > r["tile"], F.lit(1)).otherwise(F.lit(0))))
        return F.slice(ranked, 1, n_fragments)

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    v = out.select(F.col(id_col), F.col("tokens"),
                   _bound(F.col("tokens"), pick).alias("v"))
    ex = v.select(
        id_col, "tokens",
        F.posexplode("v").alias("_i", "frag"))
    return ex.select(
        id_col,
        (F.col("_i") + 1).cast("long").alias("frag_rank"),
        (F.col("frag.tile") * w).alias("start"),
        F.col("frag.n_hits"),
        F.array_join(
            F.slice(F.col("tokens"), F.col("frag.tile").cast("int") * w + 1, w),
            " ").alias("snippet"))


def facet_counts(matches: DataFrame, docs: DataFrame,
                 facets: Sequence[str], id_col: str = "doc_id") -> DataFrame:
    """Facet histograms over a match relation: (facet, value, n_docs).

    ``matches`` is any (id, ...) relation (boolean_match, term_set_match,
    bm25 top-k); ``docs`` carries the facet columns. One broadcast-free
    semi-join prunes docs to the hits, then a single ``stack`` explodes the
    facet columns so ALL histograms come out of one shuffle instead of one
    per facet. Facet values are cast to string (a histogram axis, not a
    typed value); NULLs count under the literal 'null' bucket.
    """
    fs = list(facets)
    if not fs:
        raise ValueError("need at least one facet column")
    hit = docs.join(matches.select(id_col), id_col, "left_semi")
    stack = F.expr("stack({}, {})".format(
        len(fs), ", ".join(
            f"'{c}', coalesce(cast(`{c}` as string), 'null')" for c in fs)))
    return (hit.select(stack.alias("facet", "value"))
            .groupBy("facet", "value")
            .agg(F.count("*").cast("long").alias("n_docs")))


def suggest_terms(dictionary: DataFrame, queries: Sequence[str],
                  max_dist: int = 2, n: int = 3) -> DataFrame:
    """Did-you-mean: (q_term, suggestion, dist, df, rank).

    Top-n dictionary terms per misspelled input, ranked by edit distance,
    then document frequency (desc), then term — Lucene's DirectSpellChecker
    ordering. The query list explodes as literals against the dictionary
    (the SMALL relation; the corpus is never touched), length-banded before
    the O(n·m) distance. Exact matches (dist 0) rank first naturally.
    """
    qs = sorted(set(str(q) for q in queries))
    if not qs:
        raise ValueError("need at least one query term")
    if max_dist < 0 or n < 1:
        raise ValueError("max_dist must be >= 0 and n >= 1")
    q = F.explode(F.array(*[F.lit(t) for t in qs])).alias("q_term")
    cand = (dictionary.select(q, "term", "df")
            .filter(F.abs(F.length("term") - F.length("q_term")) <= max_dist)
            .withColumn("dist", F.levenshtein(F.col("term"), F.col("q_term")))
            .filter(F.col("dist") <= max_dist))
    w = Window.partitionBy("q_term").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select("q_term", F.col("term").alias("suggestion"),
                    F.col("dist").cast("long").alias("dist"), "df",
                    F.col("rank").cast("long").alias("rank")))


def search_with_snippets(corpus: DataFrame, queries, k: int = 10,
                         window: int = 8, text_col: str = "text",
                         id_col: str = "doc_id", mode: str = "ascii_code",
                         bm25_weighting: bool = True,
                         _persisted_out: list | None = None) -> DataFrame:
    """Search-result assembly: BM25 top-k + highlight per hit.

    (query_id, doc_id, score, rank, start, n_hits, snippet). The snippet
    HOF runs ONLY on the k hits per query (a broadcast-sized relation after
    retrieval), never the corpus — the term set varies per row, so tokens
    and query terms are bound together in one struct lambda var. Hits whose
    text no longer contains a query token (possible when retrieval ran on
    a stale index) keep NULL highlight columns rather than being dropped.
    """
    from bertopic_spark.operators.bm25 import (bm25_topk_adhoc, queries_df,
                                               query_terms)

    qdf = queries_df(corpus.sparkSession, dict(queries))
    qt = query_terms(qdf, mode)
    top = bm25_topk_adhoc(corpus, qt, k=k, text_col=text_col, id_col=id_col,
                          mode=mode, bm25_weighting=bm25_weighting,
                          _persisted_out=_persisted_out)
    qlists = qt.groupBy("query_id").agg(
        F.array_sort(F.collect_set("term")).alias("qts"))
    hits = (top.join(F.broadcast(qlists), "query_id")
            .join(corpus.select(id_col, text_col), id_col))
    hits = with_tokens(hits, text_col, mode)

    def pick(s):
        tk, qts = s["tokens"], s["qts"]
        pos = F.filter(F.sequence(F.lit(0), F.size(tk) - 1),
                       lambda i: F.array_contains(qts, F.get(tk, i)))
        counts = F.transform(pos, lambda p: F.size(
            F.filter(pos, lambda q: (q >= p) & (q < p + window))))
        best = F.array_max(counts)
        start = F.get(pos, F.array_position(counts, best) - 1)
        return F.when(F.size(pos) > 0, F.struct(
            start.cast("long").alias("start"),
            best.cast("long").alias("n_hits"),
            F.array_join(F.slice(tk, start + 1, window), " ").alias("snippet")))

    v = hits.select(
        "query_id", id_col, "score", "rank",
        _bound(F.struct(F.col("tokens").alias("tokens"),
                        F.col("qts").alias("qts")), pick).alias("v"))
    return v.select("query_id", id_col, "score", "rank",
                    "v.start", "v.n_hits", "v.snippet")


def term_associations(df: DataFrame, targets: Sequence[str],
                      min_df: int = 5, n: int = 10,
                      text_col: str = "text", id_col: str = "doc_id",
                      mode: str = "ascii_code") -> DataFrame:
    """Related terms by PMI: (target, term, co_df, pmi, rank).

    pmi = ln(N · df(t,u) / (df(t) · df(u))) over document co-occurrence,
    top-n per target (pmi desc, term asc), candidates pruned to
    df(u) ≥ min_df. Physical shape: the distinct doc-term relation is
    computed once; the target side is an ``isin``-pruned slice of it
    (pushed to the scan on a materialized index), so the co-count join
    shuffles |target postings| ⋈ |postings| on doc id — never all-pairs
    over the vocabulary. df totals ride the same relation; N is one
    scalar agg.
    """
    ts = sorted(set(str(t) for t in targets))
    if not ts:
        raise ValueError("need at least one target term")
    if min_df < 1 or n < 1:
        raise ValueError("min_df and n must be >= 1")
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    dt = toks.select(F.col(id_col),
                     F.explode(F.array_distinct("tokens")).alias("term"))
    n_docs = df.select(id_col).distinct().count()
    dfs = dt.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    tgt = dt.filter(F.col("term").isin(ts)).select(
        F.col(id_col), F.col("term").alias("target"))
    co = (tgt.join(dt, id_col)
          .filter(F.col("term") != F.col("target"))
          .groupBy("target", "term")
          .agg(F.count("*").cast("long").alias("co_df")))
    # candidate-side df join is vocabulary-sized — shuffle join (the co
    # relation is already grouped to |targets|·|co-vocab| rows); only the
    # target-side slice (≤ |targets| rows) broadcasts
    scored = (co.join(dfs, "term")
              .filter(F.col("df") >= min_df)
              .join(F.broadcast(
                  dfs.filter(F.col("term").isin(ts))
                  .select(F.col("term").alias("target"),
                          F.col("df").alias("tdf"))), "target")
              .select("target", "term", "co_df",
                      F.log(F.lit(float(n_docs)) * F.col("co_df") /
                            (F.col("tdf") * F.col("df"))).alias("pmi")))
    w = Window.partitionBy("target").orderBy(F.desc("pmi"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= n)
            .select("target", "term", "co_df", "pmi", "rank"))


_SPAN_INF = 1 << 30


def _tid_expr(term: Column, distinct: Sequence[str]) -> Column:
    """Map a term to its 0-based index in ``distinct`` (-1 if absent)."""
    out = F.lit(-1)
    for j in range(len(distinct) - 1, -1, -1):
        out = F.when(term == F.lit(distinct[j]), F.lit(j)).otherwise(out)
    return out


def _min_span(events: Column, n: int) -> Column:
    """Minimal token span covering one occurrence of each of ``n`` term ids.

    ``events`` is an array<struct<pos:int,tid:int>> sorted by pos. One
    plane sweep with ``F.aggregate``: the accumulator carries the last
    position seen per term id; whenever every id has been seen, the span
    ending at the current event is (pos − min(lasts) + 1) and the minimum
    over all such windows is exact (Lucene's sloppy-phrase sweep, shuffled
    into a pure-JVM higher-order function — linear in the number of
    events, never the cross product of the per-term position lists).
    """
    init = F.struct(
        F.array_repeat(F.lit(-1), n).alias("lasts"),
        F.lit(_SPAN_INF).alias("best"))

    def step(acc, ev):
        lasts = F.transform(
            acc["lasts"],
            lambda v, j: F.when(j == ev["tid"], ev["pos"]).otherwise(v))
        mn = F.array_min(lasts)
        best = F.when(mn >= 0,
                      F.least(acc["best"], ev["pos"] - mn + F.lit(1))
                      ).otherwise(acc["best"])
        return F.struct(lasts.alias("lasts"), best.alias("best"))

    return F.aggregate(events, init, step)["best"]


def proximity_match(df: DataFrame, terms: Sequence[str], window: int,
                    text_col: str = "text", id_col: str = "doc_id",
                    mode: str = "ascii_code") -> DataFrame:
    """Unordered proximity query: docs where all ``terms`` co-occur within
    a window of ``window`` tokens — (id, min_span), min_span = smallest
    token span containing every term at least once.

    Scan path: one corpus pass, the per-row sweep runs inside
    WholeStageCodegen over the token array — no shuffle, no UDF. The
    postings variant is ``proximity_match_postings``.
    """
    distinct = sorted(set(str(t) for t in terms))
    n = len(distinct)
    if n < 2:
        raise ValueError("proximity needs >= 2 distinct terms")
    if window < n:
        raise ValueError(f"window {window} can never fit {n} distinct terms")

    def span(tk):
        idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        evs = F.filter(
            F.transform(idx, lambda i: F.struct(
                i.alias("pos"), _tid_expr(F.get(tk, i), distinct).alias("tid"))),
            lambda e: e["tid"] >= 0)
        return _min_span(evs, n)

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), span)
                       .cast("long").alias("min_span"))
            .filter(F.col("min_span") <= window))


def proximity_match_postings(positions: DataFrame, terms: Sequence[str],
                             window: int, id_col: str = "doc_id") -> DataFrame:
    """Indexed proximity over a (id, term, pos) relation: (id, min_span).

    Plan: prune the postings to the query's terms (pushed to the scan on a
    materialized source), one groupBy(id) collecting the surviving events,
    sort once per doc, then the same linear sweep as the scan path. Docs
    missing any term never produce a finite span and are filtered without
    a separate existence join.
    """
    distinct = sorted(set(str(t) for t in terms))
    n = len(distinct)
    if n < 2:
        raise ValueError("proximity needs >= 2 distinct terms")
    if window < n:
        raise ValueError(f"window {window} can never fit {n} distinct terms")
    pruned = positions.filter(F.col("term").isin(distinct))
    per_doc = pruned.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("pos").cast("int").alias("pos"),
            _tid_expr(F.col("term"), distinct).cast("int").alias("tid")
        ))).alias("evs"))
    return (per_doc.select(F.col(id_col),
                           _bound(F.col("evs"), lambda e: _min_span(e, n))
                           .cast("long").alias("min_span"))
            .filter(F.col("min_span") <= window))


def percolate(docs: DataFrame, queries: DataFrame,
              text_col: str = "text", id_col: str = "doc_id",
              min_should_match: float = 1.0,
              mode: str = "ascii_code") -> DataFrame:
    """Reverse search (Elasticsearch-percolator analog): match incoming
    DOCUMENTS against a registry of standing QUERIES — the alerting /
    routing primitive of an ingest pipeline ("which saved searches does
    this new document satisfy?").

    ``queries`` is the standing (query_id, term) relation;
    ``min_should_match`` is the fraction of a query's distinct terms the
    document must contain (1.0 = AND semantics, the percolator default;
    0.5 = at least half). Returns (doc_id, query_id, n_matched, n_q,
    coverage) for every satisfied pair.

    Physical shape: the standing-query registry is broadcast (typical
    registries are 10³-10⁵ terms — kilobytes), so matching is MAP-SIDE
    over the document stream plus one (doc, query) count agg whose
    cardinality is bounded by matches, not |docs|·|queries|. Composes
    directly under foreachBatch for streaming ingest.
    """
    if not 0.0 < min_should_match <= 1.0:
        raise ValueError("min_should_match must be in (0, 1]")
    qn = queries.groupBy("query_id").agg(
        F.count_distinct("term").alias("n_q"))
    dt = (with_tokens(docs.select(id_col, text_col), text_col, mode)
          .select(F.col(id_col),
                  F.explode(F.array_distinct("tokens")).alias("term")))
    hits = (dt.join(F.broadcast(queries.select("query_id", "term").distinct()),
                    "term")
            .groupBy(id_col, "query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_matched")))
    need = F.ceil(F.lit(float(min_should_match)) * F.col("n_q")).cast("long")
    return (hits.join(F.broadcast(qn), "query_id")
            .filter(F.col("n_matched") >= need)
            .select(id_col, "query_id", "n_matched", "n_q",
                    F.round(F.col("n_matched") / F.col("n_q"), 6)
                    .alias("coverage")))


def suggest_index(dictionary: DataFrame, min_len: int = 2, max_len: int = 4,
                  k: int = 8) -> DataFrame:
    """Materialized suggest-as-you-type completions: (prefix, term, df,
    rank) — for every term prefix of length ``min_len``..``max_len``, the
    top-``k`` completions by document frequency (df desc, term asc).

    This is the precomputed completion table behind interactive query
    suggestion at scale: serving a keystroke is a point lookup on
    ``prefix`` (partition-prunable when written partitioned/bucketed by
    prefix), never a dictionary scan. Build cost: each term explodes into
    ≤ max_len-min_len+1 prefix rows, then one windowed top-k per prefix —
    the window partitions by prefix, so no single task sees more than one
    prefix's candidates.
    """
    if not 1 <= min_len <= max_len:
        raise ValueError("need 1 <= min_len <= max_len")
    pre = (dictionary.filter(F.length("term") >= min_len)
           .select("term", "df",
                   F.explode(F.sequence(
                       F.lit(min_len),
                       F.least(F.length("term"), F.lit(max_len))))
                   .alias("_n")))
    pre = pre.select(F.expr("substring(term, 1, _n)").alias("prefix"),
                     "term", "df")
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (pre.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("prefix", "term", "df", "rank"))


def suggest(index: DataFrame, typed: str, k: int = 8,
            max_len: int = 4) -> DataFrame:
    """Completions for what the user typed so far — a point filter on the
    materialized suggest index (no dictionary scan). ``max_len`` must
    match the index's build parameter: once the user types past it, the
    lookup uses the longest materialized prefix and post-filters the
    (≤k) completions with startswith — without this the surface would go
    dark at keystroke max_len+1 (no such prefix was ever materialized)."""
    t = typed.lower()
    out = (index.filter(F.col("prefix") == t[:max_len])
           .filter(F.col("rank") <= k))
    if len(t) > max_len:
        out = out.filter(F.col("term").startswith(t))
    return out.orderBy("rank")


def phrase_suggest(corpus: DataFrame, phrase: str, max_dist: int = 1,
                   n_cand: int = 3, k: int = 5, discount: float = 0.4,
                   text_col: str = "text", id_col: str = "doc_id",
                   mode: str = "ascii_code") -> DataFrame:
    """Whole-phrase correction (ES phrase suggester shape): (suggestion,
    logp, rank) — the top-``k`` corrected phrases for a possibly-misspelled
    multi-term query, scored by a Stupid-Backoff bigram language model over
    the corpus token stream.

    Candidate generation per phrase position: the top-``n_cand`` vocabulary
    terms within levenshtein ``max_dist`` of the typed term, ranked
    (dist asc, collection count desc, term asc) — DirectSpellChecker order
    over collection frequency, so a correctly-typed in-vocabulary term is
    its own dist-0 first candidate. Scoring (Stupid Backoff, Brants et al.
    2007): the first word contributes ln(c(w0)/T); each later word
    contributes ln(c(w_{i-1} w_i)/c(w_{i-1})) when the bigram was observed,
    else ln(discount * c(w_i)/T). Ties on the 6-dp score break by phrase
    text. A position with no candidate within ``max_dist`` yields an empty
    result (nothing correctable), mirroring the reference's empty-options
    response rather than guessing.

    Scale shape: unigram and bigram counts are each ONE two-phase agg over
    the corpus (partial map-side combine; bigrams never cross document
    boundaries). The lattice is ≤ n_cand^len(phrase) rows and every serving
    join broadcasts the tiny side — the observed-bigram lookup first
    LEFT-SEMI prunes the corpus-sized bigram relation by the broadcast
    candidate pairs, then broadcasts the (≤ |pairs|) survivors back, so the
    big relation is scanned once and never shuffled on a serving key.
    """
    pts = tokenize_one(phrase, mode)
    if not pts:
        raise ValueError("phrase tokenizes to no terms")
    if max_dist < 0 or n_cand < 1 or k < 1 or not 0.0 < discount <= 1.0:
        raise ValueError("bad max_dist/n_cand/k/discount")
    toks = (with_tokens(corpus.select(id_col, text_col), text_col, mode)
            .select("tokens"))
    uni = (toks.select(F.explode("tokens").alias("term"))
           .groupBy("term").agg(F.count("*").cast("long").alias("c")))
    uni = uni.persist()
    try:
        total = float(uni.agg(F.sum("c")).collect()[0][0] or 0)
        if total == 0:
            raise ValueError("empty corpus")
        big = (toks.filter(F.size("tokens") >= 2)
               .select(F.explode(F.expr(
                   "transform(sequence(0, size(tokens) - 2), "
                   "i -> struct(tokens[i] AS w1, tokens[i + 1] AS w2))"))
                   .alias("bg"))
               .select("bg.w1", "bg.w2")
               .groupBy("w1", "w2")
               .agg(F.count("*").cast("long").alias("cb")))

        q = F.explode(F.array(*[
            F.struct(F.lit(i).alias("pos"), F.lit(t).alias("q_term"))
            for i, t in enumerate(pts)])).alias("q")
        cand = (uni.select(q, "term", "c")
                .select("q.pos", "q.q_term", "term", "c")
                .filter(F.abs(F.length("term") - F.length("q_term"))
                        <= max_dist)
                .withColumn("dist",
                            F.levenshtein(F.col("term"), F.col("q_term")))
                .filter(F.col("dist") <= max_dist))
        w = Window.partitionBy("pos").orderBy(
            F.asc("dist"), F.desc("c"), F.asc("term"))
        cand = (cand.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= n_cand)
                .select("pos", "term", "c"))
        cand = cand.persist()
        try:
            lat = (cand.filter(F.col("pos") == 0)
                   .select(F.col("term").alias("w0"), F.col("c").alias("k0")))
            for i in range(1, len(pts)):
                ci = (cand.filter(F.col("pos") == i)
                      .select(F.col("term").alias(f"w{i}"),
                              F.col("c").alias(f"k{i}")))
                lat = lat.crossJoin(F.broadcast(ci))

            pairs = None
            for i in range(1, len(pts)):
                p = lat.select(F.col(f"w{i-1}").alias("w1"),
                               F.col(f"w{i}").alias("w2"))
                pairs = p if pairs is None else pairs.unionByName(p)
            score = F.log(F.col("k0") / F.lit(total))
            if pairs is not None:
                seen = big.join(F.broadcast(pairs.distinct()),
                                ["w1", "w2"], "left_semi")
                for i in range(1, len(pts)):
                    bi = seen.select(F.col("w1").alias(f"w{i-1}"),
                                     F.col("w2").alias(f"w{i}"),
                                     F.col("cb").alias(f"cb{i}"))
                    lat = lat.join(F.broadcast(bi), [f"w{i-1}", f"w{i}"],
                                   "left")
                    score = score + F.coalesce(
                        F.log(F.col(f"cb{i}") / F.col(f"k{i-1}")),
                        F.log(F.lit(float(discount)) * F.col(f"k{i}")
                              / F.lit(total)))
            out = lat.select(
                F.concat_ws(" ", *[F.col(f"w{i}") for i in range(len(pts))])
                .alias("suggestion"),
                F.round(score, 6).alias("logp"))
            rw = Window.orderBy(F.desc("logp"), F.asc("suggestion"))
            rows = (out.withColumn("rank",
                                   F.row_number().over(rw).cast("long"))
                    .filter(F.col("rank") <= k)
                    .collect())
        finally:
            cand.unpersist()
    finally:
        uni.unpersist()
    return corpus.sparkSession.createDataFrame(
        rows, "suggestion string, logp double, rank long")


def term_vectors(corpus: DataFrame, doc_ids: Sequence, text_col: str = "text",
                 id_col: str = "doc_id", mode: str = "ascii_code",
                 term_statistics: bool = True) -> DataFrame:
    """ES ``_termvectors`` (terms + positions + term_statistics=true):
    (doc_id, term, tf, positions, df, ttf) for the requested documents —
    ``positions`` as a comma-joined ascending list (cross-engine-stable
    rendering), ``df``/``ttf`` the CORPUS-WIDE document and total term
    frequencies of that term (NULL columns when ``term_statistics`` off,
    matching the cheap default).

    Scale shape: the per-doc half touches only the requested docs (an
    isin filter pushed to the scan). The corpus-wide statistics half is
    one tokenize + two-phase agg over the corpus, but FIRST semi-joined
    (broadcast) to the requested docs' term set, so the shuffle carries
    only the few hundred terms those docs contain — at serving time the
    stats side is a point lookup against the index dictionary instead
    (same relation shape; this operator is the from-scratch oracle path).
    """
    ids = list(doc_ids)
    if not ids:
        raise ValueError("need at least one doc id")
    sel = corpus.filter(F.col(id_col).isin(ids)).select(id_col, text_col)
    pos = (with_tokens(sel, text_col, mode)
           .select(F.col(id_col), F.posexplode("tokens")
                   .alias("pos", "term")))
    dv = (pos.groupBy(id_col, "term")
          .agg(F.count("*").cast("long").alias("tf"),
               F.array_join(F.transform(
                   F.array_sort(F.collect_list(F.col("pos").cast("long"))),
                   lambda x: x.cast("string")), ",").alias("positions")))
    if not term_statistics:
        return dv.select(id_col, "term", "tf", "positions",
                         F.lit(None).cast("long").alias("df"),
                         F.lit(None).cast("long").alias("ttf"))
    terms = dv.select("term").distinct()
    allp = (with_tokens(corpus.select(id_col, text_col), text_col, mode)
            .select(F.col(id_col), F.explode("tokens").alias("term"))
            .join(F.broadcast(terms), "term"))
    stats = (allp.groupBy("term")
             .agg(F.count_distinct(id_col).cast("long").alias("df"),
                  F.count("*").cast("long").alias("ttf")))
    return (dv.join(F.broadcast(stats), "term")
            .select(id_col, "term", "tf", "positions", "df", "ttf"))


# ---------------------------------------------------------------------------
# Index-time synonym folding (Lucene SynonymGraphFilter at index time /
# SynonymQuery semantics). A synonym map is a tiny (term, syn_key) relation —
# terms sharing a key are one logical term: their per-doc tfs SUM (blended
# tf) and their document frequency is the df of the folded term, so idf is
# computed on the group, exactly what Lucene's SynonymQuery approximates
# with max-df. The map is corpus-derived here (stem-folded groups) but any
# (term, syn_key) relation works (hand-written thesaurus, alias table).
# ---------------------------------------------------------------------------


def synonym_map(counts: DataFrame, key_fn=None, min_group: int = 2) -> DataFrame:
    """(term, syn_key) for every term whose group has ≥ ``min_group``
    distinct members. ``key_fn``: Column → Column grouping key; default the
    S-stemmer (plural folding). One distinct-agg over the vocabulary — the
    map is dictionary-sized (≪ postings), always broadcastable.
    """
    from bertopic_spark.tokenizer import stem_s_col
    key_fn = key_fn or stem_s_col
    dic = counts.select("term").distinct()
    keyed = dic.select("term", key_fn(F.col("term")).alias("syn_key"))
    grp = (keyed.groupBy("syn_key")
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") >= min_group)
           .select("syn_key"))
    return keyed.join(F.broadcast(grp), "syn_key").select("term", "syn_key")


def fold_term_counts(x: DataFrame, syn: DataFrame,
                     keys: Sequence[str]) -> DataFrame:
    """Fold a (keys..., term, tf[, class_len]) count relation through a
    synonym map: mapped terms are replaced by their group key and their tfs
    re-summed per (keys, folded term). Unmapped terms pass through (left
    join + coalesce). ``class_len`` (total tokens per key) is invariant
    under folding, so it rides the groupBy as a grouping column instead of
    costing an agg. The map side is broadcast; the big side never shuffles
    beyond the one re-agg — whose input is |postings of mapped terms| plus
    pass-through rows the partial agg collapses map-side.
    """
    carry = [c for c in ("class_len",) if c in x.columns]
    folded = (x.join(F.broadcast(syn), "term", "left")
              .select(*keys, *carry,
                      F.coalesce("syn_key", "term").alias("term"), "tf"))
    return (folded.groupBy(*keys, *carry, "term")
            .agg(F.sum("tf").alias("tf")))


def bm25_topk_synonyms(corpus: DataFrame, qterms: DataFrame,
                       syn: DataFrame | None = None, k: int = 10,
                       text_col: str = "content", id_col: str = "doc_id",
                       mode: str = "ascii_code",
                       _persisted_out: list | None = None) -> DataFrame:
    """Ad-hoc BM25 with synonym folding on both the index and the query
    sides: fold counts, recompute stats on the folded vocabulary (df/idf of
    a group ≠ any member's), fold + re-distinct the query terms, then the
    standard pushed-down scoring join (mirrors bm25.bm25_topk_adhoc).
    ``syn=None`` derives the map from the corpus vocabulary (stem groups).
    """
    from bertopic_spark.operators.bm25 import bm25_topk
    from bertopic_spark.operators.ctfidf import ctfidf, term_stats
    from bertopic_spark.operators.postings import doc_term_counts

    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True)
    x = x.withColumnRenamed("doc_len", "class_len")
    if syn is None:
        syn = synonym_map(x)
    xf = fold_term_counts(x, syn, [id_col]).persist()
    if _persisted_out is not None:
        _persisted_out.append(xf)
    qf = (qterms.join(F.broadcast(syn), "term", "left")
          .select("query_id", F.coalesce("syn_key", "term").alias("term"))
          .distinct())
    stats = term_stats(xf, [id_col], bm25_weighting=True)
    terms_only = qf.select("term").distinct()
    scores = ctfidf(
        xf.join(F.broadcast(terms_only), "term"), [id_col],
        bm25_weighting=True,
        stats=stats.join(F.broadcast(terms_only), "term"),
    )
    return bm25_topk(scores, qf, k, id_col)


# ---------------------------------------------------------------------------
# Significant-terms aggregation (ES significant_terms, JLH heuristic).
# The more_like_this relevance-feedback operator lives in operators/bm25.py.
# ---------------------------------------------------------------------------


def significant_terms(dt: DataFrame, fg_col: str = "fg", k: int = 10,
                      id_col: str = "doc_id",
                      scoring: str = "jlh") -> DataFrame:
    """ES significant_terms with the JLH heuristic: terms whose foreground
    document frequency is anomalously high vs the whole corpus.
    ``dt``: doc-distinct (id_col, term, fg_col boolean). Returns the top-k
    (term, df_fg, df_all, score, rank) where score =
    (fg_pct - bg_pct) * (fg_pct / bg_pct), keeping only fg_pct > bg_pct
    (the ES positive-signal constraint).

    ``scoring``: "jlh" (default, above), "percentage" (score =
    df_fg / df_all — the share of a term's documents that are
    foreground; favors rare-but-exclusive terms where JLH favors
    common-and-lifted ones), "chi_square" (the classical 2×2
    contingency statistic N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) with the
    background as superset, ES include_negatives=false so only
    positively-lifted terms rank), or "mutual_information" (MI of the
    same 2×2 table in bits, 0·log0 = 0, positive-signal filtered).
    All run on the same single-pass stats.

    Plan: ONE groupBy(term) with conditional aggregation — the foreground
    df rides the same shuffle as the background df (no second scan, no
    join of two per-term relations); the two scalar doc totals broadcast
    via a literal-free cross join of a 1-row agg. Final top-k is a window
    over the vocabulary-sized relation.
    """
    if scoring not in ("jlh", "percentage", "chi_square",
                       "mutual_information"):
        raise ValueError(
            "scoring must be one of jlh/percentage/chi_square/"
            f"mutual_information, got {scoring!r}")
    tot = (dt.agg(
        F.count_distinct(id_col).alias("n_all"),
        F.count_distinct(F.when(F.col(fg_col), F.col(id_col))).alias("n_fg"),
    ))
    per = (dt.groupBy("term").agg(
        F.count_distinct(F.when(F.col(fg_col), F.col(id_col)))
        .cast("long").alias("df_fg"),
        F.count_distinct(id_col).cast("long").alias("df_all"),
    ))
    sc = (per.crossJoin(F.broadcast(tot))
          .withColumn("fg_pct", F.col("df_fg") / F.col("n_fg"))
          .withColumn("bg_pct", F.col("df_all") / F.col("n_all"))
          .filter(F.col("df_fg") > 0))
    if scoring == "jlh":
        sc = (sc.filter(F.col("fg_pct") > F.col("bg_pct"))
              .withColumn("score", (F.col("fg_pct") - F.col("bg_pct"))
                          * (F.col("fg_pct") / F.col("bg_pct"))))
    elif scoring == "percentage":
        sc = sc.withColumn("score", F.col("df_fg") / F.col("df_all"))
    else:
        # 2x2 contingency with background as superset:
        #   a = fg docs with term          b = fg docs without
        #   c = bg-only docs with term     d = bg-only docs without
        a = F.col("df_fg").cast("double")
        b = (F.col("n_fg") - F.col("df_fg")).cast("double")
        c = (F.col("df_all") - F.col("df_fg")).cast("double")
        d = (F.col("n_all") - F.col("n_fg") - c).cast("double")
        n = F.col("n_all").cast("double")
        sc = sc.filter(F.col("fg_pct") > F.col("bg_pct"))
        if scoring == "chi_square":
            denom = (a + b) * (c + d) * (a + c) * (b + d)
            sc = sc.withColumn(
                "score", F.when(denom > 0,
                                n * F.pow(a * d - b * c, 2) / denom)
                .otherwise(F.lit(0.0)))
        else:  # mutual_information, bits; 0*log0 = 0
            def term_mi(p_ij, p_i, p_j):
                return F.when(p_ij > 0,
                              p_ij * F.log2(p_ij / (p_i * p_j))
                              ).otherwise(F.lit(0.0))
            pa, pb, pc_, pd = a / n, b / n, c / n, d / n
            p_fg, p_bg = (a + b) / n, (c + d) / n
            p_t, p_nt = (a + c) / n, (b + d) / n
            sc = sc.withColumn(
                "score",
                term_mi(pa, p_fg, p_t) + term_mi(pb, p_fg, p_nt) +
                term_mi(pc_, p_bg, p_t) + term_mi(pd, p_bg, p_nt))
    # global top-k as sort+limit → TakeOrderedAndProject (per-partition
    # heaps, no single-partition window over the vocabulary); the rank
    # window then runs on k rows only.
    top = sc.orderBy(F.desc("score"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("term", "df_fg", "df_all", "score", "rank"))


def match_bool_prefix_topk(corpus: DataFrame, query_text: str, k: int = 10,
                           max_expand: int = 1000,
                           text_col: str = "content",
                           id_col: str = "doc_id",
                           mode: str = "ascii_code",
                           k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """ES ``match_bool_prefix`` — the search-as-you-type query over a
    plain index: every query term but the LAST scores as an Okapi
    bool-should term query; the last (still being typed) runs as a prefix
    query under Lucene's constant-score rewrite (+1 per matching doc,
    MultiTermQuery.CONSTANT_SCORE_REWRITE). Returns (id, score, rank).
    The materialized-prefix-index alternative is ``suggest_index``; this
    is the zero-extra-structure path.

    One tokenize pass feeds the scored leg, the dictionary expansion and
    the prefix-match flag; the expanded prefix set is bounded
    (``max_expand``) and broadcasts.
    """
    from bertopic_spark.operators.bm25 import (_okapi_query_hits,
                                               queries_df, query_terms)
    from bertopic_spark.operators.postings import doc_term_counts
    from bertopic_spark.tokenizer import tokenize_one

    qtoks = tokenize_one(query_text, mode)
    if not qtoks:
        raise ValueError("query has no tokens")
    full, prefix = qtoks[:-1], qtoks[-1]
    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True)
    x = x.persist()
    try:
        exp = prefix_terms(
            x.groupBy("term").agg(F.count(F.lit(1)).alias("df")),
            prefix, max_expand)
        pref_docs = (x.filter(F.col("term").isin(exp)).select(id_col)
                     .distinct().withColumn("_p", F.lit(1.0))
                     ) if exp else None
        scored = None
        if full:
            qt = query_terms(
                queries_df(corpus.sparkSession, {0: " ".join(full)}), mode)
            scored = (_okapi_query_hits(corpus, qt, k1, b, text_col, id_col,
                                        mode, counts=x)
                      .select(id_col, F.col("score").alias("_s")))
        if scored is None and pref_docs is None:
            return corpus.sparkSession.createDataFrame(
                [], f"{id_col} long, score double, rank int")
        if scored is None:
            u = pref_docs.select(id_col, F.col("_p").alias("score"))
        elif pref_docs is None:
            u = scored.select(id_col, F.col("_s").alias("score"))
        else:
            u = (scored.join(pref_docs, id_col, "full")
                 .select(id_col,
                         (F.coalesce("_s", F.lit(0.0)) +
                          F.coalesce("_p", F.lit(0.0))).alias("score")))
        top = u.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        out = (top.withColumn("rank", F.row_number().over(w))
               .localCheckpoint(eager=True))
    finally:
        x.unpersist()
    return out


def significant_results_terms(corpus: DataFrame, query_text: str,
                              k_docs: int = 20, k_terms: int = 10,
                              text_col: str = "content",
                              id_col: str = "doc_id",
                              mode: str = "ascii_code",
                              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """``significant_terms`` under a query — the aggregation's classic ES
    usage: "which terms characterize THIS query's results vs the corpus".
    Foreground = the Okapi top-``k_docs`` documents for ``query_text``;
    background = the whole corpus; JLH scoring via ``significant_terms``.

    One tokenize pass: the retrieval and the fg/bg stats share the same
    (id, term) relation; the k-row foreground id set broadcasts into the
    fg flag, so the only vocabulary-wide work is the single conditional
    groupBy inside ``significant_terms``.
    """
    from bertopic_spark.operators.bm25 import (_okapi_query_hits,
                                               queries_df, query_terms)
    from bertopic_spark.operators.postings import doc_term_counts

    qt = query_terms(queries_df(corpus.sparkSession, {0: query_text}), mode)
    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True)
    x = x.persist()
    try:
        hits = _okapi_query_hits(corpus, qt, k1, b, text_col, id_col, mode,
                                 counts=x)
        top = (hits.orderBy(F.desc("score"), F.asc(id_col)).limit(k_docs)
               .select(id_col))
        dt = (x.select(id_col, "term")
              .join(F.broadcast(top.withColumn("_fg", F.lit(True))),
                    id_col, "left")
              .select(id_col, "term",
                      F.coalesce("_fg", F.lit(False)).alias("fg")))
        out = significant_terms(dt, "fg", k_terms, id_col)
        out = out.localCheckpoint(eager=True)
    finally:
        x.unpersist()
    return out


def pinned_topk(organic: DataFrame, pinned_ids: Sequence[int],
                k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """ES ``pinned`` query: the listed ids take ranks 1..p in the GIVEN
    order (regardless of score) for every query; organic results follow,
    with pinned ids deduplicated out of the organic tail. ``organic`` is
    any (query_id, id_col, score, rank) top-k relation — compose over
    ``okapi_bm25_topk`` / ``bm25_topk`` / ``multi_match_topk``.

    The pinned list is editorial (human-curated, tiny) — it broadcasts;
    the organic relation is already k-bounded per query, so the re-rank
    window is per-query over ≤ k+p rows.
    """
    if not pinned_ids:
        raise ValueError("pinned_ids must be non-empty")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned_ids must be distinct")
    spark = organic.sparkSession
    pins = F.broadcast(spark.createDataFrame(
        [(int(d), i + 1) for i, d in enumerate(pinned_ids)],
        f"{id_col} long, _pin int"))
    qids = organic.select("query_id").distinct()
    pinned_rows = (qids.crossJoin(pins)
                   .select("query_id", id_col, F.lit(None).cast("double")
                           .alias("score"), F.col("_pin")))
    organic_rows = (organic.join(pins.select(id_col), id_col, "left_anti")
                    .select("query_id", id_col, F.col("score"),
                            F.lit(None).cast("int").alias("_pin")))
    u = pinned_rows.unionByName(organic_rows)
    w = Window.partitionBy("query_id").orderBy(
        F.when(F.col("_pin").isNotNull(), F.col("_pin")).otherwise(F.lit(1 << 30)),
        F.desc_nulls_last("score"), F.asc(id_col))
    return (u.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col,
                    (F.col("_pin").isNotNull()).alias("pinned"),
                    "score", "rank"))


def phrase_boost_topk(corpus: DataFrame, queries, k: int = 10,
                      boost: float = 1.0, text_col: str = "content",
                      id_col: str = "doc_id", mode: str = "ascii_code",
                      _persisted_out: list | None = None) -> DataFrame:
    """Solr edismax ``pf`` (phrase-field boost): recall from the BM25
    disjunction, precision from proximity — docs where the query's tokens
    appear as a consecutive phrase gain ``boost × n_occurrences`` on top
    of their disjunction score. ``queries``: {query_id: text}. Returns
    (query_id, doc_id, score, boosted, rank) ranked by the boosted score
    (a 1-token query's "phrase count" is its tf, as in Solr).

    Plan: the base ranking is the standard inverted-index probe; the
    phrase side prunes ONE positional relation to the union of all query
    vocabularies (pushed to the scan on a materialized positions table),
    persists it, and runs each query's adjacency intersection as a cheap
    branch over that shared sliver — never |queries| corpus scans. The
    boost joins hits-to-phrase-counts on (query, doc), both already
    aggregated relations.
    """
    from bertopic_spark.operators.bm25 import doc_scores, queries_df, query_terms

    spark = corpus.sparkSession
    qmap = {int(q): str(t) for q, t in dict(queries).items()}
    qt = query_terms(queries_df(spark, qmap), mode)
    scores = doc_scores(corpus, text_col=text_col, id_col=id_col, mode=mode,
                        _persisted_out=_persisted_out)
    hits = (scores.join(F.broadcast(qt), "term")
            .groupBy("query_id", id_col).agg(F.sum("score").alias("score")))

    toks_by_q = {q: tokenize_one(t, mode) for q, t in qmap.items()}
    vocab = sorted({t for ts in toks_by_q.values() for t in ts})
    pos = doc_term_positions(corpus, text_col, id_col, mode, terms=vocab)
    pos = pos.persist()
    if _persisted_out is not None:
        _persisted_out.append(pos)
    parts = [
        phrase_match_postings(pos, ts, id_col)
        .select(F.lit(q).cast("long").alias("query_id"), id_col, "n_matches")
        for q, ts in sorted(toks_by_q.items()) if ts
    ]
    if not parts:
        raise ValueError("no query tokenizes to anything")
    pm = parts[0]
    for p in parts[1:]:
        pm = pm.unionByName(p)
    out = (hits.join(pm, ["query_id", id_col], "left")
           .withColumn("boosted",
                       F.col("score") + F.lit(float(boost))
                       * F.coalesce(F.col("n_matches"), F.lit(0))))
    w = Window.partitionBy("query_id").orderBy(F.desc("boosted"),
                                               F.asc(id_col))
    return (out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", id_col, "score", "boosted", "rank"))


def _ordered_span(events: Column, seq_tids: Sequence[int]) -> Column:
    """Minimal token span covering the term sequence IN ORDER.

    ``events`` is array<struct<pos:int,tid:int>> sorted by pos (tid indexes
    the query's distinct terms); ``seq_tids`` is the query as tid sequence
    (duplicates allowed). One linear sweep (Lucene's ordered
    SpansNearQuery shape): the accumulator carries, per prefix length j,
    the LATEST start position of an ordered chain matching seq[0..j] that
    ends at an already-seen event. All reads come from the pre-event
    accumulator, so one token can never serve two consecutive sequence
    slots; starts are monotone non-decreasing, so plain max-assignment is
    exact. Same CollapseProject discipline as ``_min_span``: everything
    lives inside one F.aggregate HOF, never as withColumn intermediates.
    """
    n = len(seq_tids)
    seqarr = F.array(*[F.lit(int(t)) for t in seq_tids])
    init = F.struct(
        F.array_repeat(F.lit(-1), n).alias("starts"),
        F.lit(_SPAN_INF).alias("best"))

    def step(acc, ev):
        starts = F.transform(
            acc["starts"],
            lambda v, j: F.when(
                F.get(seqarr, j) == ev["tid"],
                F.greatest(v, F.when(j == F.lit(0), ev["pos"])
                           .otherwise(F.get(acc["starts"], j - 1)))
            ).otherwise(v))
        chain = (F.get(seqarr, F.lit(n - 1)) == ev["tid"]) & \
                (F.get(acc["starts"], F.lit(n - 2)) >= 0)
        best = F.when(
            chain,
            F.least(acc["best"],
                    ev["pos"] - F.get(acc["starts"], F.lit(n - 2)) + 1)
        ).otherwise(acc["best"])
        return F.struct(starts.alias("starts"), best.alias("best"))

    return F.aggregate(events, init, step)["best"]


def _ordered_span_sets(events: Column, slot_sets: Sequence[Sequence[int]]) -> Column:
    """``_ordered_span`` generalized to OR-slots (Lucene SpanNearQuery over
    SpanOrQuery clauses): slot j matches when the event's tid is in
    ``slot_sets[j]``. Same linear pre-event-accumulator sweep, same
    one-HOF discipline; membership is an array_contains over a literal
    per-slot tid array instead of an equality."""
    n = len(slot_sets)
    slotsarr = F.array(*[
        F.array(*[F.lit(int(t)) for t in s]) for s in slot_sets])
    init = F.struct(
        F.array_repeat(F.lit(-1), n).alias("starts"),
        F.lit(_SPAN_INF).alias("best"))

    def step(acc, ev):
        starts = F.transform(
            acc["starts"],
            lambda v, j: F.when(
                F.array_contains(F.get(slotsarr, j), ev["tid"]),
                F.greatest(v, F.when(j == F.lit(0), ev["pos"])
                           .otherwise(F.get(acc["starts"], j - 1)))
            ).otherwise(v))
        chain = (F.array_contains(F.get(slotsarr, F.lit(n - 1)), ev["tid"]) &
                 (F.get(acc["starts"], F.lit(n - 2)) >= 0))
        best = F.when(
            chain,
            F.least(acc["best"],
                    ev["pos"] - F.get(acc["starts"], F.lit(n - 2)) + 1)
        ).otherwise(acc["best"])
        return F.struct(starts.alias("starts"), best.alias("best"))

    return F.aggregate(events, init, step)["best"]


def span_near_or_match(df: DataFrame, slots: Sequence[Sequence[str]],
                       slop: int = 0, text_col: str = "text",
                       id_col: str = "doc_id",
                       mode: str = "ascii_code") -> DataFrame:
    """Ordered span-near whose slots are OR-sets (ES ``span_near`` over
    ``span_or`` clauses): docs where slot 0's set, then slot 1's set, …
    occur in order within ``slop`` interleaving tokens — (id, min_span).
    ``span_near_match`` is the single-term-slot special case.

    Scan path: one corpus pass, the generalized sweep runs inside
    WholeStageCodegen over the token array — no shuffle, no UDF; linear in
    matching events, never the per-slot position cross product.
    """
    sl = [[str(t) for t in s] for s in slots]
    if len(sl) < 2:
        raise ValueError("span_near needs >= 2 slots")
    if any(not s for s in sl):
        raise ValueError("every slot needs >= 1 alternative term")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    distinct = sorted({t for s in sl for t in s})
    slot_tids = [[distinct.index(t) for t in s] for s in sl]
    n = len(sl)

    def span(tk):
        idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        evs = F.filter(
            F.transform(idx, lambda i: F.struct(
                i.alias("pos"), _tid_expr(F.get(tk, i), distinct).alias("tid"))),
            lambda e: e["tid"] >= 0)
        return _ordered_span_sets(evs, slot_tids)

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), span)
                       .cast("long").alias("min_span"))
            .filter(F.col("min_span") <= n + slop))


def span_near_or_match_postings(positions: DataFrame,
                                slots: Sequence[Sequence[str]],
                                slop: int = 0,
                                id_col: str = "doc_id") -> DataFrame:
    """Indexed ordered span-near over OR-slots from a (id, term, pos)
    relation: (id, min_span). Postings pruned to the union of all slot
    alternatives (pushed to the scan on a materialized source), one
    groupBy(id) collecting events, the same generalized sweep as the scan
    path (``span_near_or_match`` — result-identical, pytest-pinned)."""
    sl = [[str(t) for t in s] for s in slots]
    if len(sl) < 2:
        raise ValueError("span_near needs >= 2 slots")
    if any(not s for s in sl):
        raise ValueError("every slot needs >= 1 alternative term")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    distinct = sorted({t for s in sl for t in s})
    slot_tids = [[distinct.index(t) for t in s] for s in sl]
    n = len(sl)
    pruned = positions.filter(F.col("term").isin(distinct))
    per_doc = pruned.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("pos").cast("int").alias("pos"),
            _tid_expr(F.col("term"), distinct).cast("int").alias("tid")
        ))).alias("evs"))
    return (per_doc.select(F.col(id_col),
                           _bound(F.col("evs"),
                                  lambda e: _ordered_span_sets(e, slot_tids))
                           .cast("long").alias("min_span"))
            .filter(F.col("min_span") <= n + slop))


def span_first_match(df: DataFrame, terms: Sequence[str], end: int,
                     text_col: str = "text", id_col: str = "doc_id",
                     mode: str = "ascii_code") -> DataFrame:
    """ES ``span_first``: docs whose first occurrence of ANY of ``terms``
    (a span_or clause) ends at token position ≤ ``end`` — (id, first_pos),
    0-based. The "match near the start of the field" query (titles,
    shebangs, license headers). One narrow pass: first-index HOF over the
    token array, no shuffle, no UDF.
    """
    ts = sorted({str(t) for t in terms})
    if not ts:
        raise ValueError("terms must be non-empty")
    if end < 1:
        raise ValueError("end must be >= 1")

    def first_pos(tk):
        idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        hits = F.filter(idx, lambda i: F.get(tk, i).isin(ts))
        return F.when(F.size(hits) > 0, F.array_min(hits)).otherwise(F.lit(-1))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), first_pos)
                       .cast("long").alias("first_pos"))
            .filter((F.col("first_pos") >= 0) &
                    (F.col("first_pos") + 1 <= end)))


def span_near_match(df: DataFrame, terms: Sequence[str], slop: int = 0,
                    text_col: str = "text", id_col: str = "doc_id",
                    mode: str = "ascii_code") -> DataFrame:
    """Ordered span-near query (Lucene SpanNearQuery ``in_order=true`` /
    ES ``span_near``): docs where ``terms`` occur IN THAT ORDER with at
    most ``slop`` interleaving tokens — (id, min_span), min_span = the
    smallest token span containing an ordered occurrence, kept when
    min_span − len(terms) ≤ slop. slop=0 degrades to an exact phrase
    with possible gaps of zero — i.e. adjacency.

    Scan path: one corpus pass, the ordered sweep runs inside
    WholeStageCodegen over the token array — no shuffle, no UDF; the
    unordered variant is ``proximity_match``, the postings variant
    ``span_near_match_postings``.
    """
    seq = [str(t) for t in terms]
    if len(seq) < 2:
        raise ValueError("span_near needs >= 2 terms")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    distinct = sorted(set(seq))
    seq_tids = [distinct.index(t) for t in seq]
    n = len(seq)

    def span(tk):
        idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        evs = F.filter(
            F.transform(idx, lambda i: F.struct(
                i.alias("pos"), _tid_expr(F.get(tk, i), distinct).alias("tid"))),
            lambda e: e["tid"] >= 0)
        return _ordered_span(evs, seq_tids)

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), span)
                       .cast("long").alias("min_span"))
            .filter(F.col("min_span") <= n + slop))


def span_near_match_postings(positions: DataFrame, terms: Sequence[str],
                             slop: int = 0,
                             id_col: str = "doc_id") -> DataFrame:
    """Indexed ordered span-near over a (id, term, pos) relation:
    (id, min_span). Postings pruned to the query's terms (pushed to the
    scan on a materialized source), one groupBy(id) collecting events,
    one sort per doc, the same linear ordered sweep as the scan path.
    """
    seq = [str(t) for t in terms]
    if len(seq) < 2:
        raise ValueError("span_near needs >= 2 terms")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    distinct = sorted(set(seq))
    seq_tids = [distinct.index(t) for t in seq]
    n = len(seq)
    pruned = positions.filter(F.col("term").isin(distinct))
    per_doc = pruned.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("pos").cast("int").alias("pos"),
            _tid_expr(F.col("term"), distinct).cast("int").alias("tid")
        ))).alias("evs"))
    return (per_doc.select(F.col(id_col),
                           _bound(F.col("evs"),
                                  lambda e: _ordered_span(e, seq_tids))
                           .cast("long").alias("min_span"))
            .filter(F.col("min_span") <= n + slop))


def facet_topn_approx(df: DataFrame, facet_col: str, k: int = 5,
                      n_shards: int = 4, shard_k: int = 3,
                      id_col: str = "doc_id") -> DataFrame:
    """Elasticsearch terms-aggregation semantics at cluster scale: each
    shard reports only its local top ``shard_k`` facet values, the
    coordinator sums what it received and bounds what it may have missed —
    (value, doc_count, error_bound, rank) for the merged top ``k``, where

        doc_count   = Σ counts from shards that reported the value
        error_bound = Σ over NON-reporting shards of that shard's
                      shard_k-th count (its largest possible hidden
                      contribution) — ES's doc_count_error_upper_bound.

    Sharding is DETERMINISTIC (pmod(id, n_shards)) so the result — unlike
    a real cluster's placement-dependent answer — is reproducible across
    engines and partitionings, which is what makes the gate oracle-able;
    on a real deployment the shard key is whatever partitioned the index.
    The exactness contract: doc_count ≤ true ≤ doc_count + error_bound,
    with equality (error 0) whenever shard_k covers every shard's
    vocabulary (pytest-asserted both ways).

    Plan: one (shard, value) count agg, one shard-local WindowGroupLimit
    (n_shards·shard_k survivors), the cutoff join and the merge are over
    that survivor relation — coordinator work is O(n_shards·shard_k),
    never vocabulary-sized, exactly the property that lets a 1000-shard
    terms agg answer interactively at 100 TB.
    """
    if k < 1 or n_shards < 1 or shard_k < 1:
        raise ValueError("k, n_shards, shard_k must all be >= 1")
    per = (df.select(F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
                     F.col(facet_col).cast("string").alias("value"))
           .groupBy("shard", "value")
           .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("value"))
    top = (per.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= shard_k))
    # a shard's worst-case hidden count: its shard_k-th reported count if
    # it filled the budget, else 0 (it reported everything it had)
    cut = (top.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("_m"), F.min("cnt").alias("_kth"))
           .select("shard",
                   F.when(F.col("_m") >= shard_k, F.col("_kth"))
                   .otherwise(F.lit(0)).cast("long").alias("cutoff")))
    tot_cut = cut.agg(F.sum("cutoff").alias("all_cut"))
    merged = (top.join(F.broadcast(cut), "shard")
              .groupBy("value")
              .agg(F.sum("cnt").cast("long").alias("doc_count"),
                   F.sum("cutoff").cast("long").alias("_seen_cut")))
    out = (merged.crossJoin(F.broadcast(tot_cut))
           .select("value", "doc_count",
                   (F.col("all_cut") - F.col("_seen_cut")).cast("long")
                   .alias("error_bound")))
    rw = Window.partitionBy().orderBy(F.desc("doc_count"), F.asc("value"))
    return (out.withColumn("rank", F.row_number().over(rw))
            .filter(F.col("rank") <= k)
            .select("value", "doc_count", "error_bound", "rank"))


def phrase_prefix_match(df: DataFrame, phrase: str, text_col: str = "text",
                        id_col: str = "doc_id",
                        mode: str = "ascii_code") -> DataFrame:
    """Elasticsearch ``match_phrase_prefix`` (search-as-you-type over
    bodies, not the suggest index): the phrase's last analyzed token is a
    PREFIX — docs where the leading tokens occur consecutively and the
    next token starts with that prefix, (id, n_matches) counting start
    positions (overlapping occurrences count, same contract as
    ``phrase_match``).

    Scan path: the adjacency test plus one ``startswith`` on the final
    slot, all inside the same filter-over-sequence HOF — one corpus pass
    in WholeStageCodegen, no shuffle, no term-dictionary expansion (the
    expansion-based alternative is ``prefix_terms`` + per-completion
    phrase runs — O(|completions|) passes; this is the one-pass form).
    The prefix must survive the analyzer (mode's minimum token length);
    a single-token phrase degrades to a counted prefix term query.
    """
    toks = tokenize_one(phrase, mode)
    if not toks:
        raise ValueError(f"phrase {phrase!r} has no tokens in mode {mode}")
    n, head, pre = len(toks), toks[:-1], toks[-1]

    def starts(tk):
        seq = F.when(F.size(tk) >= n,
                     F.sequence(F.lit(0), F.size(tk) - n)
                     ).otherwise(F.array().cast("array<int>"))
        return F.filter(seq, lambda i: reduce(
            lambda acc, j: acc & (F.get(tk, i + j) == F.lit(head[j])),
            range(len(head)),
            F.get(tk, i + n - 1).startswith(F.lit(pre))))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       F.size(_bound(F.col("tokens"), starts))
                       .cast("long").alias("n_matches"))
            .filter(F.col("n_matches") > 0))


def span_not_match(df: DataFrame, include: str, exclude: str,
                   pre: int = 0, post: int = 0, text_col: str = "text",
                   id_col: str = "doc_id", mode: str = "ascii_code") -> DataFrame:
    """Lucene ``SpanNotQuery`` / ES ``span_not``: occurrences of
    ``include`` that have NO occurrence of ``exclude`` within ``pre``
    tokens before through ``post`` tokens after — (id, n_kept) for docs
    with >= 1 surviving occurrence. The negative-context filter ("match
    'virus' but not near 'computer'") that completes the span family
    (span_near ordered, proximity unordered).

    Scan path: one corpus pass; position extraction and the per-occurrence
    veto run as nested array HOFs inside WholeStageCodegen — no shuffle,
    no UDF, no positional self-join. Both position lists are bound once
    per row (struct-bound lambda vars, not re-derived per check).
    """
    inc, exc = str(include), str(exclude)
    if inc == exc:
        raise ValueError("include and exclude must differ")
    if pre < 0 or post < 0:
        raise ValueError("pre/post must be >= 0")

    def positions(tk):
        idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        return F.struct(
            F.filter(idx, lambda i: F.get(tk, i) == F.lit(inc)).alias("pa"),
            F.filter(idx, lambda i: F.get(tk, i) == F.lit(exc)).alias("pb"))

    def n_kept(s):
        return F.size(F.filter(
            s["pa"], lambda a: ~F.exists(
                s["pb"], lambda b: (b >= a - F.lit(pre)) &
                                   (b <= a + F.lit(post)))))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(_bound(F.col("tokens"), positions), n_kept)
                       .cast("long").alias("n_kept"))
            .filter(F.col("n_kept") > 0))


def span_not_match_postings(positions: DataFrame, include: str, exclude: str,
                            pre: int = 0, post: int = 0,
                            id_col: str = "doc_id") -> DataFrame:
    """Indexed ``span_not`` over a (id, term, pos) relation: postings
    pruned to the two terms (pushed to the scan on a materialized source),
    one groupBy(id) collecting both position lists, then the same
    per-occurrence veto as the scan path. Docs containing the include
    term only never carry exclude rows — their veto list is empty."""
    inc, exc = str(include), str(exclude)
    if inc == exc:
        raise ValueError("include and exclude must differ")
    if pre < 0 or post < 0:
        raise ValueError("pre/post must be >= 0")
    pruned = positions.filter(F.col("term").isin([inc, exc]))
    per = pruned.groupBy(id_col).agg(
        F.sort_array(F.collect_list(
            F.when(F.col("term") == inc, F.col("pos").cast("int")))).alias("pa"),
        F.sort_array(F.collect_list(
            F.when(F.col("term") == exc, F.col("pos").cast("int")))).alias("pb"))
    kept = F.size(F.filter(
        F.col("pa"), lambda a: ~F.exists(
            F.col("pb"), lambda b: (b >= a - F.lit(pre)) &
                                   (b <= a + F.lit(post)))))
    return (per.select(F.col(id_col), kept.cast("long").alias("n_kept"))
            .filter(F.col("n_kept") > 0))


def _contained_littles(parrs, larr, n: int, slop: int):
    """Array of ``larr`` positions contained in SOME valid ordered
    occurrence of the big span: positions q with p1 ≤ q ≤ pn for an
    increasing tuple (p1 < … < pn), pi ∈ ``parrs[i]``, and span
    pn−p1+1 ≤ n+slop. Nested-exists HOFs (exact, same enumeration as the
    brute-force SQL oracle); every level prunes on the span bound, so
    the walk is bounded by positions within one slop window, not the
    full per-term cross product. All JVM-side, no UDF."""
    def level(i):
        if i == n - 1:
            return lambda prev, p1, q: F.exists(
                parrs[i], lambda p: (p > prev) &
                (p - p1 + 1 <= F.lit(n + slop)) & (p >= q))
        nxt = level(i + 1)
        return lambda prev, p1, q: F.exists(
            parrs[i], lambda p: (p > prev) &
            (p - p1 + 1 <= F.lit(n + slop)) & nxt(p, p1, q))

    if n == 1:
        # degenerate big = single term: span is the term position itself
        return F.filter(larr, lambda q: F.exists(parrs[0], lambda p: p == q))
    inner = level(1)
    return F.filter(larr, lambda q: F.exists(
        parrs[0], lambda p1: (p1 <= q) & inner(p1, p1, q)))


def _span_member_arrays(tk, big: Sequence[str], little: str):
    idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                 ).otherwise(F.array().cast("array<int>"))
    def positions(term):
        return F.filter(idx, lambda i: F.get(tk, i) == F.lit(term))
    return [positions(t) for t in big], positions(little)


def span_within_match(df: DataFrame, little: str, big: Sequence[str],
                      slop: int = 0, text_col: str = "text",
                      id_col: str = "doc_id",
                      mode: str = "ascii_code") -> DataFrame:
    """ES/Lucene ``span_within``: matches of the ``little`` span (a
    single term here) that fall INSIDE some match of the ``big`` span
    (an ordered span_near of ``big`` terms within ``slop``) — returns
    (id, pos) per contained little occurrence. Because any t1 position
    at or before a chain's latest start extends to a valid chain, the
    enumeration over increasing tuples is exact, matching the oracle's
    positional self-join.

    One corpus pass; the containment test runs as nested in-array HOFs
    inside WholeStageCodegen (no shuffle, no UDF). Per-doc cost is
    bounded by positions-per-slop-window, the same bound Lucene's span
    iterator pays per document.
    """
    bt = [str(t) for t in big]
    if not bt:
        raise ValueError("big span needs >= 1 term")
    if slop < 0:
        raise ValueError("slop must be >= 0")

    def contained(tk):
        parrs, larr = _span_member_arrays(tk, bt, str(little))
        return _contained_littles(parrs, larr, len(bt), slop)

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), contained).alias("_qs"))
            .select(F.col(id_col), F.explode("_qs").alias("_q"))
            .select(F.col(id_col), F.col("_q").cast("long").alias("pos")))


def span_containing_match(df: DataFrame, big: Sequence[str], little: str,
                          slop: int = 0, text_col: str = "text",
                          id_col: str = "doc_id",
                          mode: str = "ascii_code") -> DataFrame:
    """ES/Lucene ``span_containing``: documents with a match of the
    ``big`` ordered span (span_near of ``big`` terms within ``slop``)
    that CONTAINS a match of ``little`` — (id, n_contained) where
    n_contained counts the distinct little positions inside some valid
    big occurrence (> 0 by construction). Shares the containment core
    with ``span_within_match``; same one-pass, HOF-only plan."""
    bt = [str(t) for t in big]
    if not bt:
        raise ValueError("big span needs >= 1 term")
    if slop < 0:
        raise ValueError("slop must be >= 0")

    def n_contained(tk):
        parrs, larr = _span_member_arrays(tk, bt, str(little))
        return F.size(_contained_littles(parrs, larr, len(bt), slop))

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), n_contained)
                       .cast("long").alias("n_contained"))
            .filter(F.col("n_contained") > 0))


def span_within_match_postings(positions: DataFrame, little: str,
                               big: Sequence[str], slop: int = 0,
                               id_col: str = "doc_id") -> DataFrame:
    """Indexed ``span_within`` over a (id, term, pos) relation: postings
    pruned to big ∪ {little} (pushed to the scan on a materialized
    source), one groupBy(id) building per-term position arrays, the same
    nested-exists containment core as the scan path (result-identical,
    pytest-pinned)."""
    bt = [str(t) for t in big]
    lt = str(little)
    if not bt:
        raise ValueError("big span needs >= 1 term")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    wanted = sorted(set(bt) | {lt})
    pruned = positions.filter(F.col("term").isin(wanted))
    arrs = [F.sort_array(F.collect_list(
        F.when(F.col("term") == t, F.col("pos").cast("int")))).alias(f"_p{i}")
        for i, t in enumerate(bt)]
    larr = F.sort_array(F.collect_list(
        F.when(F.col("term") == lt, F.col("pos").cast("int")))).alias("_l")
    per_doc = pruned.groupBy(id_col).agg(*arrs, larr)
    parrs = [F.col(f"_p{i}") for i in range(len(bt))]
    contained = _contained_littles(parrs, F.col("_l"), len(bt), slop)
    return (per_doc.select(F.col(id_col), contained.alias("_qs"))
            .select(F.col(id_col), F.explode("_qs").alias("_q"))
            .select(F.col(id_col), F.col("_q").cast("long").alias("pos")))


def _interval_occurrences(tk, node):
    """Occurrence array (struct<s:int,e:int>) of an ES ``intervals``
    rule over the token array ``tk``. Rules:

      {"match": [tok, …]}                exact consecutive phrase
      {"any_of": [node, …]}              union of sub-interval matches
      {"all_of": [node, …],
       "max_gaps": g, "ordered": True}   ordered, non-overlapping
                                         sub-matches with total internal
                                         gaps ≤ g  (g = -1: unlimited)

    all_of folds children left-to-right, flattening partial chains
    against the next child's occurrences and pruning on the gap bound at
    every step — the same (s, e) enumeration as the oracle's relational
    join, entirely in nested array HOFs."""
    if "match" in node:
        ts = [str(t) for t in node["match"]]
        if not ts:
            raise ValueError("match needs >= 1 token")
        L = len(ts)
        idx = F.when(F.size(tk) > 0, F.sequence(F.lit(0), F.size(tk) - 1)
                     ).otherwise(F.array().cast("array<int>"))
        def is_start(i):
            conds = [F.get(tk, i + j) == F.lit(t) for j, t in enumerate(ts)]
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out
        starts = F.filter(idx, is_start)
        return F.transform(starts, lambda i: F.struct(
            i.alias("s"), (i + F.lit(L - 1)).alias("e")))
    if "any_of" in node:
        kids = [_interval_occurrences(tk, ch) for ch in node["any_of"]]
        if not kids:
            raise ValueError("any_of needs >= 1 child")
        return F.array_distinct(F.concat(*kids)) if len(kids) > 1 else kids[0]
    if "all_of" in node:
        if not node.get("ordered", True):
            raise ValueError("only ordered all_of is supported")
        g = int(node.get("max_gaps", -1))
        kids = [_interval_occurrences(tk, ch) for ch in node["all_of"]]
        if len(kids) < 2:
            raise ValueError("all_of needs >= 2 children")
        acc = F.transform(kids[0], lambda o: F.struct(
            o["s"].alias("s"), o["e"].alias("e"),
            (o["e"] - o["s"] + 1).alias("ln")))
        for child in kids[1:]:
            acc = F.flatten(F.transform(acc, lambda c: F.transform(
                F.filter(child, lambda o: o["s"] > c["e"]),
                lambda o: F.struct(
                    c["s"].alias("s"), o["e"].alias("e"),
                    (c["ln"] + o["e"] - o["s"] + 1).alias("ln")))))
            if g >= 0:
                acc = F.filter(
                    acc, lambda c: (c["e"] - c["s"] + 1 - c["ln"]) <= g)
        return F.array_distinct(F.transform(acc, lambda c: F.struct(
            c["s"].alias("s"), c["e"].alias("e"))))
    raise ValueError(f"unknown interval rule: {sorted(node)}")


def intervals_match(df: DataFrame, node, text_col: str = "text",
                    id_col: str = "doc_id",
                    mode: str = "ascii_code") -> DataFrame:
    """ES ``intervals`` query: proximity rules composed from exact
    phrases (``match``), alternation (``any_of``) and ordered
    conjunction with a gap budget (``all_of`` + ``max_gaps``) — the
    structured-proximity query ES exposes beside span_*. Returns
    (id, n_occ, min_span): distinct (start, end) occurrence count of the
    root rule and the tightest span.

    One corpus pass; the whole rule tree evaluates as nested array HOFs
    over the token array (WholeStageCodegen, no shuffle, no UDF).
    Per-doc cost is the product of per-child occurrence counts ONLY
    within the gap window — each fold step prunes on ``max_gaps`` before
    the next child multiplies in, the same bound the oracle's
    self-join enumeration pays."""
    def occ(tk):
        return _interval_occurrences(tk, node)

    out = with_tokens(df.select(id_col, text_col), text_col, mode)
    return (out.select(F.col(id_col),
                       _bound(F.col("tokens"), occ).alias("_occs"))
            .select(
                F.col(id_col),
                F.size("_occs").cast("long").alias("n_occ"),
                F.array_min(F.transform(
                    F.col("_occs"), lambda o: o["e"] - o["s"] + 1))
                .cast("long").alias("min_span"))
            .filter(F.col("n_occ") > 0))


def significant_text(corpus: DataFrame, query_text: str,
                     k_docs: int = 20, k_terms: int = 10,
                     filter_duplicate_text: bool = True,
                     text_col: str = "content", id_col: str = "doc_id",
                     mode: str = "ascii_code",
                     k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """ES ``significant_text`` aggregation: significant_terms over FREE
    TEXT of a query's hits, with ES's ``filter_duplicate_text`` — the
    option that makes it a distinct aggregation: boilerplate copies
    (mirrored licenses, templated pages) would otherwise dominate the
    foreground counts and every shared term would look "significant".
    Dedup here is exact-content (md5 digest, keep lowest id) applied to
    BOTH foreground and background before counting — the first-order
    form of ES's near-duplicate sequence filter; the shingle-containment
    operator (operators/dedup.shingle_containment) is the near-dup
    upgrade path.

    Physical shape mirrors ``significant_results_terms``: retrieval and
    fg/bg stats share one tokenize pass over the DEDUPED corpus; the
    k-row foreground id set broadcasts.
    """
    d = corpus
    if filter_duplicate_text:
        wdup = Window.partitionBy(F.md5(F.col(text_col))).orderBy(
            F.col(id_col).asc())
        d = (corpus.withColumn("_dup_rn", F.row_number().over(wdup))
             .filter(F.col("_dup_rn") == 1).drop("_dup_rn"))
    return significant_results_terms(d, query_text, k_docs, k_terms,
                                     text_col, id_col, mode, k1, b)


def fuzzy_terms_dl(dictionary: DataFrame, term: str,
                   max_expand: int = 1000) -> list[str]:
    """ES-default fuzzy expansion: Damerau-Levenshtein distance ≤ 1 WITH
    adjacent transpositions (ES ``fuzziness`` counts a transposition as
    ONE edit by default — plain ``fuzzy_terms`` charges it two). Exact
    decomposition, no DL implementation needed JVM-side:

        DL₁(t, q) ≤ 1  ⇔  lev(t, q) ≤ 1  ∨  t ∈ adjacent-swaps(q)

    (a single DL edit is insert/delete/substitute — all lev — or one
    adjacent swap). The ≤ |q|−1 swap variants are driver-side literals;
    the length band prunes before the distance runs. The oracle is
    DuckDB's native damerau_levenshtein."""
    if len(term) < 1:
        raise ValueError("term must be non-empty")
    swaps = sorted({term[:i] + term[i + 1] + term[i] + term[i + 2:]
                    for i in range(len(term) - 1)} - {term})
    band = F.abs(F.length("term") - F.lit(len(term))) <= 1
    close = F.levenshtein(F.col("term"), F.lit(term), 1) >= 0
    if swaps:
        close = close | F.col("term").isin(swaps)
    return expand_terms(dictionary, band & close, max_expand)


def percolate_phrases(docs: DataFrame, queries: DataFrame,
                      phrases: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      min_should_match: float = 1.0,
                      mode: str = "ascii_code",
                      max_registry: int = 10_000) -> DataFrame:
    """Percolator with PHRASE criteria: a standing query may require, on
    top of its term-coverage condition, one or more exact phrases
    (``phrases``: (query_id, phrase) rows) — the full ES percolator
    registers arbitrary queries, and phrases are the first capability
    documents-as-queries registries actually use (brand names, error
    signatures). A query with no phrase rows degrades to ``percolate``.

    Physical shape: the term leg is ``percolate`` unchanged (broadcast
    registry, map-side matching); the phrase leg tokenizes each distinct
    registered phrase DRIVER-SIDE (a registry is small by contract) into
    a broadcast (pid, idx, term) relation joined against one positional
    explode of the documents — a phrase occurrence at start ``s`` is
    ``count_distinct(idx) == n_toks`` within the (doc, pid, pos−idx=s)
    group, so the document pass is ONE join regardless of registry size
    (a projection of N per-phrase expressions re-scans every token array
    N times and leaves codegen as N grows; measured 46s → 2s for 128
    phrases × 500 docs when replaced by this join). Queries with unmet
    phrases are anti-joined out.

    The "registry is small" contract is ENFORCED, not assumed: the
    driver-side collect is capped at ``max_registry`` distinct phrase
    rows and raises beyond it (mirroring ``expand_terms``'s
    ``max_expand`` guard) — an unbounded registry must fail loudly, not
    OOM the driver or broadcast a million-HOF projection.
    """
    from bertopic_spark.tokenizer import tokenize_one

    base = percolate(docs, queries, text_col, id_col,
                     min_should_match, mode)
    reg = (phrases.select("query_id", "phrase").distinct()
           .limit(max_registry + 1).collect())
    if len(reg) > max_registry:
        raise ValueError(
            f"phrase registry exceeds max_registry={max_registry}; "
            "shard the registry or raise the cap")
    ph = [(int(r["query_id"]), tokenize_one(r["phrase"], mode))
          for r in reg]
    ph = [(q, toks) for q, toks in ph if toks]
    if not ph:
        return base
    need = {}
    for q, _ in ph:
        need[q] = need.get(q, 0) + 1
    # Positional-join adjacency, not per-phrase expressions: a projection
    # of N phrase-HOF checks re-scans every token array N times and falls
    # out of codegen as N grows (measured 46s for 128 phrases x 500 docs)
    # — the registry cap would be doing the work the plan should. Instead
    # the registry becomes a broadcast (pid, idx, term) relation joined
    # against ONE posexplode of the documents; a phrase occurrence at
    # start s is count_distinct(idx) == n_toks within the (doc, pid,
    # pos - idx = s) group. One pass over postings regardless of registry
    # size; shuffle bounded by postings that match some phrase term.
    spark = docs.sparkSession
    ph_rows = [(pid, q, idx, t, len(toks))
               for pid, (q, toks) in enumerate(ph)
               for idx, t in enumerate(toks)]
    ph_terms = F.broadcast(spark.createDataFrame(
        ph_rows,
        "pid long, query_id long, idx int, term string, n_toks int"))
    pos = (with_tokens(docs.select(id_col, text_col), text_col, mode)
           .select(F.col(id_col),
                   F.posexplode("tokens").alias("pos", "term")))
    met = (pos.join(ph_terms, "term")
           .groupBy(id_col, "pid", (F.col("pos") - F.col("idx")).alias("_s"))
           .agg(F.first("query_id").alias("query_id"),
                (F.count_distinct("idx") == F.first("n_toks")).alias("_hit"))
           .filter("_hit")
           .groupBy(id_col, "query_id")
           .agg(F.count_distinct("pid").cast("long").alias("n_ph_met")))
    need_df = F.broadcast(spark.createDataFrame(
        list(need.items()), "query_id long, n_ph long"))
    ok = (met.join(need_df, "query_id")
          .filter(F.col("n_ph_met") >= F.col("n_ph"))
          .select(id_col, "query_id"))
    phrased = set(need)
    keep_unphrased = base.filter(~F.col("query_id").isin(sorted(phrased)))
    keep_phrased = base.join(ok, [id_col, "query_id"], "leftsemi")
    return keep_unphrased.unionByName(keep_phrased)


def terms_lookup_topk(corpus: DataFrame, lookup: DataFrame,
                      lookup_id, k: int = 10,
                      lookup_id_col: str = "doc_id",
                      terms_col: str = "text",
                      text_col: str = "text", id_col: str = "doc_id",
                      mode: str = "ascii_code",
                      k1: float = 1.2, b: float = 0.75,
                      exclude_self: bool = True) -> DataFrame:
    """ES ``terms`` query with LOOKUP (terms fetched from another
    document rather than inlined): the filter's term set is the token
    set of the lookup row ``lookup_id`` in ``lookup``; matching corpus
    docs are Okapi-scored over those terms and top-k returned
    (doc_id, score, rank). The "docs like the one I'm pointing at,
    by its exact vocabulary" primitive — the lookup row never travels
    to the driver as a query string; its tokens become a broadcast
    term relation, so the plan is identical at any corpus size.

    ``exclude_self`` (default True) drops the corpus row whose ``id_col``
    equals ``lookup_id`` — the right default when ``corpus`` IS the
    lookup relation (ES semantics: the source doc should not match
    itself). Note the excluded row also leaves the BM25 statistic set
    (N, avgdl, df are computed over the filtered corpus). When corpus
    and lookup are DIFFERENT relations with unrelated id spaces, pass
    ``exclude_self=False`` so an innocent corpus doc that merely shares
    the id value is not silently dropped from scoring and stats.
    """
    from bertopic_spark.operators.bm25 import bm25_topk, okapi_doc_scores
    from bertopic_spark.tokenizer import with_tokens

    src = lookup.filter(F.col(lookup_id_col) == lookup_id)
    qt = (with_tokens(src.select(lookup_id_col, terms_col), terms_col, mode)
          .select(F.explode("tokens").alias("term"))
          .distinct()
          .select(F.lit(0).alias("query_id"), "term"))
    if exclude_self:
        corpus = corpus.filter(F.col(id_col) != lookup_id)
    scores = okapi_doc_scores(
        corpus, text_col=text_col, id_col=id_col, mode=mode, k1=k1, b=b)
    hits = bm25_topk(scores, qt, k=k, id_col=id_col)
    return hits.select(id_col, "score", "rank")
