"""Code-structure extraction over the source-code corpus: comment lines,
symbol (function/class) definitions, and import edges — the field-level
analyzers a code search engine (Sourcegraph / GitHub code search / ES with
a code analyzer) layers on top of plain-text postings, so queries can be
scoped to "comments only", "definitions of X", or "who imports Y".

All three are one narrow JVM pass each: ``regexp_extract_all`` with an RE2-
compatible pattern (no lookbehind/backrefs, so the DuckDB oracle runs the
IDENTICAL pattern) → explode → two-phase hash agg. No UDF, no shuffle
beyond the final agg; filters/projection push to the parquet scan. At
100 TB these are the same shape as the tokenize stage — embarrassingly
parallel map + map-side-combined agg.

The patterns deliberately cover the dominant line-comment and definition
syntaxes (``//``, ``#``; ``def``/``fn``/``func`` + ``class``; ``import``/
``from``/``require``/``#include`` would each be one more alternation) —
the operators take the pattern as a parameter so per-lang analyzer configs
are data, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe (Spark's Java regex AND DuckDB run these verbatim). (?m) makes
# ^ anchor at line starts; comment text excludes the newline.
COMMENT_PATTERN = r"(?m)(?:^|[ \t])(?://|#)[ \t]?([^\n]*)"
DEF_PATTERN = r"(?m)^[ \t]*(?:def|fn|func|class) ([a-z0-9_]+)"
IMPORT_PATTERN = r"(?m)^[ \t]*import ([a-z0-9_.]+)"


def extract_comments(df: DataFrame, content_col: str = "content",
                     id_col: str = "doc_id",
                     pattern: str = COMMENT_PATTERN) -> DataFrame:
    """One row per comment occurrence: (id_col…, comment) in document
    order. ``comment`` is the text after the comment marker on that line."""
    keep = [c for c in df.columns if c != content_col]
    return (df.select(*keep,
                      F.regexp_extract_all(F.col(content_col),
                                           F.lit(pattern), F.lit(1))
                      .alias("_cs"))
            .select(*keep, F.explode("_cs").alias("comment")))


def comment_term_counts(df: DataFrame, group_cols: list[str],
                        content_col: str = "content",
                        id_col: str = "doc_id",
                        mode: str = "ascii_code",
                        pattern: str = COMMENT_PATTERN) -> DataFrame:
    """Term counts over COMMENT TEXT ONLY, per group — the "search in
    comments" field: (group…, term, tf). Tokenizes only the extracted
    comment spans, never the full content."""
    from bertopic_spark.tokenizer import tokens_expr

    c = extract_comments(df, content_col, id_col, pattern)
    return (c.select(*group_cols,
                     F.explode(tokens_expr(F.col("comment"), mode)).alias("term"))
            .groupBy(*group_cols, "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


def extract_symbols(df: DataFrame, content_col: str = "content",
                    id_col: str = "doc_id",
                    pattern: str = DEF_PATTERN) -> DataFrame:
    """One row per definition occurrence: (id_col…, symbol)."""
    keep = [c for c in df.columns if c != content_col]
    return (df.select(*keep,
                      F.regexp_extract_all(F.col(content_col),
                                           F.lit(pattern), F.lit(1))
                      .alias("_ss"))
            .select(*keep, F.explode("_ss").alias("symbol")))


def symbol_stats(df: DataFrame, content_col: str = "content",
                 id_col: str = "doc_id",
                 pattern: str = DEF_PATTERN) -> DataFrame:
    """Definition-site index: (symbol, n_defs, n_docs) — n_defs total
    definition occurrences, n_docs distinct defining documents. The
    relation behind "go to definition of X" ranking (most-defined symbols
    are usually vendored boilerplate; single-def symbols are the real
    targets)."""
    s = extract_symbols(df, content_col, id_col, pattern)
    return (s.groupBy("symbol")
            .agg(F.count(F.lit(1)).cast("long").alias("n_defs"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


def resolve_imports(df: DataFrame, src_col: str,
                    content_col: str = "content",
                    id_col: str = "doc_id",
                    import_pattern: str | None = None,
                    def_pattern: str | None = None) -> DataFrame:
    """Cross-reference resolution — join the import graph to the
    definition index: for every (src, module) import edge, how many
    documents DEFINE a symbol named like the module's head segment —
    (src, module, n_imports, n_def_docs). n_def_docs = 0 marks external /
    unresolvable dependencies (the "broken import" audit of a code-search
    engine). One broadcast-or-shuffle join between two already-aggregated
    relations; both inputs are single-pass extractions."""
    imp = import_edges(df, src_col, content_col,
                       import_pattern or IMPORT_PATTERN)
    defs = symbol_stats(df, content_col, id_col,
                        def_pattern or DEF_PATTERN)
    head = F.element_at(F.split(F.col("module"), r"\."), 1)
    return (imp.withColumn("_head", head)
            .join(defs.select(F.col("symbol").alias("_head"),
                              F.col("n_docs").alias("n_def_docs")),
                  "_head", "left")
            .select("src", "module", "n_imports",
                    F.coalesce("n_def_docs", F.lit(0)).cast("long")
                    .alias("n_def_docs")))


def import_edges(df: DataFrame, src_col: str,
                 content_col: str = "content",
                 pattern: str = IMPORT_PATTERN) -> DataFrame:
    """Dependency edges (src, module, n_imports): which source group
    (repo / lang / shard) imports which module, how often. Feeds
    ``operators.graph.pagerank`` for dependency-centrality ranking."""
    return (df.select(F.col(src_col).alias("src"),
                      F.explode(
                          F.regexp_extract_all(F.col(content_col),
                                               F.lit(pattern), F.lit(1)))
                      .alias("module"))
            .groupBy("src", "module")
            .agg(F.count(F.lit(1)).cast("long").alias("n_imports")))


def path_hierarchy_terms(df, path_col: str, id_col: str = "doc_id",
                         delimiter: str = "/"):
    """ES ``path_hierarchy`` tokenizer: a path emits every ancestor
    prefix ('a/b/c' → 'a', 'a/b', 'a/b/c') — the analyzer behind
    "search/facet by directory" over a code corpus. Returns
    (id, prefix, depth), depth 1-based.

    One split + one index-transform HOF per row (no shuffle); the usual
    consumer is a groupBy(prefix) rollup whose cardinality is the tree
    size, not the file count.
    """
    parts = F.split(F.col(path_col), F.lit(delimiter).cast("string"))
    idx = F.when(F.size(parts) > 0,
                 F.sequence(F.lit(1), F.size(parts))
                 ).otherwise(F.array().cast("array<int>"))
    prefixes = F.transform(
        idx, lambda d: F.struct(
            F.concat_ws(delimiter, F.slice(parts, 1, d)).alias("prefix"),
            d.alias("depth")))
    return (df.where(F.col(path_col).isNotNull())
            .select(F.col(id_col), F.explode(prefixes).alias("_p"))
            .select(F.col(id_col), F.col("_p.prefix").alias("prefix"),
                    F.col("_p.depth").cast("long").alias("depth")))
