"""Text analysis for training-data pipelines: token stats, quality
scoring, document fingerprinting, nearest-class assignment (lang-ID).

All JVM-side expressions over the token array — no Python in the hot path.
Every op has a DuckDB oracle (entry_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.operators.ctfidf import ctfidf
from bertopic_spark.operators.postings import class_term_counts, doc_term_counts
from bertopic_spark.tokenizer import with_tokens

# Tiny embedded stopword list (whitespace/quality heuristics, not linguistics).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "this", "that", "for", "on", "with", "as", "at", "by"]


def token_stats(df: DataFrame, text_col: str, id_col: str,
                mode: str = "ascii_code") -> DataFrame:
    """(id, n_tokens, n_distinct, avg_token_len, stopword_ratio, ttr)."""
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    n_tok = F.size("tokens").cast("long")
    n_dis = F.size(F.array_distinct("tokens")).cast("long")
    tot_len = F.aggregate(
        F.transform("tokens", lambda t: F.length(t)), F.lit(0), lambda a, v: a + v
    )
    n_stop = F.size(F.filter("tokens", lambda t: t.isin(STOPWORDS))).cast("long")
    return toks.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        F.round(
            F.when(n_tok > 0, tot_len / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
        F.round(
            F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, n_dis / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("ttr"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str,
                  mode: str = "ascii_code") -> DataFrame:
    """(id, quality) ∈ [0,1]: composite of length band, type-token ratio and
    alpha density — the standard cheap pre-filter before expensive stages."""
    stats = token_stats(df, text_col, id_col, mode)
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z ]", ""))
        / F.greatest(F.length(F.col(text_col)), F.lit(1))
    )
    base = df.select(F.col(id_col), F.round(alpha_ratio, 6).alias("alpha_ratio"))
    length_band = (
        F.when(F.col("n_tokens") < 5, 0.2)
        .when(F.col("n_tokens") > 5000, 0.5)
        .otherwise(1.0)
    )
    # unrounded ttr (the exported stats column is rounded for display)
    ttr = F.when(
        F.col("n_tokens") > 0, F.col("n_distinct") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return (
        stats.join(base, id_col)
        .select(
            F.col(id_col),
            F.round(
                length_band * (0.5 + 0.5 * ttr) * F.col("alpha_ratio"), 6
            ).alias("quality"),
        )
    )


FP_MOD = 2147483647  # 2^31-1: keeps the polynomial fold overflow-free in
# BIGINT on both engines (acc < 2^31 ⇒ acc*31 + h < 2^36).


def fingerprint(df: DataFrame, text_col: str, id_col: str,
                mode: str = "ascii_code") -> DataFrame:
    """(id, fp) order-sensitive polynomial token fingerprint mod 2^31-1.

    fp = fold(tokens, acc ← (acc*31 + md5_28(token)) mod P). Same fold in
    DuckDB via list_reduce — token order is preserved by both extractors.
    """
    from bertopic_spark.operators.dedup import md5_long

    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    hashed = F.transform("tokens", lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"))
    fp = F.aggregate(hashed, F.lit(0).cast("long"),
                     lambda acc, h: (acc * 31 + h) % FP_MOD)
    return toks.select(F.col(id_col), fp.alias("fp"))


def assign_nearest_class(
    df: DataFrame,
    text_col: str,
    id_col: str,
    class_col: str,
    mode: str = "ascii_code",
    bm25_weighting: bool = False,
) -> DataFrame:
    """(id, pred_class, score): nearest class by c-TF-IDF dot product —
    the engine's analog of BERTopic ``transform`` (reduced-model path,
    _bertopic.py:611-619: cosine of doc vs topic vectors, argmax).

    Doc tf (L1-normalized) dotted with each class's c-TF-IDF scores via the
    inverted index (term join) — never a dense doc×class matrix.
    """
    from pyspark.sql import Window

    dt = doc_term_counts(df, text_col, [class_col, id_col], mode, with_len=True)
    x = class_term_counts(dt.drop("doc_len"), [class_col])
    cls_scores = ctfidf(x, [class_col], bm25_weighting=bm25_weighting).withColumnRenamed(
        "score", "cls_score"
    )
    doc_side = dt.select(
        F.col(id_col), "term", (F.col("tf") / F.col("doc_len")).alias("doc_w")
    )
    sims = (
        doc_side.join(cls_scores.select(class_col, "term", "cls_score"), "term")
        .groupBy(id_col, class_col)
        .agg(F.sum(F.col("doc_w") * F.col("cls_score")).alias("sim"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc(class_col))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col(class_col).alias("pred_class"),
                F.round("sim", 6).alias("score"))
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str,
                     mode: str = "ascii_code") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1 —
    the standard repetition filters of a training-data pipeline):

    (id, n_lines, dup_line_frac, dup_line_char_frac, top_bigram,
    top_bigram_char_frac)

    - dup_line_frac: (n_lines − n_distinct_lines) / n_lines
    - dup_line_char_frac: chars in repeat occurrences of a line (count−1
      per distinct line) / total line chars
    - top_bigram_char_frac: occurrences of the most frequent token bigram
      × its string length / total doc chars (tie-break: bigram asc)

    Physical shape: lines explode → two-phase (id, line) agg → per-id agg;
    bigrams explode → (id, bigram) agg → per-id window top-1. Every shuffle
    is keyed by (or prefixed with) the doc id, so no key is wider than a
    document — skew-free at any corpus size. Rows with NULL text keep all
    metrics at 0 (left joins back onto the input ids).
    """
    from pyspark.sql import Window

    base = df.select(id_col, text_col)
    lines = base.select(
        id_col, F.explode(F.split(F.col(text_col), "\n")).alias("line"))
    lg = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = lg.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum((F.col("cnt") - 1) * F.length("line")).alias("dup_chars"),
        F.sum(F.col("cnt") * F.length("line")).alias("tot_chars"),
    )
    toks = with_tokens(base, text_col, mode)
    bigrams = toks.select(
        id_col,
        F.explode(F.expr(
            "transform(slice(tokens, 1, greatest(size(tokens)-1, 0)), "
            "(t, i) -> concat(t, ' ', tokens[i+1]))")).alias("bg"),
    )
    bgc = bigrams.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("bg"))
    top = (
        bgc.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        .select(id_col, F.col("bg").alias("top_bigram"),
                F.col("cnt").alias("top_cnt"))
    )
    out = (
        base.select(id_col, F.length(text_col).alias("doc_chars"))
        .join(line_stats, id_col, "left")
        .join(top, id_col, "left")
    )
    z = F.lit(0.0)
    return out.select(
        F.col(id_col),
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        F.round(F.when(F.col("n_lines") > 0,
                       (F.col("n_lines") - F.col("n_distinct"))
                       / F.col("n_lines").cast("double")).otherwise(z),
                6).alias("dup_line_frac"),
        F.round(F.when(F.col("tot_chars") > 0,
                       F.col("dup_chars") / F.col("tot_chars").cast("double"))
                .otherwise(z), 6).alias("dup_line_char_frac"),
        F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
        F.round(F.when((F.col("doc_chars") > 0) & F.col("top_cnt").isNotNull(),
                       F.col("top_cnt") * F.length("top_bigram")
                       / F.col("doc_chars").cast("double")).otherwise(z),
                6).alias("top_bigram_char_frac"),
    )


# ---------------------------------------------------------------------------
# PII / secret redaction — training-data pipeline scrub pass.
# ---------------------------------------------------------------------------

# (name, pattern, replacement). Patterns restricted to the syntax subset
# where Java regex (Spark) and RE2 (DuckDB oracle) agree exactly.
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("hexkey", r"\b[0-9a-f]{32,}\b", "<KEY>"),
)


def redact_pii(df, text_col: str = "text", id_col: str = "doc_id",
               rules=PII_RULES):
    """Scrub PII/secrets: (id, n_<rule>..., clean).

    Counts are measured on the ORIGINAL text (the audit number a pipeline
    reports); replacements apply in rule order. Pure JVM ``regexp_count`` /
    ``regexp_replace`` — one narrow projection inside WholeStageCodegen,
    no shuffle, no UDF; at 100 TB this is a map-only pass whose cost is the
    scan itself.
    """
    if not rules:
        raise ValueError("need at least one redaction rule")
    clean = F.col(text_col)
    cols = [F.col(id_col)]
    for name, pat, repl in rules:
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat))
                    .cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(*cols, clean.alias("clean"))


def pack_shards(df, budget: int, order_cols=("doc_id",),
                text_col: str = "text", id_col: str = "doc_id",
                mode: str = "ascii_code", num_partitions: int | None = None):
    """Assign docs to training shards by cumulative token budget:
    (id, n_tokens, shard_id), shard_id = floor(tokens-before-this-doc /
    budget) in deterministic ``order_cols`` order.

    The cumulative-quotient rule (a doc may straddle a boundary) is the
    parallelizable semantics: strict greedy fill (reset at each boundary)
    depends on the entire prefix sequentially and cannot be expressed as a
    distributed prefix sum. Physical shape: the ``assign_doc_ids`` pattern
    — range-partition by order_cols, per-partition token totals (tiny
    collect), broadcast offsets, within-partition cumulative window. No
    single-partition window at any size.
    """
    from pyspark.sql import Window

    from bertopic_spark.tokenizer import with_tokens

    if budget < 1:
        raise ValueError("budget must be >= 1")
    order_cols = list(order_cols)
    toks = with_tokens(df.select(id_col, *[c for c in order_cols
                                           if c != id_col], text_col),
                       text_col, mode)
    nt = toks.select(*dict.fromkeys([id_col, *order_cols]),
                     F.size(F.coalesce(F.col("tokens"),
                                       F.array().cast("array<string>")))
                     .cast("long").alias("n_tokens"))
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (nt.repartitionByRange(n_part, *order_cols)
              .sortWithinPartitions(*order_cols)
              .withColumn("_pid", F.spark_partition_id())
              .persist())
    sums = {r["_pid"]: r["s"] for r in
            parted.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    off = F.broadcast(df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _offset long"))
    w = (Window.partitionBy("_pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (parted.join(off, "_pid")
           .withColumn("_cum", F.sum("n_tokens").over(w) + F.col("_offset"))
           .withColumn("shard_id",
                       F.floor((F.col("_cum") - F.col("n_tokens"))
                               / F.lit(int(budget))).cast("long"))
           .drop("_pid", "_offset", "_cum"))
    return out.select(id_col, "n_tokens", "shard_id")


GOPHER_RULES = (
    # (reason, column, op, default threshold) — Rae et al. 2021 A1.1 bands,
    # evaluated on the 6dp-rounded exported stats in BOTH engines so
    # borderline docs can never flip across float formatting.
    ("too_few_tokens", "n_tokens", "lt", 50),
    ("too_many_tokens", "n_tokens", "gt", 100000),
    ("avg_token_len_low", "avg_token_len", "lt", 3.0),
    ("avg_token_len_high", "avg_token_len", "gt", 10.0),
    ("low_stopword_ratio", "stopword_ratio", "lt", 0.06),
    ("dup_lines", "dup_line_frac", "gt", 0.30),
    ("dup_top_bigram", "top_bigram_char_frac", "gt", 0.18),
)


def gopher_filter(df, text_col: str = "text", id_col: str = "doc_id",
                  mode: str = "ascii_code",
                  thresholds: dict | None = None):
    """Gopher-style quality verdict: (id, keep, reasons) — reasons is the
    comma-joined, rule-ordered list of violated bands (empty when kept).

    The standard pre-training filter pass (Rae et al. 2021, appendix
    A1.1): length band, mean token length band, stop-word floor, duplicate
    -line and repeated-bigram ceilings. Composes the existing
    ``token_stats`` and ``repetition_stats`` relations — one join on the
    doc id, every threshold a JVM comparison; ``thresholds`` overrides any
    default by reason name.
    """
    th = {r: t for r, _, _, t in GOPHER_RULES}
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown rules: {sorted(unknown)}")
        th.update(thresholds)
    ts = token_stats(df, text_col, id_col, mode)
    rs = repetition_stats(df, text_col, id_col, mode)
    j = ts.join(rs, id_col)
    flags = [
        F.when(F.col(col) < F.lit(th[r]) if op == "lt"
               else F.col(col) > F.lit(th[r]), F.lit(r))
        for r, col, op, _ in GOPHER_RULES]
    reasons = F.array_join(
        F.filter(F.array(*flags), lambda x: x.isNotNull()), ",")
    return j.select(
        F.col(id_col),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"))


def corpus_profile(df, strat_col: str, text_col: str = "text",
                   id_col: str = "doc_id", mode: str = "ascii_code",
                   percentiles=(0.5, 0.9, 0.99)):
    """Per-stratum corpus profile: (stratum, n_docs, total_tokens,
    mean_tokens, p<q>_tokens…) — the shape/skew report a pipeline runs
    before sizing shards, filters and samplers.

    One tokenize pass → one groupBy(stratum). Exact percentiles via
    ``F.percentile`` (linear interpolation — bit-identical to DuckDB's
    ``quantile_cont``, verified in the gate); at 100 TB swap for
    ``percentile_approx`` per stratum if exact sort-based percentiles
    become the bottleneck (documented trade-off, same relation shape).
    """
    from bertopic_spark.tokenizer import with_tokens

    toks = with_tokens(df.select(id_col, strat_col, text_col),
                       text_col, mode)
    nt = toks.select(
        F.col(strat_col),
        F.size(F.coalesce(F.col("tokens"),
                          F.array().cast("array<string>")))
        .cast("long").alias("n_tokens"))
    aggs = [F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.avg("n_tokens").alias("mean_tokens")]
    for q in percentiles:
        name = f"p{int(round(q * 100))}_tokens"
        aggs.append(F.percentile("n_tokens", float(q)).alias(name))
    return nt.groupBy(strat_col).agg(*aggs)


def lm_perplexity(df, text_col: str = "text", id_col: str = "doc_id",
                  mode: str = "ascii_code", alpha: float = 0.5,
                  lm_counts=None, persist_counts: bool = True,
                  _persisted_out: list | None = None):
    """Per-doc cross-entropy / perplexity under the corpus unigram LM —
    the CCNet-style quality signal (docs far from the corpus distribution
    score high): (id, n_tokens, cross_entropy, perplexity).

    p(t) = (tf_corpus(t) + α) / (total + α·|V|) (Lidstone smoothing);
    H(d) = −Σ_t tf_d(t)·ln p(t) / len(d); ppl = exp(H). Train/apply split:
    pass ``lm_counts`` (a (term, tf) relation, e.g. from a held-out or
    earlier snapshot) to score against a frozen LM; default trains on the
    scored corpus itself. Physical shape: one counts pass, the LM is a
    (term, logp) relation joined onto the doc-term counts (vocabulary-
    sized — shuffle join, NOT broadcast), one groupBy(id).
    """
    from bertopic_spark.operators.postings import doc_term_counts

    x = doc_term_counts(df, text_col, [id_col], mode, with_len=True)
    if lm_counts is None and persist_counts:
        # x feeds both the LM training agg and the scoring join; their
        # column pruning differs so ReuseExchange can't dedupe, and the
        # corpus would tokenize twice (same trap and same fix as
        # bm25.doc_scores). Collect the handle via _persisted_out to
        # unpersist after materializing.
        x = x.persist()
        if _persisted_out is not None:
            _persisted_out.append(x)
    lm = (lm_counts if lm_counts is not None
          else x.groupBy("term").agg(F.sum("tf").alias("tf")))
    lm = lm.groupBy("term").agg(F.sum("tf").alias("ctf"))
    tot = lm.agg(F.sum("ctf").alias("total"), F.count("*").alias("v"))
    logp = (lm.crossJoin(F.broadcast(tot))
            .select("term",
                    F.log((F.col("ctf") + F.lit(float(alpha)))
                          / (F.col("total")
                             + F.lit(float(alpha)) * F.col("v")))
                    .alias("logp")))
    # OOV terms (when lm_counts is external) get the α-mass logp
    oov = (tot.select(F.log(F.lit(float(alpha))
                            / (F.col("total")
                               + F.lit(float(alpha)) * F.col("v")))
                      .alias("oov_logp")))
    h = (x.join(logp, "term", "left")
         .crossJoin(F.broadcast(oov))
         .groupBy(id_col)
         .agg(F.first("doc_len").alias("n_tokens"),
              (-F.sum(F.col("tf") * F.coalesce("logp", "oov_logp"))
               / F.first("doc_len")).alias("cross_entropy")))
    return h.select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                    "cross_entropy",
                    F.exp("cross_entropy").alias("perplexity"))


def bigram_lm_perplexity(df, text_col: str = "text", id_col: str = "doc_id",
                         mode: str = "ascii_code", alpha: float = 0.5,
                         kappa: float = 0.4, train_df=None):
    """Per-doc cross-entropy / perplexity under a corpus bigram LM with
    stupid backoff (Brants et al. 2007, "Large Language Models in Machine
    Translation" — the smoothing designed FOR distributed web-scale LM
    training: no normalization pass, counts compose under union):
    (id, n_tokens, cross_entropy, perplexity).

        S(wᵢ | wᵢ₋₁) = c(wᵢ₋₁wᵢ) / c(wᵢ₋₁)   if the bigram was seen
                     = κ · p_uni(wᵢ)           otherwise (κ = 0.4, the
                                               paper's constant)
        p_uni(w)     = (c(w) + α) / (N + α·V)  Lidstone, same α convention
                                               as ``lm_perplexity`` — gives
                                               OOV words finite mass
        ln p(doc)    = ln p_uni(t₁) + Σᵢ₌₂ ln S(tᵢ|tᵢ₋₁)
        ce = −ln p(doc) / n;  ppl = exp(ce)

    ``train_df`` freezes the LM on a different corpus (held-out snapshot,
    single-language slice); default trains on the scored corpus itself (in
    which case backoff never fires — every scored bigram was counted).

    Physical shape: doc bigrams are pre-aggregated per (doc, w₁, w₂)
    before any join (same shrink as doc_term_counts); the bigram-count
    join keys on (w₁, w₂) — a shuffle join, the bigram table is NOT
    broadcastable at scale — and the two unigram joins key on the
    vocabulary-sized relation. One groupBy(id) finishes. No UDFs.
    """
    toks = (with_tokens(df, text_col, mode)
            .select(id_col, "tokens")
            .filter(F.size("tokens") >= 1))
    tr = (toks if train_df is None
          else with_tokens(train_df, text_col, mode)
          .select("tokens").filter(F.size("tokens") >= 1))

    uni = (tr.select(F.explode("tokens").alias("term"))
           .groupBy("term").agg(F.count("*").cast("long").alias("ctf")))
    tot = uni.agg(F.sum("ctf").alias("n_total"),
                  F.count("*").alias("v"))
    bigrams_expr = F.expr(
        "CASE WHEN size(tokens) < 2 THEN array() "
        "ELSE zip_with(slice(tokens, 1, size(tokens) - 1), "
        "slice(tokens, 2, size(tokens) - 1), (l, r) -> struct(l, r)) END")
    bg = (tr.select(F.explode(bigrams_expr).alias("p"))
          .groupBy(F.col("p.l").alias("w1"), F.col("p.r").alias("w2"))
          .agg(F.count("*").cast("long").alias("cbg")))

    def _p_uni(ctf_col):
        return ((F.coalesce(ctf_col, F.lit(0)) + F.lit(float(alpha)))
                / (F.col("n_total") + F.lit(float(alpha)) * F.col("v")))

    first = toks.select(id_col, F.size("tokens").alias("n_tokens"),
                        F.element_at("tokens", 1).alias("t1"))
    lp_first = (first
                .join(uni.withColumnRenamed("term", "t1"), "t1", "left")
                .crossJoin(F.broadcast(tot))
                .select(id_col, "n_tokens",
                        F.log(_p_uni(F.col("ctf"))).alias("lp")))

    docbg = (toks.select(id_col, F.explode(bigrams_expr).alias("p"))
             .groupBy(id_col, F.col("p.l").alias("w1"),
                      F.col("p.r").alias("w2"))
             .agg(F.count("*").cast("long").alias("tf")))
    u1 = uni.select(F.col("term").alias("w1"), F.col("ctf").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("ctf").alias("c2"))
    pair_lp = (docbg
               .join(bg, ["w1", "w2"], "left")
               .join(u1, "w1", "left")
               .join(u2, "w2", "left")
               .crossJoin(F.broadcast(tot))
               .withColumn("s", F.when(
                   F.col("cbg").isNotNull(),
                   F.log(F.col("cbg") / F.col("c1").cast("double")))
                   .otherwise(F.log(F.lit(float(kappa))
                                    * _p_uni(F.col("c2")))))
               .groupBy(id_col)
               .agg(F.sum(F.col("tf") * F.col("s")).alias("lp_pairs")))

    out = (lp_first.join(pair_lp, id_col, "left")
           .withColumn("ce", -(F.col("lp")
                               + F.coalesce("lp_pairs", F.lit(0.0)))
                       / F.col("n_tokens")))
    return out.select(id_col,
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.col("ce").alias("cross_entropy"),
                      F.exp("ce").alias("perplexity"))


def char_ngrams(text, n: int = 3):
    """Sliding character n-grams of ``text`` (a raw attribute column) as an
    array, lowercased per gram. ``text`` must be a plain column reference —
    substr on an attribute is free per element; a computed intermediate
    would be inlined per gram by CollapseProject (use fulltext._bound)."""
    cnt = F.length(text) - (n - 1)
    seq = (F.when(cnt >= 1, F.sequence(F.lit(1), cnt))
           .otherwise(F.array().cast("array<int>")))
    return F.transform(seq, lambda i: F.lower(text.substr(i, F.lit(n))))


def langid_ngram(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", label_col: str = "lang",
                 n: int = 3, alpha: float = 0.5,
                 train: DataFrame | None = None,
                 persist_counts: bool = True,
                 _persisted_out: list | None = None) -> DataFrame:
    """Char-n-gram multinomial Naive Bayes language ID (the classic
    Cavnar-Trenkle-shaped n-gram heuristic, NB-scored): (id, pred_<label>,
    score). Train on ``train`` (default: ``df`` itself, resubstitution) and
    predict the argmax label for every row of ``df``.

    score(d, l) = Σ_g tf_dg·ln p(g|l), Lidstone-smoothed, decomposed so the
    plan stays sparse: a (label, gram, w) weight relation joined on gram
    (vocabulary-sized — shuffle join, fan-out bounded by the label count)
    plus a per-label constant carried by a broadcast of the label-stats
    relation. No dense doc×label matrix; docs with no grams tie at 0 and
    take the lexicographically first label.

    Physical shape: ONE gram-explode pass over the corpus — the base
    (id[, label], gram, tf) counts relation feeds the profile agg, the
    scoring join and the doc-length agg, so it is persisted by default
    (their column pruning differs; ReuseExchange can't dedupe — same
    trap/fix as bm25.doc_scores). Doc lengths rejoin an id-only (column-
    pruned) scan so zero-gram docs stay in the output.
    """
    from pyspark.sql import Window

    la = F.lit(float(alpha))
    base_cols = [F.col(id_col)]
    if train is None:
        base_cols.append(F.col(label_col).alias("label"))
    base = (df.select(*base_cols,
                      F.explode(char_ngrams(F.col(text_col), n)).alias("gram"))
            .groupBy(*([id_col, "label", "gram"] if train is None
                       else [id_col, "gram"]))
            .agg(F.count(F.lit(1)).alias("tf")))
    if persist_counts:
        base = base.persist()
        if _persisted_out is not None:
            _persisted_out.append(base)
    if train is None:
        tg = base.groupBy("label", "gram").agg(F.sum("tf").alias("c"))
    else:
        tg = (train.select(F.col(label_col).alias("label"),
                           F.explode(char_ngrams(F.col(text_col), n))
                           .alias("gram"))
              .groupBy("label", "gram").agg(F.count(F.lit(1)).alias("c")))
    stats = tg.groupBy("label").agg(F.sum("c").alias("tot"))
    vocab = tg.agg(F.count_distinct("gram").alias("v"))
    weights = tg.select("label", "gram",
                        (F.log(F.col("c") + la) - F.log(la)).alias("w"))
    consts = (stats.crossJoin(F.broadcast(vocab))
              .select("label",
                      (F.log(la) - F.log(F.col("tot") + la * F.col("v")))
                      .alias("konst")))
    dg = base.select(F.col(id_col), "gram", "tf")
    sparse = (dg.join(weights, "gram")
              .groupBy(id_col, "label")
              .agg(F.sum(F.col("tf") * F.col("w")).alias("s")))
    dlen = (df.select(F.col(id_col))
            .join(base.groupBy(id_col).agg(F.sum("tf").alias("glen")),
                  id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("glen"), F.lit(0)).cast("long")
                    .alias("glen")))
    sims = (dlen.crossJoin(F.broadcast(consts))
            .join(sparse, [id_col, "label"], "left")
            .select(F.col(id_col), "label",
                    (F.coalesce(F.col("s"), F.lit(0.0))
                     + F.col("glen") * F.col("konst")).alias("score")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col(id_col), F.col("label").alias(f"pred_{label_col}"),
                    F.round("score", 6).alias("score")))


def vocab_kl_drift(corpus_a: DataFrame, corpus_b: DataFrame,
                   text_col: str = "text", mode: str = "ascii_code",
                   k: int = 100) -> DataFrame:
    """Unigram-distribution drift between two corpus snapshots — the
    pipeline-monitoring relation that catches a crawl/source shift before
    it reaches training: per-term KL(P||Q) contribution with add-one
    (Laplace) smoothing over the UNION vocabulary, top-``k`` terms by
    contribution (the terms that drifted most toward snapshot A).

    P = smoothed unigram dist of ``corpus_a``, Q of ``corpus_b``:
    p_t = (cnt_a(t) + 1) / (N_a + V); contribution_t = p_t * ln(p_t / q_t);
    Σ over the union vocab = KL(P||Q) ≥ 0. Deterministic tie-break
    (contribution desc, term asc).

    Physical shape: one tokenize + term-level agg per snapshot (two-phase,
    map-side partial), a term-keyed full outer join at VOCABULARY
    cardinality (not corpus), two 1-row total aggs broadcast as literals
    via a cross join of a 1-row relation — no driver collect of anything
    row-count-sized, so 100 TB snapshots reduce to |vocab| rows before any
    wide operation.
    """
    ta = (with_tokens(corpus_a.select(text_col), text_col, mode)
          .select(F.explode("tokens").alias("term"))
          .groupBy("term").agg(F.count(F.lit(1)).alias("cnt_a")))
    tb = (with_tokens(corpus_b.select(text_col), text_col, mode)
          .select(F.explode("tokens").alias("term"))
          .groupBy("term").agg(F.count(F.lit(1)).alias("cnt_b")))
    u = (ta.join(tb, "term", "full_outer")
         .select("term",
                 F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                 F.coalesce("cnt_b", F.lit(0)).alias("cnt_b")))
    tot = u.agg(F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b"),
                F.count(F.lit(1)).alias("v"))
    p = (F.col("cnt_a") + 1.0) / (F.col("n_a") + F.col("v"))
    q = (F.col("cnt_b") + 1.0) / (F.col("n_b") + F.col("v"))
    scored = (u.crossJoin(F.broadcast(tot))
              .select("term", "cnt_a", "cnt_b",
                      (p * F.log(p / q)).alias("contribution")))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("contribution"), F.asc("term"))
    # global top-k over vocab-sized input: Spark plans WindowGroupLimit /
    # TakeOrderedAndProject here, a per-partition k-prune then k-merge.
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("term", "cnt_a", "cnt_b", "contribution",
                    F.col("rn").cast("long").alias("rn")))


def perplexity_buckets(df, text_col: str = "text", id_col: str = "doc_id",
                       mode: str = "ascii_code", alpha: float = 0.5,
                       n_buckets: int = 3, labels=("head", "middle", "tail"),
                       lm_counts=None):
    """CCNet quality stratification (Wenzek et al. 2020 §4.3): rank every
    document by perplexity under the (frozen or corpus) unigram LM and
    cut into ``n_buckets`` equal-count strata — ascending, so the lowest-
    perplexity third is 'head', the training-data slice CCNet keeps
    first. Returns (id, n_tokens, perplexity, bucket_idx, bucket).

    The global rank uses the range-repartition + per-partition prefix-sum
    pattern (``assign_doc_ids``) — never a partitionBy-less window, so
    the sort scales like any repartition. Bucket index =
    ⌊rank · n / N⌋ over the dense 0-based rank (exact equal-count up to
    ±1, same cut DuckDB's row_number replays).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError("labels must have n_buckets entries")
    from bertopic_spark.index.segments import assign_doc_ids

    ppl = lm_perplexity(df, text_col, id_col, mode, alpha,
                        lm_counts=lm_counts)
    ranked = assign_doc_ids(
        ppl.select(id_col, "n_tokens", "cross_entropy", "perplexity"),
        ["cross_entropy", id_col], out_col="_rank")
    n = ranked.count()
    idx = F.floor(F.col("_rank") * F.lit(int(n_buckets)) / F.lit(int(n))) \
        .cast("int")
    out = ranked.withColumn("bucket_idx", idx)
    if labels is not None:
        expr = None
        for i, name in enumerate(labels):
            c = F.when(F.col("bucket_idx") == i, F.lit(name))
            expr = c if expr is None else expr.when(
                F.col("bucket_idx") == i, F.lit(name))
        out = out.withColumn("bucket", expr)
    return out.select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                      "perplexity", F.col("bucket_idx").cast("long")
                      .alias("bucket_idx"),
                      *( ["bucket"] if labels is not None else []))


def categorize_text(df, msg_col: str, id_col: str = "event_id"):
    """ES ``categorize_text`` aggregation / Drain-style log-template
    mining: cluster semi-structured messages into categories keyed by
    (token_count, first_token) — the Drain parse-tree's first two levels
    — and render each category's template with ``*`` at every position
    whose token varies within the category. Returns
    (n_tokens, first_tok, template, n_docs).

    The observability workhorse at scale: a trillion log lines collapse
    to thousands of templates. Fully relational — one whitespace split +
    posexplode, one (key, pos) agg (distinct counts are per-position,
    never across the corpus), one ordered re-concat. No UDF, no driver
    state, unlike tree-based Drain implementations.
    """
    tk = F.split(F.trim(F.col(msg_col)), r"\s+")
    base = (df.where(F.col(msg_col).isNotNull())
            .select(F.col(id_col), tk.alias("tk"))
            .filter(F.size("tk") > 0))
    keyed = base.select(
        F.col(id_col), F.size("tk").alias("n_tokens"),
        F.get(F.col("tk"), 0).alias("first_tok"),
        F.posexplode("tk").alias("pos", "tok"))
    per_pos = (keyed.groupBy("n_tokens", "first_tok", "pos")
               .agg(F.count_distinct("tok").alias("nd"),
                    F.min("tok").alias("tok0")))
    tmpl = (per_pos
            .withColumn("piece", F.when(F.col("nd") == 1, F.col("tok0"))
                        .otherwise(F.lit("*")))
            .groupBy("n_tokens", "first_tok")
            .agg(F.concat_ws(" ", F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "piece"))),
                lambda s: s["piece"])).alias("template")))
    sizes = (base.groupBy(F.size("tk").alias("n_tokens"),
                          F.get(F.col("tk"), 0).alias("first_tok"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    return (tmpl.join(sizes, ["n_tokens", "first_tok"])
            .select(F.col("n_tokens").cast("long").alias("n_tokens"),
                    "first_tok", "template", "n_docs"))
