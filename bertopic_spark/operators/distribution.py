"""Token-window topic distributions and split/sample/scatter operators
(SURVEY §2.3 T4, §2.6 W9, §2.2 P2, §2.4 A10).

``approximate_distribution`` (reference ``_bertopic.py:1204-1429``): slide a
token window over each document, score every window against every class via
the inverted index, sum per (doc, class), L1-normalize per doc. The
reference batches docs in Python (batch_size=1000); Spark's partitioning
subsumes that — the whole corpus is one plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.tokenizer import with_tokens


def _window_structs(df: DataFrame, text_col: str, id_col: str,
                    window: int, stride: int,
                    mode: str, padding: bool) -> DataFrame:
    """(id, win_id, start, win_tokens) — one row per sliding window, with the
    0-based token position where the window starts. Shared JVM-only core of
    ``token_windows`` (term view) and ``approximate_distribution_tokens``
    (position view); win_id enumeration matches the reference's token-set
    order (pads first, then body)."""
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    size = F.size("tokens")

    def win_at(start):  # struct(start, tokens[start : start+window])
        return F.struct(start.cast("int").alias("start"),
                        F.slice("tokens", start + 1, window).alias("toks"))

    if padding:
        n_body = F.when(size < window, F.lit(1)).otherwise(
            F.ceil(size / F.lit(stride))).cast("int")
        body = F.transform(F.sequence(F.lit(0), n_body - 1),
                           lambda w: win_at(w * stride))
        t = -(-window // stride) - 1  # ceil(window/stride) - 1
        pad_lens = [window - (t - i) * stride for i in range(t)]
        # pad windows are PREFIXES tokens[:ln] — they all start at position 0
        pads = [F.struct(F.lit(0).alias("start"),
                         F.slice("tokens", 1, ln).alias("toks"))
                for ln in pad_lens if ln > 0]
        wins_expr = body if not pads else F.when(size < window, body).otherwise(
            F.concat(F.array(*pads), body))
    else:
        n_win = F.greatest(
            (F.floor((size - F.lit(window)) / F.lit(stride)) + 1).cast("int"),
            F.lit(1))
        wins_expr = F.transform(F.sequence(F.lit(0), n_win - 1),
                                lambda w: win_at(w * stride))
    return (
        toks.select(F.col(id_col), F.posexplode(wins_expr).alias("win_id", "w"))
        .filter(F.size("w.toks") > 0)
        .select(id_col, "win_id", F.col("w.start").alias("start"),
                F.col("w.toks").alias("win_tokens"))
    )


def token_windows(df: DataFrame, text_col: str, id_col: str,
                  window: int = 4, stride: int = 1,
                  mode: str = "ascii_code", padding: bool = False) -> DataFrame:
    """T4: (id, win_id, term) — sliding token windows, JVM expressions only.

    Reference-exact (``_bertopic.py:1318-1351``): window w starts at
    w·stride; without padding only FULL windows survive (the reference
    drops partial tails), with ``padding`` every stride start is kept
    (short tails included) plus the ramp-up prefixes
    ``tokens[:window−(t−i)·stride]``. Docs shorter than ``window`` always
    yield one whole-doc window. Empty pad windows are dropped (they join
    to "" in the reference and contribute no terms either way).
    """
    wins = _window_structs(df, text_col, id_col, window, stride, mode, padding)
    return wins.select(id_col, "win_id", F.explode("win_tokens").alias("term"))


def approximate_distribution(df: DataFrame, scores: DataFrame,
                             class_cols: Sequence[str], text_col: str,
                             id_col: str, window: int = 4, stride: int = 1,
                             mode: str = "ascii_code",
                             padding: bool = False) -> DataFrame:
    """(id, class..., weight) — per-doc topic distribution, L1-normalized
    (reference sum-normalize at _bertopic.py:1407-1418)."""
    wt = token_windows(df, text_col, id_col, window, stride, mode, padding)
    hit = (
        wt.join(scores.select(*class_cols, "term", "score"), "term")
        .groupBy(id_col, *class_cols)
        .agg(F.sum("score").alias("mass"))
    )
    total = Window.partitionBy(id_col)
    return hit.withColumn(
        "weight", F.col("mass") / F.sum("mass").over(total)
    ).select(id_col, *class_cols, "weight")


def approximate_distribution_tokens(
        df: DataFrame, scores: DataFrame, class_cols: Sequence[str],
        text_col: str, id_col: str, window: int = 4, stride: int = 1,
        mode: str = "ascii_code", padding: bool = False) -> DataFrame:
    """(id, token_pos, term, class..., weight) — TOKEN-level topic
    distribution (reference ``calculate_tokens=True``,
    ``_bertopic.py:1374-1404``): each token position accumulates the mass of
    every window that contains it; the token matrix stays UNNORMALIZED
    (the reference L1-normalizes only the doc-level rollup).

    Plan: window mass is computed once per (doc, win, class) from the term
    view, then fanned out to positions by a (doc, win) equi-join against the
    position view — both sides come from the same ``_window_structs`` scan,
    and the join key includes the doc id, so at 10^12 docs this shuffles
    window-count rows, never a cross product. A (doc,pos) appearing in no
    scoring window yields no row (sparse long-form semantics).
    """
    wins = _window_structs(df, text_col, id_col, window, stride, mode, padding)
    wmass = (
        wins.select(id_col, "win_id", F.explode("win_tokens").alias("term"))
        .join(scores.select(*class_cols, "term", "score"), "term")
        .groupBy(id_col, "win_id", *class_cols)
        .agg(F.sum("score").alias("mass"))
    )
    pos = wins.select(
        id_col, "win_id", "start",
        F.posexplode("win_tokens").alias("off", "term"),
    ).select(id_col, "win_id", (F.col("start") + F.col("off")).alias("token_pos"),
             "term")
    return (
        pos.join(wmass, [id_col, "win_id"])
        .groupBy(id_col, "token_pos", "term", *class_cols)
        .agg(F.sum("mass").alias("weight"))
    )


def seeded_sample_per_class(df: DataFrame, class_cols: Sequence[str],
                            id_col: str, n: int = 500, seed: int = 42) -> DataFrame:
    """W9 (reference groupby.sample(n, random_state=42), _bertopic.py:4267):
    deterministic per-class cap via md5-ordered row_number (md5 exists in
    both engines, so the oracle reproduces the exact sample)."""
    w = Window.partitionBy(*class_cols).orderBy(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string"))), F.col(id_col))
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .drop("_r")
    )


def zero_shot_split(assigned: DataFrame, sim_col: str = "sim",
                    threshold: float = 0.5, id_col: str = "doc_id"):
    """P2 (``_zeroshot_topic_modeling``, _bertopic.py:4010-4066): threshold
    filter splits docs into (assigned, rest); both re-IDed densely by the
    original id order (reference re-IDs at 4042/4058).

    Re-ID uses the range-repartition + per-partition prefix-sum pattern
    (``assign_doc_ids``) — never a partitionBy-less window, which would
    funnel each half through one task at scale.
    """
    from bertopic_spark.index.segments import assign_doc_ids

    hit = assign_doc_ids(
        assigned.filter(F.col(sim_col) >= threshold), [id_col], out_col="new_id")
    rest = assign_doc_ids(
        assigned.filter(F.col(sim_col) < threshold), [id_col], out_col="new_id")
    return hit, rest


def scatter_add_probabilities(probs: DataFrame, mapping: dict,
                              topic_col: str = "topic",
                              id_col: str = "doc_id") -> DataFrame:
    """A10 (``_map_probabilities``, _bertopic.py:4767-4798): fold the
    probability mass of merged topics — a remap join + groupBy sum."""
    from bertopic_spark.operators.topics import remap_topics

    remapped = remap_topics(probs, mapping, topic_col)
    return remapped.groupBy(id_col, topic_col).agg(F.sum("prob").alias("prob"))


def stratified_sample(df: DataFrame, strat_col: str,
                      fractions: dict, default: float = 0.0,
                      id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the domain-mixing
    primitive of a training-data pipeline (keep fraction f_s of stratum s).

    A row survives iff u(id) < f(stratum), where u is the md5-derived
    uniform in [0,1) (first 15 hex digits / 16^15 — exactly reproducible
    in DuckDB, unlike Spark's ``sample``). O(1) per row, no window, no
    shuffle: the filter runs inside the scan, and the SAME id keeps the
    same u across strata/fraction changes, so raising a fraction only
    ADDS rows (nested samples — the property mixing-weight sweeps rely
    on).
    """
    for s, f in fractions.items():
        if not (0.0 <= float(f) <= 1.0):
            raise ValueError(f"fraction for {s!r} must be in [0,1]")
    if not (0.0 <= float(default) <= 1.0):
        raise ValueError("default fraction must be in [0,1]")
    u = (F.conv(F.substring(
            F.md5(F.concat_ws("_", F.lit(seed),
                              F.col(id_col).cast("string"))), 1, 15),
            16, 10).cast("double") / F.lit(float(16 ** 15)))
    frac = F.lit(float(default))
    for s, f in sorted(fractions.items()):
        frac = F.when(F.col(strat_col) == s, F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)


def weighted_sample_wor(df: DataFrame, weight_col: str, n: int,
                        id_col: str = "doc_id", seed: int = 42,
                        by: Sequence[str] | None = None) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling WITHOUT replacement: each row
    draws key = ln(u)/w (monotone in the classic u^(1/w)); the n largest
    keys are the sample. Inclusion probability is proportional-to-weight
    without replacement in one pass — the training-data-pipeline primitive
    for 'sample 1M docs biased toward high quality-score'.

    u is the md5-derived uniform in (0, 1] (same convention as
    ``stratified_sample``, +1 offset so ln never sees 0), reproducible
    bit-for-bit in DuckDB. Rows with weight <= 0 are excluded (zero mass),
    matching the algorithm's w > 0 domain.

    Scale path: the global form compiles to TakeOrderedAndProject —
    per-partition top-n then a driver merge of n rows per partition, no
    full sort, no shuffle. With ``by`` the top-n runs per group under one
    hash shuffle on the group keys (row_number window).
    """
    if n <= 0:
        raise ValueError("n must be > 0")
    u = ((F.conv(F.substring(
            F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double") + F.lit(1.0))
         / F.lit(float(16 ** 15 + 1)))
    key = F.log(u) / F.col(weight_col).cast("double")
    pos = df.filter(F.col(weight_col) > 0).withColumn("_es_key", key)
    if by:
        w = Window.partitionBy(*by).orderBy(F.desc("_es_key"), F.col(id_col))
        return (pos.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= n).drop("_es_key", "_r"))
    return (pos.orderBy(F.desc("_es_key"), F.col(id_col))
            .limit(n).drop("_es_key"))


def diversified_sampler(df: DataFrame, dedup_col: str, n: int = 100,
                        max_docs_per_value: int = 1,
                        id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """ES ``diversified_sampler`` agg: a sample of at most ``n`` rows in
    which no ``dedup_col`` value contributes more than
    ``max_docs_per_value`` rows — the de-bias front-end ES puts before
    significant_terms so one dominant source can't swamp the analysis.

    Deterministic where ES is shard-order dependent: rows are ranked by
    the md5-derived uniform (same convention as ``stratified_sample``;
    bit-reproducible in DuckDB), capped per dedup value by one grouped
    window, then the global top-``n`` of survivors compiles to
    TakeOrderedAndProject (per-partition top-n + driver merge of n rows
    per partition — no full sort). One hash shuffle on ``dedup_col``
    total; the dedup cap is why this can't be a pure filter.
    """
    if n <= 0 or max_docs_per_value <= 0:
        raise ValueError("n and max_docs_per_value must be > 0")
    u = F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(dedup_col).orderBy(u, F.col(id_col))
    return (df.withColumn("_u", u)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= max_docs_per_value)
            .orderBy("_u", id_col).limit(n)
            .drop("_u", "_r"))
