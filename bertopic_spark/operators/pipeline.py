"""End-to-end training-data preparation: the composition a 100-TB corpus
actually runs before tokenizer training — quality filter → exact dedup →
deterministic shard packing — expressed as ONE declarative plan so Catalyst
fuses the stages (the filter's tokenize pass and the dedup digest share the
same corpus scan; nothing materializes between stages unless the caller
checkpoints).

Each stage is independently gate-checked (gopher_filter, dedup_exact,
pack_shards); this module asserts the composition semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.dedup import exact_dedup
from bertopic_spark.operators.textstats import gopher_filter, pack_shards


def training_shards(df: DataFrame, budget: int,
                    text_col: str = "text", id_col: str = "doc_id",
                    mode: str = "ascii_code",
                    thresholds: dict | None = None) -> DataFrame:
    """(id, n_tokens, shard_id) over the cleaned corpus.

    Stages: (1) Gopher keep verdicts drop low-quality docs; (2) exact
    dedup keeps the min-id representative per content digest — computed
    over the SURVIVORS, so a low-quality copy never shadows a kept one;
    (3) token-budget shard packing in doc-id order. Shard ids are dense
    from 0 over the survivors.

    Physical shape: stage order matters at scale — the quality filter is
    the cheapest (one scan) and runs first so the dedup shuffle sees only
    survivors; dedup shuffles one 16-byte digest per doc; packing is the
    distributed prefix sum. No stage collects anything wider than the
    per-partition offset map.
    """
    kept = (df.join(gopher_filter(df, text_col, id_col, mode, thresholds)
                    .filter(F.col("keep")).select(id_col), id_col)
            .select(id_col, text_col))
    reps = exact_dedup(kept, text_col, id_col).select(
        F.col("keep_id").alias(id_col))
    survivors = kept.join(reps, id_col)
    return pack_shards(survivors, budget, order_cols=[id_col],
                       text_col=text_col, id_col=id_col, mode=mode)


def domain_mix_plan(df: DataFrame, domain_col: str, size_col: str,
                    budget: float, temperature: float = 1.0) -> DataFrame:
    """Temperature-reweighted domain mixing plan — how much of each domain
    (language, source, crawl) a training run should keep to hit a token
    ``budget``: (domain, n_docs, n_tokens, share, p, target_tokens) with

        share_d = t_d / Σt,   p_d = share_d^T / Σ_d share_d^T,
        target_d = min(p_d · budget, t_d)

    T(=``temperature``) < 1 upweights small domains (the multilingual-mix
    trick); T = 1 keeps natural proportions; T = 0 is uniform. Targets are
    capped at the domain's own size — the plan never asks for more data
    than exists (Σ target then lands under budget; re-run on the residual
    if exact totals matter). One groupBy(domain) agg — the plan relation
    is |domains|-sized, never data-sized.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(size_col).cast("long")).alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").alias("t_all"))
    sh = per.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("t_all"))
    pw = sh.withColumn("pw", F.pow(F.col("share"),
                                   F.lit(float(temperature))))
    z = pw.agg(F.sum("pw").alias("z"))
    return (pw.crossJoin(F.broadcast(z))
            .withColumn("p", F.col("pw") / F.col("z"))
            .withColumn("target_tokens",
                        F.least(F.col("p") * F.lit(float(budget)),
                                F.col("n_tokens").cast("double")))
            .select("domain", "n_docs", "n_tokens", "share", "p",
                    "target_tokens"))


def domain_mix_sample(df: DataFrame, plan: DataFrame, domain_col: str,
                      size_col: str, id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Deterministic document selection realizing a ``domain_mix_plan``:
    per domain, docs are ordered by md5(seed, id) (the engine's standard
    seeded shuffle — reproducible in SQL, stable across partitionings and
    cluster sizes) and kept while the INCLUSIVE running token sum stays
    ≤ the domain's target. Returns the kept (id, domain, n_tokens) rows.

    Plan: one broadcast join of the |domains|-sized plan onto the corpus,
    one window per domain (cumsum over the md5 order). The window
    partitions by domain — a single giant domain serializes into one task,
    the same bound every per-domain top-k in the engine has; re-shard such
    a domain upstream if it dominates.
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string"))),
        F.col(id_col))
    sized = (df.select(F.col(id_col), F.col(domain_col),
                       F.col(size_col).cast("long").alias("n_tokens"))
             .withColumn("_cum", F.sum("n_tokens").over(w)))
    pl = plan.select(F.col("domain").alias(domain_col), "target_tokens")
    return (sized.join(F.broadcast(pl), domain_col)
            .filter(F.col("_cum") <= F.col("target_tokens"))
            .select(id_col, domain_col, "n_tokens"))
