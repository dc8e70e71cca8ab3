"""Topic-quality evaluation metrics over fitted topic representations.

The reference itself computes no quality metrics, but its documented
evaluation workflow (BERTopic FAQ / papers) scores the fitted model with
gensim-style topic coherence (Röder, Both & Hinneburg, "Exploring the Space
of Topic Coherence Measures", WSDM 2015) and topic diversity (Dieng et al.,
"Topic Modeling in Embedding Spaces", TACL 2020). These are relational by
nature — document frequencies and pair co-occurrence counts over the corpus
— so at cluster scale they are three small joins, not a gensim driver loop:

* the top-k vocabulary (k terms × #topics) is broadcast-tiny by definition;
* the doc×term incidence is SEMI-JOINED down to that vocabulary before the
  pair self-join, so the shuffle carries only postings of the few hundred
  evaluated terms, never the full index;
* the pair self-join key is ``doc_id`` over that filtered incidence —
  bounded by (terms-per-doc choose 2) within the evaluated vocabulary.

All outputs round to 6 dp; counts are exact integers, so the metrics are
bit-comparable across engines (DuckDB oracles in entry_queries).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _incidence(doc_terms: DataFrame, vocab: DataFrame,
               id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc, term) pairs restricted to the evaluated vocabulary."""
    return (doc_terms.join(F.broadcast(vocab), "term", "left_semi")
            .select(id_col, "term").distinct())


def _pair_cooccurrence(inc: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term_a, term_b, d_ab) with term_a < term_b: co-document counts over
    the filtered incidence. One shuffle on the doc id."""
    a = inc.select(F.col(id_col).alias("_d"), F.col("term").alias("term_a"))
    b = inc.select(F.col(id_col).alias("_d"), F.col("term").alias("term_b"))
    return (a.join(b, "_d")
            .filter(F.col("term_a") < F.col("term_b"))
            .groupBy("term_a", "term_b")
            .agg(F.count(F.lit(1)).alias("d_ab")))


def umass_coherence(topk: DataFrame, doc_terms: DataFrame,
                    class_cols: Sequence[str], id_col: str = "doc_id",
                    round_to: int = 6) -> DataFrame:
    """(class..., coherence) — u_mass topic coherence (Mimno et al.,
    "Optimizing Semantic Coherence in Topic Models", EMNLP 2011; the
    ``c_uMass`` configuration of Röder et al. 2015, as in
    ``gensim.models.CoherenceModel(coherence='u_mass')``):

        mean over ordered pairs rank_i > rank_j of
            ln( (D(w_i, w_j) + 1) / D(w_j) )

    where D counts documents (of the evaluating corpus ``doc_terms``)
    containing the word(s). ``topk`` is a ``top_k_terms`` relation
    (class..., rank, term, score); the conditioning word w_j is the
    HIGHER-ranked one, per the original formulation."""
    cc = list(class_cols)
    vocab = topk.select("term").distinct()
    inc = _incidence(doc_terms, vocab, id_col)
    dfreq = inc.groupBy("term").agg(F.count(F.lit(1)).alias("d"))
    co = _pair_cooccurrence(inc, id_col)
    a = topk.select(*cc, F.col("rank").alias("_ri"), F.col("term").alias("_wi"))
    b = topk.select(*cc, F.col("rank").alias("_rj"), F.col("term").alias("_wj"))
    pairs = a.join(b, cc).filter(F.col("_ri") > F.col("_rj"))
    # co-occurrence keys are unordered (term_a < term_b)
    key_a = F.least("_wi", "_wj")
    key_b = F.greatest("_wi", "_wj")
    scored = (
        pairs
        .join(F.broadcast(dfreq.select(F.col("term").alias("_wj"),
                                       F.col("d").alias("_dj"))), "_wj")
        .withColumn("term_a", key_a).withColumn("term_b", key_b)
        .join(F.broadcast(co), ["term_a", "term_b"], "left")
        .withColumn("_dab", F.coalesce("d_ab", F.lit(0)))
        .withColumn("_s", F.log((F.col("_dab") + 1.0) / F.col("_dj"))))
    return (scored.groupBy(*cc)
            .agg(F.round(F.avg("_s"), round_to).alias("coherence")))


def npmi_coherence(topk: DataFrame, doc_terms: DataFrame,
                   class_cols: Sequence[str], id_col: str = "doc_id",
                   round_to: int = 6) -> DataFrame:
    """(class..., coherence) — NPMI coherence (``c_npmi`` of Röder et al.
    2015, Bouma 2009 normalization): mean over unordered top-k pairs of

        NPMI(w_i, w_j) = ln(P_ij / (P_i P_j)) / (−ln P_ij)

    with probabilities = document frequencies / N over the evaluating
    corpus. Never-co-occurring pairs take the limit value −1; pairs
    co-occurring in EVERY document take +1 (both gensim conventions with
    eps→0)."""
    cc = list(class_cols)
    vocab = topk.select("term").distinct()
    inc = _incidence(doc_terms, vocab, id_col)
    n_docs = doc_terms.select(id_col).distinct().count()
    dfreq = inc.groupBy("term").agg(F.count(F.lit(1)).alias("d"))
    co = _pair_cooccurrence(inc, id_col)
    a = topk.select(*cc, F.col("rank").alias("_ri"), F.col("term").alias("_wi"))
    b = topk.select(*cc, F.col("rank").alias("_rj"), F.col("term").alias("_wj"))
    pairs = a.join(b, cc).filter(F.col("_ri") < F.col("_rj"))
    scored = (
        pairs
        .join(F.broadcast(dfreq.select(F.col("term").alias("_wi"),
                                       F.col("d").alias("_di"))), "_wi")
        .join(F.broadcast(dfreq.select(F.col("term").alias("_wj"),
                                       F.col("d").alias("_dj"))), "_wj")
        .withColumn("term_a", F.least("_wi", "_wj"))
        .withColumn("term_b", F.greatest("_wi", "_wj"))
        .join(F.broadcast(co), ["term_a", "term_b"], "left")
        .withColumn("_dab", F.coalesce("d_ab", F.lit(0)))
        .withColumn(
            "_s",
            F.when(F.col("_dab") == 0, F.lit(-1.0))
            .when(F.col("_dab") == n_docs, F.lit(1.0))
            .otherwise(
                F.log((F.col("_dab") / F.lit(float(n_docs)))
                      / ((F.col("_di") / F.lit(float(n_docs)))
                         * (F.col("_dj") / F.lit(float(n_docs)))))
                / -F.log(F.col("_dab") / F.lit(float(n_docs))))))
    return (scored.groupBy(*cc)
            .agg(F.round(F.avg("_s"), round_to).alias("coherence")))


def topic_diversity(topk: DataFrame, class_cols: Sequence[str],
                    round_to: int = 6) -> DataFrame:
    """One row (n_topics, n_words, n_unique, diversity) — Dieng et al.
    2020 topic diversity: the fraction of the topics' pooled top-k words
    that are unique. 1.0 = no word shared between topics."""
    agg = topk.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("term").alias("n_unique"))
    n_topics = topk.select(*class_cols).distinct().count()
    return agg.select(
        F.lit(n_topics).cast("long").alias("n_topics"),
        F.col("n_words").cast("long"),
        F.col("n_unique").cast("long"),
        F.round(F.col("n_unique") / F.col("n_words"), round_to)
        .alias("diversity"))


# ---------------------------------------------------------------------------
# Query performance prediction (QPP)
# ---------------------------------------------------------------------------

def query_difficulty(corpus: DataFrame, qterms: DataFrame,
                     text_col: str = "content", id_col: str = "doc_id",
                     mode: str = "ascii_code",
                     round_to: int = 6) -> DataFrame:
    """Pre-retrieval query-performance predictors — one row per query:

        n_terms   query terms (distinct, tokenized)
        n_vocab   of those, terms present in the collection
        avg_idf / max_idf      idf = ln((N+1)/df)   (He & Ounis, SPIRE 2004)
        sum_scq / avg_scq / max_scq
                  SCQ_t = (1+ln cf_t)·ln(1+N/df_t)  (Zhao, Scholer & Tsegay,
                  ECIR 2008 — collection-query similarity)
        scs       simplified clarity score Σ_t (1/|q∩V|)·ln((1/|q∩V|)
                  /(cf_t/T)) (He & Ounis 2004), OOV terms excluded (their
                  collection probability is 0)

    These run BEFORE any retrieval — one broadcast probe of the query
    terms into the df/cf stats relations (both term-keyed partial aggs
    the sibling similarity operators already compute), no (query, doc)
    shuffle at all. Predicting which queries will be hard is how a
    100-TB serving tier decides routing/expansion budget per query."""
    from bertopic_spark.operators.postings import doc_term_counts

    x = doc_term_counts(corpus, text_col, [id_col], mode)
    stats = x.groupBy("term").agg(F.count(F.lit(1)).alias("df"),
                                  F.sum("tf").alias("cf"))
    coll = x.agg(F.countDistinct(id_col).alias("n_docs"),
                 F.sum("tf").alias("total"))
    nq = qterms.groupBy("query_id").agg(
        F.countDistinct("term").alias("n_terms"))
    probe = (stats.join(
        F.broadcast(qterms.select("query_id", "term").distinct()), "term")
        .crossJoin(F.broadcast(coll)))
    idf = F.log((F.col("n_docs") + 1.0) / F.col("df"))
    scq = (F.lit(1.0) + F.log(F.col("cf"))) \
        * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
    per_q = probe.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.avg(idf).alias("avg_idf"), F.max(idf).alias("max_idf"),
        F.sum(scq).alias("sum_scq"), F.avg(scq).alias("avg_scq"),
        F.max(scq).alias("max_scq"),
        # Σ_t (1/n)·ln((1/n)/(cf/T)) = -ln(n) + (1/n)·Σ_t ln(T/cf)
        F.sum(F.log(F.col("total") / F.col("cf"))).alias("_lsum"))
    out = (nq.join(per_q, "query_id", "left")
           .select(
               "query_id", "n_terms",
               F.coalesce("n_vocab", F.lit(0)).alias("n_vocab"),
               F.round("avg_idf", round_to).alias("avg_idf"),
               F.round("max_idf", round_to).alias("max_idf"),
               F.round("sum_scq", round_to).alias("sum_scq"),
               F.round("avg_scq", round_to).alias("avg_scq"),
               F.round("max_scq", round_to).alias("max_scq"),
               F.round(-F.log(F.col("n_vocab").cast("double"))
                       + F.col("_lsum") / F.col("n_vocab"),
                       round_to).alias("scs")))
    return out


def clarity_score(corpus: DataFrame, qterms: DataFrame, k: int = 10,
                  mu: float = 2000.0, text_col: str = "content",
                  id_col: str = "doc_id", mode: str = "ascii_code",
                  round_to: int = 6,
                  persist_counts: bool = True,
                  _persisted_out: list | None = None) -> DataFrame:
    """Post-retrieval clarity score (Cronen-Townsend, Zhou & Croft,
    SIGIR 2002): KL divergence between the top-k feedback language model
    and the collection model — high clarity = focused result list =
    the query likely performed well. One row (query_id, n_fb, clarity).

    Feedback model: uniform-weighted MLE doc models over the Dirichlet-QL
    top-k (the paper's P(d|q) posterior replaced by the uniform variant —
    deterministic and the common toolkit simplification):

        P(w|R) = (1/k)·Σ_{d∈topk} tf_{w,d}/dl_d
        clarity = Σ_{w∈R} P(w|R)·ln(P(w|R) / (cf_w/T))

    Cross-engine determinism: feedback membership is ``lm_topk``'s
    (exact-score ranking, doc-id tiebreak — the same contract its own
    gate verifies). Physical shape: the
    k·|queries| feedback set broadcasts back onto the persisted counts
    relation, so the summation join touches only feedback-doc postings;
    the collection stats reuse the same single tokenize pass."""
    from pyspark.sql import Window

    from bertopic_spark.operators.bm25 import lm_topk

    from bertopic_spark.operators.postings import doc_term_counts

    x = doc_term_counts(corpus, text_col, [id_col], mode, with_len=True)
    if persist_counts:
        x = x.persist()
        if _persisted_out is not None:
            _persisted_out.append(x)
    topk = lm_topk(corpus, qterms, k=k, mu=mu, text_col=text_col,
                   id_col=id_col, mode=mode, persist_counts=False)
    fb = topk.select("query_id", id_col)
    nfb = fb.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_fb"))
    cf = x.groupBy("term").agg(F.sum("tf").alias("cf"))
    tot = x.agg(F.sum("tf").alias("total"))
    # P(w|R): only feedback-doc postings flow into this shuffle
    pr = (x.join(F.broadcast(fb), id_col)
          .groupBy("query_id", "term")
          .agg(F.sum(F.col("tf") / F.col("doc_len")).alias("_s")))
    pr = (pr.join(F.broadcast(nfb), "query_id")
          .select("query_id", "term",
                  (F.col("_s") / F.col("n_fb")).alias("pwr")))
    # cf is vocabulary-sized: prune it to feedback terms before broadcasting
    cfq = cf.join(F.broadcast(pr.select("term").distinct()), "term")
    scored = (pr.join(F.broadcast(cfq), "term").crossJoin(F.broadcast(tot))
              .groupBy("query_id")
              .agg(F.round(F.sum(
                  F.col("pwr") * F.log(F.col("pwr") * F.col("total")
                                       / F.col("cf"))), round_to)
                  .alias("clarity")))
    return nfb.join(scored, "query_id").select("query_id", "n_fb", "clarity")


# ---------------------------------------------------------------------------
# Online evaluation: team-draft interleaving (Radlinski et al. 2008)
# ---------------------------------------------------------------------------

def team_draft_interleave(rank_a: DataFrame, rank_b: DataFrame,
                          k_out: int = 10, seed: int = 17,
                          id_col: str = "doc_id") -> DataFrame:
    """Team-draft interleaving of two rankers' results — the online-eval
    primitive that shows ONE merged list and credits clicks to the ranker
    that contributed each doc (Radlinski, Kurup & Joachims, CIKM 2008).

    Per query and round r, an md5 coin decides which team drafts first;
    each pick takes the drafting team's best-ranked not-yet-picked doc
    (falling back to the other team's list when the slated team is
    exhausted — the pick is then credited to THAT team). Output:
    (query_id, pos 1..≤k_out, doc_id, team 'A'|'B').

    Physical shape: the greedy is inherently sequential per query but
    touches only that query's ≤ |A|+|B| candidate rows, so it runs as one
    Arrow-batched ``applyInPandas`` over query groups (the engine's MMR
    precedent) — never a driver loop, never row-at-a-time Python. The
    coin is the standard md5 uniform, so the whole draft replays in SQL.
    """
    import hashlib

    import pandas as pd

    a = rank_a.select("query_id", F.col(id_col).alias("doc_id"),
                      F.col("rank").alias("rn"), F.lit("A").alias("team"))
    b = rank_b.select("query_id", F.col(id_col).alias("doc_id"),
                      F.col("rank").alias("rn"), F.lit("B").alias("team"))
    both = a.unionByName(b)
    k = int(k_out)
    sd = int(seed)

    def draft(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        by_team = {
            t: pdf[pdf["team"] == t].sort_values(["rn", "doc_id"])
            for t in ("A", "B")
        }
        picked, out = set(), []
        for pos in range(1, k + 1):
            r = (pos + 1) // 2
            h = int(hashlib.md5(f"{sd}_{qid}_{r}".encode())
                    .hexdigest()[:15], 16)
            first = "A" if (h + 0.5) / 16 ** 15 < 0.5 else "B"
            slated = first if pos % 2 == 1 else ("B" if first == "A"
                                                 else "A")
            pick = None
            for team in (slated, "B" if slated == "A" else "A"):
                cand = by_team[team]
                cand = cand[~cand["doc_id"].isin(picked)]
                if len(cand):
                    pick = (cand["doc_id"].iloc[0], team)
                    break
            if pick is None:
                break
            picked.add(pick[0])
            out.append((qid, pos, pick[0], pick[1]))
        return pd.DataFrame(out, columns=["query_id", "pos", "doc_id",
                                          "team"])

    return both.groupBy("query_id").applyInPandas(
        draft, "query_id long, pos int, doc_id long, team string")


def interleave_credit(interleaved: DataFrame, clicks: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """Click-credit assignment over an interleaved list: per query, how
    many clicked docs each team contributed, and the winner ('A', 'B' or
    'tie') — the statistic a team-draft A/B test accumulates. ``clicks``
    is a (query_id, doc_id) relation; the join is on the interleaved
    list (≤ k_out rows per query), so this is window-free and tiny."""
    hit = (interleaved.join(clicks.select("query_id",
                                          F.col(id_col).alias("doc_id"))
                            .distinct(), ["query_id", "doc_id"]))
    per = (interleaved.select("query_id").distinct()
           .join(hit.groupBy("query_id").agg(
               F.sum(F.when(F.col("team") == "A", 1).otherwise(0))
               .alias("clicks_a"),
               F.sum(F.when(F.col("team") == "B", 1).otherwise(0))
               .alias("clicks_b")), "query_id", "left")
           .fillna(0, ["clicks_a", "clicks_b"]))
    return per.select(
        "query_id", "clicks_a", "clicks_b",
        F.when(F.col("clicks_a") > F.col("clicks_b"), F.lit("A"))
        .when(F.col("clicks_b") > F.col("clicks_a"), F.lit("B"))
        .otherwise(F.lit("tie")).alias("winner"))


def paired_ttest(eval_a: DataFrame, eval_b: DataFrame,
                 metric_col: str = "ndcg_at_k") -> DataFrame:
    """Paired t-test between two rankers' per-query metrics — the
    standard IR significance test (Smucker, Allan & Carterette 2007
    recommend it over sign/Wilcoxon): one row with

        n, mean_delta, sd_delta (sample, n−1), t_stat, df

    over per-query deltas metric_A − metric_B (inner join on query_id —
    only queries both runs evaluated). t_stat is NULL when the deltas
    are constant (sd = 0) or n < 2. Look the t up against df outside;
    no CDF dependency. One broadcast join of two |queries|-sized
    relations + one 1-row aggregation."""
    a = eval_a.select("query_id", F.col(metric_col).alias("_ma"))
    b = eval_b.select("query_id", F.col(metric_col).alias("_mb"))
    d = a.join(b, "query_id").select(
        "query_id", (F.col("_ma") - F.col("_mb")).alias("delta"))
    agg = d.agg(F.count(F.lit(1)).alias("n"),
                F.avg("delta").alias("mean_delta"),
                F.stddev_samp("delta").alias("sd_delta"))
    t = F.when((F.col("n") >= 2) & (F.col("sd_delta") > 0),
               F.col("mean_delta")
               / (F.col("sd_delta") / F.sqrt(F.col("n"))))
    return agg.select(F.col("n").cast("long").alias("n"),
                      "mean_delta", "sd_delta", t.alias("t_stat"),
                      (F.col("n") - 1).cast("long").alias("df"))


def cuped_adjustment(df, unit_col: str, pre_col: str, post_col: str,
                     dp: int = 6):
    """CUPED variance reduction (Deng et al. 2013, WSDM — the standard
    pre-experiment covariate adjustment every large A/B platform runs):
    per experimental unit with pre-period metric X and post-period
    metric Y,

        θ = cov(X, Y) / var(X),   Ŷ = Y − θ·(X − mean(X))

    Ŷ has the same mean as Y but variance reduced by corr(X,Y)² — the
    same experiment reaches significance with that factor fewer units.
    Returns a 1-row relation (theta, var_y, var_adj, reduction) plus the
    per-unit adjusted metric via ``cuped_series``.

    One pass computes all moments (sums/sums-of-squares/cross term —
    algebraic, map-side combined); θ and the adjustment are closed-form
    over the 1-row moment relation. Population (not sample) moments:
    the θ ratio is invariant to the n/(n−1) factor.
    """
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    mom = df.where(x.isNotNull() & y.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"), F.sum(x).alias("sx"),
        F.sum(y).alias("sy"), F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"), F.sum(x * y).alias("sxy"))
    n = F.col("n").cast("double")
    var_x = F.col("sxx") / n - F.pow(F.col("sx") / n, 2)
    var_y = F.col("syy") / n - F.pow(F.col("sy") / n, 2)
    cov = F.col("sxy") / n - F.col("sx") * F.col("sy") / (n * n)
    theta = F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0))
    var_adj = var_y - F.when(var_x > 0, cov * cov / var_x).otherwise(0.0)
    return mom.select(
        F.round(theta, dp).alias("theta"),
        F.round(var_y, dp).alias("var_y"),
        F.round(var_adj, dp).alias("var_adj"),
        F.round(F.when(var_y > 0, 1.0 - var_adj / var_y)
                .otherwise(F.lit(0.0)), dp).alias("reduction"))


def cuped_series(df, unit_col: str, pre_col: str, post_col: str,
                 dp: int = 6):
    """Per-unit CUPED-adjusted metric: (unit, y_adj) with the θ and
    mean(X) from ``cuped_adjustment``'s moment pass (broadcast — two
    scalars), so the adjustment is one map-side projection."""
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    mom = df.where(x.isNotNull() & y.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"), F.sum(x).alias("sx"),
        F.sum(y).alias("sy"), F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"))
    n = F.col("n").cast("double")
    var_x = F.col("sxx") / n - F.pow(F.col("sx") / n, 2)
    cov = F.col("sxy") / n - F.col("sx") * F.col("sy") / (n * n)
    sc = mom.select(
        F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0)).alias("_th"),
        (F.col("sx") / n).alias("_mx"))
    return (df.where(x.isNotNull() & y.isNotNull())
            .crossJoin(F.broadcast(sc))
            .select(F.col(unit_col),
                    F.round(y - F.col("_th") * (x - F.col("_mx")), dp)
                    .alias("y_adj")))
