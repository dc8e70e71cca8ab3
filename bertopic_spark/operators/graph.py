"""Link analysis over term graphs: co-occurrence edges, distributed
weighted PageRank, TextRank keyword extraction.

BERTopic's keyword surfaces (c-TF-IDF `_ctfidf.py`, KeyBERTInspired /
MMR `representation/`) are pointwise term scorers; this module adds the
classical *graph-ranking* alternative — TextRank (Mihalcea & Tarau,
EMNLP 2004) — and the web-scale ranking primitive underneath it
(PageRank, Brin & Page 1998) as first-class distributed operators, usable
both for keyword extraction and as a static document/authority prior.

Scale shape (the 100-TB contract):

* **Edge extraction prunes to the top-V vocabulary BEFORE pairing.** The
  per-document pair fan-out is bounded by C(min(v_d, V), 2), so V is the
  single knob that caps the graph; the top-V selection itself is a
  TakeOrderedAndProject (per-partition partial top-V, then merge — no
  single-partition window over the vocabulary).
* **PageRank is join + groupBy per iteration on the edge relation**, the
  rank vector broadcast when |V| is bounded (it is, post-pruning).
  Lineage is truncated with eager localCheckpoints and the previous
  generation's blocks released deterministically (same discipline as
  ``dedup.dedup_components``), so a 50-iteration run holds one generation
  of state, not fifty.
* Everything is JVM-side DataFrame algebra — no Python in the loop body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.dedup import _release_local_checkpoint
from bertopic_spark.tokenizer import with_tokens


def top_vocab(df: DataFrame, text_col: str, id_col: str,
              v: int = 100, mode: str = "ascii_code") -> DataFrame:
    """Top-``v`` terms by document frequency: (term, df, vrank).

    Deterministic tie-break (df desc, term asc). Physically a
    TakeOrderedAndProject over the df agg — partial top-v per partition,
    merged on one reducer over ≤ v·partitions rows, never a global
    single-partition sort of the vocabulary.
    """
    if v < 1:
        raise ValueError("v must be >= 1")
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    dt = toks.select(F.col(id_col),
                     F.explode(F.array_distinct("tokens")).alias("term"))
    dfs = dt.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = dfs.orderBy(F.desc("df"), F.asc("term")).limit(v)
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    # the window runs on the already-limited v-row relation (broadcast-sized)
    return top.withColumn("vrank", F.row_number().over(w).cast("long"))


def cooccurrence_edges(df: DataFrame, text_col: str, id_col: str,
                       v: int = 100, min_w: int = 1,
                       mode: str = "ascii_code") -> DataFrame:
    """Document-level term co-occurrence graph: (src, dst, w:long),
    src < dst, w = number of documents containing both terms.

    The doc-term relation is pruned to the top-``v`` vocabulary via a
    broadcast semi-join BEFORE the self-join, so the pairing shuffles
    |pruned postings| rows and each document fans out to at most
    C(min(v_d, v), 2) pairs — the graph is capped at C(v, 2) edges no
    matter the corpus size. ``min_w`` trims incidental co-occurrence.
    """
    vocab = top_vocab(df, text_col, id_col, v, mode).select("term")
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    dt = (toks.select(F.col(id_col),
                      F.explode(F.array_distinct("tokens")).alias("term"))
          .join(F.broadcast(vocab), "term"))
    a = dt.select(F.col(id_col), F.col("term").alias("src"))
    b = dt.select(F.col(id_col), F.col("term").alias("dst"))
    return (a.join(b, id_col)
            .filter(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count("*").cast("long").alias("w"))
            .filter(F.col("w") >= min_w))


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 10,
             src: str = "src", dst: str = "dst", weight: str = "w",
             undirected: bool = True, checkpoint_every: int = 5,
             broadcast_ranks: bool = True,
             checkpoint_last: bool = True) -> DataFrame:
    """Weighted PageRank: (node, score), Σ score = 1.

    score_{i+1}(v) = (1-d)/N + d·( Σ_{u→v} score_i(u)·w(u,v)/wdeg(u)
                                   + dangling_mass_i/N )

    ``undirected=True`` symmetrizes the edge list first (the TextRank
    graph). Dangling nodes (no out-edges — possible in directed graphs)
    redistribute their mass uniformly, the standard stochastic fix-up, so
    Σ score stays exactly 1 every iteration.

    Physical shape per iteration: one broadcast join of the (bounded)
    rank vector against the edge relation keyed by ``src`` + one groupBy
    shuffle on ``dst``; the dangling mass is a scalar agg on the rank
    vector. Every ``checkpoint_every`` iterations the rank vector is
    eagerly localCheckpoint'ed (cluster: checkpoint to reliable storage)
    and the previous generation released, keeping both plan depth and
    storage bounded. For graphs whose rank vector exceeds broadcast size,
    drop the ``F.broadcast`` hint — the joins become shuffle joins on the
    same keys and the algebra is unchanged.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("double").alias("w"))
    if undirected:
        e = e.unionAll(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst"), "w"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node"))).distinct())
    deg = e.groupBy("src").agg(F.sum("w").alias("wdeg"))
    # transition weights are rank-independent: fold wdeg into the edges once
    trans = (e.join(deg, "src")
             .select("src", "dst", (F.col("w") / F.col("wdeg")).alias("p"))
             .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.select(F.col("node"), F.lit(0.0).alias("score"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("score"))
    has_out = deg.select(F.col("src").alias("node"))
    dangling_nodes = nodes.join(has_out, "node", "left_anti")
    n_dangling = dangling_nodes.count()  # 0 for any undirected graph
    prev_ckpt = None
    for i in range(iters):
        dangling = 0.0
        if n_dangling:
            dangling = (dangling_nodes.join(F.broadcast(ranks), "node")
                        .agg(F.coalesce(F.sum("score"), F.lit(0.0)))
                        .collect()[0][0])
        base = (1.0 - damping) / n + damping * dangling / n
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (trans.join(rank_side, trans["src"] == ranks["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("p") * F.col("score")).alias("mass")))
        stepped = (nodes.join(contrib.withColumnRenamed("dst", "node"),
                              "node", "left")
                   .select("node",
                           (F.lit(base) + F.lit(damping) *
                            F.coalesce("mass", F.lit(0.0))).alias("score")))
        if (i + 1) % checkpoint_every == 0 or (i == iters - 1 and
                                               checkpoint_last):
            new = stepped.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                _release_local_checkpoint(prev_ckpt)
            prev_ckpt = new
            ranks = new
        else:
            ranks = stepped
    if checkpoint_last:
        _release_local_checkpoint(trans)
    return ranks


def cooccurrence_edges_grouped(df: DataFrame, text_col: str, id_col: str,
                               group_cols: list[str], v: int = 50,
                               min_w: int = 1,
                               mode: str = "ascii_code") -> DataFrame:
    """Per-group co-occurrence graphs in ONE pass: (group_cols..., src,
    dst, w). The top-``v`` vocabulary is selected PER GROUP (df desc,
    term asc — a partitioned window over the per-group vocabulary
    relation), then the doc self-join is keyed by (group, doc), so a
    thousand per-class graphs are built by the same two shuffles that
    build one.
    """
    toks = with_tokens(df.select(*group_cols, id_col, text_col),
                       text_col, mode)
    dt = toks.select(*group_cols, F.col(id_col),
                     F.explode(F.array_distinct("tokens")).alias("term"))
    dfs = (dt.groupBy(*group_cols, "term")
           .agg(F.count("*").cast("long").alias("df")))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("df"), F.asc("term"))
    vocab = (dfs.withColumn("_vr", F.row_number().over(w))
             .filter(F.col("_vr") <= v).select(*group_cols, "term"))
    dtv = dt.join(vocab, [*group_cols, "term"])
    a = dtv.select(*group_cols, F.col(id_col), F.col("term").alias("src"))
    b = dtv.select(*group_cols, F.col(id_col), F.col("term").alias("dst"))
    return (a.join(b, [*group_cols, id_col])
            .filter(F.col("src") < F.col("dst"))
            .groupBy(*group_cols, "src", "dst")
            .agg(F.count("*").cast("long").alias("w"))
            .filter(F.col("w") >= min_w))


def pagerank_grouped(edges: DataFrame, group_cols: list[str],
                     damping: float = 0.85, iters: int = 10,
                     src: str = "src", dst: str = "dst", weight: str = "w",
                     checkpoint_every: int = 5,
                     broadcast_ranks: bool = True,
                     checkpoint_last: bool = True) -> DataFrame:
    """Weighted PageRank over MANY independent graphs simultaneously:
    (group_cols..., node, score), Σ score = 1 within each group.

    Every iteration is the SAME one join + one groupBy as the scalar
    ``pagerank``, just keyed by (group, node) — a thousand per-class
    graphs cost one iteration loop, not a driver loop over classes
    (the engine's single-pass-over-slices discipline, cf. A6/P3).
    Undirected only (the TextRank shape): edges are symmetrized, so no
    dangling mass exists and no per-group scalar collects are needed —
    the loop body is pure DataFrame algebra. The grouped rank vector is
    |V|·n_groups rows — pass ``broadcast_ranks=False`` once that exceeds
    broadcast size (the per-iteration join falls back to a shuffle join
    on the same (group, node) keys, algebra unchanged).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use pagerank()")
    g = list(group_cols)
    e = edges.select(*g, F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("double").alias("w"))
    e = e.unionAll(e.select(*g, F.col("dst").alias("src"),
                            F.col("src").alias("dst"), "w"))
    nodes = e.select(*g, F.col("src").alias("node")).distinct()
    ng = nodes.groupBy(*g).agg(F.count(F.lit(1)).alias("n_g"))
    nodes = nodes.join(F.broadcast(ng), g)
    deg = e.groupBy(*g, "src").agg(F.sum("w").alias("wdeg"))
    trans = (e.join(deg, [*g, "src"])
             .select(*g, "src", "dst",
                     (F.col("w") / F.col("wdeg")).alias("p"))
             .localCheckpoint(eager=True))
    ranks = nodes.select(*g, "node", (F.lit(1.0) / F.col("n_g")).alias("score"))
    prev_ckpt = None
    for i in range(iters):
        rank_side = ranks.withColumnRenamed("node", "src")
        if broadcast_ranks:
            rank_side = F.broadcast(rank_side)
        contrib = (trans.join(rank_side, [*g, "src"])
            .groupBy(*g, "dst")
            .agg(F.sum(F.col("p") * F.col("score")).alias("mass")))
        stepped = (nodes.join(
            contrib.withColumnRenamed("dst", "node"), [*g, "node"], "left")
            .select(*g, "node",
                    ((F.lit(1.0 - damping) / F.col("n_g")) +
                     F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                    .alias("score")))
        if (i + 1) % checkpoint_every == 0 or (i == iters - 1 and
                                               checkpoint_last):
            new = stepped.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                _release_local_checkpoint(prev_ckpt)
            prev_ckpt = new
            ranks = new
        else:
            ranks = stepped
    if checkpoint_last:
        _release_local_checkpoint(trans)
    return ranks.select(*g, "node", "score")


def textrank_keywords(df: DataFrame, text_col: str, id_col: str,
                      k: int = 20, v: int = 100, min_w: int = 1,
                      damping: float = 0.85, iters: int = 5,
                      mode: str = "ascii_code") -> DataFrame:
    """TextRank keywords: (term, score, rank), top-``k`` vertices of the
    document-co-occurrence graph by PageRank score (score desc, term asc).

    Graph construction and ranking are the distributed operators above;
    the final top-k is a TakeOrderedAndProject over the |V|-row rank
    vector. ``iters`` is fixed (not convergence-tested) so the result is
    exactly reproducible cross-engine — the DuckDB oracle unrolls the
    same ``iters`` power steps symbolically.
    """
    e = cooccurrence_edges(df, text_col, id_col, v, min_w, mode)
    pr = pagerank(e, damping, iters, undirected=True)
    w = Window.orderBy(F.desc("score"), F.asc("node"))
    top = pr.orderBy(F.desc("score"), F.asc("node")).limit(k)
    return (top.withColumn("rank", F.row_number().over(w).cast("long"))
            .select(F.col("node").alias("term"), "score", "rank"))


def bigram_edges(df: DataFrame, text_col: str, id_col: str,
                 v: int = 100, min_w: int = 1,
                 mode: str = "ascii_code") -> DataFrame:
    """Directed precedence graph: (src, dst, w:long) — adjacent-token
    bigram counts with BOTH endpoints restricted to the top-``v``
    vocabulary (broadcast semi-joins before the count shuffle, same
    pruning discipline as ``cooccurrence_edges``). Self-loops (repeated
    tokens) are kept: HITS is well-defined on them and the oracle mirrors
    the relation exactly."""
    vocab = top_vocab(df, text_col, id_col, v, mode).select("term")
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    pairs_expr = F.expr(
        "CASE WHEN size(tokens) < 2 THEN array() "
        "ELSE zip_with(slice(tokens, 1, size(tokens) - 1), "
        "slice(tokens, 2, size(tokens) - 1), (l, r) -> struct(l, r)) END")
    bg = toks.select(F.explode(pairs_expr).alias("p")).select(
        F.col("p.l").alias("src"), F.col("p.r").alias("dst"))
    return (bg.join(F.broadcast(vocab.withColumnRenamed("term", "src")), "src")
            .join(F.broadcast(vocab.withColumnRenamed("term", "dst")), "dst")
            .groupBy("src", "dst")
            .agg(F.count("*").cast("long").alias("w"))
            .filter(F.col("w") >= min_w))


def hits(edges: DataFrame, iters: int = 5,
         src: str = "src", dst: str = "dst", weight: str = "w") -> DataFrame:
    """Weighted HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment"): (node, authority, hub), each vector
    L2-normalized per half-step.

        a_{i+1}(v) ∝ Σ_{u→v} w(u,v)·h_i(u)
        h_{i+1}(u) ∝ Σ_{u→v} w(u,v)·a_{i+1}(v)

    ``iters`` is fixed (not convergence-tested) so the result is exactly
    reproducible cross-engine. Physical shape per half-step: one join of
    the bounded score vector against the edge relation + one groupBy
    shuffle; the L2 norm is folded in via a broadcast scalar crossJoin —
    NO driver collect per iteration. Nodes with no in-edges (out-edges)
    get authority (hub) exactly 0.

    Unlike ``pagerank`` (one reference to the previous vector per
    iteration), each HITS half-step references the previous vector
    TWICE (the edge join and the norm aggregate over it), so an
    unmaterialized loop replicates the upstream plan ~4^iters times —
    Catalyst analysis alone goes combinatorial. Both score vectors are
    therefore eagerly localCheckpoint-truncated every iteration, and the
    edge relation once up front; each generation is released as the next
    replaces it, so executor storage stays at O(1) relations."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      F.col(weight).cast("double").alias("w"))
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node"))).distinct()
             .localCheckpoint(eager=True))
    h = nodes.select("node", F.lit(1.0).alias("s"))
    a = None
    prev_a, prev_h = None, None
    for i in range(iters):
        raw_a = (e.join(h.withColumnRenamed("node", "src"), "src")
                 .groupBy("dst")
                 .agg(F.sum(F.col("w") * F.col("s")).alias("r")))
        an = raw_a.agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("nrm"))
        a = (nodes.join(raw_a.withColumnRenamed("dst", "node"), "node", "left")
             .crossJoin(F.broadcast(an))
             .select("node", F.when(F.col("nrm") > 0,
                                    F.coalesce("r", F.lit(0.0)) / F.col("nrm"))
                     .otherwise(F.lit(0.0)).alias("s"))
             .localCheckpoint(eager=True))
        raw_h = (e.join(a.withColumnRenamed("node", "dst"), "dst")
                 .groupBy("src")
                 .agg(F.sum(F.col("w") * F.col("s")).alias("r")))
        hn = raw_h.agg(F.sqrt(F.sum(F.col("r") * F.col("r"))).alias("nrm"))
        h = (nodes.join(raw_h.withColumnRenamed("src", "node"), "node", "left")
             .crossJoin(F.broadcast(hn))
             .select("node", F.when(F.col("nrm") > 0,
                                    F.coalesce("r", F.lit(0.0)) / F.col("nrm"))
                     .otherwise(F.lit(0.0)).alias("s"))
             .localCheckpoint(eager=True))
        if prev_a is not None:
            _release_local_checkpoint(prev_a)
        if prev_h is not None:
            _release_local_checkpoint(prev_h)
        prev_a, prev_h = a, h
    out = (a.withColumnRenamed("s", "authority")
           .join(h.withColumnRenamed("s", "hub"), "node"))
    _release_local_checkpoint(nodes)
    _release_local_checkpoint(e)
    return out
