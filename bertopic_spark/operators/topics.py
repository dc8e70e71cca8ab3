"""Topic-surface operators: the reference's query/maintenance API re-expressed
as single-pass DataFrame jobs (SURVEY §2.5-2.7, §3.3).

Covers: size-ranked topic numbering (W3), topic-info enrichment (J1),
label building (F1), class remapping for merge/reduce (J2 + re-agg),
find_topics index search (W4), representative documents (W9+W5),
MMR diversity re-rank (W8), evolution/global tuning joins (J5/J6),
agglomerative topic reduction (A9 analog).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.ctfidf import ctfidf, top_k_terms
from bertopic_spark.operators.postings import class_term_counts


def rank_topics_by_size(doc_topics: DataFrame, topic_col: str = "topic",
                        outlier: int | None = -1) -> DataFrame:
    """W3 (`_sort_mappings_by_frequency`, _bertopic.py:4726-4765): dense
    renumber topics by descending size; the outlier label stays pinned.

    Returns (old_topic, new_topic, size) — a 3-col mapping table to
    broadcast-join onto any doc table.
    """
    sizes = doc_topics.groupBy(topic_col).agg(F.count(F.lit(1)).alias("size"))
    regular = sizes if outlier is None else sizes.filter(F.col(topic_col) != outlier)
    w = Window.orderBy(F.desc("size"), F.asc(topic_col))
    ranked = regular.withColumn("new_topic", F.row_number().over(w).cast("long") - 1)
    out = ranked.select(F.col(topic_col).alias("old_topic"), "new_topic", "size")
    if outlier is not None:
        pinned = sizes.filter(F.col(topic_col) == outlier).select(
            F.col(topic_col).alias("old_topic"),
            F.lit(outlier).cast("long").alias("new_topic"),
            "size",
        )
        out = out.unionByName(pinned)
    return out


def topic_labels(topk: DataFrame, class_cols: Sequence[str], n_words: int = 4,
                 sep: str = "_") -> DataFrame:
    """F1 label building (_bertopic.py:2093-2095): join the top n_words
    terms as '<w1>_<w2>_...' per class. Input: top_k_terms output."""
    return (
        topk.filter(F.col("rank") <= n_words)
        .groupBy(*class_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "term"))),
                    lambda s: s["term"],
                ),
                sep,
            ).alias("label")
        )
    )


def topic_info(doc_topics: DataFrame, topk: DataFrame,
               topic_col: str = "topic") -> DataFrame:
    """J1 (`get_topic_info`): (topic, count, label) enrichment join."""
    sizes = doc_topics.groupBy(topic_col).agg(F.count(F.lit(1)).alias("count"))
    labels = topic_labels(topk, [topic_col])
    return sizes.join(F.broadcast(labels), topic_col, "left").select(
        topic_col, "count", "label"
    )


def remap_topics(doc_topics: DataFrame, mapping: Mapping[int, int],
                 topic_col: str = "topic") -> DataFrame:
    """J2 dict-map remap (merge_topics/reduce_topics, _bertopic.py:2169,
    4628): broadcast-join a 2-col mapping; unmapped keys pass through."""
    spark = doc_topics.sparkSession
    mdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(mapping.items())],
        f"{topic_col} long, _new long",
    )
    return (
        doc_topics.join(F.broadcast(mdf), topic_col, "left")
        .withColumn(topic_col, F.coalesce("_new", F.col(topic_col)))
        .drop("_new")
    )


def merge_and_reaggregate(doc_terms: DataFrame, mapping: Mapping[int, int],
                          topic_col: str = "topic",
                          bm25_weighting: bool = False,
                          reduce_frequent_words: bool = False) -> DataFrame:
    """Merge topics then recompute c-TF-IDF (the reference re-runs
    _extract_topics after every remap, _bertopic.py:4565-4628)."""
    remapped = remap_topics(doc_terms, mapping, topic_col)
    x = class_term_counts(remapped, [topic_col])
    return ctfidf(x, [topic_col], bm25_weighting, reduce_frequent_words)


def find_topics(scores: DataFrame, query_text: str, class_cols: Sequence[str],
                top_n: int = 5, mode: str = "ascii_code") -> DataFrame:
    """W4 (`find_topics`, _bertopic.py:1466-1485): rank classes by cosine
    similarity between the query's term set and each class's c-TF-IDF
    vector — via the inverted index (term join), never a dense matrix.

    Query weights are uniform (1/√|q|); class vectors L2-normalized by a
    window over the scores relation.
    """
    from bertopic_spark.tokenizer import tokenize_one

    terms = sorted(set(tokenize_one(query_text, mode)))
    if not terms:
        return scores.sparkSession.createDataFrame(
            [], ", ".join(f"{c} string" for c in class_cols) + ", sim double")
    spark = scores.sparkSession
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")
    qnorm = float(len(terms)) ** 0.5
    l2 = Window.partitionBy(*class_cols)
    normed = scores.withColumn(
        "l2", F.sqrt(F.sum(F.col("score") * F.col("score")).over(l2))
    )
    return (
        normed.join(F.broadcast(qdf), "term")
        .groupBy(*class_cols)
        .agg((F.sum(F.col("score") / F.col("l2")) / qnorm).alias("sim"))
        .orderBy(F.desc("sim"), *[F.asc(c) for c in class_cols])
        .limit(top_n)
    )


def representative_docs(doc_terms: DataFrame, scores: DataFrame,
                        class_cols: Sequence[str], id_col: str = "doc_id",
                        n_docs: int = 3, sample_cap: int = 500,
                        seed: int = 42) -> DataFrame:
    """W9+W5 (`_save_representative_docs`, _bertopic.py:4217-4305):
    seeded per-class sample capped at ``sample_cap``, then top ``n_docs``
    per class by doc↔class c-TF-IDF dot product via the inverted index."""
    w_samp = Window.partitionBy(*class_cols).orderBy(F.xxhash64(F.lit(seed), F.col(id_col)))
    sampled = (
        doc_terms.select(*class_cols, id_col).distinct()
        .withColumn("_r", F.row_number().over(w_samp))
        .filter(F.col("_r") <= sample_cap)
        .drop("_r")
    )
    dt = doc_terms.join(sampled, [*class_cols, id_col])
    dlen = Window.partitionBy(*class_cols, id_col)
    doc_w = dt.withColumn("doc_len", F.sum("tf").over(dlen)).select(
        *class_cols, id_col, "term", (F.col("tf") / F.col("doc_len")).alias("w")
    )
    sims = (
        doc_w.join(scores.select(*class_cols, "term", "score"), [*class_cols, "term"])
        .groupBy(*class_cols, id_col)
        .agg(F.sum(F.col("w") * F.col("score")).alias("sim"))
    )
    w = Window.partitionBy(*class_cols).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n_docs)
        .select(*class_cols, id_col, F.round("sim", 6).alias("sim"), "rank")
    )


def mmr_rerank(topk: DataFrame, class_cols: Sequence[str], k: int = 5,
               diversity: float = 0.3) -> DataFrame:
    """W8 MMR (`_mmr.py:86-128` semantics): greedy top-k re-rank maximizing
    (1-λ)·relevance − λ·max-similarity-to-selected.

    The reference measures similarity in word-embedding space; without an
    embedding backend we use character-trigram Jaccard between terms — the
    structure (greedy argmax loop) is identical. Inherently sequential over
    ≤ top-k items per class → applyInPandas per class (tiny groups), which
    is exactly how the reference scopes it (per topic).
    """
    import pandas as pd

    n_keys = len(class_cols)

    def _trigrams(t: str) -> set:
        s = f"  {t} "
        return {s[i:i + 3] for i in range(len(s) - 2)}

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "term"], ascending=[False, True])
        terms = list(pdf["term"])
        rel = {t: s for t, s in zip(pdf["term"], pdf["score"])}
        grams = {t: _trigrams(t) for t in terms}
        selected: list[str] = []
        while terms and len(selected) < k:
            best, best_v = None, None
            for t in terms:
                if selected:
                    sim = max(
                        len(grams[t] & grams[s]) / max(len(grams[t] | grams[s]), 1)
                        for s in selected
                    )
                else:
                    sim = 0.0
                v = (1 - diversity) * rel[t] - diversity * sim
                if best_v is None or v > best_v or (v == best_v and t < best):
                    best, best_v = t, v
            selected.append(best)
            terms.remove(best)
        out = pdf[pdf["term"].isin(selected)].copy()
        out["mmr_rank"] = [selected.index(t) + 1 for t in out["term"]]
        return out[[*pdf.columns[:n_keys], "term", "score", "mmr_rank"]]

    schema = ", ".join(
        f"{c} {dict(topk.dtypes)[c]}" for c in class_cols
    ) + ", term string, score double, mmr_rank long"
    return topk.select(*class_cols, "term", "score").groupBy(*class_cols).applyInPandas(
        _mmr, schema
    )


def evolution_tuning(slice_scores: DataFrame, slice_col: str,
                     class_cols: Sequence[str]) -> DataFrame:
    """J5 (`topics_over_time` evolution tuning, _bertopic.py:907-924):
    average each slice's (class, term) score with slice-1's where both
    exist — a self-join on (class, term, slice-1), not a Python loop."""
    prev = slice_scores.select(
        (F.col(slice_col) + 1).alias(slice_col),
        *class_cols,
        F.col("term"),
        F.col("score").alias("prev_score"),
    )
    return slice_scores.join(prev, [slice_col, *class_cols, "term"], "left").withColumn(
        "score",
        F.when(F.col("prev_score").isNotNull(),
               (F.col("score") + F.col("prev_score")) / 2.0).otherwise(F.col("score")),
    ).drop("prev_score")


def global_tuning(slice_scores: DataFrame, global_scores: DataFrame,
                  class_cols: Sequence[str]) -> DataFrame:
    """J6 (_bertopic.py:928-930): average slice scores with the global
    c-TF-IDF rows on (class, term)."""
    g = global_scores.select(*class_cols, "term", F.col("score").alias("g_score"))
    return slice_scores.join(g, [*class_cols, "term"], "left").withColumn(
        "score",
        F.when(F.col("g_score").isNotNull(),
               (F.col("score") + F.col("g_score")) / 2.0).otherwise(F.col("score")),
    ).drop("g_score")


def class_pair_distances(scores: DataFrame, class_col: str,
                         round_to: int = 6) -> DataFrame:
    """(_ca, _cb, dist) with _ca < _cb: 1 − cosine between class c-TF-IDF
    vectors, via a term join over the inverted index — never a dense
    class×term matrix. Pairs sharing no term are absent (cos = 0 ⇒ dist 1);
    callers fill the gap. Distances round to ``round_to`` dp so driver-side
    comparisons agree with the cross-engine oracle."""
    l2 = Window.partitionBy(class_col)
    normed = scores.withColumn(
        "_v", F.col("score") / F.sqrt(F.sum(F.col("score") * F.col("score")).over(l2)))
    a = normed.select(F.col(class_col).alias("_ca"), "term", F.col("_v").alias("_va"))
    b = normed.select(F.col(class_col).alias("_cb"), "term", F.col("_v").alias("_vb"))
    return (
        a.join(b, "term")
        .filter(F.col("_ca") < F.col("_cb"))
        .groupBy("_ca", "_cb")
        .agg(F.round(F.lit(1.0) - F.sum(F.col("_va") * F.col("_vb")), round_to).alias("dist"))
    )


def single_linkage_merge(pairs: dict[tuple[int, int], float],
                         k: int) -> list[tuple[int, int, int, float, str]]:
    """Single-linkage agglomeration over a k-leaf pair-distance dict
    ((i, j) i<j → dist; missing pairs = 1.0). Returns scipy-convention
    rows (parent_id, child_left, child_right, distance, member_csv), merge
    pair chosen by lexicographic (distance, id_a, id_b) — identical output
    to the naive rescan-all-pairs loop (tested), but O(k²) typical:

    * the k×(2k−1) upper-triangle lives in one numpy matrix (new clusters
      append as columns, so row-major argmin = (dist, a, b) tie order);
    * per-row (min, argmin) caches make the global pick O(k) per merge;
    * a row rescans (C-speed np.argmin) only when its cached argmin was one
      of the two merged clusters — single linkage's min-rule means the new
      cluster can only repoint rows, never worsen them.
    """
    import numpy as np

    m = 2 * k - 1
    inf = np.inf
    dm = np.full((m, m), inf)
    iu = np.triu_indices(k, 1)
    dm[iu] = 1.0
    for (i, j), v in pairs.items():
        dm[i, j] = v
    rowmin = np.full(m, inf)
    rowarg = np.full(m, -1, dtype=np.int64)
    for i in range(k - 1):
        j = int(np.argmin(dm[i, :k]))
        rowmin[i], rowarg[i] = dm[i, j], j
    active = np.zeros(m, dtype=bool)
    active[:k] = True
    members = {i: [i] for i in range(k)}
    rows: list[tuple[int, int, int, float, str]] = []
    for nid in range(k, m):
        a = int(np.argmin(rowmin[:nid]))          # ties → smallest a
        b = int(rowarg[a])                        # ties → smallest b
        dist = float(rowmin[a])
        mem = sorted(members[a] + members[b])
        rows.append((nid, a, b, dist, ",".join(str(x) for x in mem)))
        members[nid] = mem
        # new column nid: d(nid, c) = min(d(a,c), d(b,c)) — read BOTH
        # triangles before wiping a and b
        newcol = np.minimum(
            np.minimum(dm[a, :nid], dm[:nid, a]),
            np.minimum(dm[b, :nid], dm[:nid, b]))
        newcol[a] = newcol[b] = inf
        active[a] = active[b] = False
        rowmin[a] = rowmin[b] = inf
        dm[a, :] = inf
        dm[:, a] = inf
        dm[b, :] = inf
        dm[:, b] = inf
        dm[:nid, nid] = newcol
        active[nid] = True
        # fold the new column into row caches: strict < repoints (a tie
        # keeps the OLD smaller id — nid is larger than every live id)
        upd = newcol < rowmin[:nid]
        rowarg[:nid][upd] = nid
        rowmin[:nid][upd] = newcol[upd]
        # rows whose cached argmin was a or b rescan (their distance to
        # the merged pair is preserved at column nid, but a smaller tied
        # column may now be the lexicographic argmin)
        stale = np.where(active[:nid] & np.isin(rowarg[:nid], (a, b)))[0]
        for c in stale:
            j = int(np.argmin(dm[c, :nid + 1]))
            rowmin[c], rowarg[c] = dm[c, j], j
    return rows


def hierarchical_topics(scores: DataFrame, class_col: str,
                        max_classes: int = 2000,
                        round_to: int = 6) -> DataFrame:
    """Linkage tree over class c-TF-IDF vectors — the reference's
    ``hierarchical_topics`` (`_bertopic.py:1035-1203`; output shape per
    `tests/test_bertopic.py:89-98`) with ``linkage_function`` = single
    linkage (a supported scipy option there; ward, the default, needs dense
    euclidean geometry that the inverted index deliberately avoids).

    Heavy lifting is Spark-side: pair distances (1 − cosine) come from one
    term join (``class_pair_distances``); only the k(k−1)/2 pair list is
    collected (k = topic count — small by definition), never the
    class×term matrix. The driver merge is ``single_linkage_merge`` — O(k²)
    typical with numpy row-min caches; ``max_classes`` (2,000, matching
    ``reduce_topics_agglomerative``) caps the (2k−1)² driver matrix at
    ~128 MB and a few seconds of merge time. Beyond it, partition the
    corpus (e.g. per lang) and build sub-trees.

    Returns one row per internal node, scipy node-numbering convention
    (leaves 0..k−1 by ascending class value, internal nodes k, k+1, …):
    (parent_id, child_left, child_right, distance, topics) where ``topics``
    is the comma-joined sorted leaf ids under the node.
    """
    spark = scores.sparkSession
    schema = ("parent_id long, child_left long, child_right long, "
              "distance double, topics string")
    classes = sorted(r[0] for r in scores.select(class_col).distinct().collect())
    k = len(classes)
    if k > max_classes:
        raise ValueError(
            f"{k} classes exceeds max_classes={max_classes}: the (2k-1)^2 "
            "merge matrix no longer fits a driver; partition the corpus "
            "(e.g. per lang) and build sub-trees instead")
    if k < 2:
        return spark.createDataFrame([], schema)
    leaf = {c: i for i, c in enumerate(classes)}
    d: dict[tuple[int, int], float] = {}
    for r in class_pair_distances(scores, class_col, round_to).collect():
        i, j = leaf[r["_ca"]], leaf[r["_cb"]]
        d[(min(i, j), max(i, j))] = float(r["dist"])
    return spark.createDataFrame(single_linkage_merge(d, k), schema)


def reduce_topics_agglomerative(doc_terms: DataFrame, topic_col: str,
                                nr_topics: int,
                                bm25_weighting: bool = False,
                                max_classes: int = 2000) -> tuple[dict, DataFrame]:
    """A9/J8 analog (`_reduce_to_n_topics`, _bertopic.py:4565-4627):
    iteratively merge the most-similar topic pair (cosine of summed
    c-TF-IDF rows) until ``nr_topics`` remain. Returns (mapping, new_scores).

    Never collects the class×term matrix. Spark computes the k×k Gram
    matrix D[a,b] = ⟨vec_a, vec_b⟩ once via a term join over the inverted
    index (one shuffle, vocab-size independent); the driver merge loop then
    derives every merged-cluster cosine from accumulated dots alone —
    cos(A∪B, C) uses D-sums, since ⟨Σa, Σb⟩ = ΣΣ⟨a,b⟩. O(k²) driver memory
    (hard-capped at ``max_classes``), identical output to merging the score
    vectors themselves.
    """
    x = class_term_counts(doc_terms, [topic_col])
    scores = ctfidf(x, [topic_col], bm25_weighting)
    a = scores.select(F.col(topic_col).alias("_ca"), "term", F.col("score").alias("_sa"))
    b = scores.select(F.col(topic_col).alias("_cb"), "term", F.col("score").alias("_sb"))
    pair_rows = (
        a.join(b, "term")
        .filter(F.col("_ca") <= F.col("_cb"))
        .groupBy("_ca", "_cb")
        .agg(F.sum(F.col("_sa") * F.col("_sb")).alias("dot"))
        .collect()
    )
    dots: dict[tuple[int, int], float] = {}
    topics_set = set()
    for r in pair_rows:
        ta, tb = r["_ca"], r["_cb"]
        topics_set.update((ta, tb))
        dots[(ta, tb)] = float(r["dot"])
    if len(topics_set) > max_classes:
        raise ValueError(
            f"{len(topics_set)} classes exceeds max_classes={max_classes}; "
            "the k² Gram matrix no longer fits a driver — reduce per "
            "partition (e.g. within lang) or raise the cap deliberately")

    def d(p: int, q: int) -> float:
        return dots.get((min(p, q), max(p, q)), 0.0)

    mapping = {t: t for t in topics_set}
    live = sorted(topics_set)
    while len(live) > nr_topics:
        best = None
        for i, p in enumerate(live):
            for q in live[i + 1:]:
                np_, nq = d(p, p), d(q, q)
                c = d(p, q) / (np_ ** 0.5 * nq ** 0.5) if np_ and nq else 0.0
                if best is None or c > best[0]:
                    best = (c, p, q)
        _, p, q = best
        for t, m in mapping.items():
            if m == q:
                mapping[t] = p
        # fold q's dots into p: ⟨p∪q, c⟩ = ⟨p,c⟩+⟨q,c⟩; ‖p∪q‖² = ‖p‖²+‖q‖²+2⟨p,q⟩
        new_self = d(p, p) + d(q, q) + 2.0 * d(p, q)
        for c in live:
            if c not in (p, q):
                dots[(min(p, c), max(p, c))] = d(p, c) + d(q, c)
        dots[(p, p)] = new_self
        live.remove(q)
    final = {t: m for t, m in mapping.items() if t != m}
    new_scores = merge_and_reaggregate(doc_terms, final, topic_col, bm25_weighting)
    return final, new_scores
