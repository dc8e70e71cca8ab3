"""Distributed BPE tokenizer training — the training-data-pipeline op that
turns the corpus into its own subword vocabulary (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units").

The reference delegates tokenization to sklearn's CountVectorizer
(``bertopic/_bertopic.py:4419-4424``); BPE *training* is the natural
extension a 100-TB LLM-data pipeline needs before any token-budget math
(pack_shards, training_shards) is meaningful.

Spark-first shape
-----------------
The classic algorithm is a greedy loop: count adjacent symbol pairs, merge
the most frequent pair everywhere, repeat. The scale trick (same as every
serious BPE trainer) is that merging operates on the **word-frequency
relation**, not the corpus: one corpus-wide shuffle builds (word, cnt) —
vocabulary-sized, ~10⁶-10⁷ rows even at 100 TB — and every merge iteration
is then a cheap distributed pass over that small cached relation:

- pair counting: one ``explode`` + two-phase hash agg per iteration, with
  the split symbol array bound ONCE per row as a higher-order-function
  lambda variable (Catalyst's CollapseProject would otherwise inline the
  ``split`` into every probe);
- argmax: ``ORDER BY cnt DESC, left, right LIMIT 1`` — a 1-row collect per
  iteration (the merge decision is inherently sequential; this is the
  standard k-round driver loop, each round O(vocab) distributed work);
- merge application: three JVM ``replace`` calls per row — the
  doubled-space trick makes single-pass left-to-right replacement exactly
  the greedy non-overlapping merge the reference algorithm performs
  (`` a  b `` consumes one delimiter space from each side, so adjacent
  occurrences still match).

Each generation is persisted and the previous one released, so iteration
cost stays O(one vocab scan) regardless of how many merges ran before.

Symbols are the word's characters plus a terminal ``</w>`` marker (the
paper's end-of-word symbol); ``<``/``>``/``/`` cannot appear inside
tokenizer output, so the marker is collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.tokenizer import with_tokens

EOW = "</w>"

# adjacent symbol pairs of the space-joined symbol string `s`, with the
# split array bound once as a lambda variable (CollapseProject-safe)
_PAIRS_EXPR = (
    "flatten(transform(array(split(s, ' ')), a -> CASE WHEN size(a) < 2 "
    "THEN array() ELSE zip_with(slice(a, 1, size(a) - 1), "
    "slice(a, 2, size(a) - 1), (l, r) -> struct(l, r)) END))"
)


def word_freqs(df: DataFrame, text_col: str = "text",
               mode: str = "ascii_code") -> DataFrame:
    """(word, cnt): corpus word frequencies — the one corpus-wide pass."""
    return (
        with_tokens(df, text_col, mode)
        .select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _initial_seqs(wf: DataFrame) -> DataFrame:
    """(cnt, s): word as space-joined character symbols + terminal </w>."""
    spaced = F.concat(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
        F.lit(" " + EOW),
    )
    return wf.select("cnt", spaced.alias("s"))


def _merge_expr(left: str, right: str):
    """Apply one merge to the symbol string `s`: greedy left-to-right,
    non-overlapping — identical to re.sub over non-whitespace-delimited
    pairs in the reference algorithm. Doubling the delimiter spaces lets
    adjacent occurrences (``a b a b``) each keep a full delimiter."""
    doubled = F.concat(
        F.lit(" "), F.replace(F.col("s"), F.lit(" "), F.lit("  ")), F.lit(" "))
    merged = F.replace(
        doubled, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} "))
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    mode: str = "ascii_code",
    n_merges: int = 8,
    min_pair_count: int = 2,
    return_state: bool = False,
):
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns a DataFrame (step, left, right, freq) — the learned merge table
    in application order; ties broken (freq desc, left asc, right asc) so
    the result is deterministic and cross-engine reproducible. Stops early
    when the best remaining pair falls below ``min_pair_count``.

    ``return_state=True`` additionally returns the final (cnt, s) symbol
    relation (for vocab extraction / encoding without replaying merges).
    """
    spark = df.sparkSession
    seqs = _initial_seqs(word_freqs(df, text_col, mode)).persist()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        best = (
            seqs.select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("cnt").cast("long").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_pair_count:
            break
        left, right, freq = best[0]["left"], best[0]["right"], best[0]["freq"]
        merges.append((step, left, right, freq))
        nxt = seqs.select("cnt", _merge_expr(left, right).alias("s")).persist()
        nxt.count()  # materialize before releasing the parent generation
        seqs.unpersist()
        seqs = nxt
    out = spark.createDataFrame(
        merges, "step long, left string, right string, freq long")
    if return_state:
        return out, seqs
    seqs.unpersist()
    return out


def bpe_segment_words(words: DataFrame, merges: list[tuple[str, str]],
                      word_col: str = "word") -> DataFrame:
    """Apply a learned merge list (driver-side, small) to a word relation:
    adds ``s`` (space-joined subword symbols) and ``n_subwords``. The k
    replaces compose into ONE whole-stage-codegen projection — no shuffle,
    no Python."""
    spaced = F.concat(
        F.trim(F.regexp_replace(F.col(word_col), "(.)", "$1 ")),
        F.lit(" " + EOW),
    )
    out = words.withColumn("s", spaced)
    for left, right in merges:
        out = out.withColumn("s", _merge_expr(left, right))
    return out.withColumn("n_subwords", F.size(F.split(F.col("s"), " ")))


def bpe_doc_subword_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "ascii_code",
) -> DataFrame:
    """(doc_id, n_tokens, n_subwords): per-document token-budget accounting
    under the learned subword vocabulary — what shard packing and training
    cost models consume. Words are segmented ONCE on the distinct-word
    relation (vocabulary-sized), then broadcast back onto the exploded
    corpus; the k merge replaces never touch corpus-scale rows."""
    toks = with_tokens(df, text_col, mode).select(
        id_col, F.explode("tokens").alias("word"))
    seg = bpe_segment_words(toks.select("word").distinct(), merges)
    return (
        toks.join(F.broadcast(seg.select("word", "n_subwords")), "word")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_tokens"),
             F.sum("n_subwords").cast("long").alias("n_subwords"))
    )


def bpe_vocab(state: DataFrame) -> DataFrame:
    """(symbol, freq): the learned subword vocabulary — final symbols of
    the trained state (from ``bpe_train(..., return_state=True)``) weighted
    by word frequency."""
    return (
        state.select("cnt", F.explode(F.split(F.col("s"), " ")).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )
