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

from pyspark.sql import DataFrame
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
