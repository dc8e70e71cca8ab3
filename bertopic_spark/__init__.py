"""bertopic_spark — a PySpark-native inverted-index + BM25 / c-TF-IDF engine.

A from-scratch distributed re-expression of the data-processing core of
MaartenGr/BERTopic (reference: /root/reference, v0.17.4): tokenization,
class-based TF aggregation, c-TF-IDF / BM25 term weighting
(``bertopic/vectorizers/_ctfidf.py:54-115`` semantics), top-k keyword
extraction, sliced re-aggregation (topics_over_time / topics_per_class),
topic remapping and enrichment — plus the index machinery the north rule
adds: SPIMI posting-segment builds, delta+varint compressed posting blocks
with per-block max-score, block-max WAND top-k scoring, checkpoint/resume
with per-partition lineage, and training-data-pipeline operators
(dedup, ANN similarity, text quality analysis).

Everything is Spark DataFrame/SQL-first; Python only appears as
Arrow-vectorized pandas UDFs (tokenizer, block codec, WAND kernel).
"""

__version__ = "0.1.0"

from bertopic_spark.session import get_spark  # noqa: F401
