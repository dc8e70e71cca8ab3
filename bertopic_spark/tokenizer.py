"""Tokenization layer — the engine's single mandatory "UDTF".

Re-implements, from published semantics, the tokenization that feeds
BERTopic's class×term matrix (reference behavior, not code):

* ``BERTopic._preprocess_text`` (reference ``bertopic/_bertopic.py:4804-4816``):
  replace ``\\n``/``\\t`` with a space; for ``language="english"`` drop every
  char outside ``[A-Za-z0-9 ]``; map the exactly-empty string to the literal
  ``"emptydoc"``.
* sklearn ``CountVectorizer`` defaults (public API): lowercase, token regex
  ``(?u)\\b\\w\\w+\\b`` (two or more word chars), optional word n-grams
  (consecutive tokens joined by a single space).

Plus the north-star *code-aware* mode: camelCase / snake_case identifier
splitting before tokenization, so ``getUserName`` and ``get_user_name``
both index as ``get / user / name``.

Two execution paths per mode:

* ``tokens_expr`` — pure JVM Column expressions (``regexp_replace`` +
  ``regexp_extract_all``) for the ASCII modes; stays inside whole-stage
  codegen, no Python in the hot path. This is the default for index builds.
* ``tokens_udf`` — Arrow-vectorized pandas UDF, needed for the
  unicode-exact BERTopic parity mode and for n-grams.

Both paths produce identical token arrays for the ASCII modes (tested).
"""

from __future__ import annotations

import re
from typing import Iterable, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# Pure-Python kernels (shared by the pandas UDF and the local test oracle)
# ---------------------------------------------------------------------------

# sklearn CountVectorizer default token pattern (public API docs).
_WORD_RE = re.compile(r"(?u)\b\w\w+\b")
# ASCII variant used for the SQL-oracle-checked modes: RE2 (DuckDB) treats
# \w as ASCII, so the cross-engine modes pin the class explicitly.
_ASCII_WORD_RE = re.compile(r"[a-z0-9_]{2,}")
_CODE_WORD_RE = re.compile(r"[a-z0-9]{2,}")
_NON_ALNUM_RE = re.compile(r"[^A-Za-z0-9 ]+")
# camelCase boundary: lower-or-digit followed by upper.
_CAMEL_RE = re.compile(r"([a-z0-9])([A-Z])")

MODES = ("bertopic_english", "bertopic_multilingual", "ascii_code", "code_aware")


def preprocess_text(doc: str, english: bool = True) -> str:
    """BERTopic ``_preprocess_text`` semantics for one document."""
    doc = doc.replace("\n", " ").replace("\t", " ")
    if english:
        doc = _NON_ALNUM_RE.sub("", doc)
    return doc if doc != "" else "emptydoc"


def _ngrams(tokens: List[str], ngram_range: tuple[int, int]) -> List[str]:
    """sklearn word-ngram semantics: each n in [min,max], space-joined."""
    min_n, max_n = ngram_range
    if min_n == 1 and max_n == 1:
        return tokens
    out: List[str] = []
    n_tok = len(tokens)
    for n in range(min_n, min(max_n, n_tok) + 1):
        for i in range(n_tok - n + 1):
            out.append(" ".join(tokens[i : i + n]))
    return out


def tokenize_one(doc: str, mode: str = "ascii_code", ngram_range: tuple[int, int] = (1, 1)) -> List[str]:
    """Tokenize a single document under the given analyzer mode."""
    if doc is None:
        doc = ""
    if mode == "bertopic_english":
        toks = _WORD_RE.findall(preprocess_text(doc, english=True).lower())
    elif mode == "bertopic_multilingual":
        toks = _WORD_RE.findall(preprocess_text(doc, english=False).lower())
    elif mode == "ascii_code":
        toks = _ASCII_WORD_RE.findall(doc.lower())
    elif mode == "code_aware":
        doc = _CAMEL_RE.sub(r"\1 \2", doc)
        toks = _CODE_WORD_RE.findall(doc.replace("_", " ").lower())
    else:
        raise ValueError(f"unknown tokenizer mode {mode!r}; expected one of {MODES}")
    return _ngrams(toks, ngram_range)


def tokenize_many(docs: Iterable[str], mode: str = "ascii_code", ngram_range: tuple[int, int] = (1, 1)) -> List[List[str]]:
    return [tokenize_one(d, mode, ngram_range) for d in docs]


# ---------------------------------------------------------------------------
# Spark-side: JVM expression path (preferred — whole-stage codegen)
# ---------------------------------------------------------------------------

def tokens_expr(text: Column, mode: str = "ascii_code") -> Column:
    """Pure-JVM token array for the ASCII analyzer modes.

    Exactly mirrors ``tokenize_one`` for ``ascii_code`` / ``code_aware`` /
    ``bertopic_english`` (ASCII filter makes \\w ASCII-safe). DuckDB oracle
    equivalent: ``regexp_extract_all(...)`` with the same pattern.
    """
    if mode == "ascii_code":
        return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9_]{2,}"), 0)
    if mode == "code_aware":
        split = F.regexp_replace(text, r"([a-z0-9])([A-Z])", r"$1 $2")
        split = F.replace(split, F.lit("_"), F.lit(" "))
        return F.regexp_extract_all(F.lower(split), F.lit("[a-z0-9]{2,}"), 0)
    if mode == "bertopic_english":
        # preprocess: \n\t → space, strip non-[A-Za-z0-9 ], ''→'emptydoc';
        # then lowercase + \w\w+ (ASCII-only after the filter; '_' removed by it).
        clean = F.regexp_replace(
            F.regexp_replace(text, r"[\n\t]", " "), r"[^A-Za-z0-9 ]+", ""
        )
        clean = F.when(clean == "", F.lit("emptydoc")).otherwise(clean)
        return F.regexp_extract_all(F.lower(clean), F.lit("[a-z0-9]{2,}"), 0)
    raise ValueError(f"mode {mode!r} has no pure-JVM expression; use tokens_udf")


def tokens_udf(mode: str = "bertopic_multilingual", ngram_range: tuple[int, int] = (1, 1)):
    """Arrow-vectorized pandas UDF: text → array<string> of tokens."""

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(lambda d: tokenize_one(d, mode, ngram_range))

    return _tok


def with_tokens(df, text_col: str, mode: str = "ascii_code",
                ngram_range: tuple[int, int] = (1, 1), use_udf: bool | None = None,
                out_col: str = "tokens"):
    """Add a token-array column, picking the fastest valid path."""
    if use_udf is None:
        use_udf = ngram_range != (1, 1) or mode == "bertopic_multilingual"
    if use_udf:
        return df.withColumn(out_col, tokens_udf(mode, ngram_range)(F.col(text_col)))
    return df.withColumn(out_col, tokens_expr(F.col(text_col), mode))


# DuckDB-oracle SQL fragments for the expression modes (kept adjacent to the
# Spark expressions so drift is caught in one place; used by __spark_entry__).
def duckdb_tokens_sql(text_sql: str, mode: str = "ascii_code") -> str:
    if mode == "ascii_code":
        return f"regexp_extract_all(lower({text_sql}), '[a-z0-9_]{{2,}}')"
    if mode == "code_aware":
        return (
            "regexp_extract_all(lower(replace(regexp_replace("
            f"{text_sql}, '([a-z0-9])([A-Z])', '\\1 \\2', 'g'), '_', ' ')), "
            "'[a-z0-9]{2,}')"
        )
    if mode == "bertopic_english":
        inner = (
            "regexp_replace(regexp_replace("
            f"{text_sql}, '[\\n\\t]', ' ', 'g'), '[^A-Za-z0-9 ]+', '', 'g')"
        )
        return (
            f"regexp_extract_all(lower(CASE WHEN {inner} = '' THEN 'emptydoc' "
            f"ELSE {inner} END), '[a-z0-9]{{2,}}')"
        )
    raise ValueError(f"mode {mode!r} not SQL-expressible")


# ---------------------------------------------------------------------------
# S-stemmer (Harman 1991, "How effective is suffixing?"): the weak plural
# stemmer — three suffix rules, no dictionary. Chosen over Porter because it
# is expressible as the SAME static CASE/regexp chain in Spark SQL and DuckDB
# (RE2 has no lookbehind, so the guards are LIKE predicates, not regex), which
# keeps the analyzer stage DuckDB-oracle-checkable. Lucene ships the same
# algorithm as EnglishMinimalStemFilter. Words shorter than 4 chars pass
# through unchanged.
# ---------------------------------------------------------------------------

def stem_s(t: str) -> str:
    """Pure-Python kernel (pandas-UDF / local-oracle path)."""
    if len(t) < 4:
        return t
    if t.endswith("ies") and not t.endswith(("eies", "aies")):
        return t[:-3] + "y"
    if t.endswith("es") and not t.endswith(("aes", "ees", "oes")):
        return t[:-1]
    if t.endswith("s") and not t.endswith(("us", "ss")):
        return t[:-1]
    return t


def stem_s_col(t: Column) -> Column:
    """JVM expression mirror of ``stem_s`` — safe inside HOF lambdas
    (``F.transform(tokens, stem_s_col)``), no Python in the hot path."""
    return (
        F.when(F.length(t) < 4, t)
        .when(t.endswith("ies") & ~t.endswith("eies") & ~t.endswith("aies"),
              F.regexp_replace(t, "ies$", "y"))
        .when(t.endswith("es") & ~t.endswith("aes") & ~t.endswith("ees")
              & ~t.endswith("oes"),
              F.regexp_replace(t, "es$", "e"))
        .when(t.endswith("s") & ~t.endswith("us") & ~t.endswith("ss"),
              F.regexp_replace(t, "s$", ""))
        .otherwise(t)
    )


def duckdb_stem_s_sql(t: str) -> str:
    """DuckDB mirror of ``stem_s_col`` (kept adjacent so drift is caught in
    one place, like ``duckdb_tokens_sql``)."""
    return (
        f"CASE WHEN length({t}) < 4 THEN {t} "
        f"WHEN {t} LIKE '%ies' AND {t} NOT LIKE '%eies' AND {t} NOT LIKE '%aies' "
        f"THEN regexp_replace({t}, 'ies$', 'y') "
        f"WHEN {t} LIKE '%es' AND {t} NOT LIKE '%aes' AND {t} NOT LIKE '%ees' "
        f"AND {t} NOT LIKE '%oes' THEN regexp_replace({t}, 'es$', 'e') "
        f"WHEN {t} LIKE '%s' AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss' "
        f"THEN regexp_replace({t}, 's$', '') ELSE {t} END"
    )
