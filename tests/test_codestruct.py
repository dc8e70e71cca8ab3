"""Code-structure extraction (operators/codestruct): comments, symbol
definitions, import edges — hand-built sources with known structure, plus
pattern-parity checks against Python's re (the RE2-safe subset behaves
identically in Java regex, RE2/DuckDB, and Python)."""

import re

import pytest

from bertopic_spark.operators.codestruct import (
    COMMENT_PATTERN, DEF_PATTERN, IMPORT_PATTERN, comment_term_counts,
    extract_comments, extract_symbols, import_edges, symbol_stats)

SRC_A = (
    "// top of file note\n"
    "import os_path\n"
    "def parse_query(x):\n"
    "  return x  // trailing comment here\n"
    "# hashed comment\n"
    "def parse_query(y):\n"
    "class tokenizer:\n"
    "url = 'http://nope'\n"
)
SRC_B = (
    "import os_path\n"
    "import json_util\n"
    "fn build_index() {\n"
    "  // builder note\n"
    "}\n"
)


@pytest.fixture(scope="module")
def src_df(spark):
    return spark.createDataFrame(
        [(0, "python", SRC_A), (1, "rust", SRC_B), (2, "go", "no structure at all")],
        "doc_id long, lang string, content string")


def test_extract_comments(src_df):
    got = [(r["doc_id"], r["comment"]) for r in
           extract_comments(src_df).orderBy("doc_id", "comment").collect()]
    assert got == [
        (0, "hashed comment"),
        (0, "top of file note"),
        (0, "trailing comment here"),
        (1, "builder note"),
    ]
    # 'http://nope' must NOT match: '//' inside a token is not a comment


def test_comment_term_counts(src_df):
    got = {(r["lang"], r["term"]): r["tf"] for r in
           comment_term_counts(src_df, ["lang"]).collect()}
    assert got[("python", "comment")] == 2  # hashed + trailing
    assert got[("python", "note")] == 1
    assert got[("rust", "builder")] == 1
    assert ("go", "no") not in got


def test_extract_symbols_and_stats(src_df):
    syms = [(r["doc_id"], r["symbol"]) for r in
            extract_symbols(src_df).orderBy("doc_id", "symbol").collect()]
    assert syms == [(0, "parse_query"), (0, "parse_query"), (0, "tokenizer"),
                    (1, "build_index")]
    st = {r["symbol"]: (r["n_defs"], r["n_docs"]) for r in
          symbol_stats(src_df).collect()}
    assert st == {"parse_query": (2, 1), "tokenizer": (1, 1),
                  "build_index": (1, 1)}


def test_import_edges(src_df):
    got = {(r["src"], r["module"]): r["n_imports"] for r in
           import_edges(src_df, "lang").collect()}
    assert got == {("python", "os_path"): 1, ("rust", "os_path"): 1,
                   ("rust", "json_util"): 1}


def test_patterns_match_python_re():
    """The RE2-safe patterns behave identically under Python re — the
    same subset DuckDB (RE2) and Spark (java.util.regex) run verbatim."""
    assert re.findall(COMMENT_PATTERN, SRC_A) == [
        "top of file note", "trailing comment here", "hashed comment"]
    assert re.findall(DEF_PATTERN, SRC_A) == [
        "parse_query", "parse_query", "tokenizer"]
    assert re.findall(IMPORT_PATTERN, SRC_B) == ["os_path", "json_util"]


def test_empty_and_no_match(spark):
    df = spark.createDataFrame([(0, "x", "")], "doc_id long, lang string, content string")
    assert extract_comments(df).count() == 0
    assert symbol_stats(df).count() == 0
    assert import_edges(df, "lang").count() == 0


def test_resolve_imports(spark):
    from bertopic_spark.operators.codestruct import resolve_imports
    src = spark.createDataFrame([
        (0, "py", "import os_path.sub\nimport vendor_x\ndef os_path(a):\n"),
        (1, "py", "def os_path(b):\nimport os_path\n"),
    ], "doc_id long, lang string, content string")
    got = {(r["src"], r["module"]): (r["n_imports"], r["n_def_docs"])
           for r in resolve_imports(src, "lang").collect()}
    assert got == {
        ("py", "os_path.sub"): (1, 2),  # head os_path defined in 2 docs
        ("py", "os_path"): (1, 2),
        ("py", "vendor_x"): (1, 0),     # external: no defining doc
    }
