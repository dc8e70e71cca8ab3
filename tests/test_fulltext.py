"""Fulltext operators: phrase match, boolean queries, positional postings.

The scan path and the postings path are independent physical strategies for
the same semantics — equality between them on arbitrary corpora is the core
invariant here (the oracle gates additionally check each against DuckDB).
"""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.fulltext import (
    boolean_match,
    boolean_match_postings,
    doc_term_positions,
    phrase_match,
    phrase_match_postings,
    phrase_suggest,
    term_vectors,
)
from bertopic_spark.tokenizer import tokenize_one

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _pairs(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("phrase", ["part filter", "batch batch", "order"])
def test_phrase_scan_equals_postings(spark, docs, phrase):
    scan = phrase_match(docs, phrase, "text", "doc_id")
    pos = doc_term_positions(docs, "text", "doc_id")
    idx = phrase_match_postings(pos, tokenize_one(phrase, "ascii_code"))
    assert _pairs(scan) == _pairs(idx)
    assert scan.count() > 0  # phrase chosen to hit the fixture corpus


def test_phrase_overlapping_occurrences(spark):
    t = spark.createDataFrame(
        [(1, "aa aa aa aa bb"), (2, "aa bb aa"), (3, "cc")],
        "doc_id long, text string")
    # "aa aa" starts at positions 0,1,2 → 3 overlapping matches
    assert _pairs(phrase_match(t, "aa aa")) == {(1, 3)}
    assert _pairs(phrase_match_postings(
        doc_term_positions(t), ["aa", "aa"])) == {(1, 3)}
    # trigram spans the overlap too
    assert _pairs(phrase_match(t, "aa aa aa")) == {(1, 2)}


def test_phrase_edge_cases(spark):
    t = spark.createDataFrame([(1, "xx yy"), (2, None), (3, "")],
                              "doc_id long, text string")
    assert _pairs(phrase_match(t, "xx yy")) == {(1, 1)}
    assert phrase_match(t, "yy xx").count() == 0  # order matters
    with pytest.raises(ValueError):
        phrase_match(t, "!!")  # tokenizes to nothing


def test_boolean_scan_equals_postings(spark, docs):
    kw = dict(must=["part"], should=["filter", "window"],
              must_not=["spark"], min_should=1)
    scan = boolean_match(docs, text_col="text", id_col="doc_id", **kw)
    pos = doc_term_positions(docs, "text", "doc_id")
    idx = boolean_match_postings(pos, **kw)
    assert _pairs(scan) == _pairs(idx)
    assert scan.count() > 0


def test_boolean_semantics(spark):
    t = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb dd"), (3, "aa zz"), (4, "bb cc"),
         (5, "qq")],
        "doc_id long, text string")
    pos = doc_term_positions(t)
    for fn in (lambda **kw: boolean_match(t, **kw),
               lambda **kw: boolean_match_postings(pos, **kw)):
        # must + min_should=2: needs both bb and cc
        got = _pairs(fn(must=["aa"], should=["bb", "cc"], min_should=2))
        assert got == {(1, 3)}
        # must_not knocks out doc 2
        got = _pairs(fn(must=["aa"], should=["bb"], must_not=["dd"]))
        assert got == {(1, 2)}
        # doc whose only query terms are must_not terms is rejected
        got = _pairs(fn(must=[], should=["zz"], must_not=["aa"]))
        assert got == set()
        with pytest.raises(ValueError):
            fn(must=[], should=[])


def test_frequent_line_removal_edges(spark):
    from bertopic_spark.operators.dedup import frequent_line_removal

    t = spark.createDataFrame(
        [(1, "dup\nunique one\ndup"), (2, "dup\nother"), (3, "dup"),
         (4, "solo text")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["text_clean"], r["n_lines_kept"],
                         r["n_lines_removed"])
           for r in frequent_line_removal(t, min_count=3).collect()}
    assert out[1] == ("unique one", 1, 2)
    assert out[2] == ("other", 1, 1)
    assert out[3] == ("", 0, 1)  # fully-boilerplate doc survives as a row
    assert out[4] == ("solo text", 1, 0)
    assert len(out) == 4


def test_decontaminate_marks_exact_overlap(spark):
    from bertopic_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret eval answer key")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "prefix the secret eval answer key suffix"),  # contains 5-gram
         (2, "the secret eval differs here entirely"),     # only a 3-gram
         (3, "clean document with no overlap at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_shared"]
           for r in decontaminate(train, bench, n=5).collect()}
    assert got == {1: 1}
    # with n=3 the partial overlap in doc 2 is caught too
    got3 = {r["doc_id"]: r["n_shared"]
            for r in decontaminate(train, bench, n=3).collect()}
    assert set(got3) == {1, 2} and got3[1] == 3 and got3[2] == 1


def test_doc_term_positions_prune(spark, docs):
    pos = doc_term_positions(docs, "text", "doc_id", terms=["part"])
    terms = pos.select("term").distinct().collect()
    assert [r["term"] for r in terms] == ["part"]
    # positions are 0-based token offsets
    first = (doc_term_positions(docs, "text", "doc_id")
             .groupBy("doc_id").agg(F.min("pos").alias("m"))
             .agg(F.min("m"), F.max("m")).collect()[0])
    assert first[0] == 0 == first[1]


# ---------------------------------------------------------------------------
# Dictionary expansion (prefix / wildcard / fuzzy), snippets, facets.
# ---------------------------------------------------------------------------

import random
import re as _re

from bertopic_spark.operators.fulltext import (
    best_snippet,
    expand_terms,
    facet_counts,
    fuzzy_terms,
    prefix_terms,
    term_dictionary,
    term_set_match,
    term_set_match_postings,
    wildcard_regex,
    wildcard_terms,
)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_dictionary_and_expansions_brute(spark, docs):
    vocab = {}
    for r in docs.select("doc_id", "text").collect():
        for t in set(tokenize_one(r.text or "", "ascii_code")):
            vocab[t] = vocab.get(t, 0) + 1
    d = term_dictionary(docs, "text", "doc_id")
    assert {(r.term, r.df) for r in d.collect()} == set(vocab.items())
    assert prefix_terms(d, "s") == sorted(
        t for t in vocab if t.startswith("s"))
    rx = _re.compile(wildcard_regex("s?a*"))
    assert wildcard_terms(d, "s?a*") == sorted(
        t for t in vocab if rx.match(t))
    assert fuzzy_terms(d, "querry", 1) == sorted(
        t for t in vocab if _lev(t, "querry") <= 1)
    assert fuzzy_terms(d, "query", 0) == (["query"] if "query" in vocab
                                          else [])


def test_expansion_guardrails(spark, docs):
    d = term_dictionary(docs, "text", "doc_id")
    with pytest.raises(ValueError):
        prefix_terms(d, "")
    with pytest.raises(ValueError):
        wildcard_terms(d, "*?*")  # matches everything
    with pytest.raises(ValueError):
        fuzzy_terms(d, "query", -1)
    with pytest.raises(ValueError):  # bounded expansion must fail loudly
        expand_terms(d, F.lit(True), max_expand=3)


def test_wildcard_regex_escapes_metachars():
    rx = _re.compile(wildcard_regex("a.b*c?"))
    assert rx.match("a.bxxcy") and not rx.match("axbxxcy")


def test_regexp_terms_brute_and_guardrails(spark, docs):
    from bertopic_spark.operators.fulltext import regexp_terms

    vocab = set()
    for r in docs.select("text").collect():
        vocab.update(tokenize_one(r.text or "", "ascii_code"))
    d = term_dictionary(docs, "text", "doc_id")
    pat = "[a-z]*or[a-z]*"
    assert regexp_terms(d, pat) == sorted(
        t for t in vocab if _re.fullmatch(pat, t))
    # anchored: a partial match is NOT a hit
    assert regexp_terms(d, "rde") == []           # 'order' contains 'rde'
    assert regexp_terms(d, "(scan|query)") == sorted(
        t for t in vocab if t in ("scan", "query"))
    with pytest.raises(ValueError):
        regexp_terms(d, "")
    with pytest.raises(ValueError):               # backref: Java-only
        regexp_terms(d, r"(a)\1")
    with pytest.raises(ValueError):               # lookahead: Java-only
        regexp_terms(d, r"a(?=b)")
    with pytest.raises(_re.error):                # syntax error fails fast
        regexp_terms(d, "[unclosed")


def test_term_set_match_scan_equals_postings(spark, docs):
    terms = ["query", "customer", "scan"]
    scan = term_set_match(docs, terms, "text", "doc_id")
    idx = term_set_match_postings(
        doc_term_positions(docs, "text", "doc_id", terms=terms), terms)
    assert _pairs(scan) == _pairs(idx)
    assert scan.count() > 0
    with pytest.raises(ValueError):
        term_set_match(docs, [])


def _best_window_py(tokens, qset, w):
    pos = [i for i, t in enumerate(tokens) if t in qset]
    if not pos:
        return None
    cnts = [sum(1 for q in pos if p <= q < p + w) for p in pos]
    best = max(cnts)
    start = pos[cnts.index(best)]
    return (start, best, " ".join(tokens[start:start + w]))


def test_best_snippet_brute(spark):
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 30))))
            for i in range(60)] + [(60, None), (61, "")]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.start, r.n_hits, r.snippet)
           for r in best_snippet(t, ["aa", "dd"], window=5).collect()}
    want = {}
    for i, txt in rows:
        exp = _best_window_py(tokenize_one(txt or "", "ascii_code"),
                              {"aa", "dd"}, 5)
        if exp:
            want[i] = exp
    assert got == want
    with pytest.raises(ValueError):
        best_snippet(t, [], window=5)
    with pytest.raises(ValueError):
        best_snippet(t, ["aa"], window=0)


def test_facet_counts_null_bucket_and_semantics(spark):
    d = spark.createDataFrame(
        [(1, "aa", "py", "web"), (2, "aa bb", None, "web"),
         (3, "bb", "py", "book"), (4, "aa", "go", None)],
        "doc_id long, text string, lang string, source string")
    hits = term_set_match(d, ["aa"], "text", "doc_id")
    got = _pairs(facet_counts(hits, d, ["lang", "source"]))
    assert got == {("lang", "py", 1), ("lang", "null", 1), ("lang", "go", 1),
                   ("source", "web", 2), ("source", "null", 1)}
    with pytest.raises(ValueError):
        facet_counts(hits, d, [])


from bertopic_spark.operators.fulltext import search_with_snippets, suggest_terms


def test_suggest_terms_brute(spark, docs):
    d = term_dictionary(docs, "text", "doc_id")
    vocab = {(r.term, r.df) for r in d.collect()}
    got = [(r.q_term, r.suggestion, r.dist, r.df, r["rank"])
           for r in suggest_terms(d, ["querry", "scan", "zzz"], 2, 3)
           .orderBy("q_term", "rank").collect()]
    want = []
    for q in ["querry", "scan", "zzz"]:
        cand = sorted(((_lev(t, q), -df, t) for t, df in vocab
                       if _lev(t, q) <= 2))[:3]
        want += [(q, t, dist, -ndf, i + 1)
                 for i, (dist, ndf, t) in enumerate(cand)]
    assert got == sorted(want)
    # exact match ranks first with dist 0
    exact = {r.q_term: (r.suggestion, r.dist)
             for r in suggest_terms(d, ["scan"], 2, 1).collect()}
    assert exact == {"scan": ("scan", 0)}
    with pytest.raises(ValueError):
        suggest_terms(d, [])
    with pytest.raises(ValueError):
        suggest_terms(d, ["x"], -1)


def test_search_with_snippets_matches_composition(spark, docs):
    from bertopic_spark.operators.bm25 import (bm25_topk_adhoc, queries_df,
                                               query_terms)
    from bertopic_spark.tokenizer import tokenize_one as tok

    queries = {0: "customer order", 1: "spark window filter"}
    held = []
    out = search_with_snippets(docs, queries, k=5, window=6, text_col="text",
                               id_col="doc_id", _persisted_out=held)
    rows = out.collect()
    # retrieval leg identical to bm25_topk_adhoc
    qt = query_terms(queries_df(spark, queries), "ascii_code")
    top = {(r.query_id, r.doc_id, r["rank"]) for r in
           bm25_topk_adhoc(docs, qt, k=5, text_col="text").collect()}
    assert {(r.query_id, r.doc_id, r["rank"]) for r in rows} == top
    # snippet leg identical to best_snippet restricted to each query's hits
    for qid, qtext in queries.items():
        ts = sorted(set(tok(qtext, "ascii_code")))
        hit_ids = [r.doc_id for r in rows if r.query_id == qid]
        exp = {r.doc_id: (r.start, r.n_hits, r.snippet) for r in
               best_snippet(docs.filter(F.col("doc_id").isin(hit_ids)),
                            ts, window=6, text_col="text").collect()}
        got = {r.doc_id: (r.start, r.n_hits, r.snippet)
               for r in rows if r.query_id == qid}
        assert got == exp
    for df in held:
        df.unpersist()


from bertopic_spark.operators.fulltext import term_associations


def test_term_associations_brute(spark, docs):
    import math

    rows = [(r.doc_id, set(tokenize_one(r.text or "", "ascii_code")))
            for r in docs.select("doc_id", "text").collect()]
    n = len(rows)
    dfs = {}
    for _, ts in rows:
        for t in ts:
            dfs[t] = dfs.get(t, 0) + 1
    got = [(r.target, r.term, r.co_df, round(r.pmi, 9), r["rank"])
           for r in term_associations(docs, ["customer"], min_df=5, n=5)
           .orderBy("rank").collect()]
    co = {}
    for _, ts in rows:
        if "customer" in ts:
            for t in ts - {"customer"}:
                co[t] = co.get(t, 0) + 1
    cand = sorted(
        ((-math.log(n * c / (dfs["customer"] * dfs[t])), t, c)
         for t, c in co.items() if dfs[t] >= 5))[:5]
    want = [("customer", t, c, round(-p, 9), i + 1)
            for i, (p, t, c) in enumerate(cand)]
    assert got == want
    with pytest.raises(ValueError):
        term_associations(docs, [])
    with pytest.raises(ValueError):
        term_associations(docs, ["x"], min_df=0)


from bertopic_spark.operators.fulltext import (proximity_match,
                                               proximity_match_postings)


def _brute_min_span(tokens, terms):
    """O(len·n) reference sweep, independent of the Spark HOF code."""
    lasts, best = {t: -1 for t in terms}, None
    for i, tok in enumerate(tokens):
        if tok in lasts:
            lasts[tok] = i
            lo = min(lasts.values())
            if lo >= 0:
                span = i - lo + 1
                best = span if best is None else min(best, span)
    return best


@pytest.mark.parametrize("terms,window", [
    (["customer", "order"], 12),
    (["table", "scan", "row"], 25),
])
def test_proximity_scan_postings_brute(spark, docs, terms, window):
    scan = proximity_match(docs, terms, window, "text", "doc_id")
    pos = doc_term_positions(docs, "text", "doc_id")
    idx = proximity_match_postings(pos, terms, window)
    got = _pairs(scan)
    assert got == _pairs(idx)
    want = set()
    for r in docs.select("doc_id", "text").collect():
        s = _brute_min_span(tokenize_one(r.text or "", "ascii_code"),
                            set(terms))
        if s is not None and s <= window:
            want.add((r.doc_id, s))
    assert got == want
    assert got  # fixture corpus must actually hit


def test_proximity_validation(spark, docs):
    with pytest.raises(ValueError):
        proximity_match(docs, ["only"], 5)
    with pytest.raises(ValueError):
        proximity_match(docs, ["a1", "b1", "c1"], 2)  # window < n terms


def test_percolate_semantics(spark):
    from bertopic_spark.operators.fulltext import percolate

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha delta"), (2, "epsilon")],
        "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "alpha"), (0, "beta"), (1, "alpha"), (2, "zzz_oov")],
        "query_id long, term string")
    # AND semantics (default): query 0 needs both alpha AND beta
    got = {(r["doc_id"], r["query_id"]): (r["n_matched"], r["n_q"]) for r in
           percolate(docs, q, min_should_match=1.0).collect()}
    assert got == {(0, 0): (2, 2), (0, 1): (1, 1), (1, 1): (1, 1)}
    # 50% coverage admits single-term matches of the two-term query
    half = {(r["doc_id"], r["query_id"]) for r in
            percolate(docs, q, min_should_match=0.5).collect()}
    assert (1, 0) in half and (0, 0) in half
    # OOV-only standing query never fires; doc 2 matches nothing
    assert all(qid != 2 for _, qid in half)
    assert all(d != 2 for d, _ in half)
    with pytest.raises(ValueError):
        percolate(docs, q, min_should_match=0.0)


def test_suggest_index_and_lookup(spark):
    from bertopic_spark.operators.fulltext import (suggest_index,
                                                   term_dictionary)
    from bertopic_spark.operators.fulltext import suggest

    docs = spark.createDataFrame(
        [(0, "spark sparkle spartan spin a"), (1, "spark sparkle spin"),
         (2, "spark other")],
        "doc_id long, text string")
    d = term_dictionary(docs, "text", "doc_id")
    idx = suggest_index(d, min_len=2, max_len=4, k=3)
    got = {(r["prefix"], r["rank"]): r["term"] for r in idx.collect()}
    # df order: spark(3) > sparkle(2)=spin(2, term asc) > spartan(1)
    assert got[("spa", 1)] == "spark"
    assert got[("spa", 2)] == "sparkle"
    assert got[("spa", 3)] == "spartan"
    assert got[("sp", 2)] == "sparkle" and got[("sp", 3)] == "spin"
    # prefixes capped at max_len=4; terms shorter than min_len excluded
    assert all(2 <= len(p) <= 4 for p, _ in got)
    assert not any(t == "a" for t in got.values())
    hits = suggest(idx, "SP", k=2).collect()
    assert [r["term"] for r in hits] == ["spark", "sparkle"]
    # typing past max_len: longest materialized prefix + startswith filter
    deep = suggest(idx, "SPARKL", k=3, max_len=4).collect()
    assert [r["term"] for r in deep] == ["sparkle"]
    assert [r["term"] for r in suggest(idx, "spart", k=3).collect()] == ["spartan"]
    with pytest.raises(ValueError):
        suggest_index(d, min_len=0)


# --------------------------- synonym folding -------------------------------


def test_stem_s_python_jvm_parity(spark):
    from bertopic_spark.tokenizer import stem_s, stem_s_col
    words = ["queries", "files", "classes", "bus", "boss", "goes",
             "trees", "eies", "cat", "cats", "is", "as", "axes",
             "toes", "shoes", "aies", "babies", "us", "properties"]
    t = spark.createDataFrame([(w,) for w in words], "term string")
    got = {r["term"]: r["stem"]
           for r in t.select("term", stem_s_col(F.col("term")).alias("stem"))
                     .collect()}
    assert got == {w: stem_s(w) for w in words}
    # spot-check the three rules + guards
    assert stem_s("queries") == "query"
    assert stem_s("classes") == "classe"   # es-rule drops only the s
    assert stem_s("files") == "file"
    assert stem_s("boss") == "boss"        # ss guard
    assert stem_s("bus") == "bus"          # us guard
    assert stem_s("is") == "is"            # length guard


def test_synonym_map_and_fold(spark):
    from bertopic_spark.operators.fulltext import fold_term_counts, synonym_map
    x = spark.createDataFrame(
        [(1, "file", 2), (1, "files", 3), (1, "zz", 1),
         (2, "files", 5), (2, "boss", 1)],
        "doc_id long, term string, tf long")
    syn = synonym_map(x)
    m = {r["term"]: r["syn_key"] for r in syn.collect()}
    # file/files share the stem group; singletons (zz, boss) are unmapped
    assert m == {"file": "file", "files": "file"}
    folded = fold_term_counts(x, syn, ["doc_id"])
    got = {(r["doc_id"], r["term"]): r["tf"] for r in folded.collect()}
    assert got == {(1, "file"): 5, (1, "zz"): 1,
                   (2, "file"): 5, (2, "boss"): 1}


def test_fold_preserves_class_len(spark):
    from bertopic_spark.operators.fulltext import fold_term_counts, synonym_map
    x = spark.createDataFrame(
        [(1, "file", 2, 6), (1, "files", 3, 6), (1, "zz", 1, 6)],
        "doc_id long, term string, tf long, class_len long")
    folded = fold_term_counts(x, synonym_map(x), ["doc_id"])
    rows = folded.collect()
    assert all(r["class_len"] == 6 for r in rows)
    assert sum(r["tf"] for r in rows) == 6  # total mass invariant


def test_synonym_bm25_blends_variants(spark):
    """A doc split across singular/plural forms must outrank one with the
    same total tf once folded — the SynonymQuery motivation."""
    from bertopic_spark.operators.fulltext import bm25_topk_synonyms
    docs = spark.createDataFrame(
        [(1, "token tokens token tokens pad"),
         (2, "token pad pad pad pad"),
         (3, "other words here pad pad")],
        "doc_id long, content string")
    q = spark.createDataFrame([(0, "tokens")], "query_id long, term string")
    out = bm25_topk_synonyms(docs, q, k=3).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[1] == 1 and ranks[2] == 2
    assert 3 not in ranks  # no query term, folded or not


# ------------------------- minimum_should_match ----------------------------


def test_min_should_fraction_and_absolute(spark):
    from bertopic_spark.operators.bm25 import (
        bm25_topk, bm25_topk_minshould, doc_scores)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta zz"),
         (3, "alpha zz zz"), (4, "zz zz zz")],
        "doc_id long, content string")
    scores = doc_scores(docs)
    q = spark.createDataFrame(
        [(0, "alpha"), (0, "beta"), (0, "gamma")],
        "query_id long, term string")
    by_n = {n: {r["doc_id"]: r["n_matched"]
                for r in bm25_topk_minshould(scores, q, 10, n).collect()}
            for n in (1, 2, 3)}
    assert set(by_n[1]) == {1, 2, 3} and set(by_n[2]) == {1, 2} \
        and set(by_n[3]) == {1}
    assert by_n[1] == {1: 3, 2: 2, 3: 1}
    # fraction: ceil(0.6 * 3) = 2
    frac = bm25_topk_minshould(scores, q, 10, 0.6)
    assert {r["doc_id"] for r in frac.collect()} == {1, 2}
    # min_should=1 ranks exactly like plain bm25_topk
    plain = bm25_topk(scores, q, 10)
    a = [(r["query_id"], r["doc_id"], r["rank"]) for r in plain.collect()]
    b = [(r["query_id"], r["doc_id"], r["rank"])
         for r in bm25_topk_minshould(scores, q, 10, 1).collect()]
    assert sorted(a) == sorted(b)


# --------------------------- significant terms -----------------------------


def test_significant_terms_jlh(spark):
    from bertopic_spark.operators.fulltext import significant_terms
    # fg docs: 1,2 (both contain "hot"); bg-only docs: 3,4 ("cold")
    rows = [(1, True, "hot"), (1, True, "common"),
            (2, True, "hot"), (2, True, "common"),
            (3, False, "cold"), (3, False, "common"),
            (4, False, "common")]
    dt = spark.createDataFrame(rows, "doc_id long, fg boolean, term string")
    out = {r["term"]: r for r in significant_terms(dt, k=10).collect()}
    # "hot": fg_pct 1.0 vs bg_pct 0.5 → JLH (1-.5)*(1/.5)=1.0, the top term
    assert set(out) == {"hot"}  # "common" has fg_pct == bg_pct, "cold" fg 0
    assert out["hot"]["df_fg"] == 2 and out["hot"]["df_all"] == 2
    assert abs(out["hot"]["score"] - 1.0) < 1e-12
    assert out["hot"]["rank"] == 1


def test_significant_terms_topk_cut(spark):
    from bertopic_spark.operators.fulltext import significant_terms
    rows = [(d, d < 3, f"t{d}") for d in range(1, 7)]
    dt = spark.createDataFrame(rows, "doc_id long, fg boolean, term string")
    out = significant_terms(dt, k=1).collect()
    assert len(out) == 1 and out[0]["rank"] == 1
    assert out[0]["term"] == "t1"  # tie on score → term asc


def test_phrase_boost_reorders(spark):
    from bertopic_spark.operators.fulltext import phrase_boost_topk

    # doc 1 has both terms scattered; doc 2 has them adjacent (twice)
    docs = spark.createDataFrame(
        [(1, "alpha pad pad pad pad beta alpha pad beta pad"),
         (2, "alpha beta pad alpha beta")],
        "doc_id long, content string")
    h = []
    out = {r["doc_id"]: r for r in phrase_boost_topk(
        docs, {0: "alpha beta"}, k=10, boost=10.0,
        _persisted_out=h).collect()}
    for x in h:
        x.unpersist()
    assert out[2]["rank"] == 1  # phrase boost dominates at boost=10
    assert out[2]["boosted"] == pytest.approx(out[2]["score"] + 20.0)
    assert out[1]["boosted"] == pytest.approx(out[1]["score"])  # no phrase


@pytest.mark.parametrize("terms,slop", [
    (("hash", "join", "order"), 6),
    (("table", "scan"), 4),
    (("data", "data"), 5),          # repeated-term sequence
])
def test_span_near_scan_equals_postings(spark, docs, terms, slop):
    from bertopic_spark.operators.fulltext import (
        span_near_match, span_near_match_postings)

    scan = span_near_match(docs, terms, slop, "text", "doc_id")
    pos = doc_term_positions(docs, "text", "doc_id")
    idx = span_near_match_postings(pos, terms, slop)
    assert _pairs(scan) == _pairs(idx)
    assert scan.count() > 0  # corpus-vocab terms chosen to hit the fixture


def test_span_near_is_ordered(spark):
    from bertopic_spark.operators.fulltext import span_near_match

    df = spark.createDataFrame(
        [(0, "alpha pad beta"), (1, "beta pad alpha")],
        "doc_id long, text string")
    fwd = _pairs(span_near_match(df, ["alpha", "beta"], slop=3))
    rev = _pairs(span_near_match(df, ["beta", "alpha"], slop=3))
    assert fwd == {(0, 3)}
    assert rev == {(1, 3)}


def test_span_near_no_token_reuse(spark):
    from bertopic_spark.operators.fulltext import span_near_match

    # a single "beta" must not satisfy the ["beta", "beta"] sequence
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta alpha beta")],
        "doc_id long, text string")
    got = _pairs(span_near_match(df, ["beta", "beta"], slop=4))
    assert got == {(1, 3)}


def test_span_near_slop_zero_is_adjacency(spark, docs):
    from bertopic_spark.operators.fulltext import span_near_match

    # slop=0 ordered span == exact phrase adjacency (doc sets match)
    ph = {r["doc_id"] for r in
          phrase_match(docs, "part filter", "text", "doc_id").collect()}
    sp = {r["doc_id"] for r in
          span_near_match(docs, ["part", "filter"], 0, "text",
                          "doc_id").collect()}
    assert sp == ph and sp


def test_facet_topn_approx_bounds_and_exactness(spark, docs):
    from bertopic_spark.operators.fulltext import facet_topn_approx

    exact = {r["value"]: r["n"] for r in
             docs.groupBy(F.col("source").cast("string").alias("value"))
             .agg(F.count("*").alias("n")).collect()}
    approx = facet_topn_approx(docs, "source", k=5, n_shards=4,
                               shard_k=3).collect()
    assert len(approx) == 5
    for r in approx:
        true = exact[r["value"]]
        # ES contract: reported ≤ true ≤ reported + error bound
        assert r["doc_count"] <= true <= r["doc_count"] + r["error_bound"]

    # shard_k covering every shard's vocabulary → exact, zero error
    wide = {r["value"]: r for r in
            facet_topn_approx(docs, "source", k=5, n_shards=4,
                              shard_k=10 ** 6).collect()}
    for v, r in wide.items():
        assert r["doc_count"] == exact[v]
        assert r["error_bound"] == 0


def test_phrase_prefix_semantics(spark):
    from bertopic_spark.operators.fulltext import phrase_prefix_match

    df = spark.createDataFrame([
        (0, "alpha beta gamma"),     # alpha be* → match
        (1, "alpha bx"),             # bx doesn't start with be
        (2, "beta alpha"),           # wrong order
        (3, "alpha beta alpha bexx"),  # two starts → n_matches 2
        (4, "alpha"),                # phrase longer than doc
    ], "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_prefix_match(df, "alpha be").collect()}
    assert got == {0: 1, 3: 2}
    # full-phrase degeneration: prefix equal to a whole token behaves like
    # phrase_match plus any longer completions
    ph = {r["doc_id"] for r in phrase_match(df, "alpha beta").collect()}
    pp = {r["doc_id"] for r in
          phrase_prefix_match(df, "alpha beta").collect()}
    assert ph <= pp
    # single-token phrase = counted prefix term query
    single = {r["doc_id"]: r["n_matches"]
              for r in phrase_prefix_match(df, "be").collect()}
    assert single == {0: 1, 2: 1, 3: 2}


def test_span_near_random_corpora_property(spark):
    """Randomized scan-vs-postings parity plus a brute-force local oracle
    for the ordered sweep (small alphabets force dense repeats — the
    regime where ordered-chain bookkeeping can go wrong)."""
    import random

    from bertopic_spark.operators.fulltext import (span_near_match,
                                                   span_near_match_postings)

    rng = random.Random(99)
    alphabet = ["aa", "bb", "cc", "dd"]
    for trial in range(3):
        docs = [(i, " ".join(rng.choices(alphabet, k=rng.randint(0, 14))))
                for i in range(120)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        terms = rng.choices(alphabet, k=rng.randint(2, 3))
        slop = rng.randint(0, 3)
        scan = {(r.doc_id, r.min_span) for r in
                span_near_match(df, terms, slop).collect()}
        pos = doc_term_positions(df, "text", "doc_id")
        idx = {(r.doc_id, r.min_span) for r in
               span_near_match_postings(pos, terms, slop).collect()}
        assert scan == idx, (trial, terms, slop)

        # brute force: minimal ordered occurrence via index chains
        def brute(tokens):
            best = None
            n = len(terms)
            def rec(j, start_at, first):
                nonlocal best
                if j == n:
                    span = start_at - first  # start_at = last pos + 1
                    best = span if best is None else min(best, span)
                    return
                for p in range(start_at, len(tokens)):
                    if tokens[p] == terms[j]:
                        rec(j + 1, p + 1, p if j == 0 else first)
            rec(0, 0, -1)
            return best
        want = set()
        for d, text in docs:
            toks = text.split()
            b = brute(toks)
            if b is not None and b <= len(terms) + slop:
                want.add((d, b))
        assert scan == want, (trial, terms, slop)


# ---------------------------------------------------------------------------
# phrase_suggest: ES phrase suggester (Stupid-Backoff bigram LM)
# ---------------------------------------------------------------------------


def _suggest_rows(df):
    return [(r.suggestion, r.logp, r.rank) for r in
            df.orderBy("rank").collect()]


def test_phrase_suggest_hand_scored(spark):
    import math
    t = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "aa bb"), (3, "cc bb")],
        "doc_id long, text string")
    # unigrams: aa=3 bb=4 cc=1, T=8; bigrams: (aa,bb)=3 (bb,aa)=1 (cc,bb)=1
    out = _suggest_rows(phrase_suggest(t, "aa bb", max_dist=0, n_cand=3,
                                       k=5, discount=0.4))
    assert out == [("aa bb", round(math.log(3 / 8) + math.log(3 / 3), 6), 1)]
    # unobserved bigram backs off: ln(c(bb)/T) + ln(0.4*c(bb)/T)
    out = _suggest_rows(phrase_suggest(t, "bb bb", max_dist=0, n_cand=3,
                                       k=5, discount=0.4))
    assert out == [("bb bb",
                    round(math.log(4 / 8) + math.log(0.4 * 4 / 8), 6), 1)]


def test_phrase_suggest_corrects_misspelling(spark):
    t = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "aa bb"), (3, "ab cc")],
        "doc_id long, text string")
    # "ax bb": candidates within dist 1 are {aa, ab} for "ax" and {bb, ab}
    # for "bb" -> a 4-phrase lattice; the observed bigram (aa,bb) beats
    # every backoff chain, so the corrected phrase ranks first.
    out = _suggest_rows(phrase_suggest(t, "ax bb", max_dist=1, n_cand=3,
                                       k=5, discount=0.4))
    assert {s for s, _, _ in out} == {"aa bb", "aa ab", "ab bb", "ab ab"}
    assert out[0][0] == "aa bb"
    assert out[0][1] > max(lp for _, lp, _ in out[1:])


def test_phrase_suggest_empty_position_and_validation(spark):
    t = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    # no candidate within dist 0 of an out-of-vocab term -> empty lattice
    assert phrase_suggest(t, "zz bb", max_dist=0).count() == 0
    with pytest.raises(ValueError):
        phrase_suggest(t, "??", max_dist=1)  # tokenizes to nothing
    with pytest.raises(ValueError):
        phrase_suggest(t, "aa bb", discount=0.0)


def test_phrase_suggest_fixture_nonempty(spark, docs):
    # gate-shaped invocation over the fixture corpus: full top-k comes back
    # and the dist-0 in-vocab head word survives in every suggestion slot.
    out = _suggest_rows(phrase_suggest(docs, "slow part querry", max_dist=2,
                                       n_cand=3, k=5))
    assert len(out) == 5
    assert [r for _, _, r in out] == [1, 2, 3, 4, 5]
    assert all(s.split()[2] == "query" for s, _, _ in out)


# ---------------------------------------------------------------------------
# term_vectors: ES _termvectors with corpus-wide term statistics
# ---------------------------------------------------------------------------


def test_term_vectors_hand_checked(spark):
    t = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "bb cc"), (3, "aa")],
        "doc_id long, text string")
    out = {(r.doc_id, r.term): (r.tf, r.positions, r.df, r.ttf)
           for r in term_vectors(t, [1, 2]).collect()}
    assert out == {
        (1, "aa"): (2, "0,2", 2, 3),   # df counts doc 3 too, ttf all occurrences
        (1, "bb"): (1, "1", 2, 2),
        (2, "bb"): (1, "0", 2, 2),
        (2, "cc"): (1, "1", 1, 1),
    }
    # stats off: df/ttf come back NULL, per-doc half identical
    cheap = {(r.doc_id, r.term): (r.tf, r.positions, r.df, r.ttf)
             for r in term_vectors(t, [2], term_statistics=False).collect()}
    assert cheap == {(2, "bb"): (1, "0", None, None),
                     (2, "cc"): (1, "1", None, None)}
    with pytest.raises(ValueError):
        term_vectors(t, [])


def test_term_vectors_fixture_nonempty(spark, docs):
    out = term_vectors(docs, [1, 2, 3, 5, 8])
    rows = out.collect()
    assert len(rows) > 0
    assert {r.doc_id for r in rows} == {1, 2, 3, 5, 8}
    # tf equals the number of listed positions on every row
    assert all(r.tf == len(r.positions.split(",")) for r in rows)
    assert all(r.ttf >= r.tf and r.df >= 1 for r in rows)


def test_span_not_scan_postings_parity_and_hand_case(spark):
    from pyspark.sql import functions as F
    from bertopic_spark.operators.fulltext import (
        doc_term_positions, span_not_match, span_not_match_postings)

    docs = spark.createDataFrame(
        [(1, "alpha virus beta gamma"),          # no computer: kept
         (2, "computer virus detected"),          # adjacent: vetoed
         (3, "virus one two computer virus"),     # 1st kept (pre=1,post=1), 2nd vetoed
         (4, "computer only here"),               # no include
         (5, "virus xx computer yy virus")],      # both survive at pre=post=1
        "doc_id long, text string")
    scan = span_not_match(docs, "virus", "computer", pre=1, post=1)
    got = {(r["doc_id"], r["n_kept"]) for r in scan.collect()}
    assert got == {(1, 1), (3, 1), (5, 2)}
    pos = doc_term_positions(docs, "text", "doc_id")
    post = span_not_match_postings(pos, "virus", "computer", pre=1, post=1)
    assert {(r["doc_id"], r["n_kept"]) for r in post.collect()} == got
    # pre/post asymmetry: exclude 2 BEFORE kills only with pre >= 2
    one = spark.createDataFrame([(9, "computer aa virus")],
                                "doc_id long, text string")
    assert span_not_match(one, "virus", "computer", pre=2, post=0).count() == 0
    assert span_not_match(one, "virus", "computer", pre=1, post=0).count() == 1
    assert span_not_match(one, "virus", "computer", pre=0, post=9).count() == 1


# ---------------------------------------------------------------------------
# Shingle-accelerated phrase match
# ---------------------------------------------------------------------------

from bertopic_spark.operators.fulltext import (bigram_counts,  # noqa: E402
                                               phrase_match_shingled)


def test_bigram_counts_hand_checked(spark):
    t = spark.createDataFrame(
        [(1, "aa bb aa bb"), (2, "aa"), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {(r.doc_id, r.bigram): r.n for r in bigram_counts(t).collect()}
    assert got == {(1, "aa bb"): 2, (1, "bb aa"): 1}


def test_phrase_shingled_equals_scan_paths(spark, docs):
    """Result-identical to phrase_match on the fixture corpus for 2- and
    3-token phrases (two physical strategies, one truth)."""
    for phrase in ("part filter", "slow hash batch", "hash join order"):
        scan = {(r.doc_id, r.n_matches)
                for r in phrase_match(docs, phrase).collect()}
        fast = {(r.doc_id, r.n_matches)
                for r in phrase_match_shingled(docs, phrase).collect()}
        assert fast == scan, phrase


def test_phrase_shingled_rejects_false_candidates(spark):
    """A doc containing every phrase bigram but never contiguously must
    survive the prefilter and be rejected by verification; overlapping
    occurrences count like the scan path."""
    rows = [
        (1, "slow hash batch"),                      # 1 occurrence
        (2, "slow hash xx hash batch"),              # both bigrams, no triple
        (3, "slow hash batch slow hash batch"),      # 2 occurrences
        (4, "aa aa aa"),                             # overlap: 'aa aa' x2
        (5, "hash batch slow"),                      # wrong order
    ]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.n_matches)
           for r in phrase_match_shingled(t, "slow hash batch").collect()}
    assert got == {(1, 1), (3, 2)}
    # prefilter soundness probe: doc 2 IS a candidate (both bigrams)
    bg = bigram_counts(t)
    cands = {r.doc_id for r in bg.filter(
        F.col("bigram").isin(["slow hash", "hash batch"]))
        .groupBy("doc_id").count().filter("count = 2").collect()}
    assert 2 in cands
    # 2-token fast path: answered from the bigram index alone
    two = {(r.doc_id, r.n_matches)
           for r in phrase_match_shingled(t, "aa aa").collect()}
    assert two == {(4, 2)}
    # persisted-index reuse
    reused = {(r.doc_id, r.n_matches)
              for r in phrase_match_shingled(t, "slow hash batch",
                                             bigrams=bg).collect()}
    assert reused == {(1, 1), (3, 2)}
    with pytest.raises(ValueError):
        phrase_match_shingled(t, "solo")


def test_phrase_match_batch_equals_per_phrase(spark, docs):
    from bertopic_spark.operators.fulltext import phrase_match_batch

    phrases = {0: ["part", "filter"], 1: ["batch", "batch"], 2: ["order"],
               3: ["zz_never", "seen"]}
    pos = doc_term_positions(docs, "text", "doc_id")
    got = {(r.query_id, r.doc_id, r.n_matches)
           for r in phrase_match_batch(pos, phrases).collect()}
    want = set()
    for q, toks in phrases.items():
        for r in phrase_match_postings(pos, toks).collect():
            want.add((q, r.doc_id, r.n_matches))
    assert got == want
    assert any(q == 1 for q, _, _ in got)   # duplicate-token phrase hits
    assert any(q == 2 for q, _, _ in got)   # single-term phrase hits
    assert not any(q == 3 for q, _, _ in got)  # OOV phrase matches nothing


def test_phrase_match_batch_validates(spark, docs):
    from bertopic_spark.operators.fulltext import phrase_match_batch

    pos = doc_term_positions(docs.limit(1), "text", "doc_id")
    with pytest.raises(ValueError):
        phrase_match_batch(pos, {})
    with pytest.raises(ValueError):
        phrase_match_batch(pos, {0: []})


class TestSearchAsYouTypeAndPinned:
    def test_match_bool_prefix(self, spark):
        from bertopic_spark.operators.fulltext import match_bool_prefix_topk
        rows = [(0, "merge sorting fast"), (1, "merge only here"),
                (2, "sorted output"), (3, "nothing")]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["score"] for r in
               match_bool_prefix_topk(d, "merge sor", k=10, text_col="text"
                                      ).collect()}
        assert set(got) == {0, 1, 2}           # 3 matches neither leg
        assert got[0] > got[1]                 # 0 has both legs
        assert got[2] == 1.0                   # prefix-only: constant score
        # prefix-only query (single token): every sor* doc scores 1.0
        p = {r["doc_id"]: r["score"] for r in
             match_bool_prefix_topk(d, "sor", k=10, text_col="text").collect()}
        assert p == {0: 1.0, 2: 1.0}

    def test_match_bool_prefix_validation(self, spark):
        import pytest as _pt
        from bertopic_spark.operators.fulltext import match_bool_prefix_topk
        d = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
        with _pt.raises(ValueError, match="no tokens"):
            match_bool_prefix_topk(d, "!!", text_col="text")

    def test_significant_results_terms_fg_is_topk(self, spark):
        from bertopic_spark.operators.fulltext import significant_results_terms
        # 'needle' docs share 'marker'; background docs don't
        rows = [(i, "needle marker common") for i in range(4)] + \
               [(i + 4, "common filler words here") for i in range(8)]
        d = spark.createDataFrame(rows, "doc_id long, text string")
        got = significant_results_terms(d, "needle", k_docs=4, k_terms=3,
                                        text_col="text").collect()
        terms = [r["term"] for r in got]
        assert terms[0] in ("marker", "needle")
        assert "filler" not in terms

    def test_pinned_topk(self, spark):
        from bertopic_spark.operators.fulltext import pinned_topk
        organic = spark.createDataFrame(
            [(0, 10, 5.0, 1), (0, 11, 4.0, 2), (0, 7, 3.0, 3)],
            "query_id long, doc_id long, score double, rank int")
        got = [(r["rank"], r["doc_id"], r["pinned"]) for r in
               pinned_topk(organic, [7, 99], k=10).orderBy("rank").collect()]
        # 7 pinned first (listed first), 99 second (not in organic is fine),
        # organic follows minus the pinned 7
        assert got == [(1, 7, True), (2, 99, True),
                       (3, 10, False), (4, 11, False)]

    def test_pinned_validation(self, spark):
        import pytest as _pt
        from bertopic_spark.operators.fulltext import pinned_topk
        organic = spark.createDataFrame([], "query_id long, doc_id long, score double, rank int")
        with _pt.raises(ValueError, match="non-empty"):
            pinned_topk(organic, [])
        with _pt.raises(ValueError, match="distinct"):
            pinned_topk(organic, [1, 1])


def test_significant_terms_percentage_mode(spark):
    from bertopic_spark.operators.fulltext import significant_terms
    rows = [(0, True, "rare"), (1, True, "commonterm"),
            (2, False, "commonterm"), (3, False, "commonterm"),
            (4, False, "bgonly")]
    dt = spark.createDataFrame(rows, "doc_id long, fg boolean, term string")
    got = {r["term"]: r["score"] for r in
           significant_terms(dt, k=10, scoring="percentage").collect()}
    assert got["rare"] == 1.0            # 1/1 docs foreground
    assert abs(got["commonterm"] - 1 / 3) < 1e-12
    assert "bgonly" not in got           # df_fg = 0 excluded
    import pytest as _pt
    with _pt.raises(ValueError, match="scoring"):
        significant_terms(dt, scoring="chi2")


def test_fuzzy_dl_transposition_counts_one(spark):
    from bertopic_spark.operators.fulltext import (fuzzy_terms,
                                                   fuzzy_terms_dl)
    dic = spark.createDataFrame(
        [("table",), ("tabel",), ("tablet",), ("cable",), ("stable",),
         ("tbale",), ("zzz",)], "term string")
    dl = set(fuzzy_terms_dl(dic, "tabel"))
    lev = set(fuzzy_terms(dic, "tabel", 1))
    # adjacent swap 'el'->'le' costs ONE Damerau edit, two Levenshtein
    assert "table" in dl and "table" not in lev
    assert lev <= dl  # DL1 is a superset of lev1
    assert "zzz" not in dl and "cable" not in dl


def test_percolate_phrases_gates_on_adjacency(spark):
    from bertopic_spark.operators.fulltext import percolate, percolate_phrases
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta alpha gamma"),
         (2, "alpha gamma")],
        "doc_id long, text string")
    qt = spark.createDataFrame(
        [(10, "alpha"), (10, "beta"), (20, "gamma")],
        "query_id long, term string")
    ph = spark.createDataFrame([(10, "alpha beta")],
                               "query_id long, phrase string")
    base = {(r["doc_id"], r["query_id"])
            for r in percolate(docs, qt, "text", "doc_id", 1.0).collect()}
    out = {(r["doc_id"], r["query_id"])
           for r in percolate_phrases(docs, qt, ph, "text", "doc_id",
                                      1.0).collect()}
    # doc 1 has both terms but not the phrase; query 20 is unphrased
    assert (1, 10) in base and (1, 10) not in out
    assert (0, 10) in out
    assert {(d, q) for d, q in out if q == 20} == \
        {(d, q) for d, q in base if q == 20}
    # empty phrase registry degrades to plain percolate
    none = spark.createDataFrame([], "query_id long, phrase string")
    assert {(r["doc_id"], r["query_id"]) for r in percolate_phrases(
        docs, qt, none, "text", "doc_id", 1.0).collect()} == base


def test_percolate_phrases_registry_cap(spark):
    """The 'registry is small' contract is enforced: an oversized phrase
    registry raises instead of collecting to the driver."""
    from bertopic_spark.operators.fulltext import percolate_phrases
    docs = spark.createDataFrame([(0, "alpha beta")],
                                 "doc_id long, text string")
    qt = spark.createDataFrame([(10, "alpha")],
                               "query_id long, term string")
    big = spark.range(5).select(
        F.col("id").alias("query_id"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("phrase"))
    with pytest.raises(ValueError, match="max_registry=3"):
        percolate_phrases(docs, qt, big, "text", "doc_id", 1.0,
                          max_registry=3)


def test_sig_heuristics_hand_table(spark):
    """chi2 / MI on a known 2x2: fg = {d1, d2}, term in d1 (fg) and d3
    (bg). a=1 b=1 c=1 d=1 -> chi2 = 0, MI = 0 (independent)."""
    from bertopic_spark.operators.fulltext import significant_terms

    rows = [(1, True, "tt"), (2, True, "zz"), (3, False, "tt"),
            (4, False, "zz")]
    dt = spark.createDataFrame(rows, "doc_id long, fg boolean, term string")
    # independent table never passes the positive-signal filter
    assert significant_terms(dt, scoring="chi_square").count() == 0
    # perfectly associated: term only in fg docs
    rows2 = [(1, True, "tt"), (2, True, "tt"), (3, False, "zz"),
             (4, False, "zz")]
    dt2 = spark.createDataFrame(rows2, "doc_id long, fg boolean, term string")
    out = {r["term"]: r["score"]
           for r in significant_terms(dt2, scoring="chi_square").collect()}
    assert out["tt"] == pytest.approx(4.0, abs=1e-9)  # N*(ad-bc)^2/prod = 4
    mi = {r["term"]: r["score"]
          for r in significant_terms(dt2, scoring="mutual_information")
          .collect()}
    assert mi["tt"] == pytest.approx(1.0, abs=1e-9)  # 1 bit: fg==term
    import pytest as _pt
    with _pt.raises(ValueError):
        significant_terms(dt2, scoring="gnd")


def test_terms_lookup_topk(spark):
    """Terms come from the lookup row's vocabulary; the lookup doc itself
    is excluded; docs sharing no term never match."""
    from bertopic_spark.operators.fulltext import terms_lookup_topk

    docs = spark.createDataFrame(
        [(42, "alpha beta gamma"), (1, "alpha beta xx"),
         (2, "beta yy zz"), (3, "qq rr ss")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["rank"]
           for r in terms_lookup_topk(docs, docs, 42, k=5).collect()}
    assert 42 not in out          # self excluded
    assert 3 not in out           # no shared term
    assert set(out) == {1, 2}
    assert out[1] == 1            # two shared terms beats one
    # distinct relations with unrelated id spaces: exclude_self=False keeps
    # the corpus doc that merely shares the lookup id value (and keeps it
    # in the N/avgdl/df statistic set)
    lookup = spark.createDataFrame([(42, "alpha beta gamma")],
                                   "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(42, "alpha beta gamma"), (1, "alpha beta xx")],
        "doc_id long, text string")
    keep = {r["doc_id"]
            for r in terms_lookup_topk(corpus, lookup, 42, k=5,
                                       exclude_self=False).collect()}
    assert keep == {42, 1}
