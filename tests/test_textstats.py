"""repetition_stats (Gopher A1.1 analogs): hand-computed values, NULL and
degenerate docs, and the documented tie-break."""

import pytest

from bertopic_spark.operators.textstats import repetition_stats


def _collect(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_stats_hand_computed(spark):
    rows = [
        (0, "aa bb\naa bb\ncc"),   # one duplicated line, top bigram 'aa bb' ×2
        (1, None),                  # NULL text → all zeros
        (2, "xyz"),                 # one token → no bigram
        (3, "qq ww\nee rr"),        # all lines/bigrams unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _collect(repetition_stats(df, "text", "doc_id"))
    assert set(out) == {0, 1, 2, 3}

    d0 = out[0]
    assert d0["n_lines"] == 3
    assert d0["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # dup chars = (2-1)*len('aa bb') = 5; total = 2*5 + len('cc') = 12
    assert d0["dup_line_char_frac"] == pytest.approx(5 / 12, abs=1e-6)
    assert d0["top_bigram"] == "aa bb"
    # 2 occurrences × len('aa bb')=5 over len(text)=14
    assert d0["top_bigram_char_frac"] == pytest.approx(10 / 14, abs=1e-6)

    assert out[1] == {"doc_id": 1, "n_lines": 0, "dup_line_frac": 0.0,
                      "dup_line_char_frac": 0.0, "top_bigram": "",
                      "top_bigram_char_frac": 0.0}

    d2 = out[2]
    assert (d2["n_lines"], d2["top_bigram"], d2["top_bigram_char_frac"]) == (1, "", 0.0)

    d3 = out[3]
    assert d3["dup_line_frac"] == 0.0
    assert d3["dup_line_char_frac"] == 0.0
    # ties on count=1 break to the lexicographically first bigram
    # (bigrams span line breaks: 'qq ww', 'ww ee', 'ee rr' → asc first)
    assert d3["top_bigram"] == "ee rr"


def test_repetition_stats_partition_invariant(spark):
    rows = [(i, ("dup line\n" * (i % 4)) + f"tail {i} tail {i}") for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = _collect(repetition_stats(df, "text", "doc_id"))
    b = _collect(repetition_stats(df.repartition(13), "text", "doc_id"))
    assert a == b


def test_redact_pii_rules_and_edges(spark):
    from bertopic_spark.operators.textstats import redact_pii

    rows = [
        (1, "mail a@b.co and c.d+x@e-f.org end"),
        (2, "ip 10.0.0.1 and 255.255.255.255, phone 555-123-4567"),
        (3, "key 0123456789abcdef0123456789abcdef trailing"),
        (4, "clean text with no pii at all"),
        (5, None),
        (6, ""),
        (7, "a@b.co a@b.co"),  # counts are per occurrence
    ]
    t = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in redact_pii(t).collect()}
    assert got[1]["n_email"] == 2 and "<EMAIL>" in got[1]["clean"]
    assert "@" not in got[1]["clean"]
    assert got[2]["n_ipv4"] == 2 and got[2]["n_phone"] == 1
    assert "10.0.0.1" not in got[2]["clean"]
    assert got[3]["n_hexkey"] == 1 and "<KEY> trailing" in got[3]["clean"]
    assert got[4] == {"doc_id": 4, "n_email": 0, "n_ipv4": 0, "n_phone": 0,
                      "n_hexkey": 0, "clean": rows[3][1]}
    assert got[5]["clean"] is None and got[5]["n_email"] is None
    assert got[6]["clean"] == "" and got[6]["n_email"] == 0
    assert got[7]["n_email"] == 2
    with pytest.raises(ValueError):
        redact_pii(t, rules=())


def test_pack_shards_prefix_sum(spark):
    from bertopic_spark.operators.textstats import pack_shards
    from bertopic_spark.tokenizer import tokenize_one

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").repartition(7)
    got = sorted((r.doc_id, r.n_tokens, r.shard_id)
                 for r in pack_shards(docs, budget=1500,
                                      text_col="text").collect())
    rows = sorted((r.doc_id, len(tokenize_one(r.text or "", "ascii_code")))
                  for r in docs.select("doc_id", "text").collect())
    cum, want = 0, []
    for d, n in rows:
        want.append((d, n, cum // 1500))
        cum += n
    assert got == sorted(want)
    # shard ids are dense from 0 and sizes hover around the budget
    sids = [s for _, _, s in got]
    assert min(sids) == 0 and set(sids) == set(range(max(sids) + 1))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_shards(docs, budget=0)


def test_gopher_filter_composes_stats(spark):
    from pyspark.sql import functions as F

    from bertopic_spark.operators.textstats import (gopher_filter,
                                                    repetition_stats,
                                                    token_stats)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: (r.keep, r.reasons)
           for r in gopher_filter(docs).collect()}
    ts = {r.doc_id: r for r in token_stats(docs, "text", "doc_id").collect()}
    rs = {r.doc_id: r
          for r in repetition_stats(docs, "text", "doc_id").collect()}
    assert set(got) == set(ts)
    n_drop = 0
    for d in ts:
        want = []
        if ts[d].n_tokens < 50:
            want.append("too_few_tokens")
        if ts[d].n_tokens > 100000:
            want.append("too_many_tokens")
        if ts[d].avg_token_len < 3.0:
            want.append("avg_token_len_low")
        if ts[d].avg_token_len > 10.0:
            want.append("avg_token_len_high")
        if ts[d].stopword_ratio < 0.06:
            want.append("low_stopword_ratio")
        if rs[d].dup_line_frac > 0.30:
            want.append("dup_lines")
        if rs[d].top_bigram_char_frac > 0.18:
            want.append("dup_top_bigram")
        assert got[d] == (not want, ",".join(want)), d
        n_drop += bool(want)
    assert 0 < n_drop < len(ts)  # fixture must exercise both verdicts
    # threshold override flips the stop-word floor off
    relaxed = gopher_filter(docs, thresholds={"low_stopword_ratio": -1.0})
    assert relaxed.filter(
        F.col("reasons").contains("low_stopword_ratio")).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        gopher_filter(docs, thresholds={"nope": 1})


def test_training_shards_composition(spark):
    from pyspark.sql import functions as F

    from bertopic_spark.operators.dedup import exact_dedup
    from bertopic_spark.operators.pipeline import training_shards
    from bertopic_spark.operators.textstats import gopher_filter, pack_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # duplicate a kept doc under a higher id: the copy must be dropped
    kept_ids = [r.doc_id for r in
                gopher_filter(docs).filter("keep").limit(1).collect()]
    assert kept_ids
    dup = (docs.filter(F.col("doc_id") == kept_ids[0])
           .withColumn("doc_id", F.lit(10**9).cast("long")))
    corpus = docs.unionByName(dup)
    got = sorted((r.doc_id, r.n_tokens, r.shard_id)
                 for r in training_shards(corpus, 1000,
                                          text_col="text").collect())
    assert all(d != 10**9 for d, _, _ in got)  # dup dropped
    # equals the manual three-stage composition
    keep = gopher_filter(corpus).filter("keep").select("doc_id")
    kc = corpus.join(keep, "doc_id").select("doc_id", "text")
    reps = exact_dedup(kc, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id"))
    want = sorted((r.doc_id, r.n_tokens, r.shard_id)
                  for r in pack_shards(kc.join(reps, "doc_id"), 1000,
                                       text_col="text").collect())
    assert got == want and got


def test_lm_perplexity_brute_and_frozen_lm(spark):
    import math

    from pyspark.sql import functions as F

    from bertopic_spark.operators.textstats import lm_perplexity
    from bertopic_spark.tokenizer import tokenize_one

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: (r.n_tokens, round(r.cross_entropy, 9))
           for r in lm_perplexity(docs).collect()}
    rows = [(r.doc_id, tokenize_one(r.text or "", "ascii_code"))
            for r in docs.select("doc_id", "text").collect()]
    ctf = {}
    for _, ts in rows:
        for t in ts:
            ctf[t] = ctf.get(t, 0) + 1
    total, v, a = sum(ctf.values()), len(ctf), 0.5
    for d, ts in rows:
        h = -sum(math.log((ctf[t] + a) / (total + a * v)) for t in ts) / len(ts)
        assert got[d] == (len(ts), round(h, 9)), d
    # frozen LM: score against half the corpus's counts; an OOV-only doc
    # gets the alpha-mass logp, not a crash
    half = docs.filter(F.col("doc_id") % 2 == 0)
    from bertopic_spark.operators.postings import doc_term_counts
    lm = (doc_term_counts(half, "text", ["doc_id"])
          .groupBy("term").agg(F.sum("tf").alias("tf")))
    oov = spark.createDataFrame([(999999, "zzqx qqzx zzqx")],
                                "doc_id long, text string")
    out = lm_perplexity(docs.unionByName(oov.withColumn(
        "lang", F.lit("en")).withColumn("source", F.lit("s"))
        .withColumn("n_chars", F.lit(14)).select(docs.columns)),
        lm_counts=lm).filter(F.col("doc_id") == 999999).collect()
    assert len(out) == 1 and out[0].perplexity > 0


def test_langid_ngram_brute_and_frozen_train(documents_df):
    import math

    from pyspark.sql import functions as F

    from bertopic_spark.operators.textstats import langid_ngram

    n, a = 3, 0.5
    got = {r.doc_id: (r.pred_lang, r.score)
           for r in langid_ngram(documents_df, n=n, alpha=a).collect()}
    rows = [(r.doc_id, r.lang, (r.text or "").lower())
            for r in documents_df.select("doc_id", "lang", "text").collect()]

    def grams(t):
        return [t[i:i + n] for i in range(len(t) - n + 1)]

    tg, tot, vocab = {}, {}, set()
    for _, lab, t in rows:
        for g in grams(t):
            tg[(lab, g)] = tg.get((lab, g), 0) + 1
            tot[lab] = tot.get(lab, 0) + 1
            vocab.add(g)
    v, langs = len(vocab), sorted(tot)
    for d, _, t in rows:
        sc = {lab: sum(math.log((tg.get((lab, g), 0) + a) / (tot[lab] + a * v))
                       for g in grams(t)) for lab in langs}
        best = sorted(langs, key=lambda lab: (-sc[lab], lab))[0]
        assert got[d][0] == best, (d, got[d], sc)
        assert abs(got[d][1] - sc[best]) < 1e-5, (d, got[d][1], sc[best])
    # frozen train relation: a model trained without 'zh' never predicts it
    tr = documents_df.filter(F.col("lang") != "zh")
    preds = {r.pred_lang
             for r in langid_ngram(documents_df, train=tr).collect()}
    assert preds and "zh" not in preds


def test_domain_mix_plan_temperature(spark):
    from bertopic_spark.operators.pipeline import domain_mix_plan

    df = spark.createDataFrame(
        [(i, "big", 100) for i in range(9)] + [(100, "small", 100)],
        "doc_id long, lang string, n_chars long")
    # T=1: natural proportions (big 0.9 / small 0.1)
    p1 = {r["domain"]: r for r in
          domain_mix_plan(df, "lang", "n_chars", budget=500.0,
                          temperature=1.0).collect()}
    assert p1["big"]["p"] == pytest.approx(0.9)
    assert p1["big"]["target_tokens"] == pytest.approx(450.0)
    # T=0: uniform p, but target capped at the domain's own size
    p0 = {r["domain"]: r for r in
          domain_mix_plan(df, "lang", "n_chars", budget=500.0,
                          temperature=0.0).collect()}
    assert p0["big"]["p"] == pytest.approx(0.5)
    assert p0["small"]["target_tokens"] == pytest.approx(100.0)  # cap: 250→100
    # T<1 upweights the small domain vs natural share
    p7 = {r["domain"]: r["p"] for r in
          domain_mix_plan(df, "lang", "n_chars", budget=500.0,
                          temperature=0.7).collect()}
    assert p7["small"] > 0.1 and p7["big"] < 0.9


def test_domain_mix_sample_budget_and_determinism(spark):
    from pyspark.sql import functions as F
    from bertopic_spark.operators.pipeline import (domain_mix_plan,
                                                   domain_mix_sample)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    plan = domain_mix_plan(docs, "lang", "n_chars", budget=0.4 * total,
                           temperature=0.7)
    kept = domain_mix_sample(docs, plan, "lang", "n_chars", "doc_id")
    targets = {r["domain"]: r["target_tokens"] for r in plan.collect()}
    got = {r["lang"]: r for r in
           kept.groupBy("lang").agg(F.sum("n_tokens").alias("t"),
                                    F.count("*").alias("n")).collect()}
    assert got  # corpus-backed fixture must select something
    for lang, r in got.items():
        assert r["t"] <= targets[lang] + 1e-9
    # deterministic under repartitioning
    kept2 = domain_mix_sample(docs.repartition(7), plan, "lang",
                              "n_chars", "doc_id")
    assert {tuple(r) for r in kept.collect()} == \
           {tuple(r) for r in kept2.collect()}


def _ref_bigram_ce(doc_tokens, train_docs, alpha=0.5, kappa=0.4):
    """In-test stupid-backoff reference (Brants 2007 + Lidstone unigrams)."""
    import math
    from collections import Counter
    uni, bg = Counter(), Counter()
    for t in train_docs:
        uni.update(t)
        bg.update(zip(t, t[1:]))
    n_total, v = sum(uni.values()), len(uni)

    def p_uni(w):
        return (uni.get(w, 0) + alpha) / (n_total + alpha * v)

    lp = math.log(p_uni(doc_tokens[0]))
    for a, b in zip(doc_tokens, doc_tokens[1:]):
        if (a, b) in bg:
            lp += math.log(bg[(a, b)] / uni[a])
        else:
            lp += math.log(kappa * p_uni(b))
    return -lp / len(doc_tokens)


def test_bigram_lm_perplexity_matches_reference(spark):
    from bertopic_spark.operators.textstats import bigram_lm_perplexity
    from bertopic_spark.tokenizer import tokenize_one

    train_texts = ["alpha beta alpha beta gamma", "alpha beta delta",
                   "gamma gamma alpha"]
    score_texts = [
        "alpha beta gamma",       # all bigrams seen
        "beta alpha",             # unseen bigram, seen unigrams (backoff)
        "alpha zulu beta",        # OOV unigram
        "zulu",                   # single OOV token
        "alpha",                  # single seen token
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string")
    score = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score_texts)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bigram_lm_perplexity(score, train_df=train).collect()}
    train_toks = [tokenize_one(t, "ascii_code") for t in train_texts]
    import math
    for i, t in enumerate(score_texts):
        toks = tokenize_one(t, "ascii_code")
        want = _ref_bigram_ce(toks, train_toks)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["cross_entropy"] == pytest.approx(want, abs=1e-12)
        assert got[i]["perplexity"] == pytest.approx(math.exp(want), rel=1e-12)
    # seen-bigram doc is more probable than the OOV doc under this LM
    assert got[0]["cross_entropy"] < got[2]["cross_entropy"]


def test_bigram_lm_self_trained_no_backoff(spark, documents_df):
    """Self-trained LM: every scored bigram was counted, so every doc's
    bigram term uses the MLE branch; cross-entropy is finite and the
    relation covers every non-empty doc."""
    from bertopic_spark.operators.textstats import bigram_lm_perplexity

    out = bigram_lm_perplexity(documents_df).collect()
    n_docs = documents_df.count()
    assert len(out) == n_docs and out  # corpus-backed, non-empty
    for r in out:
        assert r["cross_entropy"] > 0 and r["perplexity"] > 1


def test_perplexity_buckets_equal_counts(spark):
    from bertopic_spark.operators.textstats import perplexity_buckets
    rows = [(i, " ".join(["common"] * 5 + [f"rare{i}"] * (i % 4)))
            for i in range(30)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(d, "text", "doc_id", "ascii_code",
                             n_buckets=3).collect()
    from collections import Counter
    c = Counter(r["bucket"] for r in out)
    assert c == {"head": 10, "middle": 10, "tail": 10}
    # head = lowest perplexity stratum
    by_b = {}
    for r in out:
        by_b.setdefault(r["bucket"], []).append(r["perplexity"])
    assert max(by_b["head"]) <= min(by_b["middle"]) + 1e-12
    assert max(by_b["middle"]) <= min(by_b["tail"]) + 1e-12


def test_perplexity_buckets_validation(spark):
    import pytest as _pt
    from bertopic_spark.operators.textstats import perplexity_buckets
    d = spark.createDataFrame([(0, "aa bb")], "doc_id long, text string")
    with _pt.raises(ValueError):
        perplexity_buckets(d, n_buckets=1)
    with _pt.raises(ValueError):
        perplexity_buckets(d, n_buckets=3, labels=("a", "b"))


def test_categorize_text_templates(spark):
    from bertopic_spark.operators.textstats import categorize_text
    rows = [
        (0, "error code 500 on host7"),
        (1, "error code 404 on host3"),
        (2, "error code 500 on host7"),
        (3, "user alice logged in"),
        (4, "user bob logged in"),
        (5, "disk full"),
    ]
    d = spark.createDataFrame(rows, "event_id long, msg string")
    out = {r["template"]: r["n_docs"]
           for r in categorize_text(d, "msg").collect()}
    assert out == {"error code * on *": 3,
                   "user * logged in": 2,
                   "disk full": 1}


def test_categorize_text_null_and_whitespace(spark):
    from bertopic_spark.operators.textstats import categorize_text
    d = spark.createDataFrame(
        [(0, None), (1, "  a  b "), (2, "a c")],
        "event_id long, msg string")
    out = {r["template"]: r["n_docs"]
           for r in categorize_text(d, "msg").collect()}
    assert out == {"a *": 2}
