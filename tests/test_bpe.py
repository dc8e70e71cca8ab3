"""Distributed BPE training vs an in-test pure-Python reference.

The reference is the textbook greedy loop (Sennrich et al. 2016): count
adjacent symbol pairs over the word-frequency table, merge the argmax pair
left-to-right non-overlapping, repeat. Ties break (freq desc, left, right)
in both implementations.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bpe import (
    EOW, bpe_doc_subword_counts, bpe_segment_words, bpe_train, bpe_vocab,
    word_freqs)
from bertopic_spark.tokenizer import tokenize_one


def _ref_bpe(word_cnt: dict[str, int], n_merges: int,
             min_pair_count: int = 2):
    """Reference trainer over (word -> count); returns merge list and the
    final word -> symbol-tuple segmentation."""
    seqs = {w: tuple(w) + (EOW,) for w in word_cnt}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += word_cnt[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((step, l, r, c))
        new = {}
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        seqs = new
    return merges, seqs


@pytest.fixture(scope="module")
def tiny_docs(spark):
    # Sennrich's running example, as documents (tokens need >= 2 chars)
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(i, " ".join(words[i::4])) for i in range(4)], "doc_id long, text string")


def _word_counts(df) -> dict[str, int]:
    c = Counter()
    for row in df.select("text").collect():
        c.update(tokenize_one(row["text"], "ascii_code"))
    return dict(c)


def test_bpe_train_matches_reference_tiny(spark, tiny_docs):
    got = [(r["step"], r["left"], r["right"], r["freq"])
           for r in bpe_train(tiny_docs, "text", n_merges=8).collect()]
    want, _ = _ref_bpe(_word_counts(tiny_docs), 8)
    assert got == want
    assert got[0][1:3] == ("e", "s")  # the textbook first merge


def test_bpe_train_matches_reference_real_vocab(spark, documents_df):
    got = [(r["step"], r["left"], r["right"], r["freq"])
           for r in bpe_train(documents_df, "text", n_merges=5).collect()]
    want, _ = _ref_bpe(_word_counts(documents_df), 5)
    assert got == want and len(got) == 5


def test_bpe_segmentation_roundtrip_and_monotonicity(spark, tiny_docs):
    merges_df, state = bpe_train(tiny_docs, "text", n_merges=8,
                                 return_state=True)
    merges = [(r["left"], r["right"]) for r in merges_df.collect()]
    _, ref_seqs = _ref_bpe(_word_counts(tiny_docs), 8)

    words = spark.createDataFrame([(w,) for w in ref_seqs], "word string")
    seg = {r["word"]: r["s"] for r in
           bpe_segment_words(words, merges).collect()}
    for w, syms in ref_seqs.items():
        assert seg[w] == " ".join(syms)
        # symbols concatenate back to the word + terminal marker
        assert seg[w].replace(" ", "") == w + EOW

    # every merge strictly shrinks total symbol count on the words it hits
    prev = None
    for k in range(len(merges) + 1):
        tot = (bpe_segment_words(words, merges[:k])
               .agg(F.sum("n_subwords")).collect()[0][0])
        if prev is not None:
            assert tot < prev
        prev = tot
    state.unpersist()


def test_bpe_doc_subword_counts_budget_identity(spark, tiny_docs):
    """0 merges: n_subwords = total chars + one </w> per token; with merges
    it shrinks but never below n_tokens."""
    zero = {r["doc_id"]: (r["n_tokens"], r["n_subwords"])
            for r in bpe_doc_subword_counts(tiny_docs, [], "text").collect()}
    for row in tiny_docs.collect():
        toks = tokenize_one(row["text"], "ascii_code")
        nt, ns = zero[row["doc_id"]]
        assert nt == len(toks) and ns == sum(len(t) + 1 for t in toks)

    merges = [(r["left"], r["right"]) for r in
              bpe_train(tiny_docs, "text", n_merges=8).collect()]
    merged = {r["doc_id"]: r["n_subwords"] for r in
              bpe_doc_subword_counts(tiny_docs, merges, "text").collect()}
    for d, (nt, ns) in zero.items():
        assert nt <= merged[d] < ns


def test_bpe_vocab_mass_conservation(spark, tiny_docs):
    """Total symbol mass in the vocab equals sum(cnt * n_symbols) over
    words, and the learned multi-char symbols appear in it."""
    merges_df, state = bpe_train(tiny_docs, "text", n_merges=8,
                                 return_state=True)
    v = {r["symbol"]: r["freq"] for r in bpe_vocab(state).collect()}
    wf = {r["word"]: r["cnt"] for r in
          word_freqs(tiny_docs, "text").collect()}
    _, ref_seqs = _ref_bpe(_word_counts(tiny_docs), 8)
    want = Counter()
    for w, syms in ref_seqs.items():
        for s in syms:
            want[s] += wf[w]
    assert v == dict(want)
    assert any(len(s.replace(EOW, "")) > 1 for s in v)
    state.unpersist()
