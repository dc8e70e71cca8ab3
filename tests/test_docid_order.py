"""Docid-assignment layout experiment (jobs/docid_order_ab.py): natural-
key-sorted ids (the engine default, index/segments.assign_doc_ids over
(repo, path, commit)) must (a) produce a SMALLER delta+varint index than
a random permutation — the URL-sort effect (Silvestri, ECIR 2007) applied
to code repos — and (b) be pure layout: decoded postings reattached to
their natural keys are identical under any id assignment."""

import pytest

from jobs.docid_order_ab import build_variant


@pytest.fixture(scope="module")
def variants(spark):
    from bertopic_spark.corpus import load_corpus

    # ordering matters in the rare-term regime: per-repo vocabulary
    # locality + a Heaps-law pool (20×N) so most terms have N/df > 127
    # (the IID / dense-pool controls in jobs/docid_order_ab.py show
    # ratio ≈ 1 by design — the varint staircase sits at its 1-byte
    # floor when every gap is < 128). span 64 so the 500-doc fixture
    # spans multiple blocks per term.
    corpus = load_corpus(spark, n_files=500, locality=0.6,
                         pool_size=10000).cache()
    a = build_variant(corpus, "sorted", span=64)
    b = build_variant(corpus, "shuffled", span=64)
    corpus.unpersist()
    return a, b


def test_sorted_ids_compress_better(variants):
    a, b = variants
    assert a["postings"] == b["postings"]  # same content, different layout
    # varint stream (header + id deltas + tfs): tf bytes are permutation-
    # invariant, so any difference is the id-gap effect — sorted must win
    assert a["varint_bytes"] < b["varint_bytes"], (a, b)
    assert a["payload_bytes"] < b["payload_bytes"]
    # clustered ids touch no more (term, blk) ranges than scattered ids
    assert a["n_blocks"] <= b["n_blocks"]


def test_id_assignment_is_pure_layout(variants):
    a, b = variants
    # (repo, path, commit, term, tf, score) multiset fingerprints equal:
    # the index CONTENT does not depend on the id permutation
    assert a["fingerprint"] == b["fingerprint"]
