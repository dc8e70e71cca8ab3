"""The X1 embedding-adapter seam, end-to-end as a job (VERDICT r3 #10):
jobs/embed_ingest.py wires an external (id, vector) parquet through
fit(embeddings=) → visualize_documents and semdedup, on the shipped
testdata embeddings at sf0.01."""

import json
import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_embed_ingest_job_runs(spark, tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "jobs"))
    import embed_ingest

    rc = embed_ingest.main([
        "--docs", f"{SF_DIR}/documents.parquet",
        "--embeddings", f"{SF_DIR}/embeddings.parquet",
        "--output", str(tmp_path), "--tau", "0.7",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docmap_rows"] == 500
    docmap = spark.read.parquet(f"{tmp_path}/docmap")
    assert {"doc_id", "x", "y", "lang", "label"} <= set(docmap.columns)
    # coordinates are real numbers, labels joined for every doc
    assert docmap.filter("x IS NULL OR y IS NULL").count() == 0
    dd = spark.read.parquet(f"{tmp_path}/semdedup")
    assert {"component", "keep_id", "n_members"} <= set(dd.columns)
