"""The S5 import story end-to-end as a job (VERDICT r4 #8):
jobs/import_reference.py loads a reference-format save dir (safetensors
CSR + vocab + sizes), writes topic_info immediately, then attach_corpus
restores topics_over_time — all on a fixture exported by the same helper
the reference-import unit tests use."""

import json
import os
import sys

from pyspark.sql import functions as F

from bertopic_spark.model import BERTopicSpark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_import_reference_job_runs(spark, tmp_path, capsys):
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import import_reference
    from test_reference_import import DOCS, _export_reference_dir

    # fixture: native fit → reference-format export + the fitted corpus
    df = (spark.createDataFrame(DOCS, "doc_id long, topic long, text string")
          .withColumn("ts", (F.col("doc_id") * 3600).cast("long")))
    native = BERTopicSpark(class_cols=["topic"]).fit(df, "text", "doc_id")
    model_dir = str(tmp_path / "saved")
    os.makedirs(model_dir)
    _export_reference_dir(native, model_dir)
    docs_pq = str(tmp_path / "docs.parquet")
    df.write.parquet(docs_pq)

    out_dir = str(tmp_path / "out")
    rc = import_reference.main([
        "--model-dir", model_dir, "--docs", docs_pq,
        "--output", out_dir, "--nr-bins", "3",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["topics"] == 3
    assert payload["over_time_rows"] > 0

    info = spark.read.parquet(f"{out_dir}/topic_info")
    assert {"topic", "count"} <= set(info.columns)
    # the imported-then-attached model's per-slice representations equal
    # the native model's on the same corpus (frozen idf; scores import at
    # f32 so ranks — not raw floats — are the stable contract)
    ot = spark.read.parquet(f"{out_dir}/over_time")
    nat = native.topics_over_time("ts", nr_bins=3)
    cols = ["ts_bin", "topic", "term", "rank"]
    got = {tuple(r) for r in ot.select(*cols).collect()}
    want = {tuple(r) for r in nat.select(*cols).collect()}
    assert got == want
