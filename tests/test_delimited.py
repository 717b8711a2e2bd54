from __future__ import annotations

import glob
import shutil
import tempfile

from beymani_spark.sources.delimited import read_delimited, write_tagged


def test_delimited_roundtrip(spark):
    from pyspark.sql import functions as F

    src = tempfile.mkdtemp(prefix="beymani_csv_")
    out = tempfile.mkdtemp(prefix="beymani_out_")
    try:
        spark.createDataFrame(
            [("s1", 100, 42.5), ("s2", 200, 7.25)], "server string, ts long, usage double"
        ).select(F.concat_ws(",", "server", "ts", "usage").alias("value")).coalesce(
            1
        ).write.mode("overwrite").text(src)

        df = read_delimited(spark, src, names=["server", "ts", "usage"])
        assert df.columns == ["server", "ts", "usage"]
        assert df.count() == 2

        scored = df.withColumn("score", F.col("usage").cast("double") / 10).withColumn(
            "label", F.lit("N")
        )
        write_tagged(scored, out, precision=3)
        lines = []
        for f in glob.glob(out + "/part-*"):
            lines += open(f).read().splitlines()
        assert sorted(lines) == ["s1,100,42.5,4.250,N", "s2,200,7.25,0.725,N"]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_write_tagged_large_scores_have_no_grouping_separators(spark):
    """Scores >= 1000 must render as plain %.3f — a locale grouping comma
    would corrupt the comma-delimited line itself."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="beymani_out_")
    try:
        scored = spark.createDataFrame(
            [("s1", 1234.5678)], "server string, score double"
        ).withColumn("label", F.lit("O"))
        write_tagged(scored, out, precision=3)
        lines = []
        for f in glob.glob(out + "/part-*"):
            lines += open(f).read().splitlines()
        assert lines == ["s1,1234.568,O"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_jsonl_round_trip_and_quarantine(spark):
    import json as _json
    import os
    import shutil
    import tempfile

    from beymani_spark.sources import load_table
    from beymani_spark.sources.jsonl import (
        corrupt_lines,
        read_jsonl,
        valid_rows,
        write_jsonl,
    )

    src = tempfile.mkdtemp(prefix="beymani_jsonl_")
    out = tempfile.mkdtemp(prefix="beymani_jsonl_out_")
    try:
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        write_jsonl(docs.select("doc_id", "text", "lang"), out)
        back = read_jsonl(spark, out)
        assert corrupt_lines(back).count() == 0
        got = valid_rows(back)
        assert got.count() == docs.count()
        assert sorted(got.columns) == ["doc_id", "lang", "text"]
        a = {r.doc_id: (r.text, r.lang) for r in got.collect()}
        b = {r.doc_id: (r.text, r.lang) for r in docs.select("doc_id", "text", "lang").collect()}
        assert a == b

        # malformed lines are quarantined, not fatal
        with open(os.path.join(src, "part-0.jsonl"), "w") as f:
            f.write(_json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}) + "\n")
            f.write("{this is not json\n")
            f.write(_json.dumps({"doc_id": 2, "text": "also ok", "lang": "es"}) + "\n")
        mixed = read_jsonl(spark, src, schema="doc_id long, text string, lang string")
        assert valid_rows(mixed).count() == 2
        assert corrupt_lines(mixed).count() == 1
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_jsonl_multi_file_schema_sampling(spark):
    """sample_files > 1 must pass the sample as ONE list (json()'s second
    positional parameter is the schema, so json(*paths) misparses)."""
    import json as _json
    import os
    import shutil
    import tempfile

    from beymani_spark.sources.jsonl import read_jsonl, valid_rows

    src = tempfile.mkdtemp(prefix="beymani_jsonl_multi_")
    try:
        with open(os.path.join(src, "part-0.jsonl"), "w") as f:
            f.write(_json.dumps({"doc_id": 1, "text": "one"}) + "\n")
        with open(os.path.join(src, "part-1.jsonl"), "w") as f:
            # second file carries a field the first lacks; sampling both
            # files must widen the schema to include it
            f.write(_json.dumps({"doc_id": 2, "text": "two", "lang": "es"}) + "\n")
        back = read_jsonl(spark, src, sample_files=2)
        assert "lang" in back.columns
        assert valid_rows(back).count() == 2
    finally:
        shutil.rmtree(src, ignore_errors=True)
