"""Crash-resume soak at sf0.1 (data scale, not toy scale): kill a running
streaming query mid-stream and restart it from the checkpoint through the
config-driven source/sink entry (sources/streams.py), asserting the resumed
run's TOTAL output is byte-identical to an uninterrupted run — the
exactly-once proof for both a stateless-dedup pipeline
(stream_corpus_filter) and a per-key stateful kernel
(apply_stream_one_step_ahead, ring-buffer + residual-moment state in the
state store).

Determinism discipline: the input is materialized as ~10 parquet slice
files, each internally ordered, and BOTH runs process with
maxFilesPerTrigger=1 (Trigger.AvailableNow honors the rate limit), so
micro-batch boundaries are file boundaries in both the reference and the
crashed+resumed run; the stateful kernel additionally gets at most one row
per (key, ts) so no ordering tie can differ between runs. The output
parquet is read back through the sink's _spark_metadata commit log, which
is what makes files from an aborted in-flight batch invisible."""
from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from beymani_spark.sources import load_table, streams

SF = "/root/testdata/sf0.1"


def _write_slices(df, src_dir, slice_expr, n_slices, order_cols):
    for i in range(n_slices):
        (
            df.filter(slice_expr == i)
            .coalesce(1)
            .sortWithinPartitions(*order_cols)
            .write.mode("append")
            .parquet(src_dir)
        )


def _run_available_now(spark, src_conf, transform, out, ck):
    stream = transform(streams.open_stream(spark, src_conf))
    q = streams.start_sink(
        stream,
        {"format": "parquet", "path": out, "checkpoint": ck, "trigger": "availableNow"},
    )
    q.awaitTermination(300)


def _run_crash_then_resume(spark, src_conf, transform, out, ck):
    """Start with a free-running trigger, stop as soon as at least one batch
    has committed (interrupting whatever batch is then in flight), then
    resume from the checkpoint to completion."""
    stream = transform(streams.open_stream(spark, src_conf))
    q = streams.start_sink(
        stream,
        {"format": "parquet", "path": out, "checkpoint": ck, "trigger": "0 seconds"},
    )
    deadline = time.time() + 120
    progressed = 0
    while time.time() < deadline:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if done:
            progressed = len(done)
            break
        time.sleep(0.05)
    q.stop()
    q.awaitTermination(60)
    assert progressed >= 1, "crash run never committed a batch before the kill"
    # the kill must land mid-stream, not after completion: some input remains
    interim = spark.read.parquet(out)
    _run_available_now(spark, src_conf, transform, out, ck)
    return interim


def _collect_sorted(spark, path, key_cols):
    return (
        spark.read.parquet(path)
        .orderBy(*key_cols)
        .toPandas()
        .reset_index(drop=True)
    )


@pytest.mark.slow  # multi-minute sweep: excluded from the default run (see pyproject)
def test_stream_corpus_filter_crash_resume_parity_sf01(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    _write_slices(docs, src, F.col("doc_id") % 10, 10, ["doc_id"])

    conf = {
        "format": "file",
        "path": src,
        "schema": "doc_id long, text string",
        "maxFilesPerTrigger": "1",
    }

    def job(stream):
        from beymani_spark.streaming.jobs import stream_corpus_filter

        return stream_corpus_filter(stream, quality_min=0.6)

    ref_out, ref_ck = str(tmp_path / "ref_out"), str(tmp_path / "ref_ck")
    _run_available_now(spark, conf, job, ref_out, ref_ck)
    ref = _collect_sorted(spark, ref_out, ["doc_id"])
    assert len(ref) > 0

    cr_out, cr_ck = str(tmp_path / "cr_out"), str(tmp_path / "cr_ck")
    interim = _run_crash_then_resume(spark, conf, job, cr_out, cr_ck)
    assert interim.count() < len(ref), "kill landed after the stream finished"
    got = _collect_sorted(spark, cr_out, ["doc_id"])

    assert list(got.columns) == list(ref.columns)
    assert got["doc_id"].is_unique, "resume re-emitted documents (exactly-once broken)"
    assert got.equals(ref), "crash+resume output differs from uninterrupted run"


@pytest.mark.slow  # multi-minute sweep: excluded from the default run (see pyproject)
def test_stream_one_step_ahead_crash_resume_parity_sf01(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load_table(spark, SF, "events")
    # at most one row per (event_type, ts) so no ordering tie can differ
    # between the two runs' batch compositions
    first = (
        ev.groupBy("event_type", "ts")
        .agg(F.min("event_id").alias("event_id"), F.first("value").alias("value"))
        .select("event_type", "ts", "value")
    )
    # ts-decile slices: batch k carries a contiguous ts range for every key
    from pyspark.sql import Window

    sliced = first.withColumn(
        "_slice", F.ntile(10).over(Window.orderBy("ts")) - 1
    )
    for i in range(10):
        (
            sliced.filter(F.col("_slice") == i)
            .drop("_slice")
            .coalesce(1)
            .sortWithinPartitions("event_type", "ts")
            .write.mode("append")
            .parquet(src)
        )

    conf = {
        "format": "file",
        "path": src,
        "schema": "event_type string, ts timestamp, value double",
        "maxFilesPerTrigger": "1",
    }

    def job(stream):
        from beymani_spark.streaming.jobs import apply_stream_one_step_ahead

        return apply_stream_one_step_ahead(
            stream, ["event_type"], "ts", "value", window=8, threshold=3.0
        )

    ref_out, ref_ck = str(tmp_path / "ref_out"), str(tmp_path / "ref_ck")
    _run_available_now(spark, conf, job, ref_out, ref_ck)
    ref = _collect_sorted(spark, ref_out, ["event_type", "ts"])
    assert len(ref) > 0

    cr_out, cr_ck = str(tmp_path / "cr_out"), str(tmp_path / "cr_ck")
    interim = _run_crash_then_resume(spark, conf, job, cr_out, cr_ck)
    assert interim.count() < len(ref), "kill landed after the stream finished"
    got = _collect_sorted(spark, cr_out, ["event_type", "ts"])

    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref), "resume dropped or re-emitted rows"
    # full-value parity including the stateful columns: identical predictions,
    # scores and labels row for row — the state store resumed exactly
    assert got.equals(ref), "stateful resume diverged from uninterrupted run"
