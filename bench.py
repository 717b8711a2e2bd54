#!/usr/bin/env python
"""Benchmark harness (driver contract): runs every registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (computes all columns, no
driver collect) so the measured time is the full distributed plan.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from beymani_spark.plans import QUERIES
    from beymani_spark.sources import get_spark

    spark = get_spark("beymani-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up outside the measured region: parquet footers for every table,
    # one codegen pipeline, and one Arrow/pandas stage (the first
    # applyInPandas in a session pays ~1.5-2 s of python-worker spin-up
    # across 32 workers — that is session cost, not query cost).
    from pyspark.sql import functions as F

    from beymani_spark.sources import TABLES, load_table

    for t in TABLES:
        # full scan, not just footers: the first query over each table
        # otherwise pays the cold page-cache read that every later query
        # gets for free — session cost, not plan cost
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    ev = load_table(spark, sf_dir, "events")
    ev.groupBy("event_type").count().write.format("noop").mode("overwrite").save()
    warm = (
        spark.range(256)
        .repartition(32, "id")
        .groupBy("id")
        .applyInPandas(lambda pdf: pdf, schema="id long")
    )
    warm.write.format("noop").mode("overwrite").save()

    def run_once(q) -> float:
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        # queries are measured independently: drop any caches a builder
        # persisted so later runs neither reuse them nor inherit the
        # storage pressure (outside the timed region)
        spark.catalog.clearCache()
        return elapsed

    # Cold pass (headline, comparable to BASELINE.md r1-r3) + warm repeats:
    # the FIRST execution of a query pays session costs the plan does not
    # (python-worker spin-up for its UDF shape, codegen JIT, page cache),
    # which made r2/r3 cross-round comparisons noisy — the warm time is
    # the plan-cost signal, the cold time is what a one-shot user sees.
    # Default is ONE warm repeat so an unattended capture stays ~2x the
    # historical runtime (the payload records warm_runs); set
    # SPARK_GRAFT_WARM_RUNS=3 for a median-of-3 profiling run (the
    # BASELINE.md §7 record) or 0 to restore the r1-r3 cold-only behavior.
    warm_runs = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "1"))
    times: dict[str, float] = {}
    warm_times: dict[str, float] = {}
    for name, q in QUERIES.items():
        times[name] = round(run_once(q), 3)
        if warm_runs > 0:
            reps = sorted(run_once(q) for _ in range(warm_runs))
            warm_times[name] = round(reps[len(reps) // 2], 3)

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if warm_times:
        payload["value_warm"] = round(sum(warm_times.values()), 3)
        payload["queries_warm"] = warm_times
        payload["warm_runs"] = warm_runs
    line = json.dumps(payload)
    print(line)
    # also persist the summary: the driver captures stdout's tail, which
    # truncated the r2 line mid-JSON (BENCH_r02 parsed: null) — the file is
    # the recoverable record. The filename is ROUND-STAMPED
    # (bench_out_rNN.json): un-stamped bench_out.json was overwritten twice
    # by later ad-hoc/driver captures, silently invalidating the committed
    # record BASELINE.md cites. Round = SPARK_GRAFT_ROUND if set, else
    # 1 + the highest round with a recorded CORRECTNESS_r*.json (so every
    # capture taken while building round N lands in bench_out_rNN.json and
    # earlier rounds' committed records are never touched again).
    repo = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        import glob

        recorded = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
            if (m := re.search(r"_r(\d+)\.json$", p))
        ]
        rnd = str(max(recorded) + 1 if recorded else 1)
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(repo, f"bench_out_r{int(rnd):02d}.json"),
    )
    # only the canonical sf0.1 run owns the stamped record: quick smoke
    # drives at other SFs (e.g. the verify recipe's sf0.01 pass) print the
    # JSON line but must not overwrite the committed sf0.1 capture
    if sf == 0.1 or "SPARK_GRAFT_BENCH_OUT" in os.environ:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
