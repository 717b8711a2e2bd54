#!/usr/bin/env python
"""Profile registry queries: capture explain("formatted") and noop-sink
timings (guide §1.4) for the optimization record.

Usage:
  python tools/profile_query.py NAME [NAME...] [--tag before|after] [--reps N]
  python tools/profile_query.py --all --reps 1        # times only, no plans

Writes plans/r10/<name>_<tag>.txt when --tag is given and prints one
"name cold warm..." line per query. SPARK_GRAFT_SF_DIR picks the data dir
(default /root/testdata/sf0.1).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default=None, help="write plans/r10/<name>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from beymani_spark.plans import QUERIES
    from beymani_spark.sources import TABLES, get_spark, load_table

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    names = list(QUERIES) if args.all else args.names
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.environ.get(
        "SPARK_GRAFT_PLAN_DIR", os.path.join(repo, "plans", "r11")
    )
    os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        q = QUERIES[name]
        if args.tag:
            df = q.builder(spark, sf_dir)
            jvm = spark.sparkContext._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        times = []
        jtracker = spark.sparkContext.statusTracker()
        jobs0 = stages0 = 0
        for rep in range(max(1, args.reps)):
            before = set(jtracker.getJobIdsForGroup(None))
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            if rep == max(1, args.reps) - 1:
                ids = [
                    j
                    for j in jtracker.getJobIdsForGroup(None)
                    if j not in before
                ]
                jobs0 = len(ids)
                for j in ids:
                    try:
                        info = jtracker.getJobInfo(j)
                        stages0 += len(list(info.stageIds))
                    except Exception:
                        pass
        print(
            name,
            " ".join(f"{t:.3f}" for t in times),
            f"jobs={jobs0} stages={stages0}",
            flush=True,
        )


if __name__ == "__main__":
    main()
