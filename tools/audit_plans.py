#!/usr/bin/env python
"""Structural audit of every registry query's physical plan.

For each query: real Exchange count, Python-boundary node count
(MapInPandas / FlatMapCoGroupsInPandas / ArrowEvalPython / BatchEvalPython),
join strategies, InMemoryTableScan count, and per-table parquet scan counts
(a table scanned 3+ times in one plan = duplicated lineage, the
re-computation smell the lof fix removed). Prints a TSV sorted by a
duplication score. Plan construction only — builders that fit models still
run their fit jobs, but nothing else executes.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from beymani_spark.plans import QUERIES
    from beymani_spark.sources import get_spark

    spark = get_spark("audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    names = sys.argv[1:] or list(QUERIES)
    rows = []
    for name in names:
        try:
            df = QUERIES[name].builder(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1, -1, -1, -1, "", f"ERROR {exc}"))
            spark.catalog.clearCache()
            continue
        spark.catalog.clearCache()
        ops = re.findall(r"^\((\d+)\) ([A-Za-z]+)", plan, re.M)
        opnames = [o for _, o in ops]
        ex = opnames.count("Exchange")
        py = sum(
            opnames.count(o)
            for o in (
                "MapInPandas",
                "FlatMapCoGroupsInPandas",
                "FlatMapGroupsInPandas",
                "ArrowEvalPython",
                "BatchEvalPython",
            )
        )
        inmem = opnames.count("InMemoryTableScan")
        smj = opnames.count("SortMergeJoin") + opnames.count("ShuffledHashJoin")
        scans = re.findall(r"Location: InMemoryFileIndex \[[^\]]*?([a-z_]+)\.parquet", plan)
        from collections import Counter

        sc = Counter(scans)
        dup_scans = sum(c - 1 for c in sc.values() if c > 1)
        scan_str = ",".join(f"{t}x{c}" for t, c in sorted(sc.items()) if c > 1)
        rows.append((name, ex, py, smj, inmem, scan_str, f"dup={dup_scans}"))
    rows.sort(key=lambda r: -(r[1] + 2 * r[2]))
    print("query\tex\tpy\tsmj\tinmem\tdup_scans\tnote")
    for r in rows:
        print("\t".join(str(x) for x in r))


if __name__ == "__main__":
    main()
