#!/usr/bin/env python
"""10x scaling capture for the heavy-tail queries (BASELINE.md §8).

The sf0.1 bench is overhead-dominated (~0.3-0.8 s/query floor), so it can
no longer distinguish plan quality for sub-second queries. This harness
measures how the EXPENSIVE queries scale with data: it materializes a 10x
blow-up of the four tables the heavy tail reads (documents, embeddings,
events, lineitem), times each query at sf0.1 and at 10x, and reports the
warm-median ratio. A sound distributed plan on fixed local[32] cores
should scale ~linearly in rows (ratio ~<= 12-13 with log factors and
fixed overhead amortization); anything well beyond that is a plan bug —
except the documented O(N^2) brute-force pair paths, which are measured
here ALONGSIDE their sub-quadratic scale-path replacements to prove the
off-ramp works (lof via exact pairs vs lof via LSH-bucketed pairs).

Blow-up semantics (copy k of 10, k=0 verbatim):
- documents: new doc_id range; every token suffixed with 'k<k>' so copies
  are NOT near-duplicates of each other — the near-dup rate (and hence
  LSH candidate volume) stays ~linear in corpus size, mirroring real
  growth instead of manufacturing 10-member duplicate clusters.
- embeddings: new vec_id range; vector components rotated by k positions
  (norms preserved, neighbor structure per copy preserved, cross-copy
  neighbors scrambled).
- events: new event_id/user_id ranges; event_type suffixed — 10x the
  ENTITIES at constant per-entity series length, the shape a 100 TB
  deployment has (per-key kernel memory stays constant).
- lineitem: new l_orderkey range; numeric feature distributions unchanged
  so model fits (kmeans/isolation forest) see the same population.

Writes one JSON line + bench_scale_r<NN>.json (same round-stamp rule as
bench.py). Not part of the per-round driver bench contract — run
explicitly. Env: SPARK_GRAFT_SCALE_COPIES (default 10),
SPARK_GRAFT_SCALE_WARM (default 2), SPARK_GRAFT_SCALE_QUERIES
(comma-separated subset filter).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
# the default dir is keyed to COPIES: materialization skips existing files,
# so a shared dir would silently reuse a DIFFERENT blow-up factor's data
# and mislabel the ratio (a 100-copy run against leftover 10-copy parquet)
SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join(REPO, f".scale{COPIES}")
)
WARM = int(os.environ.get("SPARK_GRAFT_SCALE_WARM", "2"))
OFF = 10_000_000  # id offset per copy — far above any fixture id range

TOKS = "list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\f\\r\\x0B]+'), x -> x <> '')"

#: registry queries in the capture (the heavy tail of BENCH_r04) plus the
#: named scale-path probes defined in _extra_builders
HEAVY = [
    "chunk_dedup",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_corpus",
    "dedup_stats",
    "corpus_build",
    "corpus_build_mixed",
    "corpus_build_incremental",
    "corpus_to_manifest",
    "kmeans_cluster_score",
    "kmeans_mixed",
    "isolation_forest",
    "subsequence_distance",
    "lof",
    "cosine_topk",
    "ann_lsh_topk",
    "embedding_dup_clusters",
    "media_dup_pairs",
    "boilerplate_scrub",
    "dedup_minhash_incremental",
    "topic_mix",
    "perplexity_gate",
    "split_leak_check",
    "semantic_dedup",
    "prototype_prune",
    "tfidf_topk",
    "cdc_chunk_dedup",
    "ngram_novelty",
    "semantic_leak_check",
    "source_similarity",
    "event_gaps",
    "last_touch_attribution",
    "weighted_sample",
    "constraint_audit",
    "shipping_priority",
    "small_quantity_revenue",
    # round-6 additions
    "gopher_quality",
    "domain_cap",
    "pii_pseudonymize",
    "u_shaped_attribution",
    "media_features_png",
    "media_features_jpg",
    # round-7 additions
    "media_dup_pairs_lsh",
    "isolation_forest_merge",
    "dedup_simhash_auto",
    "embedding_dup_clusters_lsh",
    "numeric_profile",
    "source_gram_topk",
    "dedup_corpus_best",
    # round-7 session-2 additions
    "dedup_containment",
    "compression_ratio",
    "quality_fuse",
    "local_supplier_volume",
    "returned_item_revenue",
    "anomaly_score_fuse",
    "quality_fuse_by_lang",
    "media_phash_dup_pairs",
    "media_phash_dup_pairs_c2",
    "audio_dup_pairs",
    "video_phash_dup_pairs",
    # round-8 additions (composite-band forms for the remaining modalities)
    "audio_dup_pairs_c2",
    "video_phash_dup_pairs_c2",
    # round-9 rows for the previously unmeasured round-8 additions
    # (r8 verdict directive #6) + the round-9 markov_global
    "multigram_multivariate",
    "volume_shipping",
    "market_share",
    "customer_order_distribution",
    "large_volume_customers",
    "temperature_mix",
    "embedding_audit",
    "markov_global",
    "top_supplier_revenue",
    "idle_customer_balance",
    "zscore_seasonal_nightday",
    "repeat_mix",
    # round-10 rows for the r9 additions the r9 capture missed
    "corpus_shuffle",
    "forecast_revenue_change",
    "discounted_revenue",
    # round-10 additions
    "curriculum_plan",
    "bm25_topk",
    "hybrid_retrieval",
]


def _doc_sql(k: int) -> str:
    if k == 0:
        return "SELECT * FROM docs0"
    return f"""
SELECT doc_id + {k * OFF} AS doc_id,
       CASE WHEN text IS NULL THEN NULL
            ELSE array_to_string(list_transform({TOKS}, x -> x || 'k{k}'), ' ')
       END AS text,
       lang,
       source || '_k{k}' AS source,
       length(CASE WHEN text IS NULL THEN NULL
              ELSE array_to_string(list_transform({TOKS}, x -> x || 'k{k}'), ' ')
              END) AS n_chars
FROM docs0"""


def _emb_sql(k: int) -> str:
    if k == 0:
        return "SELECT * FROM emb0"
    return f"""
SELECT vec_id + {k * OFF} AS vec_id,
       CAST(list_concat(embedding[{k + 1}:], embedding[1:{k}]) AS FLOAT[]) AS embedding,
       label
FROM emb0"""


def _ev_sql(k: int) -> str:
    if k == 0:
        return "SELECT * FROM ev0"
    return f"""
SELECT event_id + {k * OFF} AS event_id, ts, user_id + {k * OFF} AS user_id,
       event_type || '_k{k}' AS event_type, value, props
FROM ev0"""


def _li_sql(k: int) -> str:
    if k == 0:
        return "SELECT * FROM li0"
    return f"""
SELECT l_orderkey + {k * OFF} AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
       l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM li0"""


def _ord_sql(k: int) -> str:
    # orders blow up WITH lineitem (o_orderkey offsets match _li_sql's) so
    # order-grain joins stay hit; o_custkey is NOT offset — the customer
    # dimension stays fixed while facts grow, the realistic 100 TB shape
    if k == 0:
        return "SELECT * FROM ord0"
    return f"""
SELECT o_orderkey + {k * OFF} AS o_orderkey, o_custkey, o_orderstatus,
       o_totalprice, o_orderdate, o_orderpriority
FROM ord0"""


def ensure_scale_dir() -> None:
    import duckdb
    import shutil

    os.makedirs(SCALE_DIR, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs0 AS SELECT * FROM '{BASE}/documents.parquet'")
    con.execute(f"CREATE VIEW emb0 AS SELECT * FROM '{BASE}/embeddings.parquet'")
    con.execute(f"CREATE VIEW ev0 AS SELECT * FROM '{BASE}/events.parquet'")
    con.execute(f"CREATE VIEW li0 AS SELECT * FROM '{BASE}/lineitem.parquet'")
    con.execute(f"CREATE VIEW ord0 AS SELECT * FROM '{BASE}/orders.parquet'")
    # dimensions stay fixed as facts grow: copy verbatim
    for dim in ("customer", "part", "supplier", "nation", "region"):
        dst = os.path.join(SCALE_DIR, f"{dim}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(BASE, f"{dim}.parquet"), dst)
    for name, gen in (
        ("documents", _doc_sql),
        ("embeddings", _emb_sql),
        ("events", _ev_sql),
        ("lineitem", _li_sql),
        ("orders", _ord_sql),
    ):
        out = os.path.join(SCALE_DIR, f"{name}.parquet")
        if os.path.exists(out):
            continue
        union = "\nUNION ALL\n".join(gen(k) for k in range(COPIES))
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        print(f"built {out}", file=sys.stderr)


def _extra_builders():
    """Scale-path probes that are not registry queries: the sub-quadratic
    replacements for the documented O(N^2) correctness paths, measured so
    the capture shows the off-ramp's scaling, not just the hazard's."""
    from beymani_spark.operators import knn
    from beymani_spark.sources import load_table

    def lof_lsh(spark, d):
        # The LSH scale KNOB: buckets must grow with N. Within-bucket pair
        # volume is sum(b_i^2) ~ N^2/B, so a FIXED plane count degrades to
        # quadratic as data grows (measured here: 8 planes at 10x ran 60x,
        # because the clustered fixture concentrates signatures). Planes
        # scale as log2(N / target_bucket) to hold expected bucket size
        # constant — the same rule a 100 TB deployment applies per
        # partition-of-N, trading per-table recall (amplify with
        # multiprobe/multi-table as in ann_lsh_multitable).
        emb = load_table(spark, d, "embeddings")
        pairs = knn.lsh_pair_distances(emb, "vec_id", "embedding", n_planes="auto")
        return knn.lof(pairs, k=5)

    def semantic_dedup_auto(spark, d):
        # semantic_dedup's scale knob: the registry query's FIXED 8 topics
        # makes within-cluster pair volume ~N^2/8 (the capture shows the
        # hazard); auto topics hold expected cluster size constant so the
        # pair stage scales linearly — the same off-ramp as lof_lsh.
        from beymani_spark.operators import similarity

        emb = load_table(spark, d, "embeddings")
        return similarity.semantic_dedup(
            emb, "vec_id", "embedding", n_topics="auto", tau=0.4
        )

    return {"lof_lsh": lof_lsh, "semantic_dedup_auto": semantic_dedup_auto}


def main() -> None:
    ensure_scale_dir()
    from beymani_spark.plans import QUERIES
    from beymani_spark.sources import get_spark, load_table

    spark = get_spark("beymani-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    names = [n for n in HEAVY if not only or n in only.split(",")]
    builders = {n: QUERIES[n].builder for n in names}
    for n, b in _extra_builders().items():
        if not only or n in only.split(","):
            builders[n] = b

    results: dict[str, dict] = {}
    for scale_name, d in (("sf0.1", BASE), (f"x{COPIES}", SCALE_DIR)):
        # session warm-up, mirroring bench.py: full scan of each table (page
        # cache is session cost, not plan cost) + one Arrow stage
        for t in ("documents", "embeddings", "events", "lineitem"):
            load_table(spark, d, t).write.format("noop").mode("overwrite").save()
        warm = (
            spark.range(256).repartition(32, "id").groupBy("id")
            .applyInPandas(lambda pdf: pdf, schema="id long")
        )
        warm.write.format("noop").mode("overwrite").save()
        for name, builder in builders.items():
            times = []
            for _ in range(1 + WARM):
                t0 = time.perf_counter()
                builder(spark, d).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            warms = sorted(times[1:])
            results.setdefault(name, {})[scale_name] = {
                "cold": round(times[0], 3),
                "warm": round(warms[len(warms) // 2], 3),
            }
            print(f"{scale_name} {name}: {results[name][scale_name]}", file=sys.stderr)

    xkey = f"x{COPIES}"
    for name, r in results.items():
        if r["sf0.1"]["warm"] > 0:
            r["ratio_warm"] = round(r[xkey]["warm"] / r["sf0.1"]["warm"], 2)

    recorded = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    rnd = int(os.environ.get("SPARK_GRAFT_ROUND", max(recorded) + 1 if recorded else 1))
    payload = {
        "metric": "heavy_tail_scaling",
        "unit": "sec",
        "copies": COPIES,
        "warm_runs": WARM,
        "base_sf_dir": BASE,
        "queries": results,
    }
    out_path = os.path.join(REPO, f"bench_scale_r{rnd:02d}.json")
    # a SPARK_GRAFT_SCALE_QUERIES subset run merges its rows into the
    # stamped record instead of clobbering the full capture
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.loads(f.read())
        payload["queries"] = {**prior.get("queries", {}), **results}
    line = json.dumps(payload)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
