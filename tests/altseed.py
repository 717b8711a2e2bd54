"""Alternate-seed / alternate-skew fixture build for the oracle parity sweep.

The driver fixtures (/root/testdata/sf*) are ONE draw of the data
distribution; every oracle has only ever been checked against that draw.
This module derives a second draw from sf0.001 with deliberately different
shape — skewed keys, injected NULLs, empty/single-token documents, exact
duplicate texts and vectors, dropped dimension rows (orphan FKs), heavy
value ties — so data-dependent bugs the fixed fixtures can't expose
(empty-group, all-null, single-key, tie-ordering, orphan-join edges) fail
the parity sweep instead of surfacing at 100 TB.

All transformations are DETERMINISTIC (DuckDB hash() of the row key, never
random()), so the build is reproducible and cheap enough to materialize on
first use (gitignored .altseed/ next to the repo tests).

Shape changes per table (vs sf0.001):
- customer: 30% of rows dropped (orders gain orphan custkeys); c_acctbal
  NULL on ~6%; one mktsegment made dominant.
- supplier: 3 of 10 dropped (lineitem orphan suppkeys).
- part: half dropped (lineitem orphan partkeys).
- orders: 25% of custkeys remapped onto the hottest customer (key skew).
- lineitem: l_discount zeroed on 60% (heavy value ties / near-constant
  column); 30% of suppkeys remapped onto one supplier.
- events: 30% of user_ids collapsed onto user 1 (hot key), 20% of types
  onto 'view' (dominant type); 25% of timestamps truncated to the DAY
  (guaranteed cross-row ts collisions — window tie-break stress; this is
  what forced the order_cols tie-break sweep through the sequence/drift
  kernels).
- documents: ~4% empty text, ~4% single-token text, 10% exact text copies
  of a canonical doc (bigger dup clusters), lang skewed onto 'en';
  n_chars recomputed to stay consistent with the new text.
- embeddings: 5% exact vector copies of their label's canonical vector
  (cosine == 1.0 ties), labels skewed onto 0.
"""
from __future__ import annotations

import os

#: BEYMANI_ALTSEED_BASE overrides the source draw (e.g. sf0.01 for a
#: bigger one-off sweep); the output dir is suffixed so builds don't mix
BASE = os.environ.get("BEYMANI_ALTSEED_BASE", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALT_DIR = os.path.join(
    REPO, ".altseed" + ("01" if BASE.endswith("sf0.01") else "")
)

_TABLE_SQL = {
    "region": "SELECT * FROM region0",
    "nation": "SELECT * FROM nation0",
    "customer": """
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN hash(c_custkey + 3) % 17 = 0 THEN NULL
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN hash(c_custkey + 5) % 10 < 6 THEN 'BUILDING'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer0 WHERE hash(c_custkey) % 10 >= 3
    """,
    "supplier": "SELECT * FROM supplier0 WHERE hash(s_suppkey) % 10 >= 3",
    "part": "SELECT * FROM part0 WHERE hash(p_partkey) % 2 = 0",
    "orders": """
        SELECT o_orderkey,
               CASE WHEN hash(o_orderkey + 7) % 4 = 0
                    THEN (SELECT min(c_custkey) FROM customer0)
                    ELSE o_custkey END AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders0
    """,
    "lineitem": """
        SELECT l_orderkey, l_partkey,
               CASE WHEN hash(l_orderkey * 16 + l_linenumber) % 10 < 3
                    THEN (SELECT min(s_suppkey) FROM supplier0)
                    ELSE l_suppkey END AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice,
               CASE WHEN hash(l_orderkey * 16 + l_linenumber + 1) % 10 < 6
                    THEN 0.0 ELSE l_discount END AS l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem0
    """,
    "events": """
        SELECT event_id,
               CASE WHEN hash(event_id + 11) % 4 = 0
                    THEN date_trunc('day', ts) ELSE ts END AS ts,
               CASE WHEN hash(event_id) % 10 < 3 THEN 1
                    ELSE user_id END AS user_id,
               CASE WHEN hash(event_id + 13) % 5 = 0 THEN 'view'
                    ELSE event_type END AS event_type,
               value, props
        FROM events0
    """,
    "documents": """
        WITH canon AS (
          SELECT doc_id, text FROM documents0
        ), remix AS (
          SELECT d.doc_id,
                 CASE
                   WHEN hash(d.doc_id) % 25 = 0 THEN ''
                   WHEN hash(d.doc_id) % 25 = 1 THEN 'solo'
                   WHEN hash(d.doc_id + 17) % 20 < 2
                     THEN (SELECT c.text FROM canon c
                           WHERE c.doc_id = d.doc_id - (d.doc_id % 50))
                   ELSE d.text
                 END AS text,
                 CASE WHEN hash(d.doc_id + 19) % 5 < 2 THEN 'en'
                      ELSE d.lang END AS lang,
                 d.source
          FROM documents0 d
        )
        SELECT doc_id, coalesce(text, '') AS text, lang, source,
               length(coalesce(text, '')) AS n_chars
        FROM remix
    """,
    "embeddings": """
        WITH skew AS (
          SELECT vec_id, embedding,
                 CASE WHEN hash(vec_id + 23) % 2 = 0 THEN 0
                      ELSE label END AS label
          FROM embeddings0
        ), canon AS (
          SELECT label, arg_min(embedding, vec_id) AS cvec
          FROM skew GROUP BY label
        )
        SELECT s.vec_id,
               CASE WHEN hash(s.vec_id + 29) % 20 = 0 THEN c.cvec
                    ELSE s.embedding END AS embedding,
               s.label
        FROM skew s JOIN canon c USING (label)
    """,
}


def build_altseed(base: str = BASE, out: str = ALT_DIR) -> str:
    """Materialize the alternate-seed fixture set; no-op when present."""
    import duckdb

    tables = list(_TABLE_SQL)
    if all(os.path.exists(os.path.join(out, f"{t}.parquet")) for t in tables):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t}0 AS SELECT * FROM '{base}/{t}.parquet'")
    for t in tables:
        con.execute(
            f"COPY ({_TABLE_SQL[t]}) TO '{os.path.join(out, t + '.parquet')}'"
            " (FORMAT PARQUET)"
        )
    con.close()
    return out
