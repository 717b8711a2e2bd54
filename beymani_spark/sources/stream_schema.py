"""Hierarchical data-stream schema loader (DataStreamSchema semantics).

The reference describes entity hierarchies as a JSON list of dataStreams
(/root/reference/src/main/java/org/beymani/util/DataStreamSchema.java:50-76,
resource/ecommDataStream.json): each stream has (id, type, parentId,
parentType, singleton[, childrenId]). A stream with ``id: "*"`` is a
wildcard covering every concrete id listed in its parent's ``childrenId``
(DataStreamSchema.findByTypeAndId:88-115); parent resolution follows
findParent:123-135 — singleton parents resolve by type alone, otherwise by
(type, id).

The roll-up operator (rollup.hierarchical_aggregate ≙ OutlierAggregator
.scala:66-72) consumes a pre-flattened (child_id, parent_type, parent_id)
mapping DataFrame; ``flatten_hierarchy`` builds it at load time. The schema
is driver-side config (a few KB), so parsing is plain Python and the
resulting mapping is a small broadcast-able DataFrame — at 100 TB only the
fact table scales, never this mapping.
"""
from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def load_stream_schema(path: str) -> list[dict]:
    """Parse a dataStreams JSON file into its stream-entry list."""
    with open(path) as fh:
        doc = json.load(fh)
    streams = doc.get("dataStreams")
    if not isinstance(streams, list):
        raise ValueError(f"{path}: missing dataStreams list")
    return streams


def _find_all_by_type(streams: list[dict], typ: str) -> list[dict]:
    return [s for s in streams if s.get("type") == typ]


def find_parent(streams: list[dict], typ: str, id_: str) -> tuple[str, str]:
    """(parent_type, parent_id) for a concrete (type, id), mirroring
    DataStreamSchema.findParent:123-135 — including the wildcard child
    lookup and its mismatched-parent assertion (:95-102)."""
    by_type = _find_all_by_type(streams, typ)
    if not by_type:
        raise ValueError(f"no stream of type {typ!r}")
    first = by_type[0]
    parents = _find_all_by_type(streams, first.get("parentType", ""))
    if not parents:
        raise ValueError(f"no parent stream of type {first.get('parentType')!r}")
    if parents[0].get("singleton"):
        p = parents[0]
        return p["type"], p["id"]
    # instance-based: resolve the child entry (wildcard-aware), then its parent
    entry = None
    for s in by_type:
        if s.get("id") == "*":
            for pa in parents:
                children = pa.get("childrenId")
                if children is None:
                    raise ValueError(f"missing child ID list in parent {pa.get('id')!r}")
                if id_ in children:
                    if s.get("parentId") != pa.get("id"):
                        raise ValueError(
                            f"mismatched parent ID for child {id_!r}: wildcard "
                            f"declares {s.get('parentId')!r}, found under {pa.get('id')!r}"
                        )
                    entry = s
                    break
            if entry is not None:
                break
        elif s.get("id") == id_:
            entry = s
            break
    if entry is None:
        raise ValueError(f"no stream for (type={typ!r}, id={id_!r})")
    for pa in parents:
        if pa.get("id") == entry.get("parentId"):
            return pa["type"], pa["id"]
    raise ValueError(f"parent {entry.get('parentId')!r} of (type={typ!r}, id={id_!r}) not found")


def flatten_hierarchy(
    spark: SparkSession,
    schema: list[dict] | str,
    child_types: Sequence[str] | None = None,
    child_col: str = "child_id",
) -> DataFrame:
    """Flatten the stream schema into the (child_col, parent_type,
    parent_id) mapping DataFrame hierarchical_aggregate consumes.

    Wildcard streams expand to one row per id in their declared parent's
    childrenId; concrete non-root streams map through find_parent. Pass
    ``child_types`` to restrict which stream types are flattened (default:
    every non-root leaf type)."""
    if isinstance(schema, str):
        schema = load_stream_schema(schema)
    parent_types = {s.get("parentType") for s in schema}
    rows: list[tuple[str, str, str]] = []
    seen: set[tuple[str, str]] = set()
    for s in schema:
        typ = s.get("type")
        if child_types is not None:
            if typ not in child_types:
                continue
        elif typ in parent_types or s.get("parentType") in (None, "none"):
            continue  # default: leaves only
        if s.get("id") == "*":
            parents = _find_all_by_type(schema, s.get("parentType", ""))
            declared = [p for p in parents if p.get("id") == s.get("parentId")]
            if not declared:
                raise ValueError(
                    f"wildcard stream of type {typ!r} declares missing parent "
                    f"{s.get('parentId')!r}"
                )
            p = declared[0]
            children = p.get("childrenId")
            if children is None:
                raise ValueError(f"missing child ID list in parent {p.get('id')!r}")
            for cid in children:
                # reference's mismatched-parent assert: a child id may not
                # also appear under a sibling parent of the same type
                for other in parents:
                    if other is not p and cid in (other.get("childrenId") or []):
                        raise ValueError(
                            f"mismatched parent ID: child {cid!r} listed under "
                            f"both {p.get('id')!r} and {other.get('id')!r}"
                        )
                if (typ, cid) not in seen:
                    seen.add((typ, cid))
                    rows.append((cid, p["type"], p["id"]))
        else:
            if (typ, s["id"]) not in seen:
                seen.add((typ, s["id"]))
                pt, pid = find_parent(schema, typ, s["id"])
                rows.append((s["id"], pt, pid))
    return spark.createDataFrame(
        rows, schema=f"`{child_col}` string, parent_type string, parent_id string"
    )
