"""DataStreamSchema loader: wildcard flattening + findParent semantics
(DataStreamSchema.java:50-135)."""
from __future__ import annotations

import os

import pytest

from beymani_spark.sources import stream_schema

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "beymani_spark", "resources", "event_stream.json",
)


def test_load_and_flatten_wildcards(spark):
    streams = stream_schema.load_stream_schema(FIXTURE)
    assert len(streams) == 5
    df = stream_schema.flatten_hierarchy(spark, streams, child_col="event_type")
    got = {tuple(r) for r in df.collect()}
    assert got == {
        ("view", "funnel", "engagement"),
        ("click", "funnel", "engagement"),
        ("signup", "funnel", "conversion"),
        ("purchase", "funnel", "conversion"),
        ("error", "funnel", "conversion"),
    }


def test_find_parent_wildcard_and_singleton():
    streams = stream_schema.load_stream_schema(FIXTURE)
    # wildcard child resolves through its parent's childrenId list
    assert stream_schema.find_parent(streams, "engagementEvent", "click") == (
        "funnel", "engagement",
    )
    # singleton parent resolves by type alone (findParent:128-130)
    assert stream_schema.find_parent(streams, "funnel", "conversion") == (
        "root", "site",
    )


def test_mismatched_parent_raises():
    streams = [
        {"id": "r", "type": "root", "parentId": "none", "parentType": "none",
         "singleton": True},
        {"id": "p1", "type": "grp", "parentId": "r", "parentType": "root",
         "singleton": False, "childrenId": ["a"]},
        {"id": "p2", "type": "grp", "parentId": "r", "parentType": "root",
         "singleton": False, "childrenId": ["a"]},
        # declared parent is p2, but p1 (searched first) also lists child "a"
        # -> DataStreamSchema.java:98 assertCondition fires
        {"id": "*", "type": "leaf", "parentId": "p2", "parentType": "grp",
         "singleton": False},
    ]
    with pytest.raises(ValueError, match="mismatched parent ID"):
        stream_schema.find_parent(streams, "leaf", "a")


def test_concrete_child_entry(spark):
    streams = [
        {"id": "r", "type": "root", "parentId": "none", "parentType": "none",
         "singleton": True},
        {"id": "p1", "type": "grp", "parentId": "r", "parentType": "root",
         "singleton": False, "childrenId": []},
        {"id": "c1", "type": "leaf", "parentId": "p1", "parentType": "grp",
         "singleton": False},
    ]
    df = stream_schema.flatten_hierarchy(spark, streams)
    assert [tuple(r) for r in df.collect()] == [("c1", "grp", "p1")]
