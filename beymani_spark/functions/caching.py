"""Caller-owned cache lifetime for lazily-returned operator results.

Several operators persist an intermediate frame that multiple branches of
the RETURNED (still lazy) plan consume — e.g. the exploded shingle set in
``minhash_lsh_pairs`` feeds both the signature aggregation and the
verification join. The operator cannot unpersist before returning (the
persist would never materialize), so ownership of those caches must pass to
the caller.

``pin`` attaches the intermediate persisted frames to the result DataFrame;
``release`` unpersists them once the caller has finished every action on
the result. Long sessions that skip ``release`` accumulate storage-memory
pressure (the bench survives only because it clearCache()s between
queries); a pipeline step should pair each pinned result with one
``release`` after its final write.
"""
from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_beymani_pinned_caches"


def pin(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Attach persisted intermediate frames to ``result`` for later release.

    Composes: pinning a result built from an already-pinned input extends
    the existing handle list."""
    existing = list(getattr(result, _ATTR, []))
    setattr(result, _ATTR, existing + list(intermediates))
    return result


def pinned(result: DataFrame) -> list[DataFrame]:
    """The intermediate frames whose caches ``result`` still holds."""
    return list(getattr(result, _ATTR, []))


def release(result: DataFrame, blocking: bool = False) -> None:
    """Unpersist every cache pinned to ``result``. Safe on un-pinned frames
    and idempotent."""
    for frame in getattr(result, _ATTR, []):
        frame.unpersist(blocking)
    setattr(result, _ATTR, [])
