"""Static lint: the timestamp-tie determinism convention cannot regress.

The altseed sweep (tests/altseed.py) proved that a bare
``sort_values(ts)`` inside a per-key kernel makes every order-sensitive
output engine- and run-ambiguous under tied timestamps (pandas'
default sort is an UNSTABLE quicksort, and real event data always
carries ts collisions at scale). The fix is the ``order_cols``
convention — kernels sort ``[ts, *order_cols]`` with a stable sort.

This test greps the operator sources so a future kernel can't silently
reintroduce the bare sort: every ``sort_values`` call in the batch
operator/drift modules must request a stable kind. streaming/jobs.py is
exempt by design — micro-batch boundaries make a stream
tie-nondeterministic regardless of sort, documented in its module
docstring.
"""
from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "beymani_spark"

#: modules whose kernels feed DuckDB-verified oracles — stable sort required
CHECKED = [
    *sorted((PKG / "operators").glob("*.py")),
    PKG / "streaming" / "drift.py",
]

_CALL = re.compile(r"\.sort_values\((.*?)\)", re.DOTALL)


def test_kernel_sorts_are_stable():
    offenders = []
    for path in CHECKED:
        src = path.read_text()
        for m in _CALL.finditer(src):
            args = m.group(1)
            if "mergesort" not in args and "stable" not in args:
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line}: sort_values({args!r})")
    assert not offenders, (
        "unstable kernel sort(s) — use sort_values([ts, *order_cols], "
        'kind="mergesort") per the tie-determinism convention:\n'
        + "\n".join(offenders)
    )


def test_streaming_jobs_document_the_tie_caveat():
    src = (PKG / "streaming" / "jobs.py").read_text()
    assert "micro-batch" in src and "order_cols" in src, (
        "streaming/jobs.py lost its timestamp-tie caveat — restore the "
        "module-docstring note or adopt the order_cols convention there"
    )
