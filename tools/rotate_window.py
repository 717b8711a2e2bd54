#!/usr/bin/env python
"""Regenerate the driver correctness window stalest-first.

The driver hash-checks the FIRST 50 registry queries per round
(plans/registry.py _PRIORITY); tests/test_rotation_audit.py fails the tree
if the window is mis-rotated. This tool makes the per-round rotation a
one-command task: it reads every committed CORRECTNESS_r*.json, computes
each registered query's newest driver-green round, and rewrites the
_PRIORITY block as a STABLE stalest-first sort — never-driver-checked
queries (new this round) lead in their current registration order, then
ascending newest-green round.

Run at the START of each round, after the driver commits the previous
round's CORRECTNESS record:

    python tools/rotate_window.py && python -m pytest tests/test_rotation_audit.py -q

Idempotent: re-running on an already-rotated tree is a no-op (the sort is
stable on the current registration order).
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from beymani_spark.plans.registry import QUERIES

    names = [n for n, q in QUERIES.items() if q.oracle is not None]
    newest: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        for q in json.loads(f.read_text()):
            newest[q] = max(newest.get(q, -1), rnd)
    order = sorted(names, key=lambda n: newest.get(n, -1))

    lines = []
    cur: int | None = None
    for n in order:
        r = newest.get(n, -1)
        if r != cur:
            cur = r
            label = (
                "never driver-checked — new additions lead the window"
                if r == -1
                else f"newest driver row r{r}"
            )
            lines.append(f"    # --- {label} ---")
        lines.append(f'    "{n}",')
    body = "_PRIORITY = [\n" + "\n".join(lines) + "\n]"

    reg = REPO / "beymani_spark" / "plans" / "registry.py"
    src = reg.read_text()
    new = re.sub(r"_PRIORITY = \[.*?\n\]", body, src, count=1, flags=re.S)
    if new == src:
        print("already rotated — no change")
        return
    reg.write_text(new)
    head = order[:50]
    print(f"rotated: {len(order)} queries; window head = {head[:8]} ...")


if __name__ == "__main__":
    main()
