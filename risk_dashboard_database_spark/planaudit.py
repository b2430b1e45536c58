"""Physical-plan counting shared by tools/explain.py and
tests/test_plans.py.

Counts operators in a formatted explain string, EXCLUDING everything
inside an InMemoryRelation subtree: those are the build plans of
per-dataset cached relations (the relcache MV seam) — their exchanges
are paid once per dataset at materialization, not once per consuming
query, exactly like the reference's MV refresh cost is not an
endpoint-query cost.
"""

from __future__ import annotations

OPS = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def count_ops(plan: str) -> dict[str, int]:
    counts = dict.fromkeys(OPS, 0)
    cut_depth: int | None = None
    for line in plan.splitlines():
        if line.startswith("(") and ") " in line[:8]:
            break  # details section — tree is done
        pos = line.find("+- ")
        depth = pos if pos >= 0 else 0
        name = line[pos + 3 :] if pos >= 0 else line.strip()
        if cut_depth is not None:
            if depth > cut_depth:
                continue  # inside a cached relation's build plan
            cut_depth = None
        if name.startswith("InMemoryRelation"):
            cut_depth = depth
            continue
        stripped = name.lstrip("* ")
        for k in counts:
            if stripped.startswith(k):
                counts[k] += 1
    return counts
