"""Regenerate the BENCH_NOTES round-delta table from the DRIVER's
BENCH_r{N}.json artifacts (VERDICT r3 #6: report the driver's numbers,
not only the builder's warm local medians).

Usage: python tools/benchnotes.py [--markdown]
Prints a per-query table of driver medians by round plus the delta of
the last two rounds, sorted by latest-round time descending.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_rounds() -> dict[int, dict[str, float]]:
    out: dict[int, dict[str, float]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        data = json.load(open(path))
        parsed = data.get("parsed")
        if not parsed:
            tail = data.get("tail", "")
            jm = re.search(r"\{\"metric\".*\}", tail)
            parsed = json.loads(jm.group(0)) if jm else None
        if parsed and parsed.get("queries"):
            out[int(m.group(1))] = parsed["queries"]
    return out


def main() -> None:
    rounds = driver_rounds()
    if not rounds:
        print("no driver bench artifacts found", file=sys.stderr)
        sys.exit(1)
    nums = sorted(rounds)
    last = nums[-1]
    names = sorted(
        {n for qs in rounds.values() for n in qs},
        key=lambda n: -rounds[last].get(n, -1),
    )
    md = "--markdown" in sys.argv
    header = ["Query"] + [f"r{r:02d}" for r in nums] + ["Δ last"]
    if md:
        print("| " + " | ".join(header) + " |")
        print("|" + "---|" * len(header))
    else:
        print("\t".join(header))
    for n in names:
        cells = [f"{rounds[r][n]:.2f}" if n in rounds[r] else "—" for r in nums]
        delta = "—"
        if len(nums) >= 2 and n in rounds[nums[-1]] and n in rounds[nums[-2]]:
            delta = f"{rounds[nums[-1]][n] - rounds[nums[-2]][n]:+.2f}"
        row = [n] + cells + [delta]
        print(("| " + " | ".join(row) + " |") if md else "\t".join(row))
    totals = [sum(rounds[r].values()) for r in nums]
    print()
    for r, t in zip(nums, totals):
        print(f"r{r:02d}: {len(rounds[r])} queries, suite {t:.1f}s")


if __name__ == "__main__":
    main()
