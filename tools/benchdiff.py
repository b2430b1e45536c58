"""Compare two bench JSON artifacts query-by-query.

Usage: python tools/benchdiff.py OLD.json NEW.json [threshold_pct]

Prints per-query deltas sorted by regression size. When both files
carry a `calibration` field (round 6+), a second normalized delta
divides each side by its host-speed scale first, separating real plan
drift from host noise — the same arithmetic bench.py's budget guard
uses.
"""

from __future__ import annotations

import json
import sys


def _known_query_names() -> set[str] | None:
    """Names bench.py can emit under "queries" — the full plan
    registry (HEADLINE is a subset of it). None if the registry is
    unavailable (standalone use), in which case recovery keeps the
    old permissive behavior."""
    try:
        import os
        import sys as _sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if root not in _sys.path:
            _sys.path.insert(0, root)
        from risk_dashboard_database_spark import plans

        return set(plans.QUERIES)
    except Exception:
        return None


def load(path: str) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    BENCH_r{N}.json wrapper (payload under 'parsed')."""
    with open(path) as f:
        text = f.read().strip()
    try:
        d = json.loads(text)          # pretty-printed driver artifact
    except json.JSONDecodeError:
        d = json.loads(text.splitlines()[-1])  # bench.py one-liner
    d = d.get("parsed", d) or d
    if "queries" not in d and "tail" in d:
        # driver wrapper whose 'parsed' is null (tail truncated the
        # one-line JSON): recover what survives — per-query dict via a
        # regex over the tail fragment, calibration if intact.
        import re

        frag = d["tail"]
        qs: dict[str, float] = {}
        m = re.search(r'"queries": \{(.*?)\}', frag, re.S)
        if m:
            scope = m.group(1)
        else:
            # tail starts mid-"queries": keep only up to the next
            # sibling key so refresh/calibration fields don't leak in
            scope = re.split(r'\}, "', frag, maxsplit=1)[0]
        # Filter recovered keys against the bench's own query registry
        # so sibling scalars that survive truncation (sf, value, n, rc)
        # are never mistaken for per-query timings (ADVICE r9).
        known = _known_query_names()
        for k, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', scope):
            if known is None or k in known:
                qs[k] = float(v)
        cal = {}
        mc = re.search(r'"calibration": (\{.*?\})', frag)
        if mc:
            try:
                cal = json.loads(mc.group(1))
            except json.JSONDecodeError:
                pass
        d = {"queries": qs, "calibration": cal}
    return d


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    so = old.get("calibration", {}).get("scale", 1.0)
    sn = new.get("calibration", {}).get("scale", 1.0)
    rows = []
    for q, tn in new["queries"].items():
        to = old["queries"].get(q)
        if to is None:
            rows.append((float("inf"), f"{q:32s} NEW {tn:.3f}s"))
            continue
        raw = 100.0 * (tn - to) / to
        norm = 100.0 * (tn / sn - to / so) / (to / so)
        if abs(norm) >= thresh:
            rows.append(
                (norm, f"{q:32s} {to:.3f} -> {tn:.3f}  raw {raw:+.0f}%  "
                       f"normalized {norm:+.0f}%")
            )
    for q in old["queries"]:
        if q not in new["queries"]:
            rows.append((float("-inf"), f"{q:32s} REMOVED"))
    rows.sort(reverse=True)
    for _, line in rows:
        print(line)
    ov = old.get("value")
    nv = new.get("value")
    suite = (
        f"suite {ov:.1f}s -> {nv:.1f}s"
        if ov is not None and nv is not None
        else "suite totals unavailable (truncated artifact)"
    )
    print(f"\n{suite} | calib scale {so} -> {sn} | "
          f"showing |normalized| >= {thresh:.0f}%")


if __name__ == "__main__":
    main()
