"""Structured Streaming mappings (SURVEY §2.10).

- daily: watermarked tumbling daily rollup (availableNow == batch)
- stateful: the T2 crisis-chain recurrence as applyInPandasWithState
  with bounded per-entity state
"""

from . import daily, stateful  # noqa: F401
