"""Structured Streaming mappings (SURVEY §2.10).

- daily: watermarked tumbling daily rollup (availableNow == batch)
- stateful: the T2 crisis-chain recurrence as applyInPandasWithState
  with bounded per-entity state
- dedup: exact dedup on arrival (dropDuplicatesWithinWatermark,
  watermark-bounded state)
- neardup: MinHash+LSH near-dup candidate emission on arrival
  (per-bucket stateful pair generation == batch d2 band join)
- decontam: benchmark decontamination on arrival (stateless literal
  benchmark-gram probe == batch d15 flags)
- quality: curation gate on arrival (stateless quality + repetition
  verdict == conjunction of the oracle-verified t_quality_score /
  t_repetition batch queries)
"""

from . import daily, decontam, dedup, neardup, quality, stateful  # noqa: F401
