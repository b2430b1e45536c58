"""Reusable distributed operators.

- windows: trailing ROWS-frame rollups, calendar-day LAG,
  latest-per-key dedup
- sessionize: gaps-and-islands, episode extraction, the linearized
  crisis state machine, applyInPandas state-scan escape hatch
- joins: as-of join via union + ordered window (no range cross joins)
- skew: salted two-stage aggregation and salted broadcast join
"""

from . import joins, sessionize, skew, windows  # noqa: F401
