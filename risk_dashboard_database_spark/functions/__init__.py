"""Scalar / driver-side function library (SURVEY §2.8, §2.11).

- urls: URL normalization + sha256 identity hash, hostname, control
  classification, finance/material-risk regex families
- textnorm: lookup-text normalization, suffix strip, singularizer
- period: NL time-window resolution (F6)
- planner: heuristic NL -> named-query plan routing (F7)
- llm: Arrow-batched classification plumbing + JSON salvage (F1/F2)
"""

from . import llm, period, planner, textnorm, urls  # noqa: F401
