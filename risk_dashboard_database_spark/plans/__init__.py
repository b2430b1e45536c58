"""Named query library. Importing this package registers every query
into `registry.QUERIES` / `registry.ORACLES`."""

from . import (  # noqa: F401
    aggregates,
    crisis,
    dedup,
    endpoints,
    joins,
    multimodal,
    narrative,
    overrides,
    pricing,
    scalars,
    sources_q,
    textstats,
    toporder,
    unions,
    windows,
)
from .registry import ORACLES, QUERIES  # noqa: F401
