"""Named query library. Importing this package registers every query
into `registry.QUERIES` / `registry.ORACLES`."""

from . import (  # noqa: F401
    aggregates,
    crisis,
    joins,
    narrative,
    overrides,
    pricing,
    scalars,
    toporder,
    unions,
    windows,
)
from .registry import ORACLES, QUERIES  # noqa: F401
