"""Named query library. Importing this package registers every query
into `registry.QUERIES` / `registry.ORACLES`."""

from . import crisis, joins, overrides, pricing, toporder, unions, windows  # noqa: F401
from .registry import ORACLES, QUERIES  # noqa: F401
