"""Distributed containers + top-level index API (replaces src/containers,
src/index).

Two distribution strategies, mirroring the reference's container families:

* hash-partitioned (`api`: CountIndex/PositionIndex/PositionQualityIndex —
  densehash/unordered maps, distributed_densehash_map.hpp)
* range-partitioned (`sorted_api`: SortedCountIndex/SortedPositionIndex/
  SortedPositionQualityIndex — sorted maps, distributed_sorted_map.hpp)
"""

from . import store
from .api import (BimoleculeCountIndex, CountIndex, PositionIndex,
                  PositionQualityIndex)
from .sorted_api import (SortedCountIndex, SortedPositionIndex,
                         SortedPositionQualityIndex)

__all__ = [
    "store",
    "CountIndex",
    "BimoleculeCountIndex",
    "PositionIndex",
    "PositionQualityIndex",
    "SortedCountIndex",
    "SortedPositionIndex",
    "SortedPositionQualityIndex",
]
