"""Distributed containers + top-level index API (replaces src/containers,
src/index).

Two distribution strategies, mirroring the reference's container families:

* hash-partitioned (`api`: CountIndex/PositionIndex/PositionQualityIndex —
  densehash/unordered maps, distributed_densehash_map.hpp)
* range-partitioned (`sorted_api`: SortedCountIndex/SortedPositionIndex/
  SortedPositionQualityIndex — sorted maps, distributed_sorted_map.hpp)
"""

from . import store

__all__ = ["store"]
