"""De Bruijn graph engine built on the k-mer index (replaces
test/test/debruijn)."""

from .edges import edge_bytes_for_windows, revcomp_edge_byte
from .graph import DeBruijnGraph

__all__ = ["DeBruijnGraph", "edge_bytes_for_windows", "revcomp_edge_byte"]
