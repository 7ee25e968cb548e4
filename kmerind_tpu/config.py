"""Unified runtime configuration.

The reference configures an index through THREE layers (SURVEY §5): CMake
options → bliss-config.hpp, a compile-time type matrix (one binary per
combination of -DpPARSER/-DpMAP/-DpINDEX/-DpDistHash/-DpStoreHash/-DpDNA/
-DpK macros, test/benchmark/BenchmarkKmerIndex.cpp:45-260), and TCLAP
runtime flags (:441-476).  Here the whole matrix is ONE runtime dataclass;
k and alphabet remain static *per jit* (recompiled per value), matching the
reference's per-binary specialization at far lower cost.

Mapping from the reference's macro values:

| reference macro        | IndexConfig field | values |
|------------------------|-------------------|--------|
| pPARSER FASTQ/FASTA    | fmt               | "fastq" / "fasta" (or sniffed) |
| pINDEX COUNT/POS/POSQUAL | index           | "count"/"position"/"posqual"/"debruijn" |
| pMAP DENSEHASH/SORTED… | distribution      | "hash" (densehash analog) / "range" (sorted_map analog) |
| pKmerParser canonical  | strands           | "canonical" / "single" / "bimolecule" (the three MapParams presets, kmer_index.hpp:436-562) |
| pDistHash MURMUR/FARM… | hash_name         | "murmur"/"fmix32"/"identity" |
| pDNA 4/5/16            | alphabet          | "DNA"/"DNA5"/"DNA6"/"DNA16"/… |
| pK 21/31/63            | k                 | any |
"""

from __future__ import annotations

import dataclasses

from . import alphabets
from .kmer import KmerSpec

__all__ = ["IndexConfig"]


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    """All knobs of one index instance."""

    k: int = 21
    alphabet: str = "DNA"
    index: str = "count"           # count | position | posqual | debruijn
    #                              # | value (generic unique-key u64 map)
    canonical: bool = True         # Canonical vs SingleStrand presets
    strands: str | None = None     # "canonical"|"single"|"bimolecule";
    #                                overrides `canonical` when set
    distribution: str = "hash"     # "hash" (densehash) | "range" (sorted_map)
    hash_name: str = "murmur"      # DistHash preset
    id_kind: str = "short"         # short (FASTQ) | long (FASTA)
    quality_codec: str = "Illumina18"
    saturate: int | None = None    # saturating counter ceiling
    reduce: str = "first"          # value-map insert reduction
    #                                (first | min | max)
    fill_factor: float = 1.6       # bucket capacity headroom
    fmt: str | None = None         # input format override
    devices: int | None = None     # mesh size (None = all)

    def spec(self) -> KmerSpec:
        return KmerSpec(self.k, alphabets.by_name(self.alphabet))

    def make_index(self, mesh=None, **kw):
        """Instantiate the configured index class."""
        from .debruijn import DeBruijnGraph
        from .index.api import (BimoleculeCountIndex, CountIndex,
                                PositionIndex, PositionQualityIndex)
        from .index.sorted_api import (SortedCountIndex, SortedPositionIndex,
                                       SortedPositionQualityIndex)
        from .parallel.mesh import make_mesh
        from . import quality

        if mesh is None:
            mesh = make_mesh(self.devices)
        spec = self.spec()
        strands = self.strands
        if strands is None:
            strands = "canonical" if self.canonical else "single"
        if strands not in ("canonical", "single", "bimolecule",
                           "lex_greater", "xor_rev_comp"):
            raise ValueError(f"unknown strands preset {strands!r}")
        # the full InputTransform matrix (kmer_transform.hpp:90-145):
        # canonical == lex_less; lex_greater/xor_rev_comp pass the
        # transform name through the `canonical` knob
        if strands in ("lex_greater", "xor_rev_comp"):
            if self.index == "debruijn":
                raise ValueError(
                    "the de Bruijn engine defines edges on the lex_less "
                    "canonical strand (the reference's driver config)")
            canonical = strands
        else:
            canonical = strands != "single"
        if self.distribution not in ("hash", "range"):
            raise ValueError(f"unknown distribution {self.distribution!r}")
        common = dict(mesh=mesh, fill_factor=self.fill_factor, **kw)
        if strands == "bimolecule":
            if self.distribution != "hash" or self.index != "count":
                raise ValueError(
                    "the Bimolecule preset is provided for hash-distributed "
                    "count indexes (the reference's BenchmarkKmerIndex "
                    "matrix likewise pairs it with hash maps)")
            return BimoleculeCountIndex(
                spec, hash_name=self.hash_name, saturate=self.saturate,
                **common)
        if self.distribution == "range":
            if self.index == "value":
                from .index.value_api import SortedKmerValueIndex
                return SortedKmerValueIndex(
                    spec, canonical=canonical, reduce=self.reduce,
                    id_kind=self.id_kind, **common)
            if self.index == "count":
                return SortedCountIndex(spec, canonical=canonical,
                                        saturate=self.saturate, **common)
            if self.index == "position":
                return SortedPositionIndex(spec, canonical=canonical,
                                           id_kind=self.id_kind, **common)
            if self.index == "posqual":
                codec = quality.by_name(self.quality_codec)
                return SortedPositionQualityIndex(
                    spec, canonical=canonical, id_kind=self.id_kind,
                    codec=codec, **common)
            raise ValueError(
                f"range distribution has no {self.index!r} index")
        common.update(canonical=canonical, hash_name=self.hash_name)
        if self.index == "value":
            from .index.value_api import KmerValueIndex
            return KmerValueIndex(spec, reduce=self.reduce,
                                  id_kind=self.id_kind, **common)
        if self.index == "count":
            return CountIndex(spec, saturate=self.saturate, **common)
        if self.index == "position":
            return PositionIndex(spec, id_kind=self.id_kind, **common)
        if self.index == "posqual":
            codec = quality.by_name(self.quality_codec)
            return PositionQualityIndex(spec, id_kind=self.id_kind,
                                        codec=codec, **common)
        if self.index == "debruijn":
            return DeBruijnGraph(spec, saturate=self.saturate, **common)
        raise ValueError(f"unknown index kind {self.index!r}")
