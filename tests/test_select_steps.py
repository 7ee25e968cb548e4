"""Device-side predicate scans at ~1M-row scale.

Round-4 hardening: every full-store predicate export runs on device
(compact-to-front selection) instead of fetching cap-sized stores to the
host — the owner-side predicate evaluation of the reference
(/root/reference/src/containers/distributed_densehash_map.hpp:1603+).
These tests pin the device paths against numpy oracles at sizes where a
host loop would be visibly wrong to ship (>= 1M rows per store).
"""

import numpy as np
import pytest

from kmerind_tpu import DNA, KmerSpec
from kmerind_tpu.index.api import BimoleculeCountIndex, PositionIndex
from kmerind_tpu.index.sorted_api import SortedCountIndex
from kmerind_tpu.index.value_api import KmerValueIndex

SPEC = KmerSpec(21, DNA)
M = 1 << 20  # 1M rows


def _random_kmer_rows(m: int, seed: int, distinct_bits: int = 18):
    """uint32[m, 2] valid k=21 kmer rows (packed from random codes);
    values repeat (2^distinct_bits distinct) so multimap runs are long."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, size=(1 << distinct_bits, 21), dtype=np.int64)
    pick = rng.integers(0, base.shape[0], size=m)
    rows = np.stack([SPEC.pack_codes(base[i]) for i in
                     range(base.shape[0])]).astype(np.uint32)
    return rows[pick]


@pytest.fixture(scope="module")
def kmer_rows():
    return _random_kmer_rows(M, seed=7)


def test_position_count_if_device_1m(kmer_rows):
    idx = PositionIndex(SPEC, canonical=False)
    ids = np.arange(M, dtype=np.uint64)
    idx.insert(kmer_rows, ids)
    # pred: pairs whose id_lo is even
    out = idx.count_if(lambda k, h, l, q: (l & 1) == 0)
    # oracle: canonicalization off -> keys stored as inserted
    ints = SPEC.to_ints(kmer_rows)
    sel = (ids & np.uint64(1)) == 0
    import collections
    oracle = collections.Counter(ints[sel].tolist())
    assert dict(out) == dict(oracle)


def test_position_unique_size_device_1m(kmer_rows):
    idx = PositionIndex(SPEC, canonical=False)
    idx.insert(kmer_rows, np.arange(M, dtype=np.uint64))
    ints = SPEC.to_ints(kmer_rows)
    assert idx.unique_size() == np.unique(ints).shape[0]
    assert idx.size() == M


def test_sorted_count_if_device_1m(kmer_rows):
    idx = SortedCountIndex(SPEC, canonical=False)
    idx.insert(kmer_rows)
    out = idx.count_if(lambda k, c: c >= 3)
    ints = SPEC.to_ints(kmer_rows)
    u, c = np.unique(ints, return_counts=True)
    oracle = {int(v): int(n) for v, n in zip(u, c) if n >= 3}
    assert dict(out) == oracle
    assert idx.unique_size() == u.shape[0]


def test_sorted_items_in_range_device(kmer_rows):
    idx = SortedCountIndex(SPEC, canonical=False)
    idx.insert(kmer_rows[: 1 << 16])
    ints = SPEC.to_ints(kmer_rows[: 1 << 16])
    u, c = np.unique(ints, return_counts=True)
    lo, hi = int(u[len(u) // 4]), int(u[3 * len(u) // 4])
    got = idx.items_in_range(_int_to_words(lo), _int_to_words(hi))
    oracle = sorted((int(v), int(n)) for v, n in zip(u, c)
                    if lo <= int(v) < hi)
    assert got == oracle


def _int_to_words(v: int) -> np.ndarray:
    """Inverse of KmerSpec.to_int for the 2-word k=21 DNA layout."""
    nbits = SPEC.nbits
    rows = np.zeros(SPEC.nwords, np.uint32)
    # to_int folds word 0 first (most significant)
    rem = v
    shifts = []
    total = 0
    for w, bits in enumerate(SPEC.word_bits()):
        shifts.append(bits)
        total += bits
    assert total == nbits
    for w in range(SPEC.nwords):
        total -= shifts[w]
        rows[w] = (rem >> total) & ((1 << shifts[w]) - 1)
        rem &= (1 << total) - 1
    # undo: word values sit at the layout positions pack_codes produces;
    # verify via to_int round-trip
    assert SPEC.to_int(rows) == v
    return rows


def test_kv_count_if_device_1m(kmer_rows):
    idx = KmerValueIndex(SPEC, canonical=False, reduce="min")
    vals = np.arange(M, dtype=np.uint64) * 3
    idx.insert(kmer_rows, vals)
    out = idx.count_if(lambda k, h, l: (l % 7) == 0)
    ints = SPEC.to_ints(kmer_rows)
    oracle = {}
    order = np.lexsort((vals, ints))
    for i in order[::-1]:
        oracle[int(ints[i])] = int(vals[i])  # min value per key wins
    oracle = {k: v for k, v in oracle.items() if (v & 0xFFFFFFFF) % 7 == 0}
    assert dict(out) == oracle


def test_bimol_count_if_device(kmer_rows):
    idx = BimoleculeCountIndex(SPEC)
    rows = kmer_rows[: 1 << 17]
    idx.insert(rows)
    out = idx.count_if(lambda k, c: c >= 2)
    canon = idx._maybe_canonicalize_queries(rows)
    ints = SPEC.to_ints(canon)
    u, c = np.unique(ints, return_counts=True)
    oracle = {int(v): int(n) for v, n in zip(u, c) if n >= 2}
    # count_if reports stored keys in canonical space for Bimolecule
    assert dict(out) == oracle
