"""Bimolecule map preset (kmer_index.hpp:436-562): keys hashed/compared in
CANONICAL form — both strands answer the same entry — but the stored
(reported) key keeps the INPUT-strand orientation of the earliest
occurrence.  Validated against a pure-Python oracle on the reference's own
fixtures, invariant to shard count (the mpirun -np sweep analog)."""

from collections import Counter

import numpy as np
import pytest

from kmerind_tpu import DNA, KmerSpec
from kmerind_tpu.index.api import BimoleculeCountIndex, CountIndex
from kmerind_tpu.parallel.mesh import make_mesh

import oracle
from test_io import py_parse_fastq


def _mesh(n):
    return make_mesh(n)


def bimol_oracle(seqs, k, alphabet=DNA):
    """{input_strand_kmer_int: count} — counts accumulate canonically;
    the reported key is the input-strand orientation of the FIRST
    occurrence in file order."""
    counts = Counter()
    rep = {}
    for seq in seqs:
        for v in oracle.seq_kmers(seq, k, alphabet):
            c = min(v, oracle.revcomp_int(v, k, alphabet))
            counts[c] += 1
            if c not in rep:
                rep[c] = v
    return {rep[c]: n for c, n in counts.items()}


def _int_to_words(spec, v):
    return spec.pack_codes(
        oracle.int_to_codes(v, spec.k, spec.bits_per_char))


@pytest.mark.parametrize("p", [1, 2, 8])
def test_bimol_build_any_p(ref_data_dir, p):
    path = ref_data_dir / "test.small.fastq"
    spec = KmerSpec(21, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(p))
    idx.build(path)

    seqs = [r[1] for r in py_parse_fastq(path.read_text())]
    expect = bimol_oracle(seqs, 21)
    assert idx.to_dict() == expect, f"p={p}"


def test_bimol_counts_match_canonical(ref_data_dir):
    """Counts (by canonical key) must equal the canonical CountIndex's."""
    path = ref_data_dir / "test.small.fastq"
    spec = KmerSpec(15, DNA)
    bi = BimoleculeCountIndex(spec, mesh=_mesh(4)).build(path)
    ca = CountIndex(spec, mesh=_mesh(4)).build(path)
    seqs = [r[1] for r in py_parse_fastq(path.read_text())]
    expect = oracle.count_index(seqs, 15, DNA, canonical=True)
    keys = sorted(expect)
    kwords = np.stack([_int_to_words(spec, v) for v in keys])
    np.testing.assert_array_equal(bi.count(kwords), ca.count(kwords))
    np.testing.assert_array_equal(bi.count(kwords),
                                  [expect[v] for v in keys])


def test_bimol_both_strands_answer_same_entry():
    spec = KmerSpec(9, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(4))
    # GGGGGGGGT: rc = ACCCCCCCC < input, so the input strand is NOT
    # canonical — stored orientation must still be the input strand
    idx.insert(["GGGGGGGGT", "GGGGGGGGT"])
    np.testing.assert_array_equal(
        idx.count(["GGGGGGGGT", "ACCCCCCCC"]), [2, 2])
    d = idx.to_dict()
    v = oracle.kmer_int([int(c) for c in DNA.encode("GGGGGGGGT")], 2)
    assert d == {v: 2}


def test_bimol_first_occurrence_wins():
    spec = KmerSpec(9, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(2))
    idx.insert(["GGGGGGGGT"])      # earlier occurrence, reverse strand
    idx.insert(["ACCCCCCCC"])      # same canonical key, forward strand
    d = idx.to_dict()
    v = oracle.kmer_int([int(c) for c in DNA.encode("GGGGGGGGT")], 2)
    assert d == {v: 2}


def test_bimol_find_reports_stored_orientation():
    spec = KmerSpec(9, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(4))
    idx.insert(["GGGGGGGGT", "AAAAAAAAC"])
    words, counts = idx.find(["ACCCCCCCC", "AAAAAAAAC", "TTTTTTTTT"])
    got = {spec.to_int(words[i]): int(counts[i])
           for i in range(words.shape[0])}
    vg = oracle.kmer_int([int(c) for c in DNA.encode("GGGGGGGGT")], 2)
    va = oracle.kmer_int([int(c) for c in DNA.encode("AAAAAAAAC")], 2)
    assert got == {vg: 1, va: 1}


def test_bimol_erase_and_erase_if(ref_data_dir):
    path = ref_data_dir / "test.small.fastq"
    spec = KmerSpec(21, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(4)).build(path)
    seqs = [r[1] for r in py_parse_fastq(path.read_text())]
    expect = bimol_oracle(seqs, 21)
    total = len(expect)

    # erase half the keys, queried by their STORED (input-strand) form
    keys = sorted(expect)[::2]
    kwords = np.stack([_int_to_words(spec, v) for v in keys])
    nerased = idx.erase(kwords)
    assert nerased == len(keys)
    assert idx.size() == total - len(keys)
    assert np.all(idx.count(kwords) == 0)

    # erase_if over local entries: drop all remaining singletons
    import jax.numpy as jnp
    n1 = sum(1 for v, c in expect.items() if c == 1 and v not in set(keys))
    got = idx.erase_if(lambda k, c: c == 1)
    assert got == n1
    left = {v: c for v, c in expect.items()
            if c > 1 and v not in set(keys)}
    assert idx.to_dict() == left


def test_bimol_save_load_roundtrip(tmp_path, ref_data_dir):
    path = ref_data_dir / "test.small.fastq"
    spec = KmerSpec(21, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(4)).build(path)
    expect = idx.to_dict()
    f = tmp_path / "bimol.npz"
    idx.save(f)
    idx2 = BimoleculeCountIndex.load(f, mesh=_mesh(8))
    assert idx2.to_dict() == expect


def test_bimol_saturating_counts():
    spec = KmerSpec(9, DNA)
    idx = BimoleculeCountIndex(spec, mesh=_mesh(2), saturate=3)
    idx.insert(["GGGGGGGGT"] * 7)
    np.testing.assert_array_equal(idx.count(["ACCCCCCCC"]), [3])
