"""Subprocess driver for the real-TPU test tier (run by test_tpu.py).

Runs OUTSIDE the pytest process so the conftest CPU pin does not apply:
compiles and executes the Pallas kernels, one ingest step, and one query
step on the attached TPU.  Exit codes: 0 = pass, 42 = no TPU available
(test_tpu.py turns that into a skip), anything else = failure.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    # A hung device tunnel blocks inside PJRT C++ where signals cannot
    # interrupt, so bound backend discovery from a subprocess (same
    # pattern as bench.py / test_tpu.py) before importing jax here.
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=120, capture_output=True)
        if probe.returncode != 0:
            print("no devices: "
                  + probe.stderr[-300:].decode(errors="replace"),
                  file=sys.stderr)
            return 42
    except subprocess.TimeoutExpired:
        print("TPU backend init unresponsive (tunnel down?)",
              file=sys.stderr)
        return 42

    import jax
    import jax.numpy as jnp

    try:
        devs = jax.devices()
    except Exception as e:  # no backend at all
        print(f"no devices: {e}", file=sys.stderr)
        return 42
    if jax.default_backend() != "tpu":
        print(f"default backend is {jax.default_backend()!r}, not tpu",
              file=sys.stderr)
        return 42
    print(f"device: {devs[0]}", file=sys.stderr)

    from kmerind_tpu import DNA, KmerSpec
    from kmerind_tpu.ops import packing, sortops
    from kmerind_tpu.ops.pallas_kernels import (extract_canonical_pallas,
                                                run_length_weights_pallas)

    # 1. compiled Pallas extraction vs the XLA path (bit-exact)
    spec = KmerSpec(21, DNA)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, 1 << 14, dtype=np.uint8))
    w_pl, rc_pl = jax.jit(extract_canonical_pallas,
                          static_argnames=("spec",))(codes, spec)
    w_x, rc_x = jax.jit(packing.extract_canonical,
                        static_argnames=("spec",))(codes, spec)
    nwin = codes.shape[0] - spec.k + 1
    assert np.array_equal(np.asarray(w_pl)[:nwin], np.asarray(w_x)[:nwin])
    assert np.array_equal(np.asarray(rc_pl)[:nwin], np.asarray(rc_x)[:nwin])
    print("pallas extraction: ok", file=sys.stderr)

    # 2. compiled run-length kernel vs a numpy oracle
    n = 1 << 18
    keys = rng.integers(0, 2**32, (4000, 2), dtype=np.uint32)
    pick = keys[rng.integers(0, 4000, n)]
    tv = n - 333
    pre = pick[:tv]
    pre = pre[np.lexsort(pre.T[::-1])]
    swords = np.concatenate([pre, pick[tv:]])
    got = np.asarray(run_length_weights_pallas(
        jnp.asarray(swords), jnp.int32(tv)))
    idx = np.arange(n)
    neq = np.any(swords[1:] != swords[:-1], axis=1)
    isnew = np.concatenate([[True], neq]) & (idx < tv)
    rs = np.maximum.accumulate(np.where(isnew, idx, -1))
    islast = (idx < tv) & (np.concatenate([neq, [True]]) | (idx == tv - 1))
    exp = np.where(islast, idx - rs + 1, 0)
    assert np.array_equal(got, exp)
    # and through the sortops dispatch (TPU backend -> Pallas path)
    w2, e2 = jax.jit(sortops.run_length_counts)(
        jnp.asarray(swords), jnp.asarray(idx < tv))
    assert np.array_equal(np.asarray(w2), exp)
    print("pallas run-length: ok", file=sys.stderr)

    # 3. one ingest + one query step compiled on TPU (count index e2e)
    from kmerind_tpu.index.api import CountIndex
    fq = pathlib.Path("/root/reference/test/data/test.small.fastq")

    def words_of(sp, ints):
        """Pack dict-key ints back into kmer word rows."""
        return np.stack([
            sp.pack_codes(np.array(
                [(v >> (2 * (sp.k - 1 - i))) & 3 for i in range(sp.k)],
                np.uint8)) for v in ints])

    def build_or_insert(ix):
        if fq.exists():
            ix.build(str(fq))
        else:
            kmers = ["ACGTACGTACGTACGTACGTA", "TTTTTTTTTTTTTTTTTTTTT"]
            ix.insert(kmers + kmers[:1])
        return ix

    idx_ = build_or_insert(CountIndex(spec))
    total = idx_.size()
    assert total > 0
    d = idx_.to_dict()
    assert len(d) == total
    # query every stored key: counts must match the dump
    ints = sorted(d)[:256]
    counts = idx_.count(words_of(spec, ints))
    assert [int(c) for c in counts] == [d[v] for v in ints]
    print("ingest+query on TPU: ok", file=sys.stderr)

    # 4. sorted (range-partitioned) family: samplesort flush + the
    # splitter-routed count path, contents equal to the hash build
    from kmerind_tpu.index.sorted_api import SortedCountIndex
    sidx = build_or_insert(SortedCountIndex(spec))
    sd = sidx.to_dict()
    assert sd == d
    ints_s = sorted(sd)[:128]
    counts_s = sidx.count(words_of(spec, ints_s))
    assert [int(c) for c in counts_s] == [sd[v] for v in ints_s]
    print("sorted flush + splitter query on TPU: ok", file=sys.stderr)

    # 5. multimap find with true multiplicities (grow-to-fit retry is
    # exercised by the small max_per_query)
    from kmerind_tpu.index.api import PositionIndex
    pidx = build_or_insert(PositionIndex(spec))
    pd = pidx.to_dict()
    ints_p = sorted(pd)[:64]
    ids, mask = pidx.find(words_of(spec, ints_p), max_per_query=4)
    for i, v in enumerate(ints_p):
        assert sorted(ids[i][mask[i]].tolist()) == pd[v]
    print("multimap find on TPU: ok", file=sys.stderr)

    # 6. Bimolecule preset: canonical hashing, stored-orientation answers
    from kmerind_tpu.index.api import BimoleculeCountIndex
    bidx = build_or_insert(BimoleculeCountIndex(spec))
    bd = bidx.to_dict()
    ints_b = sorted(bd)[:64]
    out_w, out_c = bidx.find(words_of(spec, ints_b))
    got = {spec.to_int(out_w[i]): int(out_c[i])
           for i in range(out_w.shape[0])}
    assert got == {v: bd[v] for v in ints_b}
    print("bimolecule find on TPU: ok", file=sys.stderr)

    # 7. de Bruijn ingest (dual-LUT raw path) + node-counter lookup
    from kmerind_tpu.debruijn import DeBruijnGraph
    g = build_or_insert(DeBruijnGraph(spec))
    gd = g.to_dict()
    nodes = sorted(gd)[:64]
    vals, found = g.node_counts(words_of(spec, nodes))
    assert found.all()
    for i, v in enumerate(nodes):
        assert tuple(int(x) for x in vals[i]) == gd[v]
    print("debruijn ingest + node query on TPU: ok", file=sys.stderr)

    # 7b. generic unique-key value map: insert + lookup on hardware
    from kmerind_tpu.index.value_api import KmerValueIndex
    vidx = KmerValueIndex(spec, reduce="min")
    vk = sorted(d)[:128]
    vw = words_of(spec, vk)
    vals = np.arange(len(vk), dtype=np.uint64) * 7 + 3
    vidx.insert(vw, vals)
    vd = vidx.to_dict()
    assert vd == {k_: int(v) for k_, v in zip(vk, vals)}
    got_v, got_f = vidx.find(vw[:32])
    assert got_f.all()
    assert [int(x) for x in got_v] == [int(v) for v in vals[:32]]
    print("value map insert+find on TPU: ok", file=sys.stderr)

    # 8. multi-word kmers (k=63 -> 4 words): build + query on hardware
    # (fixture reads are 60 bp < k, so synthesize 200 bp reads)
    spec63 = KmerSpec(63, DNA)
    import tempfile
    rng63 = np.random.default_rng(63)
    with tempfile.NamedTemporaryFile("w", suffix=".fastq",
                                     delete=False) as f:
        for i in range(40):
            seq = "".join(rng63.choice(list("ACGT"), size=200))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 200}\n")
        fq63 = f.name
    idx63 = CountIndex(spec63).build(fq63)
    d63 = idx63.to_dict()
    assert len(d63) == idx63.size() > 0
    ints63 = sorted(d63)[:64]
    counts63 = idx63.count(words_of(spec63, ints63))
    assert [int(c) for c in counts63] == [d63[v] for v in ints63]
    print("k=63 multi-word build+query on TPU: ok", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
