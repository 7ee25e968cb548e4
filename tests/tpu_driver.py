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
    idx_ = CountIndex(spec)
    if fq.exists():
        idx_.build(str(fq))
    else:
        kmers = ["ACGTACGTACGTACGTACGTA", "TTTTTTTTTTTTTTTTTTTTT"]
        idx_.insert(kmers + kmers[:1])
    total = idx_.size()
    assert total > 0
    d = idx_.to_dict()
    assert len(d) == total
    # query every stored key: counts must match the dump
    ints = sorted(d)[:256]
    qwords = np.stack([
        spec.pack_codes(np.array(
            [(v >> (2 * (spec.k - 1 - i))) & 3 for i in range(spec.k)],
            np.uint8)) for v in ints])
    counts = idx_.count(qwords)
    assert [int(c) for c in counts] == [d[v] for v in ints]
    print("ingest+query on TPU: ok", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
