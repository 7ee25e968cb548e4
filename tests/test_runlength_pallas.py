"""The Pallas run-length kernel vs the jnp scan path.

run_length_weights_pallas is the single-HBM-pass replacement for the
lax.cummax scan in sortops.run_length_counts (the segmented-reduction half
of the count build — the reference's hash-probe += loop,
distributed_densehash_map.hpp:278,1911).  These tests pin its semantics in
interpret mode (CPU); the compiled path is exercised by tests/test_tpu.py
and bench.py on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmerind_tpu.ops import sortops
from kmerind_tpu.ops.pallas_kernels import run_length_weights_pallas


def _make_sorted(rng, n, w, nkeys, tv):
    """Rows with a sorted valid prefix of tv rows (sort_rows' invariant)."""
    keys = rng.integers(0, 2**32, (max(nkeys, 1), w), dtype=np.uint32)
    pick = keys[rng.integers(0, max(nkeys, 1), n)]
    pre = pick[:tv]
    pre = pre[np.lexsort(pre.T[::-1])]
    return np.concatenate([pre, pick[tv:]])


@pytest.mark.parametrize("n,w,nkeys,tvfrac", [
    (1 << 12, 2, 50, 1.0),       # exactly one block
    (1 << 12, 2, 50, 0.7),       # invalid tail inside the block
    (300000, 1, 7, 0.9),         # non-multiple length -> padding; long runs
    (1 << 19, 3, 100000, 0.99),  # multiple blocks, 3-word keys
    (5000, 2, 1, 1.0),           # a single run spanning every block
    (4096, 2, 10, 0.0),          # all rows invalid
])
def test_matches_jnp_scan(n, w, nkeys, tvfrac):
    rng = np.random.default_rng(n + w)
    tv = int(n * tvfrac)
    swords = _make_sorted(rng, n, w, nkeys, tv)
    svalid = np.arange(n) < tv
    ref_w, ref_e = jax.jit(sortops.run_length_counts)(
        jnp.asarray(swords), jnp.asarray(svalid))
    got = run_length_weights_pallas(
        jnp.asarray(swords), jnp.int32(tv), interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_w), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(ref_e), np.asarray(got) > 0)


def test_run_spanning_block_boundary():
    """A run crossing the 256K-element grid-block boundary must emit one
    weight with the full length (the SMEM carry path)."""
    n = 1 << 19
    block = 2048 * 128
    swords = np.zeros((n, 2), np.uint32)
    swords[:block + 100] = 7          # run of block+100 equal keys
    swords[block + 100:] = 9
    got = np.asarray(run_length_weights_pallas(
        jnp.asarray(swords), jnp.int32(n), interpret=True))
    nz = np.flatnonzero(got)
    assert list(nz) == [block + 99, n - 1]
    assert got[block + 99] == block + 100
    assert got[n - 1] == n - (block + 100)


def test_weights_sum_and_first_invalid_equal_key():
    """Sum of weights == total_valid even when the first invalid row
    bit-equals the last valid row (the j == tv-1 guard)."""
    n = 1 << 12
    swords = np.full((n, 2), 5, np.uint32)
    tv = 1000
    got = np.asarray(run_length_weights_pallas(
        jnp.asarray(swords), jnp.int32(tv), interpret=True))
    assert got.sum() == tv
    assert got[tv - 1] == tv


@pytest.mark.parametrize("nblocks", [4, 8, 16])
def test_bitonic_merge_cols_fused_global_stages(monkeypatch, nblocks):
    """The column-native Pallas bitonic merge in interpret mode, at sizes
    that exercise BOTH global-stage parities and both fused kernels:
    nblocks=4 runs one fused two-stage pass (ngroups=1, single-buffered);
    nblocks=8 runs a double-buffered fused pass (ngroups=2) then a
    single-stage fallback; nblocks=16 runs two double-buffered passes at
    ngroups=4 (the steady-state prefetch + write-drain pattern).
    _MG_BLOCK is shrunk so the test stays fast."""
    from kmerind_tpu.ops import pallas_kernels as pk

    small_block = 1 << 10
    monkeypatch.setattr(pk, "_MG_BLOCK", small_block)
    monkeypatch.setattr(pk, "_mg_block_for", lambda ncols: small_block)
    n = nblocks * small_block
    half = n // 2
    rng = np.random.default_rng(nblocks)
    hi = rng.integers(0, 4, (2, half), dtype=np.uint32)
    lo = rng.integers(0, 2**32, (2, half), dtype=np.uint32)
    pay = rng.integers(0, 100, (2, half)).astype(np.int32)
    runs = []
    for r in range(2):
        order = np.lexsort((lo[r], hi[r]))
        runs.append((hi[r][order], lo[r][order], pay[r][order]))
    (ha, la, pa), (hb, lb, pb) = runs
    kcols = np.stack([np.concatenate([ha, hb[::-1]]),
                      np.concatenate([la, lb[::-1]])])
    payload = np.concatenate([pa, pb[::-1]])
    out_k, (out_p,) = pk._bitonic_merge_pallas_cols(
        jnp.asarray(kcols), (jnp.asarray(payload),), True)
    got = np.asarray(out_k)
    allhi = np.concatenate([ha, hb])
    alllo = np.concatenate([la, lb])
    allp = np.concatenate([pa, pb])
    order = np.lexsort((alllo, allhi))
    assert np.array_equal(got[0], allhi[order])
    assert np.array_equal(got[1], alllo[order])
    import collections
    gm = collections.Counter(zip(got[0].tolist(), got[1].tolist(),
                                 np.asarray(out_p).tolist()))
    em = collections.Counter(zip(allhi[order].tolist(),
                                 alllo[order].tolist(),
                                 allp[order].tolist()))
    assert gm == em


@pytest.mark.parametrize("nblocks,nbb", [
    (4, 2),    # nb == na: no sentinel blocks, minimum size (loop skipped)
    (8, 4),    # equal runs, one more global pass after the fused entry
    (8, 2),    # nb < na: two virtual sentinel blocks in the hi half
    (16, 1),   # heavily padded B + two follow-up double-buffered passes
])
def test_bitonic_merge_two_operand_entry(monkeypatch, nblocks, nbb):
    """The two-operand merge entry (_bitonic_merge_pallas_cols_2op) in
    interpret mode: run A ascending + run B ascending with nb <= na and
    no materialized concat/flip — B's blocks are mirrored and
    flat-reversed in VMEM, missing padded-B blocks become sentinel
    fills.  Result must equal the sorted multiset union with padding
    rows (sentinel keys, payload 0) at the tail."""
    from kmerind_tpu.ops import pallas_kernels as pk

    small_block = 1 << 10
    monkeypatch.setattr(pk, "_MG_BLOCK", small_block)
    monkeypatch.setattr(pk, "_mg_block_for", lambda ncols: small_block)
    na = (nblocks // 2) * small_block
    nb = nbb * small_block
    rng = np.random.default_rng(nblocks * 31 + nbb)
    def mk(n):
        hi = rng.integers(0, 4, n, dtype=np.uint32)
        lo = rng.integers(0, 2**32, n, dtype=np.uint32)
        pay = rng.integers(1, 100, n).astype(np.int32)
        order = np.lexsort((lo, hi))
        return hi[order], lo[order], pay[order]
    ha, la, pa = mk(na)
    hb, lb, pb = mk(nb)
    out_k, (out_p,) = pk._bitonic_merge_pallas_cols_2op(
        jnp.asarray(np.stack([ha, la])), (jnp.asarray(pa),),
        jnp.asarray(np.stack([hb, lb])), (jnp.asarray(pb),), True)
    got_k, got_p = np.asarray(out_k), np.asarray(out_p)
    n = 2 * na
    pad = n - na - nb
    allhi = np.concatenate([ha, hb, np.full(pad, 0xFFFFFFFF, np.uint32)])
    alllo = np.concatenate([la, lb, np.full(pad, 0xFFFFFFFF, np.uint32)])
    allp = np.concatenate([pa, pb, np.zeros(pad, np.int32)])
    order = np.lexsort((alllo, allhi))
    assert np.array_equal(got_k[0], allhi[order])
    assert np.array_equal(got_k[1], alllo[order])
    import collections
    gm = collections.Counter(zip(got_k[0].tolist(), got_k[1].tolist(),
                                 got_p.tolist()))
    em = collections.Counter(zip(allhi[order].tolist(),
                                 alllo[order].tolist(),
                                 allp[order].tolist()))
    assert gm == em
