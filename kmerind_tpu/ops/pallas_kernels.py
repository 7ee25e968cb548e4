"""Pallas TPU kernels for the extraction hot path.

`extract_canonical_pallas` fuses window-pack + reverse-complement +
canonicalize into ONE kernel: each grid step DMAs a tile of the base stream
(+ halo) from HBM into VMEM and runs the full log2(k)-step doubling
pipeline on-chip, writing only the final canonical words and the strand
flag.  The jnp/XLA path materializes every doubling step as an HBM
temporary (~20 × n × 4 bytes of traffic); here the intermediates never
leave VMEM — the "Pallas kernel #1" of SURVEY §7, replacing the
reference's SIMD hot loops (kmer.hpp:731-756 nextFromChar,
bitgroup_ops reverse_transform).

TPU layout: the VPU is (8, 128)-shaped and Mosaic has no 1-D rotate, so the
stream lives as a 2-D ``[rows, 128]`` tensor (element i at
``[i // 128, i % 128]``) and a stream shift by s decomposes into a static
sublane (row) shift plus a lane rotation with a row-boundary fix-up
(`_shl2`).  Wraparound garbage is confined to the final halo rows, which no
in-tile window reads (halo >= 2k, rounded to rows).

Per-alphabet complement is computed arithmetically inside the kernel,
mirroring the reference's per-alphabet `do_reverse_complement`
specializations (kmer.hpp:1619-2046):

* DNA / RNA   : comp = 3 - c          (bitwise NOT, kmer.hpp:1726-1804)
* DNA6 / RNA6 : comp = 3-bit reversal
* DNA16       : comp = 4-bit reversal (kmer.hpp:1851-1912)
* DNA_IUPAC   : 4-bit reversal with U (0) -> A (1) special case
                (alphabets.hpp:539-632 — the strict-IUPAC table is the
                DNA16 reversal except code 0 is U, whose complement is A)
* ASCII       : identity (no biological complement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kmer import KmerSpec

__all__ = ["extract_canonical_pallas", "pallas_supported",
           "run_length_weights_pallas"]

_LANES = 128
_TILE = 1 << 16  # windows per grid step (multiple of _LANES)


def pallas_supported(spec: KmerSpec) -> bool:
    return (spec.alphabet.name in ("DNA", "RNA", "DNA6", "RNA6", "DNA16",
                                   "DNA_IUPAC", "ASCII")
            and spec.k <= 512)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _complement_expr(name: str, c: jax.Array) -> jax.Array:
    """Arithmetic complement in code space (no LUT gather in-kernel)."""
    if name in ("DNA", "RNA"):
        return jnp.uint32(3) - c
    if name in ("DNA6", "RNA6"):  # 3-bit reversal
        return ((c & 1) << 2) | (c & 2) | ((c & 4) >> 2)
    if name == "DNA16":  # 4-bit reversal
        return (((c & 1) << 3) | ((c & 2) << 1)
                | ((c & 4) >> 1) | ((c & 8) >> 3))
    if name == "DNA_IUPAC":  # 4-bit reversal, except U (0) -> A (1)
        rev = (((c & 1) << 3) | ((c & 2) << 1)
               | ((c & 4) >> 1) | ((c & 8) >> 3))
        return jnp.where(c == 0, jnp.uint32(1), rev)
    if name == "ASCII":  # identity complement
        return c
    raise ValueError(name)


def _row_shift(a: jax.Array, r: int) -> jax.Array:
    """a'[i, :] = a[i + r, :], zero rows past the end (static r)."""
    if r == 0:
        return a
    pad = jnp.zeros((r, a.shape[1]), a.dtype)
    return jnp.concatenate([a[r:], pad], axis=0)


def _shl2(a: jax.Array, s: int) -> jax.Array:
    """Stream shift on [R, 128] layout: flat'[i] = flat[i + s]."""
    if s == 0:
        return a
    R, L = a.shape
    rs, ls = divmod(s, L)
    A = _row_shift(a, rs)
    if ls == 0:
        return A
    B = _row_shift(a, rs + 1)
    x1 = pltpu.roll(A, L - ls, 1)
    x2 = pltpu.roll(B, L - ls, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    return jnp.where(lane < L - ls, x1, x2)


def _make_kernel(spec: KmerSpec, tile: int, halo: int):
    b = spec.bits_per_char
    cpw = spec.chars_per_word
    r = spec.last_word_chars
    nwords = spec.nwords
    k = spec.k
    name = spec.alphabet.name
    rows_out = tile // _LANES

    def kernel(codes_hbm, words_ref, rc_ref, scratch, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            codes_hbm.at[pl.ds(i * (tile // _LANES), (tile + halo) // _LANES)],
            scratch, sem)
        cp.start()
        cp.wait()
        c = scratch[...].astype(jnp.uint32)
        cc = _complement_expr(name, c)

        # forward power packs: P_t = pack of c[i : i+2**t)
        fpows = {0: c}
        t = 1
        while (1 << t) <= max(cpw, r):
            h = 1 << (t - 1)
            prev = fpows[t - 1]
            fpows[t] = (prev << (b * h)) | _shl2(prev, h)
            t += 1

        def fwd_combine(m):
            acc, consumed = None, 0
            for tt in reversed(range(max(fpows) + 1)):
                if m & (1 << tt):
                    p = _shl2(fpows[tt], consumed)
                    acc = p if acc is None else (acc << (b * (1 << tt))) | p
                    consumed += 1 << tt
            return acc

        # reverse power packs: R_t = pack of cc[i+2**t-1], …, cc[i]
        rpows = {0: cc}
        t = 1
        while (1 << t) <= max(cpw, r):
            h = 1 << (t - 1)
            prev = rpows[t - 1]
            rpows[t] = (_shl2(prev, h) << (b * h)) | prev
            t += 1

        def rev_combine(m):
            acc, consumed = None, 0
            for tt in range(max(rpows) + 1):
                if m & (1 << tt):
                    p = _shl2(rpows[tt], consumed)
                    if consumed:
                        acc = (p << (b * consumed)) | acc
                    else:
                        acc = p
                    consumed += 1 << tt
            return acc

        full = fwd_combine(cpw)
        last = full if r == cpw else fwd_combine(r)
        rfull = rev_combine(cpw)
        rlast = rfull if r == cpw else rev_combine(r)

        fwd_cols = []
        rc_cols = []
        for w in range(nwords):
            nch = min(cpw, k - w * cpw)
            src = full if nch == cpw else last
            fwd_cols.append(_shl2(src, w * cpw)[:rows_out])
            rsrc = rfull if nch == cpw else rlast
            rc_cols.append(_shl2(rsrc, k - w * cpw - nch)[:rows_out])

        # keep the strand mask in int32 — Mosaic has no i8->i1 truncation
        less = jnp.zeros((rows_out, _LANES), dtype=jnp.int32)
        for w in reversed(range(nwords)):
            a, f = rc_cols[w], fwd_cols[w]
            less = jnp.where(a != f, (a < f).astype(jnp.int32), less)
        use_rc = less != 0
        for w in range(nwords):
            words_ref[w] = jnp.where(use_rc, rc_cols[w], fwd_cols[w])
        rc_ref[0] = less.astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def extract_canonical_pallas(codes: jax.Array, spec: KmerSpec,
                             interpret: bool = False):
    """Canonical k-mers at every window position (Pallas fused kernel).

    Same contract as `packing.extract_canonical`: returns
    (uint32[n, nwords], was_rc bool[n]); rows past n-k are garbage.
    """
    if not pallas_supported(spec):
        raise ValueError(
            f"spec {spec} not supported by the Pallas kernel; "
            "use packing.extract_canonical")
    n = codes.shape[0]
    tile = min(_TILE, _round_up(max(n, _LANES), _LANES * 8))
    halo = _round_up(2 * spec.k, _LANES * 8)
    ntiles = -(-n // tile)
    padded = ntiles * tile + halo
    c = jnp.zeros((padded,), jnp.uint8).at[:n].set(codes.astype(jnp.uint8))
    c2 = c.reshape(padded // _LANES, _LANES)

    kernel = _make_kernel(spec, tile, halo)
    rows_out = tile // _LANES
    # inside shard_map, outputs must declare the same varying mesh axes as
    # the input (vma checking) — propagate them from the traced input aval
    try:
        vma = jax.typeof(codes).vma
    except AttributeError:
        vma = frozenset()
    words, rc = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((spec.nwords, rows_out, _LANES),
                         lambda i: (0, i, 0)),
            pl.BlockSpec((1, rows_out, _LANES), lambda i: (0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (spec.nwords, ntiles * rows_out, _LANES), jnp.uint32,
                vma=vma),
            jax.ShapeDtypeStruct((1, ntiles * rows_out, _LANES), jnp.uint8,
                                 vma=vma),
        ),
        scratch_shapes=[
            pltpu.VMEM(((tile + halo) // _LANES, _LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(c2)
    words = words.reshape(spec.nwords, ntiles * tile).T[:n]
    rc = rc.reshape(ntiles * tile)[:n].astype(bool)
    return words, rc


# ---------------------------------------------------------------------------
# Run-length weights over sorted rows — single-HBM-pass scan kernel.
#
# Replaces the XLA `lax.cummax` in sortops.run_length_counts, which lowers
# to ~log2(n) full-array HBM passes (~7 ms at 16M rows); here the max-scan
# runs entirely in VMEM (two-level: lane-direction doubling + row-direction
# doubling) so the kernel reads and writes each element once.  Semantics
# match run_length_counts' (weights, emit) with emit == weights > 0: the
# LAST row of every run of equal keys carries the run's length; all other
# rows carry 0.  Requires prefix validity (rows >= total_valid dead) — the
# invariant sort_rows guarantees.  This is the segmented-reduction half of
# the count build (the reference's hash-probe += loop,
# distributed_densehash_map.hpp:278,1911).

_RL_ROWS = 2048                       # rows per grid block
_RL_BLOCK = _RL_ROWS * _LANES         # elements per grid block


def _lane_shift_right(v: jax.Array, s: int, fill) -> jax.Array:
    """out[r, l] = v[r, l-s] for l >= s else fill (static s)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane >= s, pltpu.roll(v, s, 1), fill)


def _make_rl_kernel(w: int, nrows_total: int):
    NEG = -1  # python int: jnp scalars would be captured closure constants

    def kernel(tv_ref, *refs):
        # refs: w col blocks, w next-row blocks, out block, SMEM carries
        cols = refs[:w]
        nxts = refs[w:2 * w]
        out_ref = refs[2 * w]
        carry_ref = refs[2 * w + 1]    # SMEM i32[1]: last run start so far
        prev_ref = refs[2 * w + 2]     # SMEM u32[w]: element before block
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = NEG
            for c in range(w):
                prev_ref[c] = jnp.int32(0)

        carry = carry_ref[0]
        tv = tv_ref[0]
        base = i * _RL_BLOCK
        row_i = jax.lax.broadcasted_iota(jnp.int32, (_RL_ROWS, _LANES), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (_RL_ROWS, _LANES), 1)
        j2 = base + row_i * _LANES + lane_i
        live = j2 < tv

        # neighbor access uses roll + masked fills only — Mosaic's
        # concatenate on sliced operands hits layout-offset limits
        neq_prev = jnp.zeros((_RL_ROWS, _LANES), jnp.bool_)
        neq_next = jnp.zeros((_RL_ROWS, _LANES), jnp.bool_)
        for c in range(w):
            # work in i32 (bitcast): Mosaic has no unsigned reductions,
            # and equality is bit-equality either way
            x = pltpu.bitcast(cols[c][...], jnp.int32)
            # prev element in linear order
            y = pltpu.roll(x, 1, 1)                   # y[r,0] = x[r,127]
            y_dn = jnp.where(row_i >= 1, pltpu.roll(y, 1, 0), prev_ref[c])
            prv = jnp.where(lane_i == 0, y_dn, y)
            neq_prev = neq_prev | (prv != x)
            # next element in linear order
            z = pltpu.roll(x, _LANES - 1, 1)          # z[r,127] = x[r,0]
            nb = pltpu.bitcast(nxts[c][...], jnp.int32)     # [8, 128]
            nrow = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 0)
            nlane = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 1)
            nxt_fill = jnp.max(jnp.where((nrow == 0) & (nlane == 0),
                                         nb, jnp.int32(-(1 << 31))))
            z_up = jnp.where(row_i < _RL_ROWS - 1,
                             pltpu.roll(z, _RL_ROWS - 1, 0), nxt_fill)
            nxt = jnp.where(lane_i == _LANES - 1, z_up, z)
            neq_next = neq_next | (nxt != x)
            # x[R-1, 127] as a masked-reduction scalar (no vector.extract)
            prev_ref[c] = jnp.max(jnp.where(
                (row_i == _RL_ROWS - 1) & (lane_i == _LANES - 1),
                x, jnp.int32(-(1 << 31))))

        is_new = live & ((j2 == 0) | neq_prev)
        v = jnp.where(is_new, j2, NEG)
        # lane-direction inclusive max-scan (7 doubling steps)
        s = 1
        while s < _LANES:
            v = jnp.maximum(v, _lane_shift_right(v, s, NEG))
            s *= 2
        # row-direction scan: mask everything but lane 127, scan down rows
        u = jnp.where(lane_i == _LANES - 1, v, NEG)
        s = 1
        while s < _RL_ROWS:
            u = jnp.maximum(
                u, jnp.where(row_i >= s, pltpu.roll(u, s, 0), NEG))
            s *= 2
        # exclusive per-row prefix (broadcast along lanes), carry-seeded
        u1 = jnp.where(row_i >= 1, pltpu.roll(u, 1, 0), NEG)
        rexc = jnp.maximum(
            jnp.max(jnp.where(lane_i == _LANES - 1, u1, NEG),
                    axis=1, keepdims=True),
            carry)
        start = jnp.maximum(v, rexc)
        is_last = live & (neq_next | (j2 == tv - 1))
        out_ref[...] = jnp.where(is_last, j2 - start + 1, 0)
        carry_ref[0] = jnp.maximum(carry, jnp.max(u))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def run_length_weights_pallas(sorted_words: jax.Array,
                              total_valid: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """weights int32[n]: run length at each run's last row, else 0.

    sorted_words: uint32[n, w], rows sorted lexicographically with all
    valid rows first (prefix validity); total_valid: int32 scalar.
    """
    n, w = sorted_words.shape
    npad = _round_up(max(n, _RL_BLOCK), _RL_BLOCK)
    cols = []
    for c in range(w):
        col = sorted_words[:, c]
        if npad != n:
            col = jnp.pad(col, (0, npad - n))
        cols.append(col.reshape(npad // _LANES, _LANES))
    nrows = npad // _LANES
    ntiles = npad // _RL_BLOCK
    tv = jnp.reshape(total_valid.astype(jnp.int32), (1,))
    try:
        vma = jax.typeof(sorted_words).vma
    except AttributeError:
        vma = frozenset()
    col_spec = pl.BlockSpec((_RL_ROWS, _LANES), lambda i: (i, 0))
    # one-row lookahead: the first element of block i+1 (clamped for the
    # last block, where it is unused).  Index map is in BLOCK units and the
    # block height must be a multiple of 8 (Mosaic tiling).
    nxt_spec = pl.BlockSpec(
        (8, _LANES),
        lambda i: (jnp.minimum((i + 1) * (_RL_ROWS // 8), nrows // 8 - 1), 0))
    weights = pl.pallas_call(
        _make_rl_kernel(w, nrows),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [col_spec] * w + [nxt_spec] * w,
        out_specs=pl.BlockSpec((_RL_ROWS, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nrows, _LANES), jnp.int32, vma=vma),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((w,), jnp.int32),
        ],
        interpret=interpret,
    )(tv, *cols, *cols)
    return weights.reshape(npad)[:n]


# ---------------------------------------------------------------------------
# Bitonic MERGE of two sorted runs — the count-index flush kernel.
#
# The flush merges the sorted store with a sorted ingest run.  XLA's sort
# re-pays the full log^2(n) network (measured 413 ms for 16.7M+16.7M rows
# incl. compaction); a merge needs only the log2(n) half-cleaner stages.
# XLA executes one elementwise stage in ~3.6 ms at 33M rows (4x off HBM
# bandwidth: the roll/stack lowering copies more than it must), so the
# stages run here instead:
#
# * GLOBAL stages (pair distance d >= block): one pallas_call per stage,
#   in-place via input_output_aliases — each grid step DMAs the XOR-pair
#   of blocks into VMEM, compare-exchanges, and DMAs back.  Exactly
#   8 bytes/row read + 8 written per column per stage.
# * LOCAL stages (d < block): ONE pallas_call; each block runs all
#   log2(block) remaining stages in VMEM (the intermediates never touch
#   HBM), with XOR-partner access via row/lane rolls.
#
# Compare-exchange on multi-word keys is the lexicographic fold of
# bitgroup_ops' array compare (bitgroup_ops.hpp:3539-3575); payload columns
# ride along unexamined.

_MG_BLOCK = 1 << 17           # elements per block (= 1024 rows x 128 lanes)


def _mg_block_for(ncols: int) -> int:
    """Merge block size by operand count: narrow column mixes (the
    count family's keys-only unit merges, the de Bruijn keys+ebyte
    merges) take 2^18-element blocks — per-pass DMA count halves and
    one whole global stage moves into the fused local pass — while
    wide mixes keep 2^17 so the 8-resident-block double-buffered global
    kernel stays inside VMEM."""
    return _MG_BLOCK * 2 if ncols <= 3 else _MG_BLOCK
_MERGE_SENTINEL = 0xFFFFFFFF  # padding key (run-store convention: weight 0)


def _lex_gt(this_cols, partner_cols, w):
    """this > partner lexicographically over the first w columns.

    Folds in int32 (Mosaic cannot select between i1 vectors) and returns
    a bool mask."""
    gt = None
    for j in reversed(range(w)):
        a, b = this_cols[j], partner_cols[j]
        g = (a > b).astype(jnp.int32)
        gt = g if gt is None else jnp.where(a != b, g, gt)
    return gt != 0


def _lex_lt(this_cols, partner_cols, w):
    lt = None
    for j in reversed(range(w)):
        a, b = this_cols[j], partner_cols[j]
        l = (a < b).astype(jnp.int32)
        lt = l if lt is None else jnp.where(a != b, l, lt)
    return lt != 0


def _make_global_stage_kernel(ncols: int, w: int, rows: int, db: int):
    """Compare-exchange block lo with block lo + db (block units)."""

    def kernel(*refs):
        ins = refs[:ncols]
        outs = refs[ncols:2 * ncols]
        slo = refs[2 * ncols:3 * ncols]
        shi = refs[3 * ncols:4 * ncols]
        sem = refs[4 * ncols]
        j = pl.program_id(0)
        lo_blk = (j // db) * (2 * db) + (j % db)
        hi_blk = lo_blk + db
        for c in range(ncols):
            pltpu.make_async_copy(
                ins[c].at[pl.ds(lo_blk * rows, rows)], slo[c],
                sem.at[0, c]).start()
            pltpu.make_async_copy(
                ins[c].at[pl.ds(hi_blk * rows, rows)], shi[c],
                sem.at[1, c]).start()
        for c in range(ncols):
            pltpu.make_async_copy(
                ins[c].at[pl.ds(lo_blk * rows, rows)], slo[c],
                sem.at[0, c]).wait()
            pltpu.make_async_copy(
                ins[c].at[pl.ds(hi_blk * rows, rows)], shi[c],
                sem.at[1, c]).wait()
        lo_vals = [slo[c][...] for c in range(ncols)]
        hi_vals = [shi[c][...] for c in range(ncols)]
        swap = _lex_gt(lo_vals, hi_vals, w)
        for c in range(ncols):
            slo[c][...] = jnp.where(swap, hi_vals[c], lo_vals[c])
            shi[c][...] = jnp.where(swap, lo_vals[c], hi_vals[c])
        for c in range(ncols):
            pltpu.make_async_copy(
                slo[c], outs[c].at[pl.ds(lo_blk * rows, rows)],
                sem.at[0, c]).start()
            pltpu.make_async_copy(
                shi[c], outs[c].at[pl.ds(hi_blk * rows, rows)],
                sem.at[1, c]).start()
        for c in range(ncols):
            pltpu.make_async_copy(
                slo[c], outs[c].at[pl.ds(lo_blk * rows, rows)],
                sem.at[0, c]).wait()
            pltpu.make_async_copy(
                shi[c], outs[c].at[pl.ds(hi_blk * rows, rows)],
                sem.at[1, c]).wait()

    return kernel


def _make_global_stage2_kernel(ncols: int, w: int, rows: int, db: int):
    """TWO consecutive global stages (block distances db, db/2) fused in
    one pass: 4 blocks resident in VMEM, compare-exchange (x, x+db) and
    (x+db/2, x+db+db/2), then (x, x+db/2) and (x+db, x+db+db/2).  Halves
    both the HBM traffic and the per-stage DMA latency of the global
    phase (measured 2.4 ms marginal per single-stage pass vs ~1 ms of
    pure bandwidth)."""
    db2 = db // 2

    def kernel(*refs):
        ins = refs[:ncols]
        outs = refs[ncols:2 * ncols]
        bufs = [refs[(2 + b) * ncols:(3 + b) * ncols] for b in range(4)]
        sem = refs[6 * ncols]
        j = pl.program_id(0)
        # base block x: group index j with zero bits inserted at the db2
        # and db block-bit positions
        x = (j % db2) + (j // db2) * (2 * db2)
        x = (x % db) + (x // db) * (2 * db)
        blks = (x, x + db2, x + db, x + db + db2)
        for b in range(4):
            for c in range(ncols):
                pltpu.make_async_copy(
                    ins[c].at[pl.ds(blks[b] * rows, rows)], bufs[b][c],
                    sem.at[b, c]).start()
        for b in range(4):
            for c in range(ncols):
                pltpu.make_async_copy(
                    ins[c].at[pl.ds(blks[b] * rows, rows)], bufs[b][c],
                    sem.at[b, c]).wait()
        vals = [[bufs[b][c][...] for c in range(ncols)] for b in range(4)]

        def cmpex(lo, hi):
            swap = _lex_gt(lo, hi, w)
            new_lo = [jnp.where(swap, h, l) for l, h in zip(lo, hi)]
            new_hi = [jnp.where(swap, l, h) for l, h in zip(lo, hi)]
            return new_lo, new_hi

        # stage with distance db (blocks 0<->2, 1<->3)
        vals[0], vals[2] = cmpex(vals[0], vals[2])
        vals[1], vals[3] = cmpex(vals[1], vals[3])
        # stage with distance db/2 (blocks 0<->1, 2<->3)
        vals[0], vals[1] = cmpex(vals[0], vals[1])
        vals[2], vals[3] = cmpex(vals[2], vals[3])
        for b in range(4):
            for c in range(ncols):
                bufs[b][c][...] = vals[b][c]
        for b in range(4):
            for c in range(ncols):
                pltpu.make_async_copy(
                    bufs[b][c], outs[c].at[pl.ds(blks[b] * rows, rows)],
                    sem.at[b, c]).start()
        for b in range(4):
            for c in range(ncols):
                pltpu.make_async_copy(
                    bufs[b][c], outs[c].at[pl.ds(blks[b] * rows, rows)],
                    sem.at[b, c]).wait()

    return kernel


def _make_global_stage2_db_kernel(ncols: int, w: int, rows: int, db: int,
                                  ngroups: int):
    """Double-buffered twin of `_make_global_stage2_kernel`: grid steps
    run sequentially on the core, so step j prefetches group j+1's four
    blocks into the OTHER buffer set while computing group j — the
    per-pass DMA latency (~1.4 ms beyond bandwidth at 33.5M rows) hides
    behind compute.  Needs 2x the VMEM (8 blocks resident), so the
    dispatcher gates it to ncols <= 3."""
    db2 = db // 2

    def kernel(*refs):
        ins = refs[:ncols]
        outs = refs[ncols:2 * ncols]
        # two buffer sets of 4 blocks x ncols
        bufs = [[refs[2 * ncols + (s * 4 + b) * ncols:
                      2 * ncols + (s * 4 + b + 1) * ncols]
                 for b in range(4)] for s in range(2)]
        sem_r = refs[10 * ncols]      # (2, 4, ncols) read DMAs
        sem_w = refs[10 * ncols + 1]  # (2, 4, ncols) write DMAs
        j = pl.program_id(0)
        cur = jax.lax.rem(j, 2)

        def blocks_of(g):
            x = (g % db2) + (g // db2) * (2 * db2)
            x = (x % db) + (x // db) * (2 * db)
            return (x, x + db2, x + db, x + db + db2)

        def start_reads(g, s):
            blks = blocks_of(g)
            for b in range(4):
                for c in range(ncols):
                    pltpu.make_async_copy(
                        ins[c].at[pl.ds(blks[b] * rows, rows)],
                        bufs_sel(s)[b][c], sem_r.at[s, b, c]).start()

        def bufs_sel(s):
            # s is traced (0/1); pick buffers via lax.cond-free python
            # branch is impossible — instead both sets are addressed with
            # pl.when below, so this helper takes a PYTHON int
            return bufs[s]

        # j == 0 prologue: fetch group 0 into set 0
        @pl.when(j == 0)
        def _():
            start_reads(0, 0)

        # prefetch group j+1 into set (j+1)%2 — after that set's previous
        # writes (group j-1) have drained
        for s in range(2):  # python-unrolled over the two sets
            @pl.when((cur == 1 - s) & (j + 1 < ngroups))
            def _(s=s):
                if ngroups >= 2:
                    @pl.when(j >= 1)
                    def _():
                        for b in range(4):
                            for c in range(ncols):
                                pltpu.make_async_copy(
                                    bufs[s][b][c],
                                    outs[c].at[pl.ds(0, rows)],
                                    sem_w.at[s, b, c]).wait()
                start_reads(j + 1, s)

        def cmpex(lo, hi):
            swap = _lex_gt(lo, hi, w)
            new_lo = [jnp.where(swap, h, l) for l, h in zip(lo, hi)]
            new_hi = [jnp.where(swap, l, h) for l, h in zip(lo, hi)]
            return new_lo, new_hi

        for s in range(2):
            @pl.when(cur == s)
            def _(s=s):
                for b in range(4):
                    for c in range(ncols):
                        pltpu.make_async_copy(
                            ins[c].at[pl.ds(0, rows)], bufs[s][b][c],
                            sem_r.at[s, b, c]).wait()
                vals = [[bufs[s][b][c][...] for c in range(ncols)]
                        for b in range(4)]
                vals[0], vals[2] = cmpex(vals[0], vals[2])
                vals[1], vals[3] = cmpex(vals[1], vals[3])
                vals[0], vals[1] = cmpex(vals[0], vals[1])
                vals[2], vals[3] = cmpex(vals[2], vals[3])
                blks = blocks_of(j)
                for b in range(4):
                    for c in range(ncols):
                        bufs[s][b][c][...] = vals[b][c]
                for b in range(4):
                    for c in range(ncols):
                        pltpu.make_async_copy(
                            bufs[s][b][c],
                            outs[c].at[pl.ds(blks[b] * rows, rows)],
                            sem_w.at[s, b, c]).start()
                # final step(s): drain writes before the kernel ends
                @pl.when(j == ngroups - 1)
                def _():
                    for b in range(4):
                        for c in range(ncols):
                            pltpu.make_async_copy(
                                bufs[s][b][c],
                                outs[c].at[pl.ds(blks[b] * rows, rows)],
                                sem_w.at[s, b, c]).wait()
                    if ngroups >= 2:
                        for b in range(4):
                            for c in range(ncols):
                                pltpu.make_async_copy(
                                    bufs[1 - s][b][c],
                                    outs[c].at[pl.ds(0, rows)],
                                    sem_w.at[1 - s, b, c]).wait()

    return kernel


def _rev_flat(x, rows):
    """Reverse the FLAT element order of a [rows, _LANES] VMEM block
    (element i lives at [i//128, i%128]).  Mosaic cannot lower a reverse
    directly; with pow2 extents the flat reverse is i -> i XOR (n-1),
    which splits into independent XOR-butterflies on each axis — log2
    unconditional roll-select stages apiece."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    d = rows // 2
    while d >= 1:
        up = pltpu.roll(x, rows - d, 0)
        dn = pltpu.roll(x, d, 0)
        x = jnp.where((row_i & d) == 0, up, dn)
        d //= 2
    d = _LANES // 2
    while d >= 1:
        up = pltpu.roll(x, _LANES - d, 1)
        dn = pltpu.roll(x, d, 1)
        x = jnp.where((lane_i & d) == 0, up, dn)
        d //= 2
    return x


def _make_first_stage2_2op_kernel(ncols: int, w: int, rows: int, nb4: int,
                                  nbb: int, sentinel: int, dtypes):
    """Fused first TWO merge stages reading the sorted runs DIRECTLY.

    Replaces the `concat([a, pad(b)[::-1]])` materialization feeding the
    bitonic network — measured 34 ms per 33.5M-row merge on v5e, 2x the
    whole compare-exchange kernel — with zero extra HBM traffic: run A's
    blocks ARE the ascending lo half of the virtual concat; run B's
    blocks are mirrored (V block k reads padded-B block nblocks-1-k) and
    flat-reversed in VMEM (`_rev_flat`) to form the descending hi half.
    Padded-B blocks at index >= nbb never existed — their buffers are
    filled with the sentinel key / zero payloads instead of a DMA.

    Grid group j handles V blocks (j, j+nb4, j+2nb4, j+3nb4): the
    distance-n/2 half-cleaner pairs (0,2) and (1,3) across the halves,
    then the distance-n/4 stage pairs (0,1) and (2,3) within each —
    same two-stages-per-HBM-pass shape as `_make_global_stage2_kernel`.
    """
    nb2 = 2 * nb4

    def kernel(*refs):
        ins_a = refs[:ncols]
        ins_b = refs[ncols:2 * ncols]
        outs = refs[2 * ncols:3 * ncols]
        bufs = [refs[(3 + b) * ncols:(4 + b) * ncols] for b in range(4)]
        sem = refs[7 * ncols]
        j = pl.program_id(0)
        vblks = (j, j + nb4, j + nb2, j + nb2 + nb4)
        ablks = (j, j + nb4)
        bblks = (nb2 - 1 - j, nb4 - 1 - j)
        for b in range(2):
            for c in range(ncols):
                pltpu.make_async_copy(
                    ins_a[c].at[pl.ds(ablks[b] * rows, rows)], bufs[b][c],
                    sem.at[b, c]).start()
        for b in range(2):
            @pl.when(bblks[b] < nbb)
            def _(b=b):
                for c in range(ncols):
                    pltpu.make_async_copy(
                        ins_b[c].at[pl.ds(bblks[b] * rows, rows)],
                        bufs[2 + b][c], sem.at[2 + b, c]).start()
        for b in range(2):
            for c in range(ncols):
                pltpu.make_async_copy(
                    ins_a[c].at[pl.ds(ablks[b] * rows, rows)], bufs[b][c],
                    sem.at[b, c]).wait()
        for b in range(2):
            @pl.when(bblks[b] < nbb)
            def _(b=b):
                for c in range(ncols):
                    pltpu.make_async_copy(
                        ins_b[c].at[pl.ds(bblks[b] * rows, rows)],
                        bufs[2 + b][c], sem.at[2 + b, c]).wait()

            @pl.when(bblks[b] >= nbb)
            def _(b=b):
                for c in range(ncols):
                    fill = sentinel if c < w else 0
                    bufs[2 + b][c][...] = jnp.full(
                        (rows, _LANES), fill, dtypes[c])
        vals = [[bufs[b][c][...] for c in range(ncols)] for b in range(4)]
        # mirrored-block reverse puts the B halves in virtual-concat order
        # (reversing a uniform sentinel block is a harmless no-op)
        for b in (2, 3):
            vals[b] = [_rev_flat(v, rows) for v in vals[b]]

        def cmpex(lo, hi):
            swap = _lex_gt(lo, hi, w)
            new_lo = [jnp.where(swap, h, l) for l, h in zip(lo, hi)]
            new_hi = [jnp.where(swap, l, h) for l, h in zip(lo, hi)]
            return new_lo, new_hi

        vals[0], vals[2] = cmpex(vals[0], vals[2])
        vals[1], vals[3] = cmpex(vals[1], vals[3])
        vals[0], vals[1] = cmpex(vals[0], vals[1])
        vals[2], vals[3] = cmpex(vals[2], vals[3])
        for b in range(4):
            for c in range(ncols):
                bufs[b][c][...] = vals[b][c]
        for b in range(4):
            for c in range(ncols):
                pltpu.make_async_copy(
                    bufs[b][c], outs[c].at[pl.ds(vblks[b] * rows, rows)],
                    sem.at[b, c]).start()
        for b in range(4):
            for c in range(ncols):
                pltpu.make_async_copy(
                    bufs[b][c], outs[c].at[pl.ds(vblks[b] * rows, rows)],
                    sem.at[b, c]).wait()

    return kernel


def _make_local_stages_kernel(ncols: int, w: int, rows: int, first_d: int):
    """All stages with distance first_d, first_d/2, …, 1 inside one VMEM
    block of rows*128 elements (flat order element i at [i//128, i%128])."""

    def kernel(*refs):
        ins = refs[:ncols]
        outs = refs[ncols:2 * ncols]
        xs = [ins[c][...] for c in range(ncols)]
        row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        d = first_d
        while d >= 1:
            if d >= _LANES:
                dr = d // _LANES
                ups = [pltpu.roll(x, rows - dr, 0) for x in xs]
                dns = [pltpu.roll(x, dr, 0) for x in xs]
                is_lo = (row_i & dr) == 0
            else:
                ups = [pltpu.roll(x, _LANES - d, 1) for x in xs]
                dns = [pltpu.roll(x, d, 1) for x in xs]
                is_lo = (lane_i & d) == 0
            partner = [jnp.where(is_lo, u, dn)
                       for u, dn in zip(ups, dns)]
            gt = _lex_gt(xs, partner, w)
            lt = _lex_lt(xs, partner, w)
            # select between int32 masks, not i1 vectors (Mosaic limit)
            take = jnp.where(is_lo, gt.astype(jnp.int32),
                             lt.astype(jnp.int32)) != 0
            xs = [jnp.where(take, p, x) for x, p in zip(xs, partner)]
            d //= 2
        for c in range(ncols):
            outs[c][...] = xs[c]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_merge_pallas(keys: jax.Array, payloads=(), interpret: bool = False):
    """Sort a bitonic row sequence (ascending then descending halves).

    Same contract as sortops.bitonic_merge: keys uint32[n, w] with n a
    power of two >= 2*_MG_BLOCK handled here (smaller inputs should use
    the XLA path), payloads carried through the exchanges.
    """
    n, w = keys.shape
    kcols = jnp.stack([keys[:, j] for j in range(w)], axis=0)
    out_cols, out_payloads = _bitonic_merge_pallas_cols(
        kcols, tuple(payloads), interpret)
    return (jnp.stack([out_cols[j] for j in range(w)], axis=1),
            out_payloads)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_merge_pallas_cols(kcols: jax.Array, payloads=(),
                              interpret: bool = False):
    """`bitonic_merge_pallas` over COLUMN-major keys (uint32[w, n]).

    The run store's native layout: every operand is a contiguous [n]
    vector, so the (rows, 128) VMEM blocking is a free reshape — none of
    the strided [n, w] column extract / restack the row-major wrapper
    pays (measured ~13 ms per 33M-row merge)."""
    return _bitonic_merge_pallas_cols(kcols, tuple(payloads), interpret)


def _bitonic_merge_pallas_cols(kcols, payloads, interpret):
    w, n = kcols.shape
    blk = _mg_block_for(w + len(payloads))
    assert n & (n - 1) == 0 and n % blk == 0
    rows_total = n // _LANES
    cols = [kcols[j].reshape(rows_total, _LANES) for j in range(w)]
    for p in payloads:
        cols.append(p.reshape(rows_total, _LANES))
    keys = kcols  # vma probe below needs a representative operand
    try:
        vma = jax.typeof(keys).vma
    except AttributeError:
        vma = frozenset()
    shapes = [jax.ShapeDtypeStruct((rows_total, _LANES), c.dtype, vma=vma)
              for c in cols]
    return _merge_stage_loop(cols, shapes, w, n, n // 2, interpret, blk)


def _bitonic_merge_pallas_cols_2op(a_kcols, a_payloads, b_kcols, b_payloads,
                                   interpret):
    """Two-operand bitonic merge: the first TWO global stages read runs A
    and B directly (`_make_first_stage2_2op_kernel`), so the bitonic
    concat `[a, pad(b)[::-1]]` is never materialized — that XLA
    concat/flip pass measured 34 ms per 33.5M-row merge on v5e, 2x the
    whole compare-exchange network.

    Preconditions (the dispatcher `sortops.merge_sorted_runs_cols`
    falls back to the concat path otherwise): n = 2*na is the output
    size, na == n/2 (run caps are powers of two by construction),
    nb % _MG_BLOCK == 0, n >= 4*_MG_BLOCK.
    """
    w, na = a_kcols.shape
    nb = b_kcols.shape[1]
    n = 2 * na
    blk = _mg_block_for(len(a_payloads) + w)
    assert n % (4 * blk) == 0 and nb % blk == 0 and 0 < nb <= na
    rows_total = n // _LANES
    brows = blk // _LANES
    a_cols = [a_kcols[j].reshape(na // _LANES, _LANES) for j in range(w)]
    b_cols = [b_kcols[j].reshape(nb // _LANES, _LANES) for j in range(w)]
    for pa, pb in zip(a_payloads, b_payloads):
        a_cols.append(pa.reshape(na // _LANES, _LANES))
        b_cols.append(pb.reshape(nb // _LANES, _LANES))
    ncols = len(a_cols)
    try:
        vma = jax.typeof(a_kcols).vma
    except AttributeError:
        vma = frozenset()
    shapes = [jax.ShapeDtypeStruct((rows_total, _LANES), c.dtype, vma=vma)
              for c in a_cols]
    dtypes = [c.dtype for c in a_cols]
    nb4 = n // (4 * blk)
    nbb = nb // blk
    cols = pl.pallas_call(
        _make_first_stage2_2op_kernel(ncols, w, brows, nb4, nbb,
                                      _MERGE_SENTINEL, dtypes),
        grid=(nb4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * ncols),
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * ncols),
        out_shape=tuple(shapes),
        scratch_shapes=(
            [pltpu.VMEM((brows, _LANES), dt)
             for _ in range(4) for dt in dtypes]
            + [pltpu.SemaphoreType.DMA((4, ncols))]),
        # 4 resident blocks + the _rev_flat roll temporaries exceed the
        # 16 MB scoped-vmem default at ncols >= 4 (18.8 MB measured at
        # ncols=5); physical VMEM accommodates this (the double-buffered
        # global kernel already runs at 28 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=4 * ncols * blk * 4
            + 24 * 1024 * 1024),
        interpret=interpret,
    )(*a_cols, *b_cols)
    return _merge_stage_loop(list(cols), shapes, w, n, n // 8, interpret,
                             blk)


def _merge_stage_loop(cols, shapes, w, n, d0, interpret,
                      blk: int = _MG_BLOCK):
    """Run the bitonic half-cleaner stages at distances d0, d0/2, …, 1
    over materialized [n/128, 128] VMEM-blocked columns (global paired /
    double-buffered passes down to the block size, then one fused local
    pass), and restack the outputs."""
    ncols = len(cols)
    brows = blk // _LANES

    # global stages: d = d0 … _MG_BLOCK, fused in PAIRS (4 blocks in
    # VMEM, two compare-exchange stages per HBM pass) while two stages
    # remain; a single odd stage falls back to the pair-exchange kernel
    d = d0
    while d >= blk:
        db = d // blk
        if d >= 2 * blk:
            ngroups = n // (4 * blk)
            if ncols <= 5 and ngroups >= 2:
                # double-buffered: 8 blocks resident (12 MB at ncols=3,
                # 20 MB at k=63's ncols=5), next group prefetches during
                # compute
                cols = pl.pallas_call(
                    _make_global_stage2_db_kernel(ncols, w, brows, db,
                                                  ngroups),
                    grid=(ngroups,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ncols,
                    out_specs=tuple(
                        [pl.BlockSpec(memory_space=pl.ANY)] * ncols),
                    out_shape=tuple(shapes),
                    input_output_aliases={c: c for c in range(ncols)},
                    scratch_shapes=(
                        [pltpu.VMEM((brows, _LANES), c.dtype)
                         for _ in range(8) for c in cols]
                        + [pltpu.SemaphoreType.DMA((2, 4, ncols)),
                           pltpu.SemaphoreType.DMA((2, 4, ncols))]),
                    # 8 resident blocks exceed the 16 MB scoped-vmem
                    # default; v5e physical VMEM accommodates this
                    # (+16 MB headroom for compare-exchange temporaries —
                    # payload-heavy ncols=5 mixes measured 31.5 MB)
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=8 * ncols * blk * 4
                        + 24 * 1024 * 1024),
                    interpret=interpret,
                )(*cols)
            else:
                cols = pl.pallas_call(
                    _make_global_stage2_kernel(ncols, w, brows, db),
                    grid=(ngroups,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ncols,
                    out_specs=tuple(
                        [pl.BlockSpec(memory_space=pl.ANY)] * ncols),
                    out_shape=tuple(shapes),
                    input_output_aliases={c: c for c in range(ncols)},
                    scratch_shapes=(
                        [pltpu.VMEM((brows, _LANES), c.dtype)
                         for _ in range(4) for c in cols]
                        + [pltpu.SemaphoreType.DMA((4, ncols))]),
                    interpret=interpret,
                )(*cols)
            cols = list(cols)
            d //= 4
            continue
        cols = pl.pallas_call(
            _make_global_stage_kernel(ncols, w, brows, db),
            grid=(n // (2 * blk),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ncols,
            out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * ncols),
            out_shape=tuple(shapes),
            input_output_aliases={c: c for c in range(ncols)},
            scratch_shapes=(
                [pltpu.VMEM((brows, _LANES), c.dtype) for c in cols]
                + [pltpu.VMEM((brows, _LANES), c.dtype) for c in cols]
                + [pltpu.SemaphoreType.DMA((2, ncols))]),
            interpret=interpret,
        )(*cols)
        cols = list(cols)
        d //= 2

    # local stages: one call, every block runs log2(blk) stages in VMEM
    blk_spec = pl.BlockSpec((brows, _LANES), lambda b: (b, 0))
    cols = pl.pallas_call(
        _make_local_stages_kernel(ncols, w, brows, blk // 2),
        grid=(n // blk,),
        in_specs=[blk_spec] * ncols,
        out_specs=tuple([blk_spec] * ncols),
        out_shape=tuple(shapes),
        # payload-heavy column mixes (e.g. the multimap's ncols=5, w=2)
        # need more than the 16 MB scoped-vmem default for the roll/
        # select temporaries (21.2 MB measured)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=4 * ncols * blk * 4
            + 24 * 1024 * 1024),
        interpret=interpret,
    )(*cols)

    out_keys = jnp.stack([cols[j].reshape(n) for j in range(w)], axis=0)
    out_payloads = tuple(c.reshape(n) for c in cols[w:])
    return out_keys, out_payloads


# ---------------------------------------------------------------------------
# Inclusive int32 prefix sum — single-HBM-pass scan kernel.
#
# The run store rebuilds its weight prefix sum after every merge; XLA's
# cumsum at 33M rows costs ~11 ms (log-passes), this kernel ~1 (read and
# write each element once; the scan itself lives in VMEM).  Same two-level
# (lane-doubling + row-doubling) structure as the run-length kernel above,
# with an SMEM carry across sequential grid steps.

_PS_ROWS = 2048
_PS_BLOCK = _PS_ROWS * _LANES


def _make_ps_kernel():
    def kernel(x_ref, out_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[0] = jnp.int32(0)

        x = x_ref[...]
        row_i = jax.lax.broadcasted_iota(jnp.int32, (_PS_ROWS, _LANES), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (_PS_ROWS, _LANES), 1)
        # inclusive scan along lanes (7 doubling steps)
        v = x
        s = 1
        while s < _LANES:
            sh = pltpu.roll(v, s, 1)
            v = v + jnp.where(lane_i >= s, sh, 0)
            s *= 2
        # row totals live in lane 127; scan them down the rows
        u = jnp.where(lane_i == _LANES - 1, v, 0)
        s = 1
        while s < _PS_ROWS:
            sh = pltpu.roll(u, s, 0)
            u = u + jnp.where(row_i >= s, sh, 0)
            s *= 2
        # exclusive row prefix, broadcast along lanes
        u1 = jnp.where(row_i >= 1, pltpu.roll(u, 1, 0), 0)
        row_excl = jnp.max(jnp.where(lane_i == _LANES - 1, u1,
                                     jnp.int32(-2147483648)),
                           axis=1, keepdims=True)
        out = v + row_excl + carry_ref[0]
        out_ref[...] = out
        # block total = value at [R-1, 127]
        carry_ref[0] = jnp.max(jnp.where(
            (row_i == _PS_ROWS - 1) & (lane_i == _LANES - 1), out,
            jnp.int32(-2147483648)))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefix_sum_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Inclusive prefix sum of int32[n] in one HBM pass."""
    n = x.shape[0]
    npad = _round_up(max(n, _PS_BLOCK), _PS_BLOCK)
    xp = x if npad == n else jnp.pad(x, (0, npad - n))
    xp = xp.reshape(npad // _LANES, _LANES)
    try:
        vma = jax.typeof(x).vma
    except AttributeError:
        vma = frozenset()
    out = pl.pallas_call(
        _make_ps_kernel(),
        grid=(npad // _PS_BLOCK,),
        in_specs=[pl.BlockSpec((_PS_ROWS, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_PS_ROWS, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad // _LANES, _LANES), jnp.int32,
                                       vma=vma),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(xp)
    return out.reshape(npad)[:n]
