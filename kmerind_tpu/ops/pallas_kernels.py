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

Alphabets whose complement is not a bit reversal (DNA_IUPAC, ASCII) fall
back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kmer import KmerSpec

__all__ = ["extract_canonical_pallas", "pallas_supported"]

_LANES = 128
_TILE = 1 << 16  # windows per grid step (multiple of _LANES)


def pallas_supported(spec: KmerSpec) -> bool:
    return (spec.alphabet.name in ("DNA", "RNA", "DNA6", "RNA6", "DNA16")
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
