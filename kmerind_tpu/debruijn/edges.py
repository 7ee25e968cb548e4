"""Edge extraction for de Bruijn graph construction.

Rebuild of the reference edge iterator
(/root/reference/test/test/debruijn/edge_iterator.hpp:56-170): for every
k-mer window, one byte packs the DNA16 one-hot codes of the neighboring
bases — upper 4 bits the LEFT (in-edge) base, lower 4 bits the RIGHT
(out-edge) base.  Terminal k-mers of a record get 0 ('.', gap — no edge
bits) on the missing side.

Canonical-strand handling: when extraction stores the reverse complement of
a window (lex_less canonicalization), the edge byte is reverse-complemented
too — halves swapped, each 4-bit code bit-reversed
(input_edge_utils::reverse_complement_edges, de_bruijn_node_trait.hpp:120-
127) — so node payload counters are always "ordered for the canonical
strand" (edge_counts doc, de_bruijn_node_trait.hpp:186-189).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabets import DNA16, Alphabet

__all__ = ["dna16_code_lut", "edge_bytes_for_windows", "revcomp_edge_byte"]


@functools.lru_cache(maxsize=None)
def dna16_code_lut(alphabet: Alphabet) -> np.ndarray:
    """uint8[size]: alphabet code -> DNA16 one-hot code
    (DNA16::FROM_ASCII[ALPHA::TO_ASCII[c]] composition,
    de_bruijn_node_trait.hpp:230-233)."""
    return DNA16.from_ascii[alphabet.to_ascii]


def _shift_idx(a, s):
    """a'[i] = a[i+s] (s may be negative: look-behind, zero fill)."""
    from ..ops.packing import _shift_idx as _fwd
    if s >= 0:
        return _fwd(a, s)
    s = -s
    pad = [(s, 0, 0)] + [(0, 0, 0)] * (a.ndim - 1)
    return jax.lax.pad(a, jnp.zeros((), a.dtype), pad)[:a.shape[0]]


@functools.partial(jax.jit, static_argnames=("k", "alphabet", "raw"))
def edge_bytes_for_windows(codes: jax.Array, valid: jax.Array,
                           seg_id: jax.Array, k: int,
                           alphabet: Alphabet, raw: bool = False) -> jax.Array:
    """uint8[n]: edge byte for the k-mer window starting at each position.

    left base = codes[i-1] if it exists, is valid, and belongs to the same
    record; right base = codes[i+k] likewise; missing sides encode as 0.

    raw=True: `codes` are raw ASCII sequence bytes — the nibble is
    DNA16::FROM_ASCII[byte] exactly like the reference's edge_iterator over
    raw chars (edge_iterator.hpp:130-170), so 'N' neighbors encode as 0xF
    (all four bases possible) instead of collapsing through the k-mer
    alphabet's LUT ('N'->'A' under DNA).  raw=False keeps the composed
    alphabet-code path for batches that no longer carry raw bytes (lossy
    for bases outside the k-mer alphabet).
    """
    lut = jnp.asarray(DNA16.from_ascii if raw else dna16_code_lut(alphabet))
    d16 = jnp.take(lut, codes.astype(jnp.int32))

    left_code = _shift_idx(d16, -1)
    left_ok = (_shift_idx(valid, -1)
               & (_shift_idx(seg_id, -1) == seg_id)
               & (jnp.arange(codes.shape[0]) >= 1))
    right_code = _shift_idx(d16, k)
    right_ok = (_shift_idx(valid, k)
                & (_shift_idx(seg_id, k) == seg_id)
                & (jnp.arange(codes.shape[0]) + k < codes.shape[0]))

    left4 = jnp.where(left_ok, left_code, 0).astype(jnp.uint8)
    right4 = jnp.where(right_ok, right_code, 0).astype(jnp.uint8)
    return (left4 << 4) | right4


def revcomp_edge_byte(edge: jax.Array) -> jax.Array:
    """Reverse-complement an edge byte: swap halves, 4-bit-reverse each
    (DNA16 complement == bit reversal)."""
    left = (edge >> 4) & jnp.uint8(0xF)
    right = edge & jnp.uint8(0xF)

    def rev4(x):
        x = x.astype(jnp.uint8)
        return (((x & 1) << 3) | ((x & 2) << 1) |
                ((x & 4) >> 1) | ((x & 8) >> 3)).astype(jnp.uint8)

    return (rev4(right) << 4) | rev4(left)


def edge_byte_to_vec(edge: jax.Array) -> jax.Array:
    """uint8[n] edge bytes -> int32[n, 9] counter increments
    [out A,C,G,T, in A,C,G,T, self] (edge_counts::update,
    de_bruijn_node_trait.hpp:195-245: one increment per set DNA16 bit)."""
    n = edge.shape[0]
    bits = jnp.stack([(edge >> b) & 1 for b in range(8)], axis=1)
    self_count = jnp.ones((n, 1), edge.dtype)
    return jnp.concatenate([bits, self_count], axis=1).astype(jnp.int32)
