"""Packed sequence storage — PackedString equivalent.

The reference's ``PackedStringImpl<BITS_PER_CHAR>`` + ``PackingIterator``
(/root/reference/src/common/packed_string.hpp:58,
src/common/packing_iterators.hpp:121) store a character sequence at
bits-per-char density for compact retention.  The tensor equivalent packs a
code array into uint32 words (char-aligned, first char most significant
within each word — same convention as the k-mer layout) and back.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_string", "unpack_string", "packed_nbytes"]


def _cpw(bits: int) -> int:
    return 32 // bits


def packed_nbytes(n_chars: int, bits: int) -> int:
    return 4 * (-(-n_chars // _cpw(bits)))


def pack_string(codes: np.ndarray, bits: int) -> np.ndarray:
    """uint8 codes -> uint32 words; last word right-aligned."""
    codes = np.asarray(codes, dtype=np.uint32)
    cpw = _cpw(bits)
    n = codes.shape[0]
    nwords = -(-n // cpw)
    padded = np.zeros(nwords * cpw, np.uint32)
    padded[:n] = codes
    words = np.zeros(nwords, np.uint32)
    for j in range(cpw):
        words = (words << np.uint32(bits)) | padded[j::cpw]
    # right-align the final partial word
    rem = n - (nwords - 1) * cpw
    if rem != cpw:
        words[-1] >>= np.uint32(bits * (cpw - rem))
    return words


def unpack_string(words: np.ndarray, n_chars: int, bits: int) -> np.ndarray:
    """uint32 words -> uint8 codes (first n_chars)."""
    words = np.asarray(words, dtype=np.uint32)
    cpw = _cpw(bits)
    mask = np.uint32((1 << bits) - 1)
    out = np.zeros(words.shape[0] * cpw, np.uint8)
    nwords = words.shape[0]
    rem = n_chars - (nwords - 1) * cpw
    for w in range(nwords):
        nch = cpw if w < nwords - 1 else rem
        v = int(words[w])
        for j in reversed(range(nch)):
            out[w * cpw + j] = v & int(mask)
            v >>= bits
    return out[:n_chars]
