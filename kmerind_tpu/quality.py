"""Phred quality-score codec + windowed k-mer quality.

Rebuild of the reference quality subsystem
(/root/reference/src/index/quality_scores.hpp,
src/index/quality_score_iterator.hpp):

* Codec: ``decode(c) = DecodeLUT[c - MinInput]`` where the 96-entry LUT holds
  ``log2(1 - 10^(-q/10))`` (q = 0 → lowest = "zero probability of being
  correct"; entries 94/95 → 0.0) — quality_scores.hpp:113-216.  Presets
  Illumina18/Sanger (33..126, min 0), Illumina13 (64..126, min 0),
  Illumina15 (64..126, min 3) — :529-545.
* Windowed score (QualityScoreSlidingWindow, quality_score_iterator.hpp:67-
  180): a k-mer's quality is ``exp2(sum of per-base log2 probs)`` —
  the probability that *all* k bases are correct — and exactly 0.0 if any
  base in the window is "incorrect" (decoded value == lowest).

The reference maintains a circular running sum per window; we compute all
window sums at once with a binary-composed tree reduction (log2(k) shifted
adds), which matches the sequential accumulation to ~ulp precision of the
float32 stored result while being one vectorized pass.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "QualityCodec",
    "ILLUMINA18",
    "SANGER",
    "ILLUMINA13",
    "ILLUMINA15",
    "window_quality",
]

_LOWEST = np.finfo(np.float64).min

# Bit-exact LUT reproduction relies on np.longdouble being the x86 80-bit
# extended type the reference's table-generation loop used (machep == -63).
# On platforms where long double is IEEE quad (aarch64) or plain double
# (Windows), the %.17f round-trip can round boundary entries differently —
# warn once and proceed (the parity tests pin exactness where it holds).
_LONGDOUBLE_X86 = np.finfo(np.longdouble).machep == -63
if not _LONGDOUBLE_X86:  # pragma: no cover - non-x86 platforms only
    import warnings

    warnings.warn(
        "np.longdouble is not x86 80-bit extended on this platform; "
        "quality LUT entries may differ from the reference's compiled "
        "literals in the last bits", RuntimeWarning, stacklevel=1)


@dataclasses.dataclass(frozen=True)
class QualityCodec:
    """Preset-parameterized Phred codec (QualityScoreCodec template args)."""

    name: str
    min_input: int
    max_input: int
    min_score: int

    @functools.cached_property
    def decode_lut(self) -> np.ndarray:
        """float64[96]: q -> log2(P(base correct)) (DecodeLUT,
        quality_scores.hpp:113)."""
        lut = np.empty(96, dtype=np.float64)
        one, ten = np.longdouble(1.0), np.longdouble(10.0)
        for q in range(96):
            if q < max(1, self.min_score) or q == 0:
                lut[q] = _LOWEST
            elif q >= 94:
                lut[q] = 0.0
            else:
                # The reference's table literals were generated from
                # std::log2(1.0L - std::exp2(qL * std::log2(10.0L) / -10.0L))
                # printed with 17 fractional decimals and compiled back as
                # double literals (quality_scores.hpp:110-113).  Replicate
                # the full pipeline — x86 np.longdouble IS C long double,
                # and the %.17f round-trip matters: for tiny entries (q=93)
                # the decimal truncation changes many low bits.  Bit-exact
                # vs the compiled reference (test_ref_parity).
                v = np.log2(one - np.exp2(np.longdouble(q)
                                          * np.log2(ten) / -ten))
                lut[q] = float(np.format_float_positional(
                    v, precision=17, unique=False, fractional=True))
        return lut

    @functools.cached_property
    def encode_lut(self) -> np.ndarray:
        """float64[96]: rounding-boundary values for encode's upper_bound
        search (EncodeLUT, quality_scores.hpp:216)."""
        lut = np.empty(96, dtype=np.float64)
        one, ten = np.longdouble(1.0), np.longdouble(10.0)
        for q in range(96):
            if q < max(1, self.min_score) or q == 0:
                lut[q] = _LOWEST
            elif q >= 94:
                lut[q] = np.finfo(np.float64).max
            else:
                # (q - round_error=0.5L) in long double + the same %.17f
                # decimal round-trip (quality_scores.hpp:213-215)
                v = np.log2(one - np.exp2(
                    (np.longdouble(q) - np.longdouble(0.5))
                    * np.log2(ten) / -ten))
                lut[q] = float(np.format_float_positional(
                    v, precision=17, unique=False, fractional=True))
        return lut

    # -- scalar/batch host-side ------------------------------------------
    def decode(self, score_bytes: np.ndarray) -> np.ndarray:
        """ASCII phred bytes -> float64 log2 probs (quality_scores.hpp:331)."""
        idx = np.clip(
            np.asarray(score_bytes, dtype=np.int32) - self.min_input, 0, 95)
        return self.decode_lut[idx]

    def encode(self, log2_prob: np.ndarray) -> np.ndarray:
        """log2 probs -> ASCII phred bytes (quality_scores.hpp:360-373)."""
        v = np.asarray(log2_prob, dtype=np.float64)
        floor_char = (self.min_input if self.min_score == 0
                      else self.min_input + self.min_score - 1)
        idx = np.searchsorted(self.encode_lut, v, side="right")
        out = np.where(idx == 0, floor_char,
                       np.minimum(self.max_input, self.min_input + idx - 1))
        out = np.where(np.isnan(v) | (v == _LOWEST) | np.isneginf(v),
                       floor_char, out)
        out = np.where(np.isposinf(v), self.max_input, out)
        return out.astype(np.uint8)


ILLUMINA18 = QualityCodec("Illumina18", 33, 126, 0)
SANGER = QualityCodec("Sanger", 33, 126, 0)
ILLUMINA13 = QualityCodec("Illumina13", 64, 126, 0)
ILLUMINA15 = QualityCodec("Illumina15", 64, 126, 3)


def by_name(name: str) -> QualityCodec:
    """Codec preset by name (the reference's quality_scores.hpp:529-542
    preset aliases)."""
    try:
        return {"Illumina18": ILLUMINA18, "Sanger": SANGER,
                "Illumina13": ILLUMINA13, "Illumina15": ILLUMINA15}[name]
    except KeyError:
        raise ValueError(f"unknown quality codec {name!r}") from None


def _shift_idx(a, s):
    from .ops.packing import _shift_idx as _impl
    return _impl(a, s)


@functools.partial(jax.jit, static_argnames=("k", "codec"))
def window_quality(qual_bytes: jax.Array, k: int, codec: QualityCodec = ILLUMINA18):
    """float32[n]: windowed k-mer quality at every window start.

    value[i] = exp2(sum_{j<k} log2 P(base i+j correct)), or exactly 0.0 if
    any window base decodes to "incorrect" (QualityScoreSlidingWindow
    getValue(), quality_score_iterator.hpp:162-173).  Rows past n-k carry
    garbage — callers mask with window validity.

    The per-window sum is a binary-composed tree reduction (log2(k) shifted
    adds, no overlap), so float32 error stays O(log k * eps) per window
    instead of growing with stream length as a naive global prefix sum would.
    """
    # float32 LUT with the float32 "lowest" sentinel (the reference's OutT
    # lowest when OutT=float), avoiding inf from a float64→float32 overflow
    f32_lowest = float(np.finfo(np.float32).min)
    lut_host = np.where(codec.decode_lut == _LOWEST, f32_lowest,
                        codec.decode_lut).astype(np.float32)
    lut = jnp.asarray(lut_host)
    idx = jnp.clip(qual_bytes.astype(jnp.int32) - codec.min_input, 0, 95)
    logp = lut[idx]
    # reference guard: OK iff DecodeLUT[0] < val < DecodeLUT[95] (== 0.0);
    # lowest or >= 0 counts as an incorrect base
    not_ok = (logp <= jnp.float32(f32_lowest)) | (logp >= 0.0)
    contrib = jnp.where(not_ok, 0.0, logp).astype(jnp.float32)
    bad = not_ok

    # power-of-two window sums: S_t[i] = sum of contrib[i : i+2**t)
    pow_sum = {0: contrib}
    pow_bad = {0: bad}
    t = 1
    while (1 << t) <= k:
        half = 1 << (t - 1)
        pow_sum[t] = pow_sum[t - 1] + _shift_idx(pow_sum[t - 1], half)
        pow_bad[t] = pow_bad[t - 1] | _shift_idx(pow_bad[t - 1], half)
        t += 1
    # compose binary digits of k, MSB-first
    wsum = None
    any_bad = None
    consumed = 0
    for t in reversed(range(max(pow_sum) + 1)):
        if k & (1 << t):
            ps = _shift_idx(pow_sum[t], consumed) if consumed else pow_sum[t]
            pb = _shift_idx(pow_bad[t], consumed) if consumed else pow_bad[t]
            wsum = ps if wsum is None else wsum + ps
            any_bad = pb if any_bad is None else any_bad | pb
            consumed += 1 << t

    score = jnp.where(any_bad, 0.0, jnp.exp2(wsum))
    return score.astype(jnp.float32)
