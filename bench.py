"""Headline benchmark: k-mers/s/chip on the canonical count-index build.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "kmers/s", "vs_baseline": N}

The build step (extract + canonicalize + sort + unique/count merge — the
full SURVEY §3.1 pipeline minus file IO) runs on the default JAX device
(the real TPU chip under the driver).  ``vs_baseline`` is the ratio to a
single-thread vectorized-numpy implementation of the same pipeline measured
in-process (the reference publishes no numbers — BASELINE.md — so the
baseline is self-measured CPU throughput, conservative for kmerind's own
per-core rate).

``vs_baseline`` divides by a PINNED reference rate (the median of repeated
single-thread numpy runs of the same pipeline on this class of host,
2.0 M k-mers/s) so the ratio is comparable across rounds — the host CPU
here is throttled and run-to-run numpy variance exceeds 10x.  Pass
--measure-baseline to re-measure live instead.

Usage: python bench.py [--bases N] [--k K] [--iters I] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _log(msg, quiet):
    if not quiet:
        print(msg, file=sys.stderr, flush=True)


def make_batch(n_bases: int, read_len: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n_bases).astype(np.uint8)
    valid = np.ones(n_bases, dtype=bool)
    seg_id = (np.arange(n_bases) // read_len).astype(np.int32)
    return codes, valid, seg_id


def numpy_baseline(codes: np.ndarray, seg_id: np.ndarray, k: int) -> float:
    """Single-thread numpy canonical count build; returns kmers/s."""
    t0 = time.perf_counter()
    n = codes.shape[0]
    # pack 21-mers into uint64 via sliding accumulation (vectorized numpy)
    c = codes.astype(np.uint64)
    mask = np.uint64((1 << (2 * k)) - 1)
    packed = np.zeros(n - k + 1, dtype=np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    acc[:] = c
    span = 1
    while span < k:
        step = min(span, k - span)
        shifted = np.zeros_like(acc)
        shifted[:-step] = acc[step:]
        acc = (acc << np.uint64(2 * step)) | shifted
        span += step
    packed = acc[: n - k + 1] & mask
    # revcomp: complement = 3 - c; reverse
    comp = np.uint64(3) - c
    racc = comp[::-1].copy()
    span = 1
    while span < k:
        step = min(span, k - span)
        shifted = np.zeros_like(racc)
        shifted[:-step] = racc[step:]
        racc = (racc << np.uint64(2 * step)) | shifted
        span += step
    rc = racc[::-1][k - 1:] & mask
    canon = np.minimum(packed, rc)
    valid_w = seg_id[: n - k + 1] == seg_id[k - 1:]
    vals = canon[valid_w]
    uniq, counts = np.unique(vals, return_counts=True)
    dt = time.perf_counter() - t0
    return vals.shape[0] / dt, (uniq, counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=1 << 24)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--read-len", type=int, default=250)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--inner", type=int, default=40,
                    help="on-device builds per timed dispatch")
    ap.add_argument("--baseline-bases", type=int, default=1 << 21)
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()
    quiet = args.json_only

    # A hung device tunnel blocks inside C where signals can't interrupt;
    # probe backend discovery from a bounded subprocess so a dead tunnel
    # yields a clear failure instead of a silent stall.
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=180, capture_output=True)
        ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("device backend unresponsive (tunnel down?) — no measurement",
              file=sys.stderr)
        sys.exit(3)

    import jax
    import jax.numpy as jnp

    from kmerind_tpu import DNA, KmerSpec
    from kmerind_tpu.io.kmer_parsers import DeviceBases, extract_tuples
    from kmerind_tpu.ops import sortops

    dev = jax.devices()[0]
    from kmerind_tpu.ops.pallas_kernels import pallas_supported
    _log(f"device: {dev} (pallas extraction: "
         f"{jax.default_backend() == 'tpu'})", quiet)
    spec = KmerSpec(args.k, DNA)

    codes, valid, seg = make_batch(args.bases, args.read_len)

    def build_once(codes, valid, seg_id, salt):
        # salt perturbs the input so repeated on-device builds cannot be
        # collapsed by the compiler; it flips the low bit of one base code
        c = codes.at[0].set(codes[0] ^ (salt & jnp.uint8(1)))
        bases = DeviceBases(
            codes=c, valid=valid, owned=jnp.ones_like(valid),
            seg_id=seg_id,
            id_hi=jnp.zeros_like(codes, jnp.uint32),
            id_lo=jnp.zeros_like(codes, jnp.uint32),
            qual=jnp.zeros_like(codes),
        )
        tup = extract_tuples(bases, spec, canonical=True)
        s_words, _, s_valid = sortops.sort_rows(
            tup.words, (), tup.valid, is_stable=False,
            sentinel_ok=spec.sentinel_safe, word_bits=spec.word_bits())
        # the ingest pipeline's scan-based run-length reduction (what
        # make_ingest_step runs); one sort + one cummax, no compaction sort
        weights, emit = sortops.run_length_counts(s_words, s_valid)
        return jnp.sum(emit.astype(jnp.int32)), jnp.sum(weights)

    INNER = args.inner  # builds per dispatch: amortizes host->device
    # dispatch latency (ms-scale over the TPU tunnel) out of the
    # steady-state per-build time, like any throughput benchmark loop

    @jax.jit
    def build(codes, valid, seg_id):
        def it(i, acc):
            d, t = build_once(codes, valid, seg_id, i.astype(jnp.uint8))
            return (acc[0] + d, acc[1] + t)
        return jax.lax.fori_loop(
            0, INNER, it, (jnp.int32(0), jnp.int32(0)))

    @jax.jit
    def build1(codes, valid, seg_id):
        return build_once(codes, valid, seg_id, jnp.uint8(0))

    dcodes = jax.device_put(codes, dev)
    dvalid = jax.device_put(valid, dev)
    dseg = jax.device_put(seg, dev)

    _log("compiling…", quiet)
    t0 = time.perf_counter()
    out = jax.block_until_ready(build1(dcodes, dvalid, dseg))
    jax.block_until_ready(build(dcodes, dvalid, dseg))
    _log(f"compile+first run: {time.perf_counter() - t0:.1f}s "
         f"(distinct={int(out[0])}, total={int(out[1])})", quiet)

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        r = build(dcodes, dvalid, dseg)
        np.asarray(r[0])  # force full sync (tunnel-safe)
        times.append((time.perf_counter() - t0) / INNER)
        _log(f"iter {i}: {times[-1]*1e3:.1f} ms/build (x{INNER})", quiet)

    n_windows = int(out[1])
    best = min(times)
    tpu_rate = n_windows / best

    PINNED_BASELINE = 2.0e6  # median numpy k-mers/s on this host class
    if args.measure_baseline:
        _log("running numpy baseline…", quiet)
        bcodes, _, bseg = make_batch(args.baseline_bases, args.read_len)
        rates = []
        for _ in range(3):
            r, _res = numpy_baseline(bcodes, bseg, args.k)
            rates.append(r)
        base_rate = sorted(rates)[1]  # median
        _log(f"numpy baseline (measured): {base_rate/1e6:.2f} Mkmers/s", quiet)
    else:
        base_rate = PINNED_BASELINE

    print(json.dumps({
        "metric": "kmers/s/chip (canonical count-index build, k=%d)" % args.k,
        "value": round(tpu_rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(tpu_rate / base_rate, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
