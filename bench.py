"""Headline benchmark: END-TO-END k-mers/s/chip on the canonical
count-index build.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "kmers/s", "vs_baseline": N}

The timed program is the FULL build of a multi-chunk corpus into a
queryable index state — per chunk: extract + canonicalize + sort
(ingest), plus every LSM run-merge the index's default policy triggers
(bitonic-merge network, `ops/pallas_kernels.bitonic_merge_pallas`), plus
the per-run prefix sums that make counts answerable.  Nothing is
deferred past the timer: when it stops, `count()` on the result is pure
lookup work.  This replaces round 2's ingest-only metric (the deferred
sort-based flush, measured at 413 ms per 16.7M-row merge, was excluded
there — see DESIGN.md "where time goes" for the redesign that closed
the gap: run-layout stores + log2(n)-stage merges instead of re-sorts).

``vs_baseline`` divides by a PINNED single-thread vectorized-numpy rate
for the same pipeline (2.0 M k-mers/s on this host class; the reference
publishes no numbers — BASELINE.md).  Pass --measure-baseline to
re-measure live.

Usage: python bench.py [--bases N] [--k K] [--chunks C] [--max-runs R]
                       [--iters I] [--mode e2e|ingest] [--json-only]
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
    c = codes.astype(np.uint64)
    mask = np.uint64((1 << (2 * k)) - 1)
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
    ap.add_argument("--bases", type=int, default=1 << 24,
                    help="bases per chunk")
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--read-len", type=int, default=250)
    ap.add_argument("--chunks", type=int, default=8,
                    help="chunks in the end-to-end build")
    ap.add_argument("--max-runs", type=int, default=4,
                    help="LSM run bound (merges trigger above it)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--inner", type=int, default=40,
                    help="builds per dispatch in --mode ingest")
    ap.add_argument("--mode", choices=("e2e", "ingest"), default="e2e")
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
    from kmerind_tpu.index import store as st
    from kmerind_tpu.io.kmer_parsers import DeviceBases, extract_tuples
    from kmerind_tpu.ops import sortops

    dev = jax.devices()[0]
    _log(f"device: {dev} (pallas: {jax.default_backend() == 'tpu'})", quiet)
    spec = KmerSpec(args.k, DNA)

    codes, valid, seg = make_batch(args.bases, args.read_len)

    def ingest(codes, valid, seg_id, salt):
        # salt perturbs the input so repeated on-device builds cannot be
        # collapsed by the compiler (flips the low bit of one base code)
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
        s_words = jnp.where(s_valid[:, None], s_words,
                            jnp.uint32(0xFFFFFFFF))
        return s_words, s_valid.astype(jnp.int32)

    dcodes = jax.device_put(codes, dev)
    dvalid = jax.device_put(valid, dev)
    dseg = jax.device_put(seg, dev)

    if args.mode == "e2e":
        C, MAX_RUNS = args.chunks, args.max_runs

        @jax.jit
        def build(codes, valid, seg_id, salt0):
            """Full C-chunk build: every chunk ingested + the index's LSM
            merge policy applied + per-run prefix sums — the exact device
            schedule CountIndex (max_runs=MAX_RUNS) runs for this corpus."""
            runs = []
            for i in range(C):
                w, t = ingest(codes, valid, seg_id,
                              salt0 + jnp.uint8(i))
                runs.append((w, t))
                while len(runs) > MAX_RUNS:
                    runs.sort(key=lambda r: r[0].shape[0], reverse=True)
                    b = runs.pop()
                    a = runs.pop()
                    k2, (wt,) = sortops.merge_sorted_runs(
                        a[0], (a[1],), b[0], (b[1],))
                    runs.append((k2, wt))
            acc = jnp.uint32(0)
            total = jnp.int32(0)
            for w, t in runs:
                s = st.run_from_sorted(w, t)
                acc = acc + s.keys[0, 0]
                total = total + s.csum[-1]
            return acc, total

        _log(f"compiling e2e build ({C} chunks, max_runs={MAX_RUNS})…",
             quiet)
        t0 = time.perf_counter()
        r = build(dcodes, dvalid, dseg, jnp.uint8(0))
        total = int(np.asarray(r[1]))
        _log(f"compile+first run: {time.perf_counter() - t0:.1f}s "
             f"(total kmers in store: {total})", quiet)
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            r = build(dcodes, dvalid, dseg, jnp.uint8(i))
            np.asarray(r[0])  # force full sync (tunnel-safe)
            times.append(time.perf_counter() - t0)
            _log(f"iter {i}: {times[-1]*1e3:.0f} ms/build", quiet)
        n_windows = total
        best = min(times)
        tpu_rate = n_windows / best
        metric = ("kmers/s/chip (canonical count-index build END-TO-END: "
                  "%d chunks, k=%d, LSM merges + prefix sums included)"
                  % (C, args.k))
    else:
        INNER = args.inner

        @jax.jit
        def build_i(codes, valid, seg_id):
            def it(i, acc):
                w, t = ingest(codes, valid, seg_id, i.astype(jnp.uint8))
                return (acc[0] + w[0, 0], acc[1] + jnp.sum(t))
            return jax.lax.fori_loop(
                0, INNER, it, (jnp.uint32(0), jnp.int32(0)))

        _log("compiling ingest loop…", quiet)
        t0 = time.perf_counter()
        r = jax.block_until_ready(build_i(dcodes, dvalid, dseg))
        total = int(np.asarray(r[1])) // INNER
        _log(f"compile+first run: {time.perf_counter() - t0:.1f}s", quiet)
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            r = build_i(dcodes, dvalid, dseg)
            np.asarray(r[0])
            times.append((time.perf_counter() - t0) / INNER)
            _log(f"iter {i}: {times[-1]*1e3:.1f} ms/chunk (x{INNER})", quiet)
        n_windows = total
        best = min(times)
        tpu_rate = n_windows / best
        metric = ("kmers/s/chip (canonical count ingest only, k=%d)"
                  % args.k)

    PINNED_BASELINE = 2.0e6  # median numpy k-mers/s on this host class
    if args.measure_baseline:
        _log("running numpy baseline…", quiet)
        bcodes, _, bseg = make_batch(args.baseline_bases, args.read_len)
        rates = []
        for _ in range(3):
            rr, _res = numpy_baseline(bcodes, bseg, args.k)
            rates.append(rr)
        base_rate = sorted(rates)[1]  # median
        _log(f"numpy baseline (measured): {base_rate/1e6:.2f} Mkmers/s",
             quiet)
    else:
        base_rate = PINNED_BASELINE

    print(json.dumps({
        "metric": metric,
        "value": round(tpu_rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(tpu_rate / base_rate, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
