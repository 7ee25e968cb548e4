"""Range-partitioned (sorted) distributed k-mer indexes.

The reference ships TWO distribution strategies for every index flavor:
hash-partitioned (densehash/unordered maps) and range-partitioned (the
sorted maps, /root/reference/src/containers/distributed_sorted_map.hpp:
`sorted_map` :1407, `sorted_multimap` :2333, `counting_sorted_map` :2825).
`index.api` rebuilds the first; this module rebuilds the second:

* `SortedCountIndex`    — counting_sorted_map (:2825): k-mer → count.
* `SortedPositionIndex` — sorted_multimap (:2333): k-mer → position ids.
* `SortedPositionQualityIndex` — quality-carrying variant.

Semantics mirror the reference's lazy-sort design
(distributed_sorted_map.hpp:341,940): `insert*` appends shard-local rows
and marks the index unsorted; the first query triggers `_flush` — a global
samplesort that rebalances ALL rows across shards by key range and
recomputes the p-1 splitters; queries then route by splitter binary search
instead of hashing.  Contents are interchangeable with the hash indexes
(same stores, same oracle answers); only placement differs — shard i holds
a contiguous key range, which is what makes range scans (`items_in_range`)
a local operation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..kmer import KmerSpec
from ..io.batch import ReadBatch
from ..utils.timers import PhaseTimer
from . import distributed as dx
from . import sorted_dist as sx
from . import store as st
from .api import _IndexBase, _MultimapSurfaceMixin, _next_pow2

__all__ = ["SortedCountIndex", "SortedPositionIndex",
           "SortedPositionQualityIndex"]

_SENTINEL = 0xFFFFFFFF


class _SortedBase(_IndexBase):
    """Shared splitter/pending bookkeeping for sorted indexes."""

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = True,
                 fill_factor: float = 1.6, timer: PhaseTimer | None = None):
        # hash_name is irrelevant for range routing; pass a fixed value so
        # _IndexBase helpers work unchanged
        super().__init__(spec, mesh, canonical, hash_name="identity",
                         fill_factor=fill_factor, timer=timer)
        # replicated splitter rows [p, p-1, w]; None until first flush
        self.splitters = None
        self._dirty = False  # true when pending rows await a global sort

    def _splitters_blk(self):
        if self.splitters is None:
            # pre-flush queries on an empty index: all-zero splitters route
            # everything to the last shard; stores are empty so answers are
            # correct regardless.  Built under jit with out_shardings so
            # the array is a proper global array under multi-process SPMD.
            key = ("zero_splitters",)
            if key not in self._step_cache:
                shape = (self.nparts, max(self.nparts - 1, 0),
                         self.spec.nwords)
                self._step_cache[key] = jax.jit(
                    lambda: jnp.zeros(shape, jnp.uint32),
                    out_shardings=self._sharding)
            return self._step_cache[key]()
        return self.splitters

    def _live_mask(self):
        """bool[p, cap] live-row mask of the store — computed under jit
        (eager ops on non-addressable global arrays are illegal in
        multi-process mode)."""
        key = ("_live", self.capacity)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                lambda s: jnp.arange(s.keys.shape[1])[None, :]
                < s.size[:, None],
                out_shardings=self._sharding)
        return self._step_cache[key](self.store)

    def _query_capacity(self, mq: int) -> int:
        """Initial per-destination bucket: ~mq/p with fill headroom (the
        reference all2allv ships exact per-destination counts,
        incremental_mxx.hpp:1087-1098; we approximate + overflow-retry)."""
        return _next_pow2(int(math.ceil(mq / self.nparts
                                        * self.fill_factor)))

    def splitter_table(self) -> np.ndarray:
        """Host copy of the p-1 range boundaries (uint32[p-1, w])."""
        self._flush()
        if self.splitters is None:
            return np.zeros((max(self.nparts - 1, 0), self.spec.nwords),
                            np.uint32)
        return self._fetch(self.splitters)[0]


class SortedCountIndex(_SortedBase):
    """Distributed k-mer → count index, range-partitioned
    (counting_sorted_map, distributed_sorted_map.hpp:2825)."""

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = True,
                 saturate: int | None = None,
                 initial_capacity: int = 1 << 12, **kw):
        super().__init__(spec, mesh, canonical, **kw)
        self.saturate = saturate
        self.store = self._init_store(
            lambda: st.empty_count_store(initial_capacity, spec.nwords))
        self._pending: list = []   # [(words[p,n,w], weights[p,n], valid[p,n])]
        self._pending_rows = 0

    @property
    def capacity(self) -> int:
        return self.store.keys.shape[1]

    def size(self) -> int:
        self._flush()
        return int(self._fetch(self.store.size).sum())

    # -- ingest --------------------------------------------------------
    def insert_batch(self, batch: ReadBatch, chunk_bases: int | None = None):
        """Shard-local extract + pre-reduce; rows stay on their resident
        shard until the flush samplesort (sorted_map append-then-sort,
        distributed_sorted_map.hpp:341)."""
        if chunk_bases is None:
            chunk_bases = self.default_chunk_bases
        if batch.num_bases > chunk_bases:
            chunks = list(batch.iter_chunks(chunk_bases, self.spec.k - 1))
        else:
            chunks = [batch]
        self._stream_chunks(chunks, self._marshal_chunk, self._insert_cols)
        return self

    def _marshal_chunk(self, batch: ReadBatch):
        with self.timer.phase("extract"):
            return self._batch_to_stacked(batch, id_kind=None,
                                          need_ids=False,
                                          need_qual=False)[0]

    def _insert_one_chunk(self, batch: ReadBatch):
        return self._insert_cols(self._marshal_chunk(batch))

    def _insert_cols(self, cols):
        n_local = cols["codes"].shape[1]
        key = ("local_ingest", n_local)
        if key not in self._step_cache:
            self._step_cache[key] = sx.make_local_ingest_step(
                self.mesh, self.spec, self.canonical)
        with self.timer.phase("insert"):
            rw, rc, rv = self._step_cache[key](
                cols["codes"], cols["valid"], cols["owned"], cols["seg_id"])
        self._pending.append((rw, rc, rv))
        self._pending_rows += rw.shape[1]
        self._dirty = True
        return self

    def insert(self, kmers):
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        return self.insert_counts(words, np.ones(words.shape[0], np.int32),
                                  _skip_canonical=True)

    def insert_counts(self, kmers, counts, _skip_canonical: bool = False):
        """(kmer, count) pair inserts (counting map's second input flavor)."""
        words = self._to_words(kmers)
        if not _skip_canonical:
            words = self._maybe_canonicalize_queries(words)
        counts = np.asarray(counts, np.int32)
        (wsh, csh), vsh, m = self._shard_rows(words, extra=(counts,))
        self._pending.append((wsh, csh, vsh))
        self._pending_rows += wsh.shape[1]
        self._dirty = True
        return self

    # -- the global samplesort flush -----------------------------------
    def _flush(self):
        if not self._dirty and self.splitters is not None:
            return
        if not self._pending and self.splitters is not None:
            return
        # all live rows: store contents as weighted rows + pending.
        # Everything below is jitted or collective (no eager ops on
        # possibly non-addressable global arrays — multi-process-safe).
        live = self._live_mask()
        parts_w = [self.store.keys] + [t[0] for t in self._pending]
        parts_c = [self.store.counts] + [t[1] for t in self._pending]
        parts_v = [live] + [t[2] for t in self._pending]
        words = self._device_concat(parts_w)
        weights = self._device_concat(parts_c)
        valid = self._device_concat(parts_v)
        self._pending = []
        self._pending_rows = 0
        n_rows = words.shape[1]
        total = int(self._valid_counts(valid).sum())
        cap = max(self._query_capacity(max(total, 1)), 16)
        while True:
            key = ("flush", n_rows, cap)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_count_flush_step(
                    self.mesh, self.nparts, cap, self.saturate,
                    self.spec.sentinel_safe)
            with self.timer.phase("merge"):
                new_store, splitters, ovf = self._step_cache[key](
                    words, weights, valid)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                self.splitters = splitters
                self._dirty = False
                return
            cap *= 2

    # -- queries -------------------------------------------------------
    def count(self, kmers) -> np.ndarray:
        self._flush()
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("count", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_count_query_step(
                    self.mesh, self.nparts, bucket_cap)
            with self.timer.phase("count"):
                counts, ovf = self._step_cache[key](
                    self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                return self._fetch(counts).reshape(-1)[:m]
            bucket_cap *= 2

    def find(self, kmers):
        """Found (kmer, count) pairs (Index::find contract)."""
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        counts = self.count(words)
        hit = counts > 0
        return words[hit], counts[hit]

    def erase(self, kmers) -> int:
        self._flush()
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("erase", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_count_erase_step(
                    self.mesh, self.nparts, bucket_cap)
            new_store, nerased, ovf = self._step_cache[key](
                self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                return int(self._fetch(nerased).sum())
            bucket_cap *= 2

    # predicate family: local scans need no routing — reuse the hash
    # strategy's filter/scan steps verbatim
    def erase_if(self, pred, kmers=None) -> int:
        self._flush()
        if kmers is None:
            key = ("erase_if", pred, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_count_filter_step(
                    self.mesh, lambda k, c: ~pred(k, c))
            new_store, nerased = self._step_cache[key](self.store)
            self.store = new_store
            return int(self._fetch(nerased).sum())
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        counts = self.count(words)
        keep = np.asarray(pred(jnp.asarray(words), jnp.asarray(counts)))
        hits = keep & (counts > 0)
        if not hits.any():
            return 0
        return self.erase(words[hits])

    def filter(self, pred) -> int:
        return self.erase_if(lambda k, c: ~pred(k, c))

    def count_if(self, pred, kmers=None):
        if kmers is None:
            # device-side selection: matching entries compact to the front
            # per shard, the host slices n rows (no cap-sized mask scans)
            self._flush()
            key = ("select_if", pred, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_count_select_step(
                    self.mesh, pred)
            keys_out, counts_out, n = self._step_cache[key](self.store)
            keys_out = self._fetch(keys_out)
            counts_out = self._fetch(counts_out)
            n = self._fetch(n)
            out = []
            for p in range(self.nparts):
                c = int(n[p])
                if c == 0:
                    continue
                ints = self.spec.to_ints(keys_out[p, :c])
                out.extend(zip(ints.tolist(),
                               counts_out[p, :c].astype(int).tolist()))
            return out
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        counts = self.count(words)
        keep = np.asarray(pred(jnp.asarray(words), jnp.asarray(counts)))
        return np.where(keep, counts, 0)

    def find_if(self, pred, kmers=None):
        if kmers is None:
            return self.count_if(pred)
        counts = self.count_if(pred, kmers)
        return counts > 0, counts

    def unique_size(self) -> int:
        return self.size()

    def get_multiplicity(self, kmers) -> np.ndarray:
        return self.count(kmers)

    # -- range scan: the capability hash distribution cannot offer ------
    def items_in_range(self, lo_kmer, hi_kmer):
        """All (kmer_int, count) with lo <= kmer < hi — a LOCAL slice on
        the owning shard(s), possible because shards hold contiguous key
        ranges (the sorted strategy's raison d'être,
        distributed_sorted_map.hpp:114-141)."""
        self._flush()
        lo_w = tuple(int(x) for x in self._to_words([lo_kmer])[0])
        hi_w = tuple(int(x) for x in self._to_words([hi_kmer])[0])

        def _ge(keys, bound):  # lexicographic keys >= bound, elementwise
            ge = jnp.ones(keys.shape[0], bool)
            for j in reversed(range(keys.shape[1])):
                b = jnp.uint32(bound[j])
                ge = jnp.where(keys[:, j] != b, keys[:, j] > b, ge)
            return ge

        # range membership as a device-side select (the range scan is the
        # sorted strategy's raison d'être; keys in [lo, hi) compact to the
        # front per shard, the host slices n rows)
        key = ("range_scan", lo_w, hi_w, self.capacity)
        if key not in self._step_cache:
            self._step_cache[key] = dx.make_count_select_step(
                self.mesh,
                lambda k, c, lo_w=lo_w, hi_w=hi_w:
                    _ge(k, lo_w) & ~_ge(k, hi_w))
        keys_out, counts_out, n = self._step_cache[key](self.store)
        keys_out = self._fetch(keys_out)
        counts_out = self._fetch(counts_out)
        n = self._fetch(n)
        out = []
        for p in range(self.nparts):
            c = int(n[p])
            if c == 0:
                continue
            ints = self.spec.to_ints(keys_out[p, :c])
            out.extend(zip(ints.tolist(),
                           counts_out[p, :c].astype(int).tolist()))
        return sorted(out)

    def histogram(self, max_count: int = 255) -> np.ndarray:
        """K-mer frequency spectrum (see CountIndex.histogram) —
        distribution-agnostic: the step only scans local stores."""
        self._flush()
        key = ("hist", max_count + 1, self.capacity)
        if key not in self._step_cache:
            self._step_cache[key] = dx.make_histogram_step(
                self.mesh, max_count + 1)
        return self._fetch(
            self._step_cache[key](self.store)).astype(np.int64)

    # -- persistence / export ------------------------------------------
    def to_dict(self) -> dict[int, int]:
        self._flush()
        keys = self._fetch(self.store.keys)
        counts = self._fetch(self.store.counts)
        sizes = self._fetch(self.store.size)
        out = {}
        for p in range(self.nparts):
            n = int(sizes[p])
            if n == 0:
                continue
            ints = self.spec.to_ints(keys[p, :n]).tolist()
            out.update(zip(ints, counts[p, :n].tolist()))
        return out

    def save(self, path):
        self._flush()
        np.savez_compressed(
            path,
            kind="sorted_count",
            k=self.spec.k,
            alphabet=self.spec.alphabet.name,
            canonical=self.canonical,
            saturate=-1 if self.saturate is None else self.saturate,
            nparts=self.nparts,
            keys=self._fetch(self.store.keys),
            counts=self._fetch(self.store.counts),
            sizes=self._fetch(self.store.size),
        )
        return self

    @classmethod
    def load(cls, path, mesh=None):
        from .. import alphabets as _al
        z = np.load(path, allow_pickle=False)
        spec = KmerSpec(int(z["k"]), _al.by_name(str(z["alphabet"])))
        sat = int(z["saturate"])
        idx = cls(spec, mesh=mesh, canonical=bool(z["canonical"]),
                  saturate=None if sat < 0 else sat)
        keys, counts, sizes = z["keys"], z["counts"], z["sizes"]
        rows = np.concatenate(
            [keys[p, : sizes[p]] for p in range(keys.shape[0])])
        vals = np.concatenate(
            [counts[p, : sizes[p]] for p in range(keys.shape[0])])
        if rows.shape[0]:
            idx.insert_counts(rows.astype(np.uint32), vals,
                              _skip_canonical=True)
        return idx


class SortedPositionIndex(_MultimapSurfaceMixin, _SortedBase):
    """Distributed k-mer → position-id multimap, range-partitioned
    (sorted_multimap, distributed_sorted_map.hpp:2333)."""

    with_quality = False

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = False,
                 id_kind: str = "short", initial_capacity: int = 1 << 12,
                 codec=None, **kw):
        super().__init__(spec, mesh, canonical, **kw)
        from ..quality import ILLUMINA18
        self.id_kind = id_kind
        self.codec = codec if codec is not None else ILLUMINA18
        self.store = self._init_store(
            lambda: st.empty_multi_store(initial_capacity, spec.nwords))
        self._pending: list = []
        self._pending_rows = 0

    @property
    def capacity(self) -> int:
        return self.store.keys.shape[1]

    def size(self) -> int:
        self._flush()
        return int(self._fetch(self.store.size).sum())

    def insert_batch(self, batch: ReadBatch, chunk_bases: int | None = None):
        if chunk_bases is None:
            chunk_bases = self.default_chunk_bases
        if batch.num_bases > chunk_bases:
            chunks = list(batch.iter_chunks(chunk_bases, self.spec.k - 1))
        else:
            chunks = [batch]
        self._stream_chunks(chunks, self._marshal_chunk, self._insert_cols)
        return self

    def _marshal_chunk(self, batch: ReadBatch):
        with self.timer.phase("extract"):
            return self._batch_to_stacked(
                batch, id_kind=self.id_kind,
                real_qual=self.with_quality)[0]

    def _insert_one_chunk(self, batch: ReadBatch):
        return self._insert_cols(self._marshal_chunk(batch))

    def _insert_cols(self, cols):
        n_local = cols["codes"].shape[1]
        key = ("local_ingest", n_local)
        if key not in self._step_cache:
            self._step_cache[key] = sx.make_multi_local_ingest_step(
                self.mesh, self.spec, self.canonical, self.with_quality,
                self.codec)
        with self.timer.phase("insert"):
            rw, rhi, rlo, rq, rv = self._step_cache[key](
                cols["codes"], cols["valid"], cols["owned"],
                cols["seg_id"], cols["id_hi"], cols["id_lo"], cols["qual"])
        self._pending.append((rw, rhi, rlo, rq, rv))
        self._pending_rows += rw.shape[1]
        self._dirty = True
        return self

    def _insert_pairs(self, words, val_hi, val_lo, val_q):
        (wsh, hsh, lsh, qsh), vsh, _ = self._shard_rows(
            self._maybe_canonicalize_queries(words),
            extra=(val_hi.astype(np.uint32), val_lo.astype(np.uint32),
                   val_q.astype(np.float32)))
        self._pending.append((wsh, hsh, lsh, qsh, vsh))
        self._pending_rows += wsh.shape[1]
        self._dirty = True
        return self

    def _flush(self):
        if not self._dirty and self.splitters is not None:
            return
        if not self._pending and self.splitters is not None:
            return
        live = self._live_mask()
        parts = [
            (self.store.keys, self.store.val_hi, self.store.val_lo,
             self.store.val_q, live)
        ] + self._pending
        # store and pending columns share dtypes by construction
        # (uint32 ids, float32 quality) — no casts needed
        words = self._device_concat([t[0] for t in parts])
        hi = self._device_concat([t[1] for t in parts])
        lo = self._device_concat([t[2] for t in parts])
        q = self._device_concat([t[3] for t in parts])
        valid = self._device_concat([t[4] for t in parts])
        self._pending = []
        self._pending_rows = 0
        n_rows = words.shape[1]
        total = int(self._valid_counts(valid).sum())
        cap = max(self._query_capacity(max(total, 1)), 16)
        while True:
            key = ("flush", n_rows, cap)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_multi_flush_step(
                    self.mesh, self.nparts, cap)
            with self.timer.phase("merge"):
                new_store, splitters, ovf = self._step_cache[key](
                    words, hi, lo, q, valid)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                self.splitters = splitters
                self._dirty = False
                return
            cap *= 2

    # -- queries -------------------------------------------------------
    def count(self, kmers) -> np.ndarray:
        return self._count_words(
            self._maybe_canonicalize_queries(self._to_words(kmers)))

    def _count_words(self, words: np.ndarray) -> np.ndarray:
        self._flush()
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("count", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_multi_count_step(
                    self.mesh, self.nparts, bucket_cap)
            counts, ovf = self._step_cache[key](
                self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                return self._fetch(counts).reshape(-1)[:m]
            bucket_cap *= 2

    def get_multiplicity(self, kmers) -> np.ndarray:
        return self.count(kmers)

    def unique_size(self) -> int:
        """Distinct keys, counted on device (key-change boundaries + psum;
        the samplesort colocates equal keys, so per-shard counts sum
        exactly)."""
        self._flush()
        key = ("unique_size", self.capacity)
        if key not in self._step_cache:
            self._step_cache[key] = dx.make_unique_size_step(self.mesh)
        return int(self._fetch(self._step_cache[key](self.store)))

    def find(self, kmers, max_per_query: int = 64, with_quality: bool = False,
             grow_to_fit: bool = True):
        """Same contract as the hash PositionIndex.find (incl. growth /
        truncation counts)."""
        return self._find_words(
            self._maybe_canonicalize_queries(self._to_words(kmers)),
            max_per_query, with_quality, grow_to_fit)

    def _find_words(self, words, max_per_query, with_quality=False,
                    grow_to_fit=True):
        self._flush()
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("find", mq, bucket_cap, self.capacity, max_per_query)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_multi_find_step(
                    self.mesh, self.nparts, bucket_cap, max_per_query)
            with self.timer.phase("find"):
                hi, lo, q, mask, nfound, ovf = self._step_cache[key](
                    self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) != 0:
                bucket_cap *= 2
                continue
            counts = self._fetch(nfound).reshape(-1)[:m]
            worst = int(counts.max()) if m else 0
            if grow_to_fit and worst > max_per_query:
                max_per_query = _next_pow2(worst)
                continue
            hi = self._fetch(hi).reshape(-1, max_per_query)[:m]
            lo = self._fetch(lo).reshape(-1, max_per_query)[:m]
            q = self._fetch(q).reshape(-1, max_per_query)[:m]
            mask = self._fetch(mask).reshape(-1, max_per_query)[:m]
            ids = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
            if with_quality:
                return (ids, q, mask) if grow_to_fit else (ids, q, mask, counts)
            return (ids, mask) if grow_to_fit else (ids, mask, counts)

    def erase(self, kmers) -> int:
        self._flush()
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("erase", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_multi_erase_step(
                    self.mesh, self.nparts, bucket_cap)
            new_store, nerased, ovf = self._step_cache[key](
                self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                return int(self._fetch(nerased).sum())
            bucket_cap *= 2

    def erase_if(self, pred, kmers=None) -> int:
        self._flush()
        if kmers is None:
            key = ("erase_if", pred, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_multi_filter_step(
                    self.mesh, lambda k, h, l, q: ~pred(k, h, l, q))
            new_store, nerased = self._step_cache[key](self.store)
            self.store = new_store
            return int(self._fetch(nerased).sum())
        # keyed erase_if: splitter-route the query keys, mark covered
        # store ranges, apply pred only inside them (device-side)
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("erase_if_keys", pred, mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_multi_erase_if_keys_step(
                    self.mesh, self.nparts, bucket_cap, pred)
            new_store, nerased, ovf = self._step_cache[key](
                self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                return int(self._fetch(nerased).sum())
            bucket_cap *= 2

    def filter(self, pred) -> int:
        return self.erase_if(lambda k, h, l, q: ~pred(k, h, l, q))

    def to_dict(self) -> dict[int, list[int]]:
        self._flush()
        out: dict[int, list[int]] = {}
        keys = self._fetch(self.store.keys)
        hi = self._fetch(self.store.val_hi)
        lo = self._fetch(self.store.val_lo)
        sizes = self._fetch(self.store.size)
        for p in range(self.nparts):
            for i in range(int(sizes[p])):
                v = self.spec.to_int(keys[p, i])
                pid = (int(hi[p, i]) << 32) | int(lo[p, i])
                out.setdefault(v, []).append(pid)
        return {k: sorted(v) for k, v in out.items()}

    def save(self, path):
        self._flush()
        np.savez_compressed(
            path,
            kind="sorted_position",
            k=self.spec.k,
            alphabet=self.spec.alphabet.name,
            canonical=self.canonical,
            id_kind=self.id_kind,
            with_quality=self.with_quality,
            nparts=self.nparts,
            keys=self._fetch(self.store.keys),
            val_hi=self._fetch(self.store.val_hi),
            val_lo=self._fetch(self.store.val_lo),
            val_q=self._fetch(self.store.val_q),
            sizes=self._fetch(self.store.size),
        )
        return self

    @classmethod
    def load(cls, path, mesh=None):
        from .. import alphabets as _al
        z = np.load(path, allow_pickle=False)
        spec = KmerSpec(int(z["k"]), _al.by_name(str(z["alphabet"])))
        idx = cls(spec, mesh=mesh, canonical=bool(z["canonical"]),
                  id_kind=str(z["id_kind"]))
        keys, hi, lo, q, sizes = (z["keys"], z["val_hi"], z["val_lo"],
                                  z["val_q"], z["sizes"])
        rows = np.concatenate(
            [keys[p, : sizes[p]] for p in range(keys.shape[0])])
        if rows.shape[0] == 0:
            return idx
        vhi = np.concatenate([hi[p, : sizes[p]] for p in range(keys.shape[0])])
        vlo = np.concatenate([lo[p, : sizes[p]] for p in range(keys.shape[0])])
        vq = np.concatenate([q[p, : sizes[p]] for p in range(keys.shape[0])])
        canonical = idx.canonical
        idx.canonical = False  # stored keys are post-transform
        try:
            idx._insert_pairs(rows.astype(np.uint32), vhi, vlo, vq)
        finally:
            idx.canonical = canonical
        return idx


class SortedPositionQualityIndex(SortedPositionIndex):
    """Range-partitioned (position, windowed quality) multimap."""

    with_quality = True

    def to_dict(self):
        self._flush()
        out: dict[int, list] = {}
        keys = self._fetch(self.store.keys)
        hi = self._fetch(self.store.val_hi)
        lo = self._fetch(self.store.val_lo)
        q = self._fetch(self.store.val_q)
        sizes = self._fetch(self.store.size)
        for p in range(self.nparts):
            for i in range(int(sizes[p])):
                v = self.spec.to_int(keys[p, i])
                pid = (int(hi[p, i]) << 32) | int(lo[p, i])
                out.setdefault(v, []).append((pid, float(q[p, i])))
        return {k: sorted(v) for k, v in out.items()}
