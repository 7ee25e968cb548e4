"""Generic unique-key k-mer → 64-bit value indexes.

The reference's `KmerIndex` alias family — an `Index` over a UNIQUE-key
map with an arbitrary per-key payload
(/root/reference/src/index/kmer_index.hpp:397-399:
``KmerIndex = Index<densehash_map<Kmer, T>>`` over
src/containers/densehash_map.hpp:1742, and the sorted-map variant
distributed_sorted_map.hpp:1407).  Counting and multimap presets cover
the apps the reference ships; this family is the user-payload map:
k-mer → one uint64 value with a configurable insert reduction:

* ``reduce="first"`` — keep the earliest-inserted value (the hash map's
  insert-does-not-overwrite semantics; arrival order = API call order,
  then row order within a call).
* ``reduce="min"`` / ``"max"`` — keep the extreme u64 value
  (reduction map with min/max functor,
  distributed_densehash_map.hpp:2429+); order-independent.

``build(path)`` instantiates the reference's
``Index<map, KmerPositionTupleParser>`` combination: the value is the
64-bit Short/LongSequenceKmerId of an occurrence, reduced per the
configured reduction ("min" = earliest position in the file,
deterministic under any chunking/process count).

Both distributions are provided: `KmerValueIndex` (hash-partitioned) and
`SortedKmerValueIndex` (range-partitioned with splitter-routed queries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kmer import KmerSpec
from ..io.batch import ReadBatch
from . import distributed as dx
from . import sorted_dist as sx
from . import store as st
from .api import _IndexBase, _next_pow2, _SENTINEL
from .sorted_api import _SortedBase

__all__ = ["KmerValueIndex", "SortedKmerValueIndex"]


def _split64(values) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, dtype=np.uint64).reshape(-1)
    return ((v >> np.uint64(32)).astype(np.uint32),
            (v & np.uint64(0xFFFFFFFF)).astype(np.uint32))


class _KVCommon:
    """Host-side surface shared by both distributions (duck-typed on
    self.store being a KVStore pytree)."""

    def size(self) -> int:
        self._flush()
        return int(self._fetch(self.store.size).sum())

    def local_sizes(self) -> list[int]:
        self._flush()
        return [int(x) for x in self._fetch(self.store.size)]

    def unique_size(self) -> int:
        return self.size()

    def count(self, kmers) -> np.ndarray:
        """0/1 membership counts (unique map multiplicity)."""
        _, found = self.find(kmers)
        return found.astype(np.int32)

    def exists(self, kmers) -> np.ndarray:
        _, found = self.find(kmers)
        return found

    def get_multiplicity(self, kmers) -> np.ndarray:
        return self.count(kmers)

    def insert(self, kmers, values):
        """Insert (kmer, uint64 value) pairs under the configured
        reduction (Index::insert of (Kmer, T) tuples)."""
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        hi, lo = _split64(values)
        if hi.shape[0] != words.shape[0]:
            raise ValueError("kmers and values length mismatch")
        return self._insert_rows(words, hi, lo)

    def find_if(self, pred, kmers=None):
        """pred: traceable (keys uint32[n,w], val_hi, val_lo) -> bool[n].
        Without kmers: [(kmer_int, value)] entries satisfying pred.  With
        kmers: (values, found & pred(queries))."""
        if kmers is None:
            return self.count_if(pred)
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        vals, found = self._find_words(words)
        hi = (vals >> np.uint64(32)).astype(np.uint32)
        lo = vals.astype(np.uint32)
        keep = np.asarray(pred(jnp.asarray(words), jnp.asarray(hi),
                               jnp.asarray(lo)))
        return vals, found & keep

    def find(self, kmers):
        """(values uint64[m], found bool[m]) in query order (Index::find;
        absent keys report value 0 with found False)."""
        return self._find_words(
            self._maybe_canonicalize_queries(self._to_words(kmers)))

    def to_dict(self) -> dict[int, int]:
        """{kmer_int: value} full contents (to_vector analog)."""
        self._flush()
        keys = self._fetch(self.store.keys)
        hi = self._fetch(self.store.val_hi)
        lo = self._fetch(self.store.val_lo)
        sizes = self._fetch(self.store.size)
        out = {}
        for p in range(self.nparts):
            n = int(sizes[p])
            if n == 0:
                continue
            ints = self.spec.to_ints(keys[p, :n]).tolist()
            vals = ((hi[p, :n].astype(np.uint64) << np.uint64(32))
                    | lo[p, :n].astype(np.uint64)).tolist()
            out.update(zip(ints, vals))
        return out

    def save(self, path):
        self._flush()
        np.savez_compressed(
            path,
            kind=self._save_kind,
            k=self.spec.k,
            alphabet=self.spec.alphabet.name,
            canonical=self.canonical,
            reduce=self.reduce,
            nparts=self.nparts,
            keys=self._fetch(self.store.keys),
            val_hi=self._fetch(self.store.val_hi),
            val_lo=self._fetch(self.store.val_lo),
            sizes=self._fetch(self.store.size),
        )
        return self

    @classmethod
    def load(cls, path, mesh=None):
        from .. import alphabets as _al
        z = np.load(path, allow_pickle=False)
        spec = KmerSpec(int(z["k"]), _al.by_name(str(z["alphabet"])))
        idx = cls(spec, mesh=mesh, canonical=bool(z["canonical"]),
                  reduce=str(z["reduce"]))
        keys, hi, lo, sizes = z["keys"], z["val_hi"], z["val_lo"], z["sizes"]
        P_ = keys.shape[0]
        rows = np.concatenate([keys[p, :sizes[p]] for p in range(P_)])
        if rows.shape[0]:
            vhi = np.concatenate([hi[p, :sizes[p]] for p in range(P_)])
            vlo = np.concatenate([lo[p, :sizes[p]] for p in range(P_)])
            canonical = idx.canonical
            idx.canonical = False  # stored keys are post-transform
            try:
                idx._insert_rows(rows.astype(np.uint32), vhi, vlo)
            finally:
                idx.canonical = canonical
        return idx

    # -- file build: value = 64-bit position id -------------------------
    def insert_batch(self, batch: ReadBatch, chunk_bases: int | None = None):
        if chunk_bases is None:
            chunk_bases = self.default_chunk_bases
        if batch.num_bases > chunk_bases:
            chunks = list(batch.iter_chunks(chunk_bases, self.spec.k - 1))
        else:
            chunks = [batch]
        self._stream_chunks(self._equalize_chunks(chunks),
                            self._marshal_chunk, self._insert_cols)
        return self

    def _marshal_chunk(self, batch: ReadBatch):
        with self.timer.phase("extract"):
            return self._batch_to_stacked(batch, id_kind=self.id_kind,
                                          need_qual=False)[0]

    def _insert_one_chunk(self, batch: ReadBatch):
        return self._insert_cols(self._marshal_chunk(batch))


class KmerValueIndex(_KVCommon, _IndexBase):
    """Hash-partitioned unique k-mer → uint64 value map (the
    `KmerIndex = Index<densehash_map<Kmer, T>>` alias,
    kmer_index.hpp:397-399)."""

    _save_kind = "kv"

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = True,
                 hash_name: str = "murmur", reduce: str = "first",
                 id_kind: str = "short", initial_capacity: int = 1 << 12,
                 **kw):
        super().__init__(spec, mesh, canonical, hash_name, **kw)
        if reduce not in ("first", "min", "max"):
            raise ValueError("reduce must be first|min|max (sum-type "
                             "reductions are the counting family)")
        self.reduce = reduce
        self.id_kind = id_kind
        self.store = self._init_store(
            lambda: st.empty_kv_store(initial_capacity, spec.nwords))

    @property
    def capacity(self) -> int:
        return self.store.keys.shape[1]

    def _flush(self):
        return  # inserts are eager

    def _grow(self, new_cap: int):
        pad = new_cap - self.capacity
        if pad <= 0:
            return
        key = ("_grow", new_cap, self.capacity)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                lambda s: st.KVStore(
                    keys=jnp.pad(s.keys, ((0, 0), (0, pad), (0, 0)),
                                 constant_values=np.uint32(_SENTINEL)),
                    val_hi=jnp.pad(s.val_hi, ((0, 0), (0, pad))),
                    val_lo=jnp.pad(s.val_lo, ((0, 0), (0, pad))),
                    size=s.size,
                ),
                out_shardings=self._sharding)
        self.store = self._step_cache[key](self.store)

    def _insert_rows(self, words, hi, lo):
        (wsh, hsh, lsh), vsh, m = self._shard_rows(words, extra=(hi, lo))
        mq = wsh.shape[1]
        if self.size() + m > self.capacity * self.nparts:
            self._grow(_next_pow2(-(-(self.size() + m) // self.nparts)))
        bucket_cap = self._bucket_capacity(mq)
        while True:
            key = ("insert", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_kv_insert_step(
                    self.mesh, self.nparts, bucket_cap, self.hash_name,
                    self.reduce)
            new_store, route_ovf, store_ovf = self._step_cache[key](
                self.store, wsh, hsh, lsh, vsh)
            if int(self._fetch(route_ovf).max()) == 0 and \
               int(self._fetch(store_ovf).max()) == 0:
                self.store = new_store
                return self
            bucket_cap *= 2
            if int(self._fetch(store_ovf).max()) > 0:
                self._grow(self.capacity * 2)

    def _insert_cols(self, cols):
        n_local = cols["codes"].shape[1]
        bucket_cap = self._bucket_capacity(n_local)
        while True:
            key = ("ingest", n_local, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_kv_ingest_step(
                    self.mesh, self.nparts, self.spec, self.canonical,
                    bucket_cap, self.hash_name,
                    "min" if self.reduce == "first" else self.reduce)
            with self.timer.phase("insert"):
                new_store, route_ovf, store_ovf = self._step_cache[key](
                    self.store, cols["codes"], cols["valid"],
                    cols["owned"], cols["seg_id"], cols["id_hi"],
                    cols["id_lo"])
            if int(self._fetch(route_ovf).max()) == 0 and \
               int(self._fetch(store_ovf).max()) == 0:
                self.store = new_store
                return self
            if int(self._fetch(route_ovf).max()) > 0:
                bucket_cap = _next_pow2(
                    bucket_cap + int(self._fetch(route_ovf).max()))
            if int(self._fetch(store_ovf).max()) > 0:
                self._grow(_next_pow2(
                    self.capacity + int(self._fetch(store_ovf).max())))

    def _find_words(self, words):
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._bucket_capacity(mq)
        while True:
            key = ("find", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_kv_find_step(
                    self.mesh, self.nparts, bucket_cap, self.hash_name)
            with self.timer.phase("find"):
                hi, lo, found, ovf = self._step_cache[key](
                    self.store, wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                hi = self._fetch(hi).reshape(-1)[:m]
                lo = self._fetch(lo).reshape(-1)[:m]
                found = self._fetch(found).reshape(-1)[:m]
                vals = ((hi.astype(np.uint64) << np.uint64(32))
                        | lo.astype(np.uint64))
                return vals, found
            bucket_cap *= 2

    def erase(self, kmers) -> int:
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._bucket_capacity(mq)
        while True:
            key = ("erase", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_kv_erase_step(
                    self.mesh, self.nparts, bucket_cap, self.hash_name)
            new_store, nerased, ovf = self._step_cache[key](
                self.store, wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                return int(self._fetch(nerased).sum())
            bucket_cap *= 2

    def erase_if(self, pred, kmers=None) -> int:
        """pred: traceable (keys, val_hi, val_lo) -> bool[n] over entries."""
        if kmers is None:
            key = ("erase_if", pred, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_kv_filter_step(
                    self.mesh, lambda k, h, l: ~pred(k, h, l))
            new_store, nerased = self._step_cache[key](self.store)
            self.store = new_store
            return int(self._fetch(nerased).sum())
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        vals, found = self._find_words(words)
        hi = (vals >> np.uint64(32)).astype(np.uint32)
        lo = vals.astype(np.uint32)
        keep = np.asarray(pred(jnp.asarray(words), jnp.asarray(hi),
                               jnp.asarray(lo)))
        hits = keep & found
        if not hits.any():
            return 0
        return self.erase(words[hits])

    def filter(self, pred) -> int:
        return self.erase_if(lambda k, h, l: ~pred(k, h, l))

    def count_if(self, pred, kmers=None):
        """Without kmers: [(kmer_int, value)] entries satisfying pred."""
        if kmers is None:
            # device-side selection: matching entries compact to the front
            # per shard, the host slices n rows (no cap-sized mask scans)
            self._flush()
            key = ("select_if", pred, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_kv_select_step(
                    self.mesh, pred)
            keys_out, hi_out, lo_out, n = self._step_cache[key](self.store)
            keys_out = self._fetch(keys_out)
            hi_out = self._fetch(hi_out)
            lo_out = self._fetch(lo_out)
            n = self._fetch(n)
            out = []
            for p in range(self.nparts):
                c = int(n[p])
                if c == 0:
                    continue
                ints = self.spec.to_ints(keys_out[p, :c])
                vals = ((hi_out[p, :c].astype(np.uint64) << np.uint64(32))
                        | lo_out[p, :c].astype(np.uint64))
                out.extend(zip(ints.tolist(),
                               vals.astype(int).tolist()))
            return out
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        vals, found = self._find_words(words)
        hi = (vals >> np.uint64(32)).astype(np.uint32)
        lo = vals.astype(np.uint32)
        keep = np.asarray(pred(jnp.asarray(words), jnp.asarray(hi),
                               jnp.asarray(lo)))
        return np.where(keep & found, 1, 0).astype(np.int32)


class SortedKmerValueIndex(_KVCommon, _SortedBase):
    """Range-partitioned unique k-mer → uint64 value map
    (sorted_map, distributed_sorted_map.hpp:1407): lazy insert, global
    samplesort flush, splitter-routed lookups."""

    _save_kind = "sorted_kv"

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = True,
                 reduce: str = "first", id_kind: str = "short",
                 initial_capacity: int = 1 << 12, **kw):
        super().__init__(spec, mesh, canonical, **kw)
        if reduce not in ("first", "min", "max"):
            raise ValueError("reduce must be first|min|max")
        self.reduce = reduce
        self.id_kind = id_kind
        self.store = self._init_store(
            lambda: st.empty_kv_store(initial_capacity, spec.nwords))
        self._pending: list = []
        self._pending_rows = 0
        #: arrival priority counter for reduce="first" (store rows re-enter
        #: the flush with priority 0 and win; pending batches get ascending
        #: bases)
        self._prio = 1

    @property
    def capacity(self) -> int:
        return self.store.keys.shape[1]

    def _insert_rows(self, words, hi, lo):
        m = words.shape[0]
        prio = np.full(m, self._prio, np.uint32)
        self._prio += 1
        (wsh, hsh, lsh, psh), vsh, _ = self._shard_rows(
            words, extra=(hi, lo, prio))
        self._pending.append((wsh, hsh, lsh, psh, vsh))
        self._pending_rows += wsh.shape[1]
        self._dirty = True
        return self

    def _insert_cols(self, cols):
        n_local = cols["codes"].shape[1]
        key = ("local_ingest", n_local)
        if key not in self._step_cache:
            self._step_cache[key] = sx.make_kv_local_ingest_step(
                self.mesh, self.spec, self.canonical)
        with self.timer.phase("insert"):
            rw, rhi, rlo, rv = self._step_cache[key](
                cols["codes"], cols["valid"], cols["owned"],
                cols["seg_id"], cols["id_hi"], cols["id_lo"])
        # file builds reduce by value ("first" -> earliest position id);
        # priority column mirrors the value's high half so "first" matches
        # min-id deterministically
        self._pending.append((rw, rhi, rlo, rhi, rv))
        self._pending_rows += rw.shape[1]
        self._dirty = True
        return self

    def _flush(self):
        if not self._dirty and self.splitters is not None:
            return
        if not self._pending and self.splitters is not None:
            return
        live = self._live_mask()
        zero_prio = self._zero_like_u32()
        parts = [(self.store.keys, self.store.val_hi, self.store.val_lo,
                  zero_prio, live)] + self._pending
        words = self._device_concat([t[0] for t in parts])
        hi = self._device_concat([t[1] for t in parts])
        lo = self._device_concat([t[2] for t in parts])
        prio = self._device_concat([t[3] for t in parts])
        valid = self._device_concat([t[4] for t in parts])
        self._pending = []
        self._pending_rows = 0
        n_rows = words.shape[1]
        total = int(self._valid_counts(valid).sum())
        cap = max(self._query_capacity(max(total, 1)), 16)
        while True:
            key = ("flush", n_rows, cap)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_kv_flush_step(
                    self.mesh, self.nparts, cap, self.reduce)
            with self.timer.phase("merge"):
                new_store, splitters, ovf = self._step_cache[key](
                    words, hi, lo, prio, valid)
            if int(self._fetch(ovf).max()) == 0:
                self.store = new_store
                self.splitters = splitters
                self._dirty = False
                return
            cap *= 2

    def _zero_like_u32(self):
        """uint32[p, cap] zeros matching the store rows (jitted)."""
        key = ("_zero_u32", self.capacity)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                lambda s: jnp.zeros(s.val_hi.shape, jnp.uint32),
                out_shardings=self._sharding)
        return self._step_cache[key](self.store)

    def _find_words(self, words):
        self._flush()
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("find", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_kv_query_step(
                    self.mesh, self.nparts, bucket_cap)
            with self.timer.phase("find"):
                hi, lo, found, ovf = self._step_cache[key](
                    self.store, self._splitters_blk(), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                hi = self._fetch(hi).reshape(-1)[:m]
                lo = self._fetch(lo).reshape(-1)[:m]
                found = self._fetch(found).reshape(-1)[:m]
                vals = ((hi.astype(np.uint64) << np.uint64(32))
                        | lo.astype(np.uint64))
                return vals, found
            bucket_cap *= 2

    def erase(self, kmers) -> int:
        self._flush()
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = self._query_capacity(mq)
        while True:
            key = ("erase", mq, bucket_cap, self.capacity)
            if key not in self._step_cache:
                self._step_cache[key] = sx.make_kv_erase_step(
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
                self._step_cache[key] = dx.make_kv_filter_step(
                    self.mesh, lambda k, h, l: ~pred(k, h, l))
            new_store, nerased = self._step_cache[key](self.store)
            self.store = new_store
            return int(self._fetch(nerased).sum())
        return KmerValueIndex.erase_if(self, pred, kmers)

    def filter(self, pred) -> int:
        return self.erase_if(lambda k, h, l: ~pred(k, h, l))

    def count_if(self, pred, kmers=None):
        self._flush()
        return KmerValueIndex.count_if(self, pred, kmers)
