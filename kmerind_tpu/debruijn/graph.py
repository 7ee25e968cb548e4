"""Distributed de Bruijn graph.

Rebuild of the reference's de Bruijn application
(/root/reference/test/test/debruijn/): nodes are (canonical) k-mers, node
payloads are 9 counters [out A,C,G,T; in A,C,G,T; self] accumulated from
per-window edge bytes (de_bruijn_node_trait.hpp:186-280 `edge_counts`;
`edge_exists` is the thresholded view).  Construction is the index build
pipeline with an extra payload column (de_bruijn_construct_engine.hpp:91-131
zips kmer and edge iterators); storage is the vector-reduction map
(de_bruijn_nodes_distributed.hpp:61-101 ≈ reduction map on edge vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..kmer import KmerSpec
from ..io.batch import ReadBatch
from ..ops import packing
from ..parallel import distribute as dist
from ..parallel.mesh import axes_of
from ..index import distributed as dx
from ..index import store as st
from ..index.api import _IndexBase, _next_pow2, _SENTINEL
from .edges import edge_byte_to_vec, edge_bytes_for_windows, revcomp_edge_byte

__all__ = ["DeBruijnGraph", "QualityDeBruijnGraph"]

_DIM = 9  # out A C G T, in A C G T, self


class DeBruijnGraph(_IndexBase):
    """Distributed de Bruijn graph over a device mesh.

    canonical=True mirrors the reference driver's Bimolecule/canonical
    configuration (test_de_bruijn_graph_construction.cpp:118-131): node key
    = canonical k-mer; edge bytes are reverse-complemented when the window
    was flipped, so counters are ordered for the canonical strand.
    """

    # run-store step factories — the quality subclass swaps these for
    # the RunVecQStore variants and inherits the whole LSM machinery
    _rv_empty = staticmethod(st.empty_run_vec_store)
    _rv_adopt = staticmethod(dx.make_run_vec_adopt_step)
    _rv_merge = staticmethod(dx.make_run_vec_merge_pair_step)
    _rv_stats = staticmethod(dx.make_run_vec_stats_step)
    _rv_compact = staticmethod(dx.make_run_vec_compact_step)
    _rv_table = staticmethod(dx.make_run_vec_table_step)

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = True,
                 hash_name: str = "murmur", saturate: int | None = None,
                 initial_capacity: int = 1 << 12, max_runs: int = 8, **kw):
        if not isinstance(canonical, bool):
            raise ValueError(
                "DeBruijnGraph defines edge orientation on the lex_less "
                "canonical strand; transform-name presets apply to the "
                "k-mer index families only")
        super().__init__(spec, mesh, canonical, hash_name, **kw)
        self.saturate = saturate
        self.initial_capacity = initial_capacity
        self.max_runs = max_runs
        # jit-with-out_shardings store init: SPMD-safe (a plain device_put
        # cannot target non-addressable devices under jax.distributed)
        self.runs: list = [self._init_store(
            lambda: self._rv_empty(initial_capacity, spec.nwords))]
        #: per-run unit flags (weight 1 per live row — file-ingest runs);
        #: unit pairs merge without the weight column, closed-form self
        #: stream (st.run_vec_merge_unit)
        self._unit: list = [spec.sentinel_safe]
        self._virgin = True
        self.compact_factor = 4
        #: host-side bound on any shard's raw weight total (int32 prefix
        #: sums wrap past 2^31); see CountIndex._note_weight
        self._ingested_weight = 0

    # the store pytree = the run list (checkpointing flattens it)
    @property
    def store(self):
        return self.runs

    @store.setter
    def store(self, value):
        self.runs = list(value) if isinstance(value, (list, tuple)) \
            else [value]
        self._unit = [False] * len(self.runs)

    @property
    def capacity(self) -> int:
        return sum(r.keys.shape[-1] for r in self.runs)

    def _run_caps(self) -> tuple:
        return tuple(r.keys.shape[-1] for r in self.runs)

    def _distinct(self) -> np.ndarray:
        assert len(self.runs) == 1
        self._ensure_tables()
        key = ("run_stats", self._run_caps())
        if key not in self._step_cache:
            self._step_cache[key] = self._rv_stats(self.mesh)
        return self._fetch(self._step_cache[key](self.runs[0]))

    def size(self) -> int:
        """Number of graph nodes (distinct canonical k-mers)."""
        self._consolidate()
        return int(self._distinct().sum())

    def local_sizes(self) -> list[int]:
        self._consolidate()
        return [int(x) for x in self._distinct()]

    def clear(self):
        self.runs = [self._init_store(
            lambda: self._rv_empty(self.initial_capacity,
                                   self.spec.nwords))]
        self._unit = [self.spec.sentinel_safe]
        self._virgin = True
        self._ingested_weight = 0
        return self

    def _flush(self):
        """No deferred work: each chunk is already a queryable run (the
        LSM laziness bound is max_runs, like the count family)."""
        return

    def _checkpoint_prepare(self):
        self._consolidate()
        self._ensure_tables()

    def _merge_two_smallest(self):
        order = sorted(range(len(self.runs)),
                       key=lambda i: self.runs[i].keys.shape[-1],
                       reverse=True)
        self.runs = [self.runs[i] for i in order]
        self._unit = [self._unit[i] for i in order]
        b, ub = self.runs.pop(), self._unit.pop()
        a, ua = self.runs.pop(), self._unit.pop()
        unit = ua and ub
        key = ("run_merge_pair", a.keys.shape[-1], b.keys.shape[-1], unit,
               a.bsum is None, b.bsum is None)
        if key not in self._step_cache:
            self._step_cache[key] = self._rv_merge(self.mesh, unit=unit,
                                                   table=False)
        with self.timer.phase("merge"):
            self.runs.append(self._step_cache[key](a, b))
        self._unit.append(unit)

    def _ensure_tables(self):
        """Materialize deferred counter tables on every run (queries,
        exports, stats, and checkpoints read them)."""
        for i, r in enumerate(self.runs):
            if r.bsum is None:
                key = ("run_table", r.keys.shape[-1])
                if key not in self._step_cache:
                    self._step_cache[key] = self._rv_table(self.mesh)
                self.runs[i] = self._step_cache[key](r)

    _I32_WEIGHT_GUARD = (1 << 31) - (1 << 26)

    def _note_weight(self, add: int):
        if self._ingested_weight + add > self._I32_WEIGHT_GUARD:
            # tighten the conservative bound from true device totals (the
            # worst case routes every window to one shard)
            totals = np.zeros(self.nparts, np.int64)
            for r in self.runs:
                totals += self._fetch(
                    r.weights.sum(-1)).astype(np.int64)
            self._ingested_weight = int(totals.max())
            if self._ingested_weight + add > (1 << 31) - 1:
                raise OverflowError(
                    "de Bruijn raw weight total would overflow the int32 "
                    "prefix sums on a shard; use more shards or smaller "
                    "insert batches")
        self._ingested_weight += add

    def _append_run(self, words, *payload_cols, unit: bool = False):
        """Adopt routed sorted columns as a LAZY run ((ebytes, weights)
        for the base graph; (ebytes, weights, qsums) for the quality
        engine).  Counter tables are deferred: intermediate LSM runs are
        merge fodder and would rebuild the [9, cap] table at every
        level; `_ensure_tables` materializes before any query/export."""
        unit = unit and self.spec.sentinel_safe
        key = ("run_adopt", words.shape[-1], unit)
        if key not in self._step_cache:
            self._step_cache[key] = self._rv_adopt(self.mesh, unit=unit,
                                                   table=False)
        run = self._step_cache[key](words, *payload_cols)
        if self._virgin:
            self.runs = [run]
            self._unit = [unit]
            self._virgin = False
        else:
            self.runs.append(run)
            self._unit.append(unit)
        while len(self.runs) > self.max_runs:
            self._merge_two_smallest()

    def _consolidate(self):
        while len(self.runs) > 1:
            self._merge_two_smallest()
        self._maybe_compact()

    def _maybe_compact(self):
        """Collapse duplicate (key, edge-byte) rows when the store is
        mostly duplicates — amortized O(1) per ingested row."""
        cap = self.capacity
        if len(self.runs) != 1 or cap <= (1 << 14):
            return
        distinct = int(self._distinct().max())
        # distinct (key, ebyte) groups are bounded by a few per node in
        # real genomes; size for 4x before giving up on shrinking
        target = _next_pow2(max(4 * distinct, 1 << 12))
        if cap >= self.compact_factor * target:
            self.compact(target)

    def compact(self, new_cap: int | None = None):
        """Consolidate to one run and collapse equal (key, edge-byte)
        rows; retries with doubled capacity on overflow."""
        while len(self.runs) > 1:
            self._merge_two_smallest()
        cap = self.capacity
        if new_cap is None:
            new_cap = _next_pow2(
                max(4 * int(self._distinct().max()), 1 << 12))
        while True:
            key = ("run_compact", new_cap, self._run_caps())
            if key not in self._step_cache:
                self._step_cache[key] = self._rv_compact(
                    self.mesh, new_cap)
            new_run, ovf = self._step_cache[key](self.runs[0])
            if int(self._fetch(ovf).max()) == 0:
                self.runs = [new_run]
                self._unit = [False]
                return self
            if new_cap >= cap:
                # nothing to reclaim at this size; keep the raw run
                return self
            new_cap *= 2

    def reserve(self, n: int):
        """Pre-grow total capacity (map_base::reserve).  Run capacities
        are otherwise data-driven; reserving pads the last run's sentinel
        tail (weight-0 rows never affect a counter)."""
        self._ensure_tables()
        per = _next_pow2(-(-n // self.nparts))
        cur = self.capacity
        if per <= cur:
            return self
        pad = per - cur
        key = ("_grow", pad, self._run_caps())
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                lambda s: st.RunVecStore(
                    keys=jnp.pad(s.keys, ((0, 0), (0, 0), (0, pad)),
                                 constant_values=np.uint32(_SENTINEL)),
                    ebytes=jnp.pad(s.ebytes, ((0, 0), (0, pad))),
                    weights=jnp.pad(s.weights, ((0, 0), (0, pad))),
                    bsum=jnp.pad(s.bsum, ((0, 0), (0, 0), (0, pad)),
                                 mode="edge"),
                ),
                out_shardings=self._sharding)
        self.runs[-1] = self._step_cache[key](self.runs[-1])
        return self

    # ------------------------------------------------------------------
    def _chunk_halo(self):
        # edge bytes need 1 base of left context and the k-th base on the
        # right, beyond the k-1 window halo (edge_iterator.hpp:56)
        return self.spec.k, 1

    def insert_batch(self, batch: ReadBatch, chunk_bases: int | None = None):
        if chunk_bases is None:
            chunk_bases = self.default_chunk_bases
        if batch.num_bases > chunk_bases:
            # edge context needs 1 base left + k right
            chunks = list(batch.iter_chunks(chunk_bases, self.spec.k,
                                            halo_left=1))
        else:
            chunks = [batch]
        self._stream_chunks(chunks, self._marshal_chunk, self._insert_cols)
        return self

    @property
    def parse_alphabet(self):
        """The graph parses raw bytes (identity alphabet): edge nibbles are
        DNA16::FROM_ASCII[raw char] like the reference's edge_iterator, so
        'N' neighbors encode as 0xF (any base) instead of collapsing
        through the k-mer alphabet's LUT.  K-mer codes are derived on
        device by the k-mer alphabet's FROM_ASCII LUT."""
        from ..alphabets import ASCII
        return ASCII

    def _marshal_chunk(self, batch: ReadBatch):
        with self.timer.phase("extract"):
            # edge bytes need 1 base of left context and the k-th base on
            # the right, beyond the k-1 window halo
            cols = self._batch_to_stacked(
                batch, id_kind=None, halo=self.spec.k, halo_left=1,
                need_ids=False, need_qual=False)[0]
        # externally-supplied batches may be pre-encoded in the k-mer
        # alphabet (legacy path: edge chars outside it are lossy — an 'N'
        # neighbor collapses through the k-mer LUT instead of encoding as
        # DNA16 0xF).  Parse with graph.parse_alphabet (ASCII) to get the
        # reference's dual-LUT semantics; warn once otherwise.
        raw = batch.alphabet.name == "ASCII"
        if not raw and not getattr(self, "_warned_lossy_edges", False):
            self._warned_lossy_edges = True
            import warnings
            warnings.warn(
                "DeBruijnGraph received a batch encoded in the "
                f"{batch.alphabet.name} alphabet: edge characters outside "
                "it (e.g. 'N') are lossy.  Parse inputs with "
                "graph.parse_alphabet (raw ASCII) for the reference's "
                "dual-LUT edge semantics.", RuntimeWarning, stacklevel=3)
        cols["raw"] = raw
        return cols

    def _insert_one_chunk(self, batch: ReadBatch):
        return self._insert_cols(self._marshal_chunk(batch))

    def _insert_cols(self, cols):
        raw = cols.pop("raw", False)
        n_local = cols["codes"].shape[1]
        self._note_weight(n_local * self.nparts)
        bucket_cap = self._bucket_capacity(n_local)
        while True:
            key = ("ingest", n_local, bucket_cap, raw)
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_debruijn_run_ingest_step(
                    self.mesh, self.nparts, self.spec, self.canonical,
                    bucket_cap, self.hash_name, raw=raw)
            with self.timer.phase("insert"):
                rw, reb, rwt, route_ovf = self._step_cache[key](
                    cols["codes"], cols["valid"], cols["owned"],
                    cols["seg_id"])
            if int(self._fetch(route_ovf).max()) == 0:
                self._append_run(rw, reb, rwt, unit=True)
                return self
            bucket_cap = _next_pow2(
                bucket_cap + int(self._fetch(route_ovf).max()))

    # ------------------------------------------------------------------
    def node_counts(self, kmers):
        """(counts int32[m, 9], found bool[m]) per query node —
        edge_counts payload lookup summed over the run list."""
        self._ensure_tables()
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = _next_pow2(mq)
        while True:
            key = ("lookup", mq, bucket_cap, self._run_caps())
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_runs_vec_query_step(
                    self.mesh, self.nparts, bucket_cap, self.hash_name,
                    self.saturate, len(self.runs))
            vals, ovf = self._step_cache[key](tuple(self.runs), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                vals = self._fetch(vals).reshape(-1, _DIM)[:m]
                # a node exists iff any window touched it (self > 0)
                return vals, vals[:, 8] > 0
            bucket_cap *= 2

    def edge_exists(self, kmers):
        """bool[m, 8] out/in edge-existence flags (edge_exists node trait,
        de_bruijn_node_trait.hpp:270-330)."""
        vals, found = self.node_counts(kmers)
        return (vals[:, :8] > 0) & found[:, None]

    def neighbors(self, kmer):
        """(in_neighbors, out_neighbors) of one node as lists of
        (kmer_string, edge count) — get_in/out_neighbors
        (de_bruijn_node_trait.hpp:60-115)."""
        spec = self.spec
        words = self._maybe_canonicalize_queries(self._to_words([kmer]))
        vals, found = self.node_counts(words)
        if not found[0]:
            return [], []
        counts = vals[0]
        # counters are ordered for the canonical strand; walk from the
        # canonicalized node, not the raw query orientation
        codes = spec.unpack_words(words[0])
        outs, ins = [], []
        for b in range(4):  # DNA codes A C G T = 0..3
            c_out = int(counts[b])
            if c_out > 0:
                nxt = np.concatenate([codes[1:], [b]]).astype(np.uint8)
                outs.append((spec.alphabet.decode(nxt), c_out))
            c_in = int(counts[4 + b])
            if c_in > 0:
                prv = np.concatenate([[b], codes[:-1]]).astype(np.uint8)
                ins.append((spec.alphabet.decode(prv), c_in))
        return ins, outs

    def save(self, path):
        """Serialize the graph + config to one .npz file.  The payload is
        the consolidated run's raw columns (keys, edge bytes, weights) —
        weight-0 rows are dead, so no per-shard sizes are needed."""
        self._consolidate()
        self._ensure_tables()
        r = self.runs[0]
        np.savez_compressed(
            path, kind="debruijn", k=self.spec.k,
            alphabet=self.spec.alphabet.name, canonical=self.canonical,
            hash_name=self.hash_name, nparts=self.nparts,
            keys=self._fetch(r.keys),
            ebytes=self._fetch(r.ebytes),
            weights=self._fetch(r.weights))
        return self

    @classmethod
    def load(cls, path, mesh=None):
        """Restore a saved graph onto any mesh (rows re-routed to their
        owners, re-sorted, and adopted as one run)."""
        from .. import alphabets as _al
        from ..kmer import KmerSpec as _KS
        z = np.load(path, allow_pickle=False)
        spec = _KS(int(z["k"]), _al.by_name(str(z["alphabet"])))
        g = cls(spec, mesh=mesh, canonical=bool(z["canonical"]),
                hash_name=str(z["hash_name"]))
        keys, ebytes, weights = z["keys"], z["ebytes"], z["weights"]
        P_ = keys.shape[0]
        live = weights > 0
        rows = np.concatenate([
            keys[p].T[live[p]] for p in range(P_)]).astype(np.uint32)
        if rows.shape[0] == 0:
            return g
        eb = np.concatenate([ebytes[p][live[p]] for p in range(P_)])
        wt = np.concatenate([weights[p][live[p]] for p in range(P_)])
        (wsh, esh, tsh), vsh, m = g._shard_rows(
            rows, extra=(eb.astype(np.uint32), wt.astype(np.uint32)))
        mq = wsh.shape[1]
        bucket_cap = _next_pow2(mq)
        while True:
            key = ("load", mq, bucket_cap)
            if key not in g._step_cache:
                g._step_cache[key] = _make_run_vec_load_step(
                    g.mesh, g.nparts, bucket_cap, g.hash_name, g.spec)
            skeys, seb, swt, route_ovf = g._step_cache[key](
                wsh, esh, tsh, vsh)
            if int(g._fetch(route_ovf).max()) == 0:
                g._append_run(skeys, seb, swt)
                g._ingested_weight = int(np.int64(wt.sum()))
                return g
            bucket_cap *= 2

    def to_dict(self):
        """{kmer_int: (out ACGT, in ACGT, self) counters}."""
        self._consolidate()
        self._ensure_tables()
        key = ("export", self._run_caps())
        if key not in self._step_cache:
            self._step_cache[key] = dx.make_run_vec_export_step(
                self.mesh, self.saturate)
        keys_out, vecs_out, n = self._step_cache[key](self.runs[0])
        keys_out = self._fetch(keys_out)
        vecs_out = self._fetch(vecs_out)
        n = self._fetch(n)
        out = {}
        for p in range(self.nparts):
            for i in range(int(n[p])):
                out[self.spec.to_int(keys_out[p, i])] = tuple(
                    int(x) for x in vecs_out[p, i])
        return out


class QualityDeBruijnGraph(DeBruijnGraph):
    """De Bruijn graph whose tuples also carry the window's phred score —
    the reference's `de_bruijn_quality_engine`
    (/root/reference/test/test/debruijn/de_bruijn_construct_engine.hpp:245:
    de_bruijn_quality_parser zips the k-mer, edge, and
    QualityScoreGenerationIterator streams, :160-230).

    The alias is DECLARED in the reference but never instantiated by any
    test or benchmark, and its node traits define no quality reduction —
    so the node-side semantics are defined here: per node, the 9 edge
    counters (identical to DeBruijnGraph), the number of windows (== the
    self counter), and the SUM of windowed quality scores;
    `node_quality` reports the mean.  FASTQ-only (quality bytes
    required), like the reference parser.

    Runs on the same RUN-layout LSM as the base graph (RunVecQStore:
    one extra float payload column in the merges + a float prefix-sum
    table) — the compacted VecQStore flush had the same pathological
    9-payload re-sort economics the base graph escaped.
    """

    _rv_empty = staticmethod(st.empty_run_vecq_store)
    _rv_adopt = staticmethod(dx.make_run_vecq_adopt_step)
    _rv_merge = staticmethod(dx.make_run_vecq_merge_pair_step)
    _rv_stats = staticmethod(dx.make_run_vecq_stats_step)
    _rv_compact = staticmethod(dx.make_run_vecq_compact_step)
    _rv_table = staticmethod(dx.make_run_vecq_table_step)

    def __init__(self, spec: KmerSpec, mesh=None, canonical: bool = True,
                 hash_name: str = "murmur", saturate: int | None = None,
                 initial_capacity: int = 1 << 12, codec=None, **kw):
        from ..quality import ILLUMINA18
        super().__init__(spec, mesh, canonical, hash_name, saturate,
                         initial_capacity, **kw)
        self.codec = codec if codec is not None else ILLUMINA18

    def _marshal_chunk(self, batch: ReadBatch):
        with self.timer.phase("extract"):
            cols = self._batch_to_stacked(
                batch, id_kind=None, halo=self.spec.k, halo_left=1,
                need_ids=False, need_qual=True)[0]
        cols["raw"] = batch.alphabet.name == "ASCII"
        return cols

    def _insert_cols(self, cols):
        raw = cols.pop("raw", False)
        n_local = cols["codes"].shape[1]
        self._note_weight(n_local * self.nparts)
        bucket_cap = self._bucket_capacity(n_local)
        while True:
            key = ("ingest", n_local, bucket_cap, raw)
            if key not in self._step_cache:
                self._step_cache[key] = \
                    dx.make_debruijn_quality_run_ingest_step(
                        self.mesh, self.nparts, self.spec, self.canonical,
                        bucket_cap, self.hash_name, self.codec, raw=raw)
            with self.timer.phase("insert"):
                rw, reb, rwt, rqs, route_ovf = self._step_cache[key](
                    cols["codes"], cols["valid"], cols["owned"],
                    cols["seg_id"], cols["qual"])
            if int(self._fetch(route_ovf).max()) == 0:
                self._append_run(rw, reb, rwt, rqs, unit=True)
                return self
            bucket_cap = _next_pow2(
                bucket_cap + int(self._fetch(route_ovf).max()))

    def reserve(self, n: int):
        self._ensure_tables()
        per = _next_pow2(-(-n // self.nparts))
        cur = self.capacity
        if per <= cur:
            return self
        pad = per - cur
        key = ("_grow", pad, self._run_caps())
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(
                lambda s: st.RunVecQStore(
                    keys=jnp.pad(s.keys, ((0, 0), (0, 0), (0, pad)),
                                 constant_values=np.uint32(_SENTINEL)),
                    ebytes=jnp.pad(s.ebytes, ((0, 0), (0, pad))),
                    weights=jnp.pad(s.weights, ((0, 0), (0, pad))),
                    qsums=jnp.pad(s.qsums, ((0, 0), (0, pad))),
                    bsum=jnp.pad(s.bsum, ((0, 0), (0, 0), (0, pad)),
                                 mode="edge"),
                    qcsum=jnp.pad(s.qcsum, ((0, 0), (0, pad)),
                                  mode="edge"),
                ),
                out_shardings=self._sharding)
        self.runs[-1] = self._step_cache[key](self.runs[-1])
        return self

    # ------------------------------------------------------------------
    def node_counts(self, kmers):
        """(counts int32[m, 9], found bool[m]) — the DeBruijnGraph
        contract."""
        vals, _, found = self._node_payload(kmers)
        return vals, found

    def node_quality(self, kmers):
        """(mean_quality float32[m], n_windows int32[m], found bool[m])
        — the quality summary per node (mean of the windowed scores of
        every window that touched the node)."""
        vals, qsum, found = self._node_payload(kmers)
        n = vals[:, 8]
        mean = np.where(n > 0, qsum / np.maximum(n, 1), 0.0)
        return mean.astype(np.float32), n, found

    def _node_payload(self, kmers):
        self._ensure_tables()
        words = self._maybe_canonicalize_queries(self._to_words(kmers))
        (wsh,), vsh, m = self._shard_rows(words)
        mq = wsh.shape[1]
        bucket_cap = _next_pow2(mq)
        while True:
            key = ("lookup", mq, bucket_cap, self._run_caps())
            if key not in self._step_cache:
                self._step_cache[key] = dx.make_runs_vecq_query_step(
                    self.mesh, self.nparts, bucket_cap, self.hash_name,
                    self.saturate, len(self.runs))
            vals, qs, ovf = self._step_cache[key](
                tuple(self.runs), wsh, vsh)
            if int(self._fetch(ovf).max()) == 0:
                vals = self._fetch(vals).reshape(-1, _DIM)[:m]
                qs = self._fetch(qs).reshape(-1)[:m]
                return vals, qs, vals[:, 8] > 0
            bucket_cap *= 2

    def save(self, path):
        self._consolidate()
        r = self.runs[0]
        np.savez_compressed(
            path, kind="debruijn_quality", k=self.spec.k,
            alphabet=self.spec.alphabet.name, canonical=self.canonical,
            hash_name=self.hash_name, nparts=self.nparts,
            keys=self._fetch(r.keys),
            ebytes=self._fetch(r.ebytes),
            weights=self._fetch(r.weights),
            qsums=self._fetch(r.qsums))
        return self

    @classmethod
    def load(cls, path, mesh=None):
        """Restore a saved quality graph onto any mesh (rows re-routed;
        quality sums merge additively like the counters)."""
        from .. import alphabets as _al
        from ..kmer import KmerSpec as _KS
        z = np.load(path, allow_pickle=False)
        spec = _KS(int(z["k"]), _al.by_name(str(z["alphabet"])))
        g = cls(spec, mesh=mesh, canonical=bool(z["canonical"]),
                hash_name=str(z["hash_name"]))
        keys, ebytes = z["keys"], z["ebytes"]
        weights, qsums = z["weights"], z["qsums"]
        P_ = keys.shape[0]
        live = weights > 0
        rows = np.concatenate([
            keys[p].T[live[p]] for p in range(P_)]).astype(np.uint32)
        if rows.shape[0] == 0:
            return g
        eb = np.concatenate([ebytes[p][live[p]] for p in range(P_)])
        wt = np.concatenate([weights[p][live[p]] for p in range(P_)])
        qq = np.concatenate([qsums[p][live[p]] for p in range(P_)])
        (wsh, esh, tsh, qsh), vsh, m = g._shard_rows(
            rows, extra=(eb.astype(np.uint32), wt.astype(np.uint32),
                         qq.astype(np.float32)))
        mq = wsh.shape[1]
        bucket_cap = _next_pow2(mq)
        while True:
            key = ("load", mq, bucket_cap)
            if key not in g._step_cache:
                g._step_cache[key] = _make_run_vecq_load_step(
                    g.mesh, g.nparts, bucket_cap, g.hash_name, g.spec)
            skeys, seb, swt, sqs, route_ovf = g._step_cache[key](
                wsh, esh, tsh, qsh, vsh)
            if int(g._fetch(route_ovf).max()) == 0:
                g._append_run(skeys, seb, swt, sqs)
                g._ingested_weight = int(np.int64(wt.sum()))
                return g
            bucket_cap *= 2

    def to_dict(self):
        """{kmer_int: (9 counters..., n_windows, qsum)}."""
        self._consolidate()
        self._ensure_tables()
        key = ("export", self._run_caps())
        if key not in self._step_cache:
            self._step_cache[key] = dx.make_run_vecq_export_step(
                self.mesh, self.saturate)
        keys_out, vecs_out, qsum_out, n = self._step_cache[key](
            self.runs[0])
        keys_out = self._fetch(keys_out)
        vecs_out = self._fetch(vecs_out)
        qsum_out = self._fetch(qsum_out)
        n = self._fetch(n)
        out = {}
        for p in range(self.nparts):
            for i in range(int(n[p])):
                out[self.spec.to_int(keys_out[p, i])] = tuple(
                    int(x) for x in vecs_out[p, i]) \
                    + (float(qsum_out[p, i]),)
        return out


def _make_run_vec_load_step(mesh, nparts, capacity, hash_name, spec):
    """Route explicit (node, edge byte, weight) rows to their owners and
    locally sort them into an adoptable run (the load/restore path)."""
    from ..ops import sortops

    def body(words_blk, eb_blk, wt_blk, valid_blk):
        words, eb, wt, valid = (words_blk[0], eb_blk[0], wt_blk[0],
                                valid_blk[0])
        owner = dx.owners_for(words, nparts, hash_name)
        (rw, re, rt), rvalid, route = dist.distribute(
            (words, eb, wt), owner, valid, nparts, capacity,
            axes_of(mesh))
        s_words, (s_eb, s_wt), s_valid = sortops.sort_rows(
            rw, (re, rt), rvalid, is_stable=False,
            sentinel_ok=spec.sentinel_safe, word_bits=spec.word_bits(),
            as_cols=True)
        s_words = jnp.where(s_valid[None, :], s_words,
                            jnp.uint32(0xFFFFFFFF))
        ebytes = jnp.where(s_valid, s_eb, 0).astype(jnp.int32)
        weights = jnp.where(s_valid, s_wt, 0).astype(jnp.int32)
        return (s_words[None], ebytes[None], weights[None],
                route.overflow[None])

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes_of(mesh)),) * 4,
        out_specs=(P(axes_of(mesh)),) * 4,
    ))


def _make_run_vecq_load_step(mesh, nparts, capacity, hash_name, spec):
    """Quality variant of `_make_run_vec_load_step`: rows carry an extra
    bitcast float quality-sum payload."""
    from ..ops import sortops

    def body(words_blk, eb_blk, wt_blk, qs_blk, valid_blk):
        words, eb, wt, qs, valid = (
            words_blk[0], eb_blk[0], wt_blk[0], qs_blk[0], valid_blk[0])
        owner = dx.owners_for(words, nparts, hash_name)
        qbits = jax.lax.bitcast_convert_type(qs, jnp.uint32)
        (rw, re, rt, rqb), rvalid, route = dist.distribute(
            (words, eb, wt, qbits), owner, valid, nparts, capacity,
            axes_of(mesh))
        s_words, (s_eb, s_wt, s_qb), s_valid = sortops.sort_rows(
            rw, (re, rt, rqb), rvalid, is_stable=False,
            sentinel_ok=spec.sentinel_safe, word_bits=spec.word_bits(),
            as_cols=True)
        s_words = jnp.where(s_valid[None, :], s_words,
                            jnp.uint32(0xFFFFFFFF))
        ebytes = jnp.where(s_valid, s_eb, 0).astype(jnp.int32)
        weights = jnp.where(s_valid, s_wt, 0).astype(jnp.int32)
        qsums = jnp.where(
            s_valid, jax.lax.bitcast_convert_type(s_qb, jnp.float32), 0.0)
        return (s_words[None], ebytes[None], weights[None], qsums[None],
                route.overflow[None])

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes_of(mesh)),) * 5,
        out_specs=(P(axes_of(mesh)),) * 5,
    ))
