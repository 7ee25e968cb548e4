"""Multi-host deployment glue.

The reference's process model is ``mpirun`` + ``mxx::env``
(/root/reference/src/io/file.hpp parallel readers, mxx comm); ours is
`jax.distributed` + a global mesh.  Each host:

1. calls `initialize()` (reads the standard JAX coordinator env vars or
   takes explicit arguments);
2. builds the global 1-D mesh over ALL devices (`global_mesh`);
3. reads ITS OWN byte block of the input with `host_block_batch` — the
   BlockPartitioner byte-range decomposition over hosts with FASTQ/FASTA
   record-boundary repair (file.hpp:1216-1432) — and feeds it to the index
   whose arrays are sharded over the global mesh.

Owner hashing spreads k-mers over every chip in the pod slice; the dense
bucket all_to_all rides ICI within a host and DCN across hosts, exactly the
two-level layout the reference sketches for its hash prefix bits
(kmer_hash.hpp:24-54).

Single-host processes (tests, the driver's dry run) can use everything here
unchanged: `initialize()` is a no-op when no coordinator is configured.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..alphabets import Alphabet
from ..io.batch import ReadBatch
from ..io.files import (
    block_partition,
    fasta_block_record_starts,
    file_size,
    read_fasta_block,
    read_fastq_block,
    sniff_format,
)
from .mesh import SHARD_AXIS

__all__ = ["initialize", "global_mesh", "host_block_batch",
           "distributed_fasta_context", "distributed_fasta_grid_context"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Bring up the multi-process JAX runtime (mxx::env analog).

    No-op when neither arguments nor JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES env vars are present (single-process mode).
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh():
    """1-D mesh over every device of every host."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (SHARD_AXIS,))


def host_block_batch(path, alphabet: Alphabet, fmt: str | None = None,
                     halo: int = 0, file_id: int = 0,
                     halo_left: int = 0) -> ReadBatch:
    """This host's byte block of `path`, parsed with record repair.

    NOTE for de Bruijn builds: pass `graph.parse_alphabet` (raw ASCII) as
    `alphabet` so edge nibbles see the raw characters (dual-LUT
    semantics: an 'N' neighbor encodes as DNA16 0xF instead of collapsing
    through the k-mer alphabet's LUT).

    Host h of H owns records starting in byte block h (FASTQ) or the bases
    in block h plus `halo` following bases (FASTA) — the partitioned_file
    contract, with `jax.process_index()` standing in for the MPI rank.
    """
    h = jax.process_index()
    nh = jax.process_count()
    fmt = fmt or sniff_format(path)
    if fmt == "fastq":
        return read_fastq_block(path, alphabet, h, nh, file_id=file_id)
    ctx = distributed_fasta_context(path) if nh > 1 else None
    return read_fasta_block(path, alphabet, h, nh, file_id=file_id,
                            halo=halo, halo_left=halo_left, context=ctx)


def distributed_fasta_context(path) -> tuple[int, int]:
    """(ordinal, start position) of the FASTA record containing this
    host's block start — `(-1, -1)` if no record starts at or before it.

    The distributed header scan (fasta_loader.hpp:202-360), O(block) per
    host: each host scans only ITS byte block for record-run starts, then
    one small allgather of (count, last_start) per host supplies every
    host's leading-record context — the ordinal is the exclusive prefix
    sum of earlier hosts' counts, the position is the nearest earlier
    host's last start (or this host's own block start when a record
    begins exactly there).
    """
    from jax.experimental import multihost_utils

    h = jax.process_index()
    nh = jax.process_count()
    total = file_size(path)
    bs, be = block_partition(total, nh, h)
    local = fasta_block_record_starts(path, bs, be)
    mine = np.array(
        [local.size, int(local[-1]) if local.size else -1], np.int64)
    gathered = np.asarray(multihost_utils.process_allgather(mine))
    counts, lasts = gathered[:, 0], gathered[:, 1]
    before = int(counts[:h].sum())
    if local.size and int(local[0]) == bs:
        return before, bs
    prev = lasts[:h][lasts[:h] >= 0]
    if prev.size == 0:
        return -1, -1
    return before - 1, int(prev[-1])


def distributed_fasta_grid_context(path, blocks_per_host) -> list:
    """Per-sub-block (ordinal, record start) contexts for THIS host's
    `blocks_per_host` sub-blocks of the `nh * blocks_per_host` global
    block grid — the streamed generalization of
    `distributed_fasta_context` for `build_stream` under multi-process.

    Each host scans only ITS byte range for record-run starts (done one
    sub-block at a time, so memory stays O(sub-block) even when the host
    range is huge), then ONE allgather of (count, last start) per host
    supplies the cross-host prefix, and the per-sub-block contexts follow
    from the local prefix walk.  The reference's distributed header scan
    (fasta_loader.hpp:202-360) is the per-rank analog; here the grid is
    finer than one block per rank so the index can stream.

    Every host MUST call this collectively (same blocks_per_host).
    Returns ``[(hidx, lead_abs), ...]``: the ordinal and absolute start of
    the record containing each sub-block's first byte, ``(-1, -1)`` when
    no record starts at or before it.
    """
    from jax.experimental import multihost_utils

    h = jax.process_index()
    nh = jax.process_count()
    total = file_size(path)
    nblocks = nh * blocks_per_host
    counts = np.zeros(blocks_per_host, np.int64)
    firsts = np.full(blocks_per_host, -1, np.int64)
    lasts = np.full(blocks_per_host, -1, np.int64)
    bounds = []
    for j in range(blocks_per_host):
        bs, be = block_partition(total, nblocks, h * blocks_per_host + j)
        bounds.append(bs)
        local = fasta_block_record_starts(path, bs, be)
        counts[j] = local.size
        if local.size:
            firsts[j] = int(local[0])
            lasts[j] = int(local[-1])
    my_last = int(lasts[lasts >= 0][-1]) if (lasts >= 0).any() else -1
    mine = np.array([int(counts.sum()), my_last], np.int64)
    gathered = np.asarray(multihost_utils.process_allgather(mine))
    host_counts, host_lasts = gathered[:, 0], gathered[:, 1]
    count_so_far = int(host_counts[:h].sum())
    prev = host_lasts[:h][host_lasts[:h] >= 0]
    last = int(prev[-1]) if prev.size else -1
    ctxs = []
    for j in range(blocks_per_host):
        bs = bounds[j]
        if firsts[j] == bs:
            ctxs.append((count_so_far, bs))
        elif count_so_far == 0:
            ctxs.append((-1, -1))
        else:
            ctxs.append((count_so_far - 1, last))
        count_so_far += int(counts[j])
        if lasts[j] >= 0:
            last = int(lasts[j])
    return ctxs
