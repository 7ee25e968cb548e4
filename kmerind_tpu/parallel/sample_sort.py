"""Distributed sample sort over the mesh.

Rebuild of the reference's range-partitioned strategy — ``mxx::sort``
sample sort as used by the sorted distributed maps
(/root/reference/src/containers/distributed_sorted_map.hpp:2061, and
``imxx::samplesort_buf``, src/io/incremental_mxx.hpp:2431): each shard
sorts locally, contributes p-quantile samples, the gathered samples define
p-1 splitters broadcast everywhere, elements route to the shard owning
their splitter range via the dense-bucket all_to_all, and each shard merges
its received runs.  The result is a *globally* sorted distribution: shard
i's keys all precede shard i+1's — the layout that lets range queries and
splitter-routed lookups work (distributed_sorted_map.hpp:1568-1600).

Written for use inside `shard_map`; `make_sample_sort_step` builds the
jitted whole-mesh program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import sortops
from . import distribute as dist
from .mesh import axes_of

__all__ = ["make_sample_sort_step"]


def _splitters_from_sorted(s_words, s_valid, nparts, oversample):
    """Sample `oversample` evenly spaced valid rows from this shard."""
    n = s_words.shape[0]
    total_valid = jnp.sum(s_valid.astype(jnp.int32))
    # positions: (j+1) * valid/(oversample+1), clipped to [0, n-1]
    j = jnp.arange(oversample, dtype=jnp.int32)
    pos = jnp.clip(((j + 1) * total_valid) // (oversample + 1), 0, n - 1)
    return s_words[pos], total_valid


def make_sample_sort_step(mesh: Mesh, nparts: int, capacity: int,
                          oversample: int = 8):
    """Jitted: (words[p, n, w], valid[p, n]) ->
    (sorted_words[p, n2, w], out_valid[p, n2], overflow[p])
    with n2 = nparts * capacity; globally sorted across shards.

    capacity: per-destination bucket size; needs headroom over n/nparts for
    imbalance (overflow is reported for check-and-retry, like the rest of
    the exchange layer).
    """

    def body(words_blk, valid_blk):
        words, valid = words_blk[0], valid_blk[0]
        n, w = words.shape

        # 1. local sort (invalid rows to the back)
        s_words, _, s_valid = sortops.sort_rows(words, (), valid)

        # 2. sample + allgather → global splitter table
        samples, _ = _splitters_from_sorted(s_words, s_valid, nparts,
                                            oversample)
        all_samples = jax.lax.all_gather(
            samples, axes_of(mesh), axis=0, tiled=True)  # [p*oversample, w]
        g_sorted, _, _ = sortops.sort_rows(all_samples, ())
        # splitters: p-1 evenly spaced rows of the sorted sample set
        m = nparts * oversample
        pos = jnp.clip(((jnp.arange(nparts - 1) + 1) * m) // nparts, 0, m - 1) \
            if nparts > 1 else jnp.zeros((0,), jnp.int32)
        splitters = g_sorted[pos]  # [p-1, w]

        # 3. owner = number of splitters <= element
        from ..ops.packing import lex_less
        owner = jnp.zeros((n,), jnp.int32)
        for si in range(nparts - 1):
            sp = jnp.broadcast_to(splitters[si], words.shape)
            owner = owner + jnp.where(lex_less(words, sp), 0, 1)

        # 4. route + local sort of received runs
        (rwords,), rvalid, route = dist.distribute(
            (words,), owner, valid, nparts, capacity, axes_of(mesh))
        f_words, _, f_valid = sortops.sort_rows(rwords, (), rvalid)
        return (f_words[None], f_valid[None], route.overflow[None])

    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axes_of(mesh)), P(axes_of(mesh))),
        out_specs=(P(axes_of(mesh)), P(axes_of(mesh)), P(axes_of(mesh))),
    ))
