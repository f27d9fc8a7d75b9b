"""Stream compaction under static shapes.

The reference compacts boolean frontier masks with
``thrust::exclusive_scan`` + a scatter kernel ``findInd`` (KGMT.cu:139-147,
319-339), reading the resulting size back to the host every iteration. Here the
same mask -> dense-index transform is a cumsum + one scatter, stays on device,
and the "size" is a traced scalar — no host round-trip, no dynamic shapes.

Library op: the flagship planner no longer needs it (its frontier became the
contiguous range [frontier_lo, tree_size) since commits are tail-packed), but
it is the general-mask building block for planner variants whose acceptance
doesn't tail-pack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def compact_indices(mask: Array) -> tuple[Array, Array]:
    """Pack the indices of True entries to the front of a fixed-size buffer.

    mask: bool [M]. Returns (idx, count): idx int32 [M] whose first ``count``
    entries are the positions of set bits in ascending order (entries beyond
    ``count`` are 0 and must be masked by the caller), count int32 scalar.
    """
    m = mask.shape[0]
    cum = jnp.cumsum(mask.astype(jnp.int32))
    count = cum[-1]
    # Destination of each set bit; unset bits scatter out of bounds and drop.
    pos = jnp.where(mask, cum - 1, m)
    idx = jnp.zeros(m, jnp.int32).at[pos].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop"
    )
    return idx, count
