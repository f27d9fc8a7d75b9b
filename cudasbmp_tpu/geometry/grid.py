"""Two-level workspace decomposition (R1 coarse cells / R2 subcells).

Re-implements the semantics of the reference's inline ``getR1`` / ``getR2``
(KGMT.cu:602-629) as vectorized index math:

- R1: N x N grid of cells of edge ``r1_size = width / N`` (KGMT.cu:13); cell
  index ``cellY * N + cellX``; out-of-grid -> -1.
- R2: each R1 cell splits into n x n subcells of edge ``r2_size = width/(n*N)``
  (KGMT.cu:14); flattened index ``r1 * n*n + localY * n + localX``; -1 if the
  R1 index is -1 or the local subcell falls outside [0, n).

Casts truncate toward zero, matching C ``static_cast<int>`` (so x in
(-cell, 0) lands in cell 0 exactly as the reference does). Both axes use the
width-derived cell size, also as the reference does (height is never used for
cell geometry — KGMT.cu:13-14).

Also provides a *working* ``OccupancyGrid``: the reference ships one
(occupancyMaps/OccupancyGrid.cu) that is dead code with host/device bugs
(SURVEY.md §2.4.9); this is the functional equivalent of its evident intent.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RegionGrid:
    """Static geometry of the two-level grid."""

    width: float
    height: float
    N: int  # R1 cells per axis
    n: int  # R2 subcells per axis within one R1 cell

    @property
    def r1_size(self) -> float:
        return self.width / self.N

    @property
    def r2_size(self) -> float:
        return self.width / (self.n * self.N)

    @property
    def num_r1(self) -> int:
        return self.N * self.N

    @property
    def num_r2(self) -> int:
        return self.N * self.N * self.n * self.n

    def r1_index(self, x: Array, y: Array) -> Array:
        """Coarse cell index of (x, y); -1 outside the grid (KGMT.cu:602-609)."""
        cell_x = (x / self.r1_size).astype(jnp.int32)  # truncates toward zero
        cell_y = (y / self.r1_size).astype(jnp.int32)
        inside = (cell_x >= 0) & (cell_x < self.N) & (cell_y >= 0) & (cell_y < self.N)
        return jnp.where(inside, cell_y * self.N + cell_x, -1)

    def r2_index(self, x: Array, y: Array, r1: Array) -> Array:
        """Flattened subcell index; -1 if r1 == -1 or subcell out of range
        (KGMT.cu:610-629)."""
        cell_y_r1 = r1 // self.N
        cell_x_r1 = r1 % self.N
        local_x = x - cell_x_r1.astype(jnp.float32) * self.r1_size
        local_y = y - cell_y_r1.astype(jnp.float32) * self.r1_size
        cell_x = (local_x / self.r2_size).astype(jnp.int32)
        cell_y = (local_y / self.r2_size).astype(jnp.int32)
        inside = (cell_x >= 0) & (cell_x < self.n) & (cell_y >= 0) & (cell_y < self.n)
        r2 = r1 * (self.n * self.n) + cell_y * self.n + cell_x
        return jnp.where((r1 >= 0) & inside, r2, -1)

    def region_indices(self, xy: Array) -> tuple[Array, Array]:
        """(r1, r2) for positions xy [..., 2]."""
        x, y = xy[..., 0], xy[..., 1]
        r1 = self.r1_index(x, y)
        r2 = self.r2_index(x, y, r1)
        return r1, r2


@dataclasses.dataclass
class OccupancyGrid:
    """Functional occupancy counter over the R1 grid.

    Equivalent in intent to the reference's unused OccupancyGrid class
    (include/occupancyMaps/OccupancyGrid.cuh:7-25): track how many samples
    landed in each cell and answer occupancy queries — but implemented as a
    pure-array API that actually works under jit.
    """

    grid: RegionGrid
    counts: Array  # [num_r1] int32

    @classmethod
    def create(cls, grid: RegionGrid) -> "OccupancyGrid":
        return cls(grid=grid, counts=jnp.zeros(grid.num_r1, jnp.int32))

    def add_points(self, xy: Array) -> "OccupancyGrid":
        """Count points into cells (out-of-grid points are dropped)."""
        r1, _ = self.grid.region_indices(xy.reshape(-1, 2))
        valid = r1 >= 0
        counts = self.counts.at[jnp.where(valid, r1, 0)].add(
            valid.astype(jnp.int32), mode="drop"
        )
        return OccupancyGrid(grid=self.grid, counts=counts)

    def occupancy(self, x: Array, y: Array) -> Array:
        """Count in the cell containing (x, y); 0 outside the grid."""
        r1 = self.grid.r1_index(x, y)
        safe = jnp.where(r1 >= 0, r1, 0)
        return jnp.where(r1 >= 0, self.counts[safe], 0)
