"""Sharded-tree planning: ONE logical planner spread over the mesh's ``tree``
axis (SURVEY.md §7 'hard part 5', BASELINE.json cross-host frontier reduction).

Design: each shard owns a tree partition of ``max_tree_size`` slots seeded
from the same root but expanding with shard-decorrelated RNG
(fold_in(key, axis_index)). What makes it one logical planner rather than D
independent ones is the guidance loop: the R1/R2 region statistics are
all-reduced (psum over ICI) every iteration before scoring, so all shards
share one global exploration map — a shard that saturates a region suppresses
every other shard's sampling there (the adaptive-guidance semantics of
updateR1, KGMT.cu:487-538, applied globally). Termination is likewise global:
any shard finding the goal, or all shards filling, stops the collective
while_loop via a psum'd done flag carried in the loop state (collectives in
the body, not the cond — the standard pattern).

The result is the best (min-cost) solution across shards; total logical tree
capacity is D * max_tree_size.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import (
    KGMTState,
    extract_path,
    init_state,
    kgmt_iteration,
)
from cudasbmp_tpu.systems.registry import get_system


def kgmt_run_sharded(cfg: KGMTConfig, system, grid: RegionGrid, goal, obstacles,
                     s0: KGMTState, axis_name: str) -> KGMTState:
    """Collective while_loop over the sharded iteration; runs inside
    shard_map. The done flag is computed in the body with psum and carried."""

    def cond(carry):
        s, done = carry
        return (s.itr < cfg.num_iterations) & ~done

    def body(carry):
        s, _ = carry
        s = kgmt_iteration(cfg, system, grid, obstacles, goal, s,
                           axis_name=axis_name)
        n_shards = jax.lax.psum(jnp.ones((), jnp.int32), axis_name)
        solved_any = (
            jax.lax.psum(jnp.isfinite(s.cost_to_goal).astype(jnp.int32),
                         axis_name) > 0
        )
        full_all = (
            jax.lax.psum((s.tree_size >= cfg.max_tree_size).astype(jnp.int32),
                         axis_name) == n_shards
        )
        return s, solved_any | full_all

    s, _done = jax.lax.while_loop(cond, body, (s0, jnp.zeros((), bool)))
    return s


@dataclasses.dataclass
class ShardedTreeResult:
    solved: bool
    cost: float
    best_shard: int
    iterations: int
    total_tree_size: int
    wall_time_s: float
    path: np.ndarray
    path_lengths_by_shard: np.ndarray
    r1_scores_by_shard: np.ndarray  # [n_shards, N*N] — identical rows iff
    # the psum'd global-guidance loop is intact


class ShardedTreePlanner:
    """One logical KGMT planner sharded over the mesh ``tree`` axis."""

    def __init__(self, config: KGMTConfig | None = None, mesh: Mesh | None = None,
                 system=None):
        if mesh is None:
            raise ValueError("ShardedTreePlanner requires a mesh with a "
                             "'tree' axis (parallel.mesh.make_planner_mesh)")
        self.config = config or KGMTConfig()
        self.mesh = mesh
        self.system = system or get_system(self.config.system)
        cfg, sys_ = self.config, self.system
        grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)

        def _shard_body(init, goal, obstacles, key):
            # per-shard decorrelated RNG; same root seeded everywhere
            shard = jax.lax.axis_index("tree")
            s0 = init_state(cfg, grid, init, jax.random.fold_in(key, shard))
            final = kgmt_run_sharded(cfg, sys_, grid, goal, obstacles, s0,
                                     "tree")
            nodes, samples, length = extract_path(cfg, final)
            # leave per-shard results; host reduces (small arrays).
            # r1_score is computed from the psum'd GLOBAL stats, so every
            # shard must hold an identical copy — returned per shard as a
            # testable witness of the collective guidance loop.
            return (final.cost_to_goal[None], final.tree_size[None],
                    final.itr[None], samples[None], length[None],
                    final.r1_score[None])

        self._solve = jax.jit(
            jax.shard_map(
                _shard_body,
                mesh=mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=(P("tree"), P("tree"), P("tree"), P("tree"),
                           P("tree"), P("tree")),
                # the rollout scan carry transitions replicated->varying on
                # the first committed wave; skip the static VMA check
                check_vma=False,
            )
        )

    def plan(self, scenario: Scenario, seed: int | None = None
             ) -> ShardedTreeResult:
        cfg = self.config
        obstacles, _ = scenario.padded_obstacles(cfg.max_obstacles)
        key = jax.random.key(cfg.seed if seed is None else seed)
        t0 = time.perf_counter()
        outs = jax.block_until_ready(
            self._solve(jnp.asarray(scenario.init), jnp.asarray(scenario.goal),
                        jnp.asarray(obstacles), key)
        )
        if not outs[0].is_fully_addressable:
            # multi-host: the per-shard outputs live across processes;
            # replicate them (an all-gather over DCN — small arrays) so every
            # controller can reduce on the host below
            rep = NamedSharding(self.mesh, P())
            outs = jax.jit(lambda *xs: xs,
                           out_shardings=(rep,) * len(outs))(*outs)
        costs, sizes, iters, paths, lengths, scores = outs
        wall = time.perf_counter() - t0
        costs = np.asarray(costs)
        best = int(np.argmin(np.where(np.isfinite(costs), costs, np.inf)))
        solved = bool(np.isfinite(costs[best]))
        lengths = np.asarray(lengths)
        path = np.asarray(paths)[best][: lengths[best]] if solved else \
            np.zeros((0, 7), np.float32)
        return ShardedTreeResult(
            solved=solved,
            cost=float(costs[best]) if solved else float("inf"),
            best_shard=best,
            iterations=int(np.asarray(iters).max()),
            total_tree_size=int(np.asarray(sizes).sum()),
            wall_time_s=wall,
            path=path,
            path_lengths_by_shard=lengths,
            r1_scores_by_shard=np.asarray(scores),
        )
