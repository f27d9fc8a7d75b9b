"""Sharded-tree planning: ONE logical planner spread over the mesh's ``tree``
axis (SURVEY.md §7 'hard part 5', BASELINE.json cross-host frontier reduction).

Design: each shard owns a tree partition of ``max_tree_size`` slots, expanding
with shard-decorrelated RNG (fold_in(key, axis_index)). TWO collectives per
iteration make the shards one logical planner rather than D independent ones
(both in kgmt_iteration, gated on axis_name):

1. **Global guidance**: the R1/R2 region statistics are all-reduced (psum
   over ICI) before scoring, so all shards share one exploration map — a
   shard that saturates a region suppresses every other shard's sampling
   there (the adaptive-guidance semantics of updateR1, KGMT.cu:487-538,
   applied globally).
2. **Frontier exchange**: every shard all_gathers the ``exchange_k``
   goal-nearest nodes of every shard's frontier and reserves
   ``exchange_frac`` of each expansion wave for parents drawn from that
   pool. Children of foreign parents are committed locally with GLOBAL
   parent ids (owning_shard * max_tree_size + slot), so the D shard-local
   trees form one tree whose paths can cross shards — the collective analog
   of the reference's single compacted frontier (KGMT.cu:139-147). A shard
   whose local frontier went sterile (e.g. walled in) keeps expanding
   foreign nodes and stays productive (tested by the forced-sterile-shard
   test in tests/test_parallel.py).

Termination is likewise global: any shard finding the goal, or all shards
filling, stops the collective while_loop via a psum'd done flag carried in
the loop state (collectives in the body, not the cond — the standard
pattern).

The result is the best (min-cost) solution across shards, its path stitched
across shard boundaries on the host by walking global parent ids; total
logical tree capacity is D * max_tree_size.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cudasbmp_tpu.config import KGMTConfig, SAMPLE_DIM, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import (
    KGMTState,
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


def stitch_path(parents_by_shard: np.ndarray, samples_by_shard: np.ndarray,
                goal_gid: int, max_tree_size: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Walk GLOBAL parent ids from the goal node to the root, hopping shards
    as the chain crosses them (the sharded analog of extract_path's local
    walk). Returns (path [L, SAMPLE_DIM] root->goal, shard_of_node [L])."""
    rows, shards = [], []
    g = int(goal_gid)
    guard = parents_by_shard.size + 1
    while g >= 0 and guard > 0:
        d, i = divmod(g, max_tree_size)
        rows.append(samples_by_shard[d, i])
        shards.append(d)
        g = int(parents_by_shard[d, i])
        guard -= 1
    assert guard > 0, "parent-id cycle: corrupt stitched tree"
    return (np.asarray(rows[::-1], np.float32),
            np.asarray(shards[::-1], np.int32))


@dataclasses.dataclass
class ShardedTreeResult:
    solved: bool
    cost: float
    best_shard: int  # shard owning the goal node
    iterations: int
    total_tree_size: int
    wall_time_s: float
    path: np.ndarray  # [L, SAMPLE_DIM] root -> goal, stitched across shards
    path_shards: np.ndarray  # [L] shard owning each path node
    tree_sizes_by_shard: np.ndarray  # [n_shards]
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
        self.n_shards = mesh.shape["tree"]
        self.system = system or get_system(self.config.system)
        cfg, sys_ = self.config, self.system
        grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)

        def _shard_body(inits, goal, obstacles, key):
            # per-shard root (inits rows, usually all the same sample) and
            # decorrelated RNG
            shard = jax.lax.axis_index("tree")
            s0 = init_state(cfg, grid, inits[shard],
                            jax.random.fold_in(key, shard))
            final = kgmt_run_sharded(cfg, sys_, grid, goal, obstacles, s0,
                                     "tree")
            # Per-shard results; the host reduces. Full tree arrays are
            # returned for cross-shard path stitching (goal_node/parents are
            # GLOBAL ids). r1_score is computed from the psum'd GLOBAL
            # stats, so every shard must hold an identical copy — returned
            # per shard as a testable witness of the collective guidance
            # loop.
            return (final.cost_to_goal[None], final.tree_size[None],
                    final.itr[None], final.goal_node[None],
                    final.tree_samples[None], final.tree_parent[None],
                    final.r1_score[None])

        self._solve = jax.jit(
            jax.shard_map(
                _shard_body,
                mesh=mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=(P("tree"),) * 7,
                # the rollout scan carry transitions replicated->varying on
                # the first committed wave; skip the static VMA check
                check_vma=False,
            )
        )

    def plan(self, scenario: Scenario, seed: int | None = None,
             inits: np.ndarray | None = None) -> ShardedTreeResult:
        """Solve ``scenario``. ``inits`` optionally seeds each shard's root
        with its own sample ([n_shards, SAMPLE_DIM]; default: every shard
        seeds the scenario's init)."""
        cfg = self.config
        obstacles, _ = scenario.padded_obstacles(cfg.max_obstacles)
        if inits is None:
            inits = np.tile(scenario.init, (self.n_shards, 1))
        inits = np.asarray(inits, np.float32)
        if inits.shape != (self.n_shards, SAMPLE_DIM):
            raise ValueError(f"inits must be [{self.n_shards}, {SAMPLE_DIM}]")
        key = jax.random.key(cfg.seed if seed is None else seed)
        t0 = time.perf_counter()
        outs = jax.block_until_ready(
            self._solve(jnp.asarray(inits), jnp.asarray(scenario.goal),
                        jnp.asarray(obstacles), key)
        )
        if not outs[0].is_fully_addressable:
            # multi-host: the per-shard outputs live across processes;
            # replicate them (an all-gather over DCN — the tree arrays are
            # a few MB) so every controller can stitch on the host below
            rep = NamedSharding(self.mesh, P())
            outs = jax.jit(lambda *xs: xs,
                           out_shardings=(rep,) * len(outs))(*outs)
        (costs, sizes, iters, goal_nodes, trees, parents, scores) = (
            np.asarray(o) for o in outs)
        wall = time.perf_counter() - t0
        best = int(np.argmin(np.where(np.isfinite(costs), costs, np.inf)))
        solved = bool(np.isfinite(costs[best]))
        if solved:
            path, path_shards = stitch_path(
                parents, trees, int(goal_nodes[best]), cfg.max_tree_size
            )
            best_shard = int(goal_nodes[best]) // cfg.max_tree_size
        else:
            path = np.zeros((0, SAMPLE_DIM), np.float32)
            path_shards = np.zeros(0, np.int32)
            best_shard = best
        return ShardedTreeResult(
            solved=solved,
            cost=float(costs[best]) if solved else float("inf"),
            best_shard=best_shard,
            iterations=int(iters.max()),
            total_tree_size=int(sizes.sum()),
            wall_time_s=wall,
            path=path,
            path_shards=path_shards,
            tree_sizes_by_shard=sizes,
            r1_scores_by_shard=scores,
        )
