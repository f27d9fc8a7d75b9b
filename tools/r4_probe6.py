"""Round-4 probe #6 (real TPU): cumulative build-up of the flat iteration.

r4_probe1's one-at-a-time REMOVALS measured every small op as noise
(+-0.03 ms resolution on a 0.44 ms signal), yet the no-commit floor shows
~20 ns/rollout of distributed glue beyond the individually-measured ops.
This probe measures cumulative ADDITIONS over a bare core, where each
delta lands on a smaller base:

  bare       parent row gather + fused rollout + commit scatters +
             tree_size/frontier bookkeeping (accept = valid, score const)
  +stats     one-hot region-stats einsum + the 8 stat-array updates
  +accept    score/virgin lookups + threefry uniform draw + Bernoulli
  +goal      goal argmin/bookkeeping
  +metrics   the four .at[it] metric updates (== shipped flat body)

Usage: python tools/r4_probe6.py [R]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import init_state, update_region_scores
from cudasbmp_tpu.systems.registry import get_system

LEVELS = ["bare", "stats", "accept", "goal", "metrics"]


def make_iteration(cfg, system, grid, obstacles, goal, level):
    M = cfg.max_tree_size
    R = cfg.rollouts_per_iter
    n2 = cfg.n * cfg.n
    lv = LEVELS.index(level)

    def iteration(s):
        frontier_lo0 = s.frontier_lo
        tree_size0 = s.tree_size
        frontier_size = tree_size0 - frontier_lo0
        n_target = jnp.minimum(
            jnp.minimum(cfg.fanout * frontier_size, M - tree_size0), R)
        it = s.itr
        r2_seen = s.r2_avail

        slot = jnp.arange(R, dtype=jnp.int32)
        slot_active = slot < n_target
        parent_idx = frontier_lo0 + slot % jnp.maximum(frontier_size, 1)
        parent_rows = s.tree_samples[parent_idx]
        parent_cost = s.costs[parent_idx]
        x0 = parent_rows[:, : system.state_dim]

        key_iter = jax.random.fold_in(s.key, s.itr)
        k_ctrl, k_accept = jax.random.split(key_iter)
        seed = jax.random.randint(k_ctrl, (), 0, jnp.iinfo(jnp.int32).max)
        from cudasbmp_tpu.ops.rollout_pallas import sample_and_rollout_pallas

        x1, controls, valid = sample_and_rollout_pallas(
            system, seed, x0, obstacles, num_disc=cfg.num_disc,
            width=cfg.width, height=cfg.height)
        valid = valid & slot_active
        samples1 = jnp.concatenate([x1, controls], axis=-1)

        upd = {}
        if lv >= 1:  # +stats
            r1, r2 = grid.region_indices(x1[:, 0:2])
            in_r1 = r1 >= 0
            in_r2 = r2 >= 0
            loc = jnp.where(in_r2, r2 - r1 * n2, 0)
            oh1 = (jax.nn.one_hot(jnp.maximum(r1, 0), cfg.num_r1,
                                  dtype=jnp.float32)
                   * in_r1[:, None].astype(jnp.float32))
            ohl = (jax.nn.one_hot(loc, n2, dtype=jnp.float32)
                   * in_r2[:, None].astype(jnp.float32))
            act_f = slot_active.astype(jnp.float32)
            val_f = valid.astype(jnp.float32)
            rhs = jnp.concatenate(
                [ohl * act_f[:, None], ohl * val_f[:, None],
                 act_f[:, None], val_f[:, None]], axis=-1)
            dmat = jnp.einsum("rc,rl->cl", oh1, rhs,
                              preferred_element_type=jnp.float32)
            d1 = jnp.stack([dmat[:, 2 * n2], dmat[:, 2 * n2 + 1]],
                           axis=-1).astype(jnp.int32)
            d2 = jnp.stack([dmat[:, :n2].ravel(),
                            dmat[:, n2:2 * n2].ravel()],
                           axis=-1).astype(jnp.int32)
            upd = dict(
                r1_total=s.r1_total + d1[:, 0],
                r1_valid=s.r1_valid + d1[:, 1],
                r1_invalid=s.r1_invalid + (d1[:, 0] - d1[:, 1]),
                r1_avail=s.r1_avail | (d1[:, 1] > 0).astype(jnp.int32),
                r2_total=s.r2_total + d2[:, 0],
                r2_valid=s.r2_valid + d2[:, 1],
                r2_invalid=s.r2_invalid + (d2[:, 0] - d2[:, 1]),
                r2_avail=s.r2_avail | (d2[:, 1] > 0).astype(jnp.int32),
            )

        if lv >= 2:  # +accept (scores + draw)
            r1_score, _ = update_region_scores(cfg, s)
            u = jax.random.uniform(k_accept, (R,))
            score_r = jnp.matmul(oh1, r1_score,
                                 precision=jax.lax.Precision.HIGHEST)
            seen_rows = jnp.matmul(
                oh1, r2_seen.reshape(cfg.num_r1, n2).astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST)
            seen_r = (seen_rows * ohl).sum(axis=-1)
            virgin_r2 = (r2 < 0) | (seen_r == 0)
            accept = valid & ((u <= score_r) | virgin_r2)
        else:
            accept = valid

        accept_i = accept.astype(jnp.int32)
        accept_pos = jnp.cumsum(accept_i) - accept_i
        child_slot = s.tree_size + accept_pos
        within = accept & (child_slot < M)
        n_accepted = jnp.minimum(accept_i.sum(), M - s.tree_size)
        child_cost = parent_cost + controls[:, -1]
        dst = jnp.where(within, child_slot, M)
        tree_samples = s.tree_samples.at[dst].set(samples1, mode="drop")
        tree_parent = s.tree_parent.at[dst].set(parent_idx, mode="drop")
        costs = s.costs.at[dst].set(child_cost, mode="drop")

        if lv >= 3:  # +goal
            d2g = (x1[:, 0] - goal[0]) ** 2 + (x1[:, 1] - goal[1]) ** 2
            in_goal = within & (d2g < cfg.goal_threshold**2)
            goal_costs = jnp.where(in_goal, child_cost, jnp.inf)
            best = jnp.argmin(goal_costs)
            best_cost = goal_costs[best]
            improved = best_cost < s.cost_to_goal
            upd["cost_to_goal"] = jnp.where(improved, best_cost,
                                            s.cost_to_goal)
            upd["goal_node"] = jnp.where(improved, child_slot[best],
                                         s.goal_node)

        if lv >= 4:  # +metrics
            upd["m_frontier_size"] = s.m_frontier_size.at[it].set(
                frontier_size)
            upd["m_tree_size"] = s.m_tree_size.at[it].set(
                s.tree_size + n_accepted)
            upd["m_valid"] = s.m_valid.at[it].add(valid.sum())
            upd["m_accepted"] = s.m_accepted.at[it].add(n_accepted)

        stalled = n_accepted == 0
        return s._replace(
            tree_samples=tree_samples, tree_parent=tree_parent, costs=costs,
            tree_size=s.tree_size + n_accepted,
            frontier_lo=jnp.where(stalled, frontier_lo0, tree_size0),
            itr=it + 1, stalled=stalled,
            u_samples=samples1, u_parent=parent_idx,
            **upd,
        )

    return iteration


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_lo, n_hi = (int(os.environ.get("PROBE_N_LO", 100)),
                  int(os.environ.get("PROBE_N_HI", 200)))
    M = (n_hi + 2) * R
    cfg = KGMTConfig(num_iterations=n_hi, max_tree_size=M,
                     rollouts_per_iter=R, rollout_backend="pallas_rng",
                     adaptive_waves=False)
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
    init = jnp.asarray(sc.init, jnp.float32)
    goal = jnp.full(7, -100.0, jnp.float32)

    prev = None
    for level in LEVELS:
        body = make_iteration(cfg, system, grid, obstacles, goal, level)

        @jax.jit
        def run(key, n, body=body):
            s0 = init_state(cfg, grid, init, key)
            final = jax.lax.while_loop(lambda s: s.itr < n, body, s0)
            return (final.costs.sum() + final.tree_size.astype(jnp.float32)
                    + final.r1_total.sum().astype(jnp.float32))

        float(run(jax.random.key(0), jnp.int32(2)))
        times = {}
        for n in (n_lo, n_hi):
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(run(jax.random.key(1000 * rep + n), jnp.int32(n)))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        slope_ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
        delta = None if prev is None else round(slope_ms - prev, 4)
        prev = slope_ms
        print(json.dumps({"level": level, "R": R,
                          "slope_ms_per_iter": round(slope_ms, 4),
                          "delta_ms": delta,
                          "t_lo_s": round(times[n_lo], 4),
                          "t_hi_s": round(times[n_hi], 4)}), flush=True)


if __name__ == "__main__":
    main()
