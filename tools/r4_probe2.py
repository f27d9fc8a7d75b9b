"""Round-4 probe #2 (real TPU): combined fixes for the two dominant
single-tree glue costs found by r4_probe1 —

  commit scatters   0.435 -> 0.175 ms/iter when removed (no_commit)
  inner while_loop  0.435 -> 0.292 ms/iter when removed (direct_wave)

Both look like full-tree carry copies (tree pytree ~30 MB at the probe's
M = 827k; a copy at HBM bandwidth is ~0.15 ms), not the op costs themselves
(r3_probe4 measured the same scatters at 0.06 ms standalone). Variants:

  direct_scatter        direct wave call + the 3 commit scatters (baseline
                        = r4_probe1's direct_wave, re-measured this session)
  direct_nocommit       direct wave, no commit at all (lower bound)
  direct_window         direct wave + WINDOW commit: accepted rows compacted
                        into an R-row staging block by a small [R]->[R]
                        scatter, then ONE dynamic_update_slice per tree
                        array at offset tree_size. Writes garbage rows
                        beyond n_accepted that the next wave's DUS
                        overwrites; consumers already respect tree_size.
  nested_window         window commit inside the original inner while_loop
                        (isolates the loop-entry cost with the cheap commit)

Same slope discipline as r4_probe1. Usage: python tools/r4_probe2.py [R]
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
import numpy as np

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import init_state, update_region_scores
from cudasbmp_tpu.systems.registry import get_system


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_iteration(cfg, system, grid, obstacles, goal, variant):
    M = cfg.max_tree_size
    R = cfg.rollouts_per_iter
    n2 = cfg.n * cfg.n

    def sub_wave(carry):
        w, s_in, r2_seen = carry
        frontier_lo0 = s_in.frontier_lo
        frontier_size = s_in.tree_size - frontier_lo0
        n_target = jnp.minimum(
            jnp.minimum(cfg.fanout * frontier_size, M - s_in.tree_size), R)
        it = s_in.itr

        slot = jnp.arange(R, dtype=jnp.int32)
        gslot = w * R + slot
        slot_active = gslot < n_target
        parent_idx = frontier_lo0 + gslot % jnp.maximum(frontier_size, 1)
        parent_rows = s_in.tree_samples[parent_idx]
        parent_cost = s_in.costs[parent_idx]
        parent_gid = parent_idx
        x0 = parent_rows[:, : system.state_dim]

        key_iter = jax.random.fold_in(s_in.key, s_in.itr)
        k_ctrl, k_accept = jax.random.split(key_iter)
        seed = jax.random.randint(k_ctrl, (), 0, jnp.iinfo(jnp.int32).max)
        from cudasbmp_tpu.ops.rollout_pallas import sample_and_rollout_pallas

        x1, controls, valid = sample_and_rollout_pallas(
            system, seed, x0, obstacles, num_disc=cfg.num_disc,
            width=cfg.width, height=cfg.height)
        valid = valid & slot_active
        samples1 = jnp.concatenate([x1, controls], axis=-1)

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
        d2 = jnp.stack([dmat[:, :n2].ravel(), dmat[:, n2:2 * n2].ravel()],
                       axis=-1).astype(jnp.int32)

        r1_score, _ = update_region_scores(cfg, s_in)
        u = jax.random.uniform(k_accept, (R,))
        score_r = jnp.matmul(oh1, r1_score,
                             precision=jax.lax.Precision.HIGHEST)
        seen_rows = jnp.matmul(
            oh1, r2_seen.reshape(cfg.num_r1, n2).astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST)
        seen_r = (seen_rows * ohl).sum(axis=-1)
        virgin_r2 = (r2 < 0) | (seen_r == 0)
        accept = valid & ((u <= score_r) | virgin_r2)
        r2_seen = r2_seen | (d2[:, 1] > 0).astype(jnp.int32)

        accept_i = accept.astype(jnp.int32)
        accept_pos = jnp.cumsum(accept_i) - accept_i
        child_slot = s_in.tree_size + accept_pos
        within = accept & (child_slot < M)
        n_accepted = jnp.minimum(accept_i.sum(), M - s_in.tree_size)
        child_cost = parent_cost + controls[:, -1]

        if variant == "direct_nocommit":
            tree_samples = s_in.tree_samples
            tree_parent = s_in.tree_parent
            costs = s_in.costs
        elif variant in ("direct_window", "nested_window"):
            # compact accepted rows to the front of an R-row staging block
            # (small scatter), then one DUS per tree array at tree_size.
            # Beyond-n_accepted rows carry garbage the next wave overwrites;
            # the capacity clamp trims the block so DUS never writes past M.
            blk = jnp.minimum(jnp.int32(R), M - s_in.tree_size)
            sdst = jnp.where(within, accept_pos, R)
            stage_s = jnp.zeros((R, samples1.shape[1]),
                                jnp.float32).at[sdst].set(samples1,
                                                          mode="drop")
            stage_p = jnp.full((R,), -1, jnp.int32).at[sdst].set(
                parent_gid, mode="drop")
            stage_c = jnp.zeros((R,), jnp.float32).at[sdst].set(
                child_cost, mode="drop")
            # blend with existing rows so the DUS block is EXACT everywhere:
            # rows before tree_size (when the block is shifted back at the
            # capacity boundary) and rows past the clamp keep old values
            base = jnp.minimum(s_in.tree_size, M - R)
            old_s = jax.lax.dynamic_slice(s_in.tree_samples, (base, 0),
                                          (R, samples1.shape[1]))
            old_p = jax.lax.dynamic_slice(s_in.tree_parent, (base,), (R,))
            old_c = jax.lax.dynamic_slice(s_in.costs, (base,), (R,))
            off = s_in.tree_size - base  # 0 unless near capacity
            idx = jnp.arange(R) - off
            keep = (idx < 0) | (idx >= blk)
            take = jnp.clip(idx, 0, R - 1)
            put_s = jnp.where(keep[:, None], old_s, stage_s[take])
            put_p = jnp.where(keep, old_p, stage_p[take])
            put_c = jnp.where(keep, old_c, stage_c[take])
            tree_samples = jax.lax.dynamic_update_slice(
                s_in.tree_samples, put_s, (base, 0))
            tree_parent = jax.lax.dynamic_update_slice(
                s_in.tree_parent, put_p, (base,))
            costs = jax.lax.dynamic_update_slice(s_in.costs, put_c, (base,))
        else:  # direct_scatter
            dst = jnp.where(within, child_slot, M)
            tree_samples = s_in.tree_samples.at[dst].set(samples1,
                                                         mode="drop")
            tree_parent = s_in.tree_parent.at[dst].set(parent_gid,
                                                       mode="drop")
            costs = s_in.costs.at[dst].set(child_cost, mode="drop")

        d2g = (x1[:, 0] - goal[0]) ** 2 + (x1[:, 1] - goal[1]) ** 2
        in_goal = within & (d2g < cfg.goal_threshold**2)
        goal_costs = jnp.where(in_goal, child_cost, jnp.inf)
        best = jnp.argmin(goal_costs)
        best_cost = goal_costs[best]
        improved = best_cost < s_in.cost_to_goal
        cost_to_goal = jnp.where(improved, best_cost, s_in.cost_to_goal)
        goal_node = jnp.where(improved, child_slot[best], s_in.goal_node)

        s_out = s_in._replace(
            tree_samples=tree_samples, tree_parent=tree_parent, costs=costs,
            tree_size=s_in.tree_size + n_accepted,
            r1_total=s_in.r1_total + d1[:, 0],
            r1_valid=s_in.r1_valid + d1[:, 1],
            r1_invalid=s_in.r1_invalid + (d1[:, 0] - d1[:, 1]),
            r1_avail=s_in.r1_avail | (d1[:, 1] > 0).astype(jnp.int32),
            r2_total=s_in.r2_total + d2[:, 0],
            r2_valid=s_in.r2_valid + d2[:, 1],
            r2_invalid=s_in.r2_invalid + (d2[:, 0] - d2[:, 1]),
            r2_avail=s_in.r2_avail | (d2[:, 1] > 0).astype(jnp.int32),
            u_samples=samples1, u_parent=parent_gid,
            cost_to_goal=cost_to_goal, goal_node=goal_node,
            m_valid=s_in.m_valid.at[it].add(valid.sum()),
            m_accepted=s_in.m_accepted.at[it].add(n_accepted),
        )
        return w + 1, s_out, r2_seen

    def iteration(s):
        frontier_lo0 = s.frontier_lo
        tree_size0 = s.tree_size
        frontier_size = tree_size0 - frontier_lo0
        it = s.itr
        wave_init = (jnp.zeros((), jnp.int32), s, s.r2_avail)
        if variant == "nested_window":
            n_target = jnp.minimum(
                jnp.minimum(cfg.fanout * frontier_size, M - tree_size0), R)
            n_waves = jnp.minimum(n_target, 1)
            _, s, _ = jax.lax.while_loop(
                lambda c: c[0] < n_waves, sub_wave, wave_init)
        else:
            _, s, _ = sub_wave(wave_init)
        stalled = s.tree_size == tree_size0
        new_frontier_lo = jnp.where(stalled, frontier_lo0, tree_size0)
        r1_score, r1_threshold = update_region_scores(cfg, s)
        return s._replace(
            frontier_lo=new_frontier_lo, r1_score=r1_score,
            r1_threshold=r1_threshold, itr=it + 1, stalled=stalled,
            m_frontier_size=s.m_frontier_size.at[it].set(frontier_size),
            m_tree_size=s.m_tree_size.at[it].set(s.tree_size),
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

    for variant in ("direct_scatter", "direct_nocommit", "direct_window",
                    "nested_window"):
        body = make_iteration(cfg, system, grid, obstacles, goal, variant)

        @jax.jit
        def run(key, n):
            s0 = init_state(cfg, grid, init, key)
            final = jax.lax.while_loop(lambda s: s.itr < n, body, s0)
            return (final.r1_total.sum().astype(jnp.float32)
                    + final.costs.sum()
                    + final.tree_size.astype(jnp.float32))

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
        emit(variant=variant, R=R, slope_ms_per_iter=round(slope_ms, 4),
             t_lo_s=round(times[n_lo], 4), t_hi_s=round(times[n_hi], 4))


if __name__ == "__main__":
    main()
