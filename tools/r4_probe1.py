"""Round-4 probe #1 (run on the real TPU chip): single-tree KGMT iteration
glue ablation.

perf.md r3 leaves ~0.35 ms/iter of the 0.464 ms single-tree iteration
unattributed: expansion_wave is 0.021 ms, stats+lookup contractions ~0.015,
commit ~0.06 — the rest is "plumbing" (acceptance draw, RNG, goal argmin,
four .at[it] metric updates, inner while_loop entry). This probe ablates a
frozen copy of planners/kgmt.py:kgmt_iteration (non-adaptive single wave,
unsharded, goal_bias=0 — the shapes of the r3 slope measurement) piece by
piece, with the same slope discipline as tools/r3_probe3.py: one jitted
while_loop with a TRACED iteration bound (one compile per variant), goals
unreachable so termination never trips, capacity sized so waves never clamp.

Variants:
  library         the shipped kgmt_iteration (adaptive_waves=False config)
  full            this probe's frozen copy (sanity: must match library)
  no_metrics      the four .at[it] metric updates skipped
  packed_metrics  candidate: in-wave scalar accumulators + ONE [4]-row
                  dynamic_update_slice into a [T, 4] metrics array at tail
  no_rng          fold_in/split/uniform replaced by constants (threefry cost)
  no_accept_draw  uniform draw replaced by a constant (draw cost only)
  no_lookups      score/virgin lookups replaced by constants (stats kept)
  no_stats        stats einsum skipped (lookup one-hots kept)
  no_goal         goal argmin/bookkeeping block skipped
  no_commit       the 3 commit scatters skipped
  no_scores       update_region_scores replaced by a constant table
  direct_wave     inner while_loop removed — sub_wave called exactly once
  no_rollout      fused kernel replaced by shape-preserving elementwise fake

Usage: python tools/r4_probe1.py [R]   (default 4096)
Env: PROBE_N_LO/PROBE_N_HI (default 100/200), PROBE_BACKEND (pallas_rng)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import (
    KGMTState,
    init_state,
    update_region_scores,
)
from cudasbmp_tpu.systems.registry import get_system


def emit(**kw):
    print(json.dumps(kw), flush=True)


def iteration(cfg, system, grid, obstacles, goal, variant, s, packed_m=None):
    """Frozen copy of kgmt_iteration (adaptive_waves=False, unsharded,
    goal_bias=0) with ablation toggles. Keep in sync by eye with
    planners/kgmt.py — this is a probe, not a library."""
    M = cfg.max_tree_size
    R = cfg.rollouts_per_iter
    n2 = cfg.n * cfg.n

    if variant == "no_scores":
        r1_score = jnp.full(cfg.num_r1, 0.5, jnp.float32)
        r1_threshold = jnp.float32(0.0)
    else:
        r1_score, r1_threshold = update_region_scores(cfg, s)

    frontier_lo0 = s.frontier_lo
    tree_size0 = s.tree_size
    frontier_size = tree_size0 - frontier_lo0
    n_target = jnp.minimum(
        jnp.minimum(cfg.fanout * frontier_size, M - tree_size0), R)
    n_waves = jnp.minimum(n_target, 1)
    it = s.itr

    def sub_wave(carry):
        w, s_in, r2_seen, mv, ma = carry

        # --- expansion_wave (inlined: non-adaptive, no pool, no bias) ----
        slot = jnp.arange(R, dtype=jnp.int32)
        gslot = w * R + slot
        slot_active = gslot < n_target
        parent_idx = frontier_lo0 + gslot % jnp.maximum(frontier_size, 1)
        parent_rows = s_in.tree_samples[parent_idx]
        parent_cost = s_in.costs[parent_idx]
        parent_gid = parent_idx
        x0 = parent_rows[:, : system.state_dim]

        if variant == "no_rng":
            k_accept = jax.random.key(7)
            seed = jnp.int32(1234)
        else:
            key_iter = jax.random.fold_in(s_in.key, s_in.itr)
            key_wave = jax.lax.cond(
                jnp.asarray(w) == 0, lambda: key_iter,
                lambda: jax.random.fold_in(key_iter, w))
            k_ctrl, k_accept = jax.random.split(key_wave)
            seed = jax.random.randint(k_ctrl, (), 0,
                                      jnp.iinfo(jnp.int32).max)
        if variant == "no_rollout":
            x1 = x0 * 1.000001 + 0.001
            controls = jnp.full((R, system.control_spec.dim), 0.1,
                                jnp.float32)
            valid = x1[:, 0] > -1.0
        else:
            from cudasbmp_tpu.ops.rollout_pallas import (
                sample_and_rollout_pallas,
            )

            x1, controls, valid = sample_and_rollout_pallas(
                system, seed, x0, obstacles, num_disc=cfg.num_disc,
                width=cfg.width, height=cfg.height)
        valid = valid & slot_active
        samples1 = jnp.concatenate([x1, controls], axis=-1)

        # --- region stats one-hot contraction ----------------------------
        r1, r2 = grid.region_indices(x1[:, 0:2])
        in_r1 = r1 >= 0
        in_r2 = r2 >= 0
        loc = jnp.where(in_r2, r2 - r1 * n2, 0)
        oh1 = (jax.nn.one_hot(jnp.maximum(r1, 0), cfg.num_r1,
                              dtype=jnp.float32)
               * in_r1[:, None].astype(jnp.float32))
        ohl = (jax.nn.one_hot(loc, n2, dtype=jnp.float32)
               * in_r2[:, None].astype(jnp.float32))
        if variant == "no_stats":
            d1 = jnp.zeros((cfg.num_r1, 2), jnp.int32)
            d2 = jnp.zeros((cfg.num_r2, 2), jnp.int32)
        else:
            act_f = slot_active.astype(jnp.float32)
            val_f = valid.astype(jnp.float32)
            rhs = jnp.concatenate(
                [ohl * act_f[:, None], ohl * val_f[:, None],
                 act_f[:, None], val_f[:, None]], axis=-1)
            dmat = jnp.einsum("rc,rl->cl", oh1, rhs,
                              preferred_element_type=jnp.float32)
            d1 = jnp.stack(
                [dmat[:, 2 * n2], dmat[:, 2 * n2 + 1]], axis=-1
            ).astype(jnp.int32)
            d2 = jnp.stack(
                [dmat[:, :n2].ravel(), dmat[:, n2:2 * n2].ravel()], axis=-1
            ).astype(jnp.int32)

        # --- acceptance ---------------------------------------------------
        if variant == "no_accept_draw":
            u = jnp.full((R,), 0.5, jnp.float32)
        elif variant == "no_rng":
            u = jnp.full((R,), 0.5, jnp.float32)
        else:
            u = jax.random.uniform(k_accept, (R,))
        if variant == "no_lookups":
            score_r = jnp.ones((R,), jnp.float32)
            virgin_r2 = jnp.ones((R,), bool)
        else:
            score_r = jnp.matmul(oh1, r1_score,
                                 precision=jax.lax.Precision.HIGHEST)
            seen_rows = jnp.matmul(
                oh1, r2_seen.reshape(cfg.num_r1, n2).astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST)
            seen_r = (seen_rows * ohl).sum(axis=-1)
            virgin_r2 = (r2 < 0) | (seen_r == 0)
        accept = valid & ((u <= score_r) | virgin_r2)
        r2_seen = r2_seen | (d2[:, 1] > 0).astype(jnp.int32)

        # --- commit -------------------------------------------------------
        accept_i = accept.astype(jnp.int32)
        accept_pos = jnp.cumsum(accept_i) - accept_i
        child_slot = s_in.tree_size + accept_pos
        within = accept & (child_slot < M)
        n_accepted = jnp.minimum(accept_i.sum(), M - s_in.tree_size)
        child_cost = parent_cost + controls[:, -1]
        if variant == "no_commit":
            tree_samples = s_in.tree_samples
            tree_parent = s_in.tree_parent
            costs = s_in.costs
        else:
            dst = jnp.where(within, child_slot, M)
            tree_samples = s_in.tree_samples.at[dst].set(samples1,
                                                         mode="drop")
            tree_parent = s_in.tree_parent.at[dst].set(parent_gid,
                                                       mode="drop")
            costs = s_in.costs.at[dst].set(child_cost, mode="drop")

        # --- goal ---------------------------------------------------------
        if variant == "no_goal":
            cost_to_goal = s_in.cost_to_goal
            goal_node = s_in.goal_node
        else:
            d2g = (x1[:, 0] - goal[0]) ** 2 + (x1[:, 1] - goal[1]) ** 2
            in_goal = within & (d2g < cfg.goal_threshold**2)
            goal_costs = jnp.where(in_goal, child_cost, jnp.inf)
            best = jnp.argmin(goal_costs)
            best_cost = goal_costs[best]
            improved = best_cost < s_in.cost_to_goal
            cost_to_goal = jnp.where(improved, best_cost, s_in.cost_to_goal)
            goal_node = jnp.where(improved, child_slot[best], s_in.goal_node)

        if variant in ("no_metrics", "packed_metrics"):
            m_valid, m_accepted = s_in.m_valid, s_in.m_accepted
            mv = mv + valid.sum(dtype=jnp.int32)
            ma = ma + n_accepted
        else:
            m_valid = s_in.m_valid.at[it].add(valid.sum())
            m_accepted = s_in.m_accepted.at[it].add(n_accepted)

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
            m_valid=m_valid, m_accepted=m_accepted,
        )
        return w + 1, s_out, r2_seen, mv, ma

    wave_init = (jnp.zeros((), jnp.int32), s, s.r2_avail,
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    if variant == "direct_wave":
        _, s, _, mv, ma = sub_wave(wave_init)
    else:
        _, s, _, mv, ma = jax.lax.while_loop(
            lambda c: c[0] < n_waves, sub_wave, wave_init)

    stalled = s.tree_size == tree_size0
    new_frontier_lo = jnp.where(stalled, frontier_lo0, tree_size0)

    if variant == "no_metrics":
        m_frontier_size, m_tree_size = s.m_frontier_size, s.m_tree_size
        out_packed = packed_m
    elif variant == "packed_metrics":
        m_frontier_size, m_tree_size = s.m_frontier_size, s.m_tree_size
        row = jnp.stack([frontier_size, mv, ma, s.tree_size])[None, :]
        out_packed = jax.lax.dynamic_update_slice(packed_m, row, (it, 0))
    else:
        m_frontier_size = s.m_frontier_size.at[it].set(frontier_size)
        m_tree_size = s.m_tree_size.at[it].set(s.tree_size)
        out_packed = packed_m

    out = s._replace(
        frontier_lo=new_frontier_lo, r1_score=r1_score,
        r1_threshold=r1_threshold, itr=it + 1, stalled=stalled,
        m_frontier_size=m_frontier_size, m_tree_size=m_tree_size,
    )
    return out, out_packed


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    backend = os.environ.get("PROBE_BACKEND", "pallas_rng")
    n_lo, n_hi = (int(os.environ.get("PROBE_N_LO", 100)),
                  int(os.environ.get("PROBE_N_HI", 200)))
    M = (n_hi + 2) * R
    cfg = KGMTConfig(num_iterations=n_hi, max_tree_size=M,
                     rollouts_per_iter=R, rollout_backend=backend,
                     adaptive_waves=False)
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)
    obstacles = jnp.asarray(obstacles)
    init = jnp.asarray(sc.init, jnp.float32)
    goal = jnp.full(7, -100.0, jnp.float32)  # unreachable: never terminates

    variants = ["library", "full", "no_metrics", "packed_metrics", "no_rng",
                "no_accept_draw", "no_lookups", "no_stats", "no_goal",
                "no_commit", "no_scores", "direct_wave", "no_rollout"]

    for variant in variants:
        if variant == "library":
            from cudasbmp_tpu.planners.kgmt import kgmt_iteration

            lib_body = partial(kgmt_iteration, cfg, system, grid, obstacles,
                               goal)

            def body(c):
                return lib_body(c[0]), c[1]
        else:
            vbody = partial(iteration, cfg, system, grid, obstacles, goal,
                            variant)

            def body(c):
                return vbody(c[0], packed_m=c[1])

        @jax.jit
        def run(key, n):
            s0 = init_state(cfg, grid, init, key)
            pm0 = jnp.zeros((max(cfg.num_iterations, 1), 4), jnp.int32)
            final, pm = jax.lax.while_loop(
                lambda c: c[0].itr < n, lambda c: body(c), (s0, pm0))
            return (final.r1_total.sum().astype(jnp.float32)
                    + final.costs.sum() + final.tree_size.astype(jnp.float32)
                    + pm.sum().astype(jnp.float32))

        float(run(jax.random.key(0), jnp.int32(2)))  # compile + warm
        times = {}
        for n in (n_lo, n_hi):
            best = float("inf")
            for rep in range(3):
                key = jax.random.key(1000 * rep + n)
                t0 = time.perf_counter()
                float(run(key, jnp.int32(n)))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        slope_ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
        emit(variant=variant, R=R, slope_ms_per_iter=round(slope_ms, 4),
             t_lo_s=round(times[n_lo], 4), t_hi_s=round(times[n_hi], 4))


if __name__ == "__main__":
    main()
