"""Round-4 probe #7 (real TPU): per-wave cost decomposition at DEMO-scale
capacity (M=30000) — every earlier slope probe inflated M to ~800k so
waves never clamp, which also inflated the M-dependent costs (carry
copies). Demo device TTS is 55 waves x the DEMO-M per-wave cost, so this
is the number that matters for TTS work.

Trick: commits WRAP (dst = (it*R) mod (M-R)), so the tree never fills and
the loop can run 100-200 iterations at the real capacity; the frontier is
pinned to [0, R) (round-robin over garbage rows is timing-equivalent).
Cumulative build-up:

  empty          s._replace(itr+1) only — pure while-trip cost at demo M
  rng            + fold_in/split/randint/uniform draw
  gather_rollout + parent row gather [R] from [30000, 7] + fused kernel
  commit         + 3 wrap-around commit scatters (+ concat + cumsum)
  phases         + stats einsum + lookups/accept + goal + metrics
                 (~ the shipped wave at demo M)

Usage: python tools/r4_probe7.py [R]
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

LEVELS = ["empty", "rng", "gather_rollout", "commit", "phases"]


def make_body(cfg, system, grid, obstacles, goal, level):
    M = cfg.max_tree_size
    R = cfg.rollouts_per_iter
    n2 = cfg.n * cfg.n
    lv = LEVELS.index(level)

    def body(s):
        it = s.itr
        upd = dict(itr=it + 1)
        if lv >= 1:
            key_iter = jax.random.fold_in(s.key, it)
            k_ctrl, k_accept = jax.random.split(key_iter)
            seed = jax.random.randint(k_ctrl, (), 0,
                                      jnp.iinfo(jnp.int32).max)
            u = jax.random.uniform(k_accept, (R,))
        if lv >= 2:
            parent_idx = jnp.arange(R, dtype=jnp.int32) % jnp.maximum(
                s.tree_size, 1)
            parent_rows = s.tree_samples[parent_idx]
            parent_cost = s.costs[parent_idx]
            x0 = parent_rows[:, : system.state_dim]
            from cudasbmp_tpu.ops.rollout_pallas import (
                sample_and_rollout_pallas,
            )

            x1, controls, valid = sample_and_rollout_pallas(
                system, seed, x0, obstacles, num_disc=cfg.num_disc,
                width=cfg.width, height=cfg.height)
            touch = x1.sum() + valid.sum()
        else:
            touch = jnp.float32(0.0)
        if lv >= 4:
            r1, r2 = grid.region_indices(x1[:, 0:2])
            in_r1 = r1 >= 0
            in_r2 = r2 >= 0
            loc = jnp.where(in_r2, r2 - r1 * n2, 0)
            oh1 = (jax.nn.one_hot(jnp.maximum(r1, 0), cfg.num_r1,
                                  dtype=jnp.float32)
                   * in_r1[:, None].astype(jnp.float32))
            ohl = (jax.nn.one_hot(loc, n2, dtype=jnp.float32)
                   * in_r2[:, None].astype(jnp.float32))
            val_f = valid.astype(jnp.float32)
            rhs = jnp.concatenate(
                [ohl * val_f[:, None], jnp.ones((R, 1)), val_f[:, None]],
                axis=-1)
            dmat = jnp.einsum("rc,rl->cl", oh1, rhs,
                              preferred_element_type=jnp.float32)
            d1 = jnp.stack([dmat[:, n2], dmat[:, n2 + 1]],
                           axis=-1).astype(jnp.int32)
            r1_score, _ = update_region_scores(cfg, s)
            score_r = jnp.matmul(oh1, r1_score,
                                 precision=jax.lax.Precision.HIGHEST)
            seen_rows = jnp.matmul(
                oh1, (s.r2_valid.reshape(cfg.num_r1, n2) > 0
                      ).astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST)
            seen_r = (seen_rows * ohl).sum(axis=-1)
            accept = valid & ((u <= score_r) | (seen_r == 0))
            upd.update(
                r1_total=s.r1_total + d1[:, 0],
                r1_valid=s.r1_valid + d1[:, 1],
                r1_avail=s.r1_avail | (d1[:, 1] > 0).astype(jnp.int32),
            )
        elif lv >= 2:
            accept = valid
        if lv >= 3:
            samples1 = jnp.concatenate([x1, controls], axis=-1)
            accept_i = accept.astype(jnp.int32)
            accept_pos = jnp.cumsum(accept_i) - accept_i
            base = (it * R) % (M - R)
            child_slot = base + accept_pos
            child_cost = parent_cost + controls[:, -1]
            dst = jnp.where(accept, child_slot, M)
            upd.update(
                tree_samples=s.tree_samples.at[dst].set(samples1,
                                                        mode="drop"),
                tree_parent=s.tree_parent.at[dst].set(parent_idx,
                                                      mode="drop"),
                costs=s.costs.at[dst].set(child_cost, mode="drop"),
            )
        if lv >= 4:
            d2g = (x1[:, 0] - goal[0]) ** 2 + (x1[:, 1] - goal[1]) ** 2
            goal_costs = jnp.where(accept & (d2g < cfg.goal_threshold**2),
                                   child_cost, jnp.inf)
            best = jnp.argmin(goal_costs)
            improved = goal_costs[best] < s.cost_to_goal
            upd["cost_to_goal"] = jnp.where(improved, goal_costs[best],
                                            s.cost_to_goal)
            upd["m_valid"] = s.m_valid.at[it].add(valid.sum())
            upd["m_tree_size"] = s.m_tree_size.at[it].set(s.tree_size)
        # keep a data dependence on the wave so nothing dead-code-eliminates
        upd["r1_threshold"] = s.r1_threshold + touch * 0.0
        return s._replace(**upd)

    return body


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_lo, n_hi = (int(os.environ.get("PROBE_N_LO", 100)),
                  int(os.environ.get("PROBE_N_HI", 200)))
    cfg = KGMTConfig(num_iterations=n_hi, rollouts_per_iter=R,
                     rollout_backend="pallas_rng", adaptive_waves=False)
    assert cfg.max_tree_size == 30000  # the point of this probe
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
    init = jnp.asarray(sc.init, jnp.float32)
    goal = jnp.full(7, -100.0, jnp.float32)

    prev = None
    for level in LEVELS:
        body = make_body(cfg, system, grid, obstacles, goal, level)

        @jax.jit
        def run(key, n, body=body):
            s0 = init_state(cfg, grid, init, key)
            final = jax.lax.while_loop(lambda s: s.itr < n, body, s0)
            return (final.costs.sum() + final.r1_threshold
                    + final.cost_to_goal)

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
        print(json.dumps({"level": level, "R": R, "M": cfg.max_tree_size,
                          "slope_ms_per_iter": round(slope_ms, 4),
                          "delta_ms": delta}), flush=True)


if __name__ == "__main__":
    main()
