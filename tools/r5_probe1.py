"""r5 probe 1: where does the pathless wave's ~137 us go?

The demo solve is 53 waves x ~0.137 ms (tools output, r5). Each wave's 4096
rollouts would cost ~3 us at the standalone kernel's streaming rate, so the
wave is overhead-dominated. This probe measures the per-wave slope of the
pathless wave body with components knocked out one at a time, inside ONE
while_loop of W trips (W=64 vs 256 so fixed dispatch cost cancels):

  full        — the real body (rollout + stats/accept + commit + goal)
  no_rollout  — x1 := x0 columns (kernel removed)
  no_stats    — d1/d2 zeros, accept := valid (one-hot einsums removed)
  no_commit   — next-frontier scatter removed (children ignored)
  no_prng     — control sampling keys reused (fold_in/split removed)
  empty       — carry churn only

Run on the real TPU chip: python tools/r5_probe1.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from cudasbmp_tpu.config import KGMTConfig, SAMPLE_DIM, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import (
    _expand_rollout,
    _region_stats_and_accept,
    init_pathless_state,
    update_region_scores,
)
from cudasbmp_tpu.systems.registry import get_system

REPO = Path(__file__).resolve().parents[1]


def make_runner(cfg, system, grid, obstacles, goal, W: int, knock: str):
    M = cfg.max_tree_size
    R = cfg.rollouts_per_iter

    def body(c):
        s, w, r2_seen = c
        r1_score, r1_thr = update_region_scores(cfg, s)
        slot = jnp.arange(R, dtype=jnp.int32)
        slot_active = slot < jnp.minimum(cfg.fanout * s.n_frontier, R)
        parent_idx = slot % jnp.maximum(s.n_frontier, 1)
        parent_rows = s.f_rows[parent_idx]
        parent_cost = parent_rows[:, SAMPLE_DIM]
        x0 = parent_rows[:, : system.state_dim]
        if knock == "no_prng":
            k_ctrl = k_accept = s.key
        else:
            key_iter = jax.random.fold_in(s.key, w)
            k_ctrl, k_accept = jax.random.split(key_iter)
        if knock in ("no_rollout", "empty"):
            x1 = parent_rows[:, : system.state_dim] + 0.01
            controls = parent_rows[:, system.state_dim:SAMPLE_DIM]
            valid = slot_active
        else:
            x1, controls, valid = _expand_rollout(cfg, system, k_ctrl, x0,
                                                  obstacles)
            valid = valid & slot_active
        samples1 = jnp.concatenate([x1, controls], axis=-1)
        if knock in ("no_stats", "empty"):
            accept = valid
            d1 = jnp.zeros((cfg.num_r1, 2), jnp.int32)
            d2 = jnp.zeros((cfg.num_r2, 2), jnp.int32)
        else:
            d1, d2, accept, r2_seen = _region_stats_and_accept(
                cfg, grid, x1, slot_active, valid, r1_score, r2_seen,
                k_accept)
        accept_i = accept.astype(jnp.int32)
        accept_pos = jnp.cumsum(accept_i) - accept_i
        n_acc = jnp.minimum(accept_i.sum(), M - s.tree_size)
        child_cost = parent_cost + controls[:, -1]
        child_rows = jnp.concatenate([samples1, child_cost[:, None]],
                                     axis=-1)
        if knock in ("no_commit", "empty"):
            nxt_rows = child_rows
        else:
            within = accept & ((s.tree_size + accept_pos) < M)
            dst = jnp.where(within, accept_pos, R)
            nxt_rows = s.f_rows.at[dst].set(child_rows, mode="drop")
        n_next = jnp.minimum(jnp.maximum(n_acc, 1), R)
        d2g = (x1[:, 0] - goal[0]) ** 2 + (x1[:, 1] - goal[1]) ** 2
        in_goal = accept & (d2g < cfg.goal_threshold**2)
        best_cost = jnp.where(in_goal, child_cost, jnp.inf).min()
        s2 = s._replace(
            f_rows=nxt_rows,
            n_frontier=n_next,
            tree_size=jnp.minimum(s.tree_size + n_acc, M - R),
            r1_total=s.r1_total + d1[:, 0],
            r1_valid=s.r1_valid + d1[:, 1],
            r1_invalid=s.r1_invalid + (d1[:, 0] - d1[:, 1]),
            r1_avail=s.r1_avail | (d1[:, 1] > 0).astype(jnp.int32),
            r2_avail=s.r2_avail | (d2[:, 1] > 0).astype(jnp.int32),
            r1_score=r1_score,
            r1_threshold=r1_thr,
            cost_to_goal=jnp.minimum(best_cost, s.cost_to_goal),
        )
        return s2, w + 1, r2_seen

    @jax.jit
    def run(key):
        s0 = init_pathless_state(cfg, grid, jnp.asarray([5.0, 5.0, 0, 0, 0,
                                                         0, 0]), key)
        c = (s0, jnp.zeros((), jnp.int32), s0.r2_avail)
        s, _, _ = jax.lax.while_loop(lambda c: c[1] < W, body, c)
        return s.cost_to_goal + s.f_rows.sum() + s.tree_size

    return run


def walltime(fn, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    return time.perf_counter() - t0


def main():
    cfg = KGMTConfig(rollout_backend="pallas_rng")
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
    goal = jnp.asarray(sc.goal)
    out = {}
    key = jax.random.key(0)
    for knock in ("full", "no_rollout", "no_stats", "no_commit", "no_prng",
                  "empty"):
        lo, hi = 64, 256
        f_lo = make_runner(cfg, system, grid, obstacles, goal, lo, knock)
        f_hi = make_runner(cfg, system, grid, obstacles, goal, hi, knock)
        float(f_lo(key)); float(f_hi(key))  # compile
        t_lo = min(walltime(f_lo, key) for _ in range(4))
        t_hi = min(walltime(f_hi, key) for _ in range(4))
        per_wave_us = (t_hi - t_lo) / (hi - lo) * 1e6
        out[knock] = round(per_wave_us, 1)
        print(f"{knock:12s} {per_wave_us:8.1f} us/wave", flush=True)
    (REPO / ".r5_probe1.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
