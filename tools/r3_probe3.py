"""Round-3 probe #3 (run on the real TPU chip): arena per-iteration glue
ablation.

perf.md's arena section ends with an open question: at R=128 the batched
arena spends ~2.5 ms/iter on device while the rollout kernel itself is
~40 us (B*R = 32k lanes / 0.83 B rollouts/s) — what is the other 98%?
This probe measures iteration SLOPES (run the jitted window loop at n and
2n iterations inside one dispatch, divide the difference — the same
dispatch-overhead-immune method perf.md uses throughout) for the full
arena iteration and for ablated variants:

  full          the arena_iteration body as shipped
  no_stats      one-hot einsum stats + score/virgin lookups replaced by
                constants (score=1, virgin=True, no histogram update)
  gather_lookup stats einsum kept, but score/virgin LOOKUPS switched from
                the one-hot contraction to direct take_along_axis gathers
                (the design alternative rejected at R=2048; re-tested at
                R=128 where proportions differ)
  no_frontier   frontier refresh (stable argsort + 3 take_along_axis)
                skipped — carry reused as-is
  cumsum_frontier frontier refresh via cumsum destination + tiny [B,R]
                scatter instead of stable argsort
  no_commit     the 4 dynamic_update_slice window commits skipped
  no_rollout    fused kernel replaced by a shape-preserving elementwise fake

Every variant keeps identical carry shapes so the loop structure (and
XLA's in-place DUS aliasing) is unchanged. Goals are placed unreachably
far so `done` never trips and the loop runs exactly n windows.

TIMING: on the axon relay block_until_ready does not reliably block
(perf.md); every timed program reduces to a scalar the host FETCHES.

Usage: python tools/r3_probe3.py [B] [R]   (defaults 256 128)
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
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
from cudasbmp_tpu.parallel.batch_kgmt import (
    ArenaState,
    _region_local,
    _rollout_wave,
    _scores,
    arena_init,
)
from cudasbmp_tpu.systems.registry import get_system


def emit(**kw):
    print(json.dumps(kw), flush=True)


def iteration(cfg, system, grid, obstacles, goals, R, variant, s):
    """arena_iteration with ablation toggles; mirrors
    parallel/batch_kgmt.py:arena_iteration (keep in sync by eye — this is a
    probe, not a library)."""
    B = s.done.shape[0]
    nr1, n2 = cfg.num_r1, cfg.n * cfg.n
    r1_score = _scores(cfg, s)

    j = (jnp.arange(R, dtype=jnp.int32)[None, :]
         % jnp.maximum(s.n_parents, 1)[:, None])
    x0 = jnp.take_along_axis(s.p_x0, j[:, :, None], axis=1)
    pcost = jnp.take_along_axis(s.p_cost, j, axis=1)
    pgid = jnp.take_along_axis(s.p_gid, j, axis=1)

    key_it = jax.random.fold_in(s.key, s.it)
    k_ctrl, k_accept = jax.random.split(key_it)
    if variant == "no_rollout":
        # shape-preserving fake: p_x0 is already [B, R, state_dim]
        x1 = x0 * 1.000001 + 0.001
        controls = jnp.full((B, R, system.control_spec.dim), 0.1, jnp.float32)
        valid = x1[..., 0] > -1.0
    else:
        x1, controls, valid = _rollout_wave(cfg, system, x0, obstacles,
                                            k_ctrl)
    live = ~s.done
    valid = valid & live[:, None]

    if variant == "no_stats":
        score_r = jnp.ones((B, R), jnp.float32)
        virgin = jnp.ones((B, R), bool)
        d1_total = jnp.zeros((B, nr1), jnp.float32)
        d1_valid = d1_total
        d2_valid = jnp.zeros((B, nr1, n2), jnp.float32)
    else:
        r1 = grid.r1_index(x1[..., 0], x1[..., 1])
        loc, in_r2 = _region_local(grid, x1[..., 0], x1[..., 1], r1)
        in_r1 = r1 >= 0
        oh1 = (jax.nn.one_hot(jnp.maximum(r1, 0), nr1, dtype=jnp.float32)
               * in_r1[..., None])
        ohl = (jax.nn.one_hot(loc, n2, dtype=jnp.float32)
               * in_r2[..., None])
        touched = (live[:, None] & in_r1).astype(jnp.float32)
        valid_f = (valid & in_r1).astype(jnp.float32)
        rhs = jnp.concatenate(
            [ohl * valid_f[..., None], touched[..., None],
             valid_f[..., None]], axis=-1)
        d = jnp.einsum("brc,brl->bcl", oh1, rhs,
                       preferred_element_type=jnp.float32)
        d2_valid, d1_total, d1_valid = (d[..., :n2], d[..., n2],
                                        d[..., n2 + 1])
        if variant == "gather_lookup":
            r1c = jnp.maximum(r1, 0)
            score_r = jnp.take_along_axis(r1_score, r1c, axis=1)
            score_r = jnp.where(in_r1, score_r, 0.0)
            flat_seen = (s.r2_valid > 0).reshape(B, nr1 * n2)
            seen_r = jnp.take_along_axis(
                flat_seen, r1c * n2 + loc, axis=1)
            virgin = ~in_r2 | ~seen_r
        else:
            seen = (s.r2_valid > 0).astype(jnp.float32)
            tbl = jnp.concatenate([r1_score[:, :, None], seen], axis=-1)
            look = jnp.einsum("brc,bcl->brl", oh1, tbl,
                              preferred_element_type=jnp.float32)
            score_r = look[..., 0]
            seen_r = (look[..., 1:] * ohl).sum(-1)
            virgin = ~in_r2 | (seen_r == 0)

    u = jax.random.uniform(k_accept, (B, R))
    accept = valid & ((u <= score_r) | virgin)

    win_base = (s.it + 1) * R
    samples1 = jnp.concatenate([x1, controls], axis=-1)
    child_cost = pcost + controls[..., -1]
    if variant == "no_commit":
        tree_samples, tree_parent = s.tree_samples, s.tree_parent
        tree_valid, costs = s.tree_valid, s.costs
    else:
        tree_samples = jax.lax.dynamic_update_slice(
            s.tree_samples, samples1, (0, win_base, 0))
        tree_parent = jax.lax.dynamic_update_slice(
            s.tree_parent, jnp.where(accept, pgid, -1), (0, win_base))
        tree_valid = jax.lax.dynamic_update_slice(
            s.tree_valid, accept, (0, win_base))
        costs = jax.lax.dynamic_update_slice(
            s.costs, jnp.where(accept, child_cost, 0.0), (0, win_base))

    d2g = ((x1[..., 0] - goals[:, None, 0]) ** 2
           + (x1[..., 1] - goals[:, None, 1]) ** 2)
    in_goal = accept & (d2g < cfg.goal_threshold**2)
    goal_costs = jnp.where(in_goal, child_cost, jnp.inf)
    best = jnp.argmin(goal_costs, axis=-1)
    best_cost = jnp.take_along_axis(goal_costs, best[:, None], axis=1)[:, 0]
    improved = best_cost < s.cost_to_goal
    cost_to_goal = jnp.where(improved, best_cost, s.cost_to_goal)
    goal_node = jnp.where(improved, win_base + best, s.goal_node)
    newly = improved & (s.solved_at < 0)
    solved_at = jnp.where(newly, s.it + 1, s.solved_at)

    n_acc = accept.sum(axis=-1, dtype=jnp.int32)
    if variant == "no_frontier":
        p_x0, p_cost, p_gid = s.p_x0, s.p_cost, s.p_gid
        n_parents = s.n_parents
    else:
        if variant == "cumsum_frontier":
            dst = jnp.cumsum(accept, axis=-1, dtype=jnp.int32) - 1
            dst = jnp.where(accept, dst, R - 1)  # rejects pile on the tail
            new_x0 = jnp.zeros_like(s.p_x0)
            bidx = jnp.arange(s.p_x0.shape[0])[:, None]
            new_x0 = new_x0.at[bidx, dst].set(x1, mode="drop")
            new_cost = jnp.zeros_like(s.p_cost).at[bidx, dst].set(
                child_cost, mode="drop")
            order = jnp.zeros_like(s.p_gid).at[bidx, dst].set(
                jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32),
                                 accept.shape), mode="drop")
            new_gid = win_base + order
        else:
            order = jnp.argsort(jnp.where(accept, 0, 1), axis=-1,
                                stable=True).astype(jnp.int32)
            new_x0 = jnp.take_along_axis(x1, order[:, :, None], axis=1)
            new_cost = jnp.take_along_axis(child_cost, order, axis=1)
            new_gid = win_base + order
        keep = (n_acc > 0) & live
        kb = keep[:, None]
        p_x0 = jnp.where(kb[..., None], new_x0, s.p_x0)
        p_cost = jnp.where(kb, new_cost, s.p_cost)
        p_gid = jnp.where(kb, new_gid, s.p_gid)
        n_parents = jnp.where(keep, n_acc, s.n_parents)

    solved = jnp.isfinite(cost_to_goal)
    done = s.done | solved

    return ArenaState(
        tree_samples=tree_samples, tree_parent=tree_parent,
        tree_valid=tree_valid, costs=costs,
        p_x0=p_x0, p_cost=p_cost, p_gid=p_gid, n_parents=n_parents,
        r1_total=s.r1_total + d1_total, r1_valid=s.r1_valid + d1_valid,
        r2_valid=s.r2_valid + d2_valid,
        cost_to_goal=cost_to_goal, goal_node=goal_node, solved_at=solved_at,
        done=done, it=s.it + 1, key=s.key,
    )


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    import os

    backend = os.environ.get("PROBE_BACKEND", "pallas_rng")
    n_lo, n_hi = (int(os.environ.get("PROBE_N_LO", 60)),
                  int(os.environ.get("PROBE_N_HI", 120)))
    M = (n_hi + 2) * R
    cfg = KGMTConfig(num_iterations=n_hi, max_tree_size=M,
                     rollouts_per_iter=R, rollout_backend=backend)
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)
    obstacles = jnp.asarray(obstacles)
    inits = jnp.asarray(np.tile(sc.init, (B, 1)), jnp.float32)
    # unreachable goal: outside the workspace, so done never trips
    goals = jnp.full((B, 7), -100.0, jnp.float32)

    # "library" = the shipped parallel.batch_kgmt.arena_iteration (which
    # uses the MXU one-hot permutations for R <= _PERMUTE_MATMUL_MAX_R);
    # "full" = this probe's frozen copy of the original gather-based body
    variants = ["library", "full", "no_stats", "gather_lookup",
                "no_frontier", "cumsum_frontier", "no_commit", "no_rollout"]

    for variant in variants:
        if variant == "library":
            from cudasbmp_tpu.parallel.batch_kgmt import arena_iteration

            body = partial(arena_iteration, cfg, system, grid, obstacles,
                           goals, R)
        else:
            body = partial(iteration, cfg, system, grid, obstacles, goals, R,
                           variant)

        @jax.jit
        def run(key, n):  # n is a traced scalar: ONE compile per variant
            s0 = arena_init(cfg, grid, inits, key, M, R, system.state_dim)
            final = jax.lax.while_loop(lambda s: s.it < n, body, s0)
            return (final.r1_total.sum() + final.cost_to_goal.sum()
                    + final.p_cost.sum())

        float(run(jax.random.key(0), jnp.int32(2)))  # compile + warm
        times = {}
        for n in (n_lo, n_hi):
            best = float("inf")
            for rep in range(3):
                key = jax.random.key(1000 * rep + n)
                t0 = time.perf_counter()
                float(run(key, jnp.int32(n)))  # host fetch forces completion
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        slope_ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
        emit(variant=variant, B=B, R=R, slope_ms_per_iter=round(slope_ms, 4),
             t_lo_s=round(times[n_lo], 4), t_hi_s=round(times[n_hi], 4))


if __name__ == "__main__":
    main()
