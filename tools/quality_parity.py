"""Statistical search-quality parity: adaptive single-tree vs fixed-width
arena at scale (VERDICT r3 missing #2 / next-round item 4).

The reference guarantees every frontier node exactly ``fanout`` children per
iteration (KGMT.cu:151-158); the flagship single-tree planner reproduces
that with adaptive sub-waves (adaptive_waves=True, the default), while the
bench-headline arena/multi-query paths run fixed-width round-robin waves
(adaptive_waves=False) — a documented search-behavior knob. This tool
quantifies the deviation with real n: >= SEEDS independent solves per
workload per mode on {demo, dense24, fine-grid}, reporting solve rate and
the solution-cost / iterations-to-solve distributions (p10/p50/p90).

Method notes:
- single-tree: K seeds run SEQUENTIALLY inside one dispatch (lax.scan over
  fold_in seeds — the tts_device_s discipline), so the relay round trip is
  paid once per workload.
- arena: K identical problems in one batch; per-problem randomness comes
  from the per-lane HW-PRNG streams of the flat B*R kernel call. Window
  budget auto-derives from num_iterations (auto_capacity) with
  progressive-doubling restarts, so capacity never confounds the rate.
- iterations are mode-specific (an adaptive iteration expands
  fanout*frontier rollouts, an arena iteration exactly R): comparable
  within a mode across workloads, not across modes; cost/solve rate are the
  cross-mode metrics.

Writes .quality_parity.json; prints one JSON line per (workload, mode).
Usage: python tools/quality_parity.py [SEEDS]   (default 128)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.parallel.batch_kgmt import ArenaMultiQueryPlanner
from cudasbmp_tpu.planners.kgmt import kgmt_solve
from cudasbmp_tpu.systems.registry import get_system

OUT = REPO / ".quality_parity.json"


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _quantiles(a: np.ndarray) -> dict:
    if a.size == 0:
        return {"p10": None, "p50": None, "p90": None}
    q = np.quantile(a, [0.1, 0.5, 0.9])
    return {"p10": round(float(q[0]), 3), "p50": round(float(q[1]), 3),
            "p90": round(float(q[2]), 3)}


def _summarize(costs: np.ndarray, iters: np.ndarray, wall: float) -> dict:
    solved = np.isfinite(costs)
    return {
        "n": int(costs.size),
        "solve_rate": round(float(solved.mean()), 4),
        "cost": _quantiles(costs[solved]),
        "iters_to_solve": _quantiles(iters[solved].astype(float)),
        "wall_s": round(wall, 2),
    }


def run_single_tree(cfg: KGMTConfig, sc: Scenario, seeds: int) -> dict:
    """K sequential in-dispatch solves of the adaptive single-tree planner."""
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
    init, goal = jnp.asarray(sc.init), jnp.asarray(sc.goal)

    @jax.jit
    def run(key0):
        def body(_, i):
            key = jax.random.fold_in(key0, i)
            final = kgmt_solve(cfg, system, grid, init, goal, obstacles, key)
            return 0.0, (final.cost_to_goal, final.itr)

        _, outs = jax.lax.scan(body, 0.0,
                               jnp.arange(seeds, dtype=jnp.int32))
        return outs

    costs, iters = jax.block_until_ready(run(jax.random.key(99)))  # compile
    t0 = time.perf_counter()
    costs, iters = jax.block_until_ready(run(jax.random.key(7)))
    wall = time.perf_counter() - t0
    return _summarize(np.asarray(costs), np.asarray(iters), wall)


def run_arena(cfg: KGMTConfig, sc: Scenario, seeds: int) -> dict:
    """K identical problems through the fixed-width arena in one batch."""
    planner = ArenaMultiQueryPlanner(cfg, auto_capacity=True)
    inits = np.tile(sc.init, (seeds, 1))
    goals = np.tile(sc.goal, (seeds, 1))
    obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)
    planner.plan_batch(inits, goals, obstacles, seed=1)  # compile + warm
    t0 = time.perf_counter()
    res = planner.plan_batch(inits, goals, obstacles, seed=7,
                             max_extensions=2)
    wall = time.perf_counter() - t0
    out = _summarize(res.costs, res.iterations, wall)
    out["budget_exhausted"] = int(res.budget_exhausted.sum())
    return out


def main():
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    fine_cap = KGMTConfig.derived_tree_capacity(32, 8)
    workloads = {
        "demo": (Scenario.demo(), {}),
        "dense24": (Scenario.dense(24), {}),
        "fine_grid": (Scenario.dense(24),
                      {"N": 32, "n": 8, "max_tree_size": fine_cap}),
    }
    results = {"seeds": seeds, "workloads": {}}
    for name, (sc, over) in workloads.items():
        st_cfg = KGMTConfig(rollout_backend="pallas_rng", **over)
        ar_over = dict(over)
        ar_over.pop("max_tree_size", None)  # arena: auto_capacity derives it
        ar_cfg = KGMTConfig(rollout_backend="pallas_rng",
                            adaptive_waves=False, rollouts_per_iter=128,
                            num_iterations=150, **ar_over)
        st = run_single_tree(st_cfg, sc, seeds)
        emit(workload=name, mode="single_tree_adaptive", **st)
        ar = run_arena(ar_cfg, sc, seeds)
        emit(workload=name, mode="arena_fixed_width", **ar)
        results["workloads"][name] = {
            "single_tree_adaptive": st,
            "arena_fixed_width": ar,
        }
    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
