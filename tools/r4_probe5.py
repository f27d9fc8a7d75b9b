"""Round-4 probe #5 (real TPU): slope of the SHIPPED flat kgmt_run.

kgmt_run's iteration bound is static config, so the slope comes from two
separately-compiled configs (num_iterations = N_LO vs N_HI) with goals
placed unreachably and capacity sized so waves never clamp — the same
regime as r4_probe1/4, measuring the production path end to end
(VERDICT r3 item 2 acceptance: slope <= 0.25 ms/iter at R=4096).

Usage: python tools/r4_probe5.py [R]
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
from cudasbmp_tpu.planners.kgmt import kgmt_solve
from cudasbmp_tpu.systems.registry import get_system


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_lo, n_hi = (int(os.environ.get("PROBE_N_LO", 100)),
                  int(os.environ.get("PROBE_N_HI", 200)))
    M = (n_hi + 2) * R
    system = get_system("bicycle")
    sc = Scenario.demo()
    init = jnp.asarray(sc.init, jnp.float32)
    goal = jnp.full(7, -100.0, jnp.float32)

    times = {}
    for n in (n_lo, n_hi):
        cfg = KGMTConfig(num_iterations=n, max_tree_size=M,
                         rollouts_per_iter=R, rollout_backend="pallas_rng",
                         adaptive_waves=False)
        grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N,
                          n=cfg.n)
        obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])

        @jax.jit
        def run(key, cfg=cfg, grid=grid, obstacles=obstacles):
            final = kgmt_solve(cfg, system, grid, init, goal, obstacles, key)
            return (final.r1_total.sum().astype(jnp.float32)
                    + final.costs.sum()
                    + final.tree_size.astype(jnp.float32))

        float(run(jax.random.key(0)))  # compile + warm
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            float(run(jax.random.key(1000 * rep + n)))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    slope_ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    print(json.dumps({"probe": "shipped_kgmt_run_flat", "R": R,
                      "slope_ms_per_iter": round(slope_ms, 4),
                      "t_lo_s": round(times[n_lo], 4),
                      "t_hi_s": round(times[n_hi], 4)}))


if __name__ == "__main__":
    main()
