"""Round-4 probe #4 (real TPU): same-session head-to-head of the shipped
nested-loop iteration vs the flat restructure.

Cross-probe comparisons are unreliable on the shared chip (+-25% session
load drift, perf.md). This probe measures, in ONE session: the library
kgmt_iteration (inner sub-wave while_loop), the flat single-_replace
iteration of r4_probe3 (identical math, plain scatters), and its
no-commit floor. The flat/library ratio is the honest win of the
restructure; flat - floor is the true commit cost.

Usage: python tools/r4_probe4.py [R]
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

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.planners.kgmt import init_state
from cudasbmp_tpu.systems.registry import get_system
from r4_probe3 import make_iteration


def emit(**kw):
    print(json.dumps(kw), flush=True)


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

    bodies = {}
    from cudasbmp_tpu.planners.kgmt import kgmt_iteration

    bodies["library_nested"] = partial(kgmt_iteration, cfg, system, grid,
                                       obstacles, goal)
    bodies["flat_scatter"] = make_iteration(cfg, system, grid, obstacles,
                                            goal, "scatter_plain")
    bodies["flat_nocommit"] = make_iteration(cfg, system, grid, obstacles,
                                             goal, "nocommit")

    for name, body in bodies.items():
        @jax.jit
        def run(key, n, body=body):
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
        emit(variant=name, R=R, slope_ms_per_iter=round(slope_ms, 4),
             t_lo_s=round(times[n_lo], 4), t_hi_s=round(times[n_hi], 4))


if __name__ == "__main__":
    main()
