"""Round-4 device-TTS sweep over the wave width R (real TPU).

Adaptive-wave semantics fix the per-iteration rollout TARGET at
min(fanout*frontier, capacity-left) independent of R — R only sets how
many sub-waves partition it. Since the per-wave glue is ~flat in R while
the wave COUNT shrinks ~linearly with R, a wider wave should cut demo
device TTS (7.6 ms at R=4096 this session) roughly by the wave-count
ratio until the R-scaled ops (parent gather, stats einsum, acceptance)
take over. Search quality is unchanged in aggregate (same fan-out target;
RNG partitioning differs, so costs land in the same band, not bitwise).

Writes .tts_sweep.json. Usage: python tools/r4_tts_sweep.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def measure(R: int, need_path: bool = True) -> dict:
    import time

    from cudasbmp_tpu.config import KGMTConfig, Scenario
    from cudasbmp_tpu.geometry.grid import RegionGrid
    from cudasbmp_tpu.planners.kgmt import kgmt_solve, kgmt_solve_pathless
    from cudasbmp_tpu.systems.registry import get_system

    solve = kgmt_solve if need_path else kgmt_solve_pathless
    cfg = KGMTConfig(rollout_backend="pallas_rng", rollouts_per_iter=R,
                     need_path=need_path)
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
    init, goal = jnp.asarray(sc.init), jnp.asarray(sc.goal)

    def many(k: int):
        @jax.jit
        def run(key0):
            def body(acc, i):
                key = jax.random.fold_in(key0, i)
                final = solve(cfg, system, grid, init, goal, obstacles,
                              key)
                return acc, (final.cost_to_goal, final.itr)

            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(k, dtype=jnp.int32))
            return outs

        return run

    k_lo, k_hi = 2, 22
    f_lo, f_hi = many(k_lo), many(k_hi)
    key = jax.random.key(42)
    jax.block_until_ready(f_lo(key))
    costs, iters = jax.device_get(jax.block_until_ready(f_hi(key)))

    def wall(f):
        import time as _t

        t0 = _t.perf_counter()
        jax.block_until_ready(f(key))
        return _t.perf_counter() - t0

    t_lo = min(wall(f_lo) for _ in range(3))
    t_hi = min(wall(f_hi) for _ in range(3))
    per_solve = max(t_hi - t_lo, 0.0) / (k_hi - k_lo)
    solved = np.isfinite(costs)
    return {
        "R": R,
        "tts_device_ms": round(per_solve * 1e3, 3),
        "solve_rate": round(float(solved.mean()), 4),
        "mean_cost": round(float(np.asarray(costs)[solved].mean()), 3),
        "mean_iters": round(float(np.asarray(iters)[solved].mean()), 2),
    }


def main() -> None:
    if jax.devices()[0].platform != "tpu":
        print("need the real TPU chip")
        raise SystemExit(1)
    # same-run calibration (VERDICT r4 item 7): the fixed demo-8 kernel
    # rate, so cross-round comparisons can normalize out chip load
    from bench import measure_prop_throughput

    cal = measure_prop_throughput(backend="pallas_rng", repeats=500)
    cal_rate = round(cal["rollouts_per_sec"], 1)
    print(f"calibration: {cal_rate:.3e} rollouts/s", flush=True)
    rows = []
    for R in (4096, 8192, 16384, 32768):
        r = measure(R)
        rows.append(r)
        print(json.dumps(r), flush=True)
    best = min(rows, key=lambda r: r["tts_device_ms"])
    # pathless driver sweep (r5): same discipline, register frontier
    prows = []
    for R in (4096, 5120, 6144, 8192):
        r = measure(R, need_path=False)
        r["need_path"] = False
        prows.append(r)
        print(json.dumps(r), flush=True)
    pbest = min(prows, key=lambda r: r["tts_device_ms"])
    out = {"rows": rows, "best_R": best["R"],
           "best_tts_device_ms": best["tts_device_ms"],
           "pathless_rows": prows, "pathless_best_R": pbest["R"],
           "pathless_best_tts_device_ms": pbest["tts_device_ms"],
           "calibration_rollouts_per_sec": cal_rate}
    (REPO / ".tts_sweep.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))


if __name__ == "__main__":
    main()
