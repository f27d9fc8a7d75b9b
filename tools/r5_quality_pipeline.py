"""Quality-matched throughput via post-processing (VERDICT r4 item 4): the
fixed-width arena trades solution cost for solves/s (R=128 waves find ~5x
costlier first solutions than the adaptive single-tree's full fan-out,
.quality_parity.json). This tool measures the FULL pipeline

    arena solve (fixed-width R) -> shortcut_batch -> refine_batch

against the adaptive single-tree cost distribution at n=128, counting the
post-processing wall time, and records a ``postprocessed_pipeline`` section
into .quality_parity.json: cost quantiles per stage, the cost ratio to
adaptive, and quality-adjusted solves/s (problems/s whose FINAL cost lands
inside the adaptive band, i.e. <= the adaptive p90).

Run on the real TPU chip: python tools/r5_quality_pipeline.py [B] [R] [rounds]
(defaults B=128, R=1024, rounds=256 — the measured sweet spot: R=1024 solve
cost p50 12.5 -> 9.6 after 256 shortcut rounds, ~1.5x the adaptive band)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.geometry.grid import RegionGrid
from cudasbmp_tpu.parallel.batch_kgmt import ArenaMultiQueryPlanner
from cudasbmp_tpu.planners.kgmt import kgmt_solve
from cudasbmp_tpu.refine import refine_batch
from cudasbmp_tpu.shortcut import ShortcutConfig, shortcut_batch
from cudasbmp_tpu.systems.registry import get_system

OUT = REPO / ".quality_parity.json"


def _q(xs):
    xs = np.asarray(xs, float)
    if xs.size == 0:
        return None
    return [round(float(v), 3) for v in np.quantile(xs, [0.1, 0.5, 0.9])]


def adaptive_costs(n: int) -> np.ndarray:
    """n adaptive single-tree demo solves SEQUENTIALLY inside one dispatch
    (the tts_device_s discipline) — the reference-semantics cost band."""
    cfg = KGMTConfig(rollout_backend="pallas_rng")
    system = get_system(cfg.system)
    grid = RegionGrid(width=cfg.width, height=cfg.height, N=cfg.N, n=cfg.n)
    sc = Scenario.demo()
    obstacles = jnp.asarray(sc.padded_obstacles(cfg.max_obstacles)[0])
    init, goal = jnp.asarray(sc.init), jnp.asarray(sc.goal)

    @jax.jit
    def run(key0):
        def body(_, i):
            final = kgmt_solve(cfg, system, grid, init, goal, obstacles,
                               jax.random.fold_in(key0, i))
            return _, final.cost_to_goal

        _, costs = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.int32))
        return costs

    return np.asarray(jax.block_until_ready(run(jax.random.key(17))))


def main() -> None:
    if jax.devices()[0].platform != "tpu":
        print("refusing: need the real TPU chip")
        raise SystemExit(1)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from bench import measure_prop_throughput

    cal = measure_prop_throughput(backend="pallas_rng", repeats=500)
    cal_rate = round(cal["rollouts_per_sec"], 1)
    print(f"calibration: {cal_rate:.3e} rollouts/s", flush=True)

    ad = adaptive_costs(B)
    ad_solved = ad[np.isfinite(ad)]
    ad_q = _q(ad_solved)
    print(f"adaptive single-tree n={B}: cost q {ad_q}", flush=True)

    cfg = KGMTConfig(rollouts_per_iter=R, num_iterations=150,
                     rollout_backend="pallas_rng", adaptive_waves=False)
    planner = ArenaMultiQueryPlanner(cfg, auto_capacity=True)
    sc = Scenario.demo()
    inits = np.tile(sc.init, (B, 1))
    goals = np.tile(sc.goal, (B, 1))
    obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)
    planner.plan_batch(inits, goals, obstacles, seed=7)  # compile
    t0 = time.perf_counter()
    res = planner.plan_batch(inits, goals, obstacles, seed=8,
                             max_extensions=1)
    t_solve = time.perf_counter() - t0
    solved = res.path_lengths >= 2
    print(f"arena solve: {solved.mean():.2f} rate, cost q "
          f"{_q(res.costs[solved])}, {t_solve:.3f}s", flush=True)

    system = planner.system
    scfg = ShortcutConfig(rounds=rounds, candidates=256)
    shortcut_batch(system, cfg, res.paths, res.path_lengths, goals,
                   obstacles, scfg, seed=3)  # compile
    t0 = time.perf_counter()
    sc_out = shortcut_batch(system, cfg, res.paths, res.path_lengths, goals,
                            obstacles, scfg, seed=4)
    t_shortcut = time.perf_counter() - t0
    print(f"shortcut: cost q {_q(sc_out['cost_after'][solved])}, "
          f"{t_shortcut:.3f}s", flush=True)

    refine_batch(system, cfg, sc_out["paths"], sc_out["path_lengths"],
                 goals, obstacles)  # compile
    t0 = time.perf_counter()
    rf = refine_batch(system, cfg, sc_out["paths"], sc_out["path_lengths"],
                      goals, obstacles)
    t_refine = time.perf_counter() - t0
    final_cost = np.where(rf["improved"], rf["cost_after"],
                          sc_out["cost_after"])
    final_cost = np.where(solved, final_cost, np.inf)
    print(f"refine: cost q {_q(final_cost[solved])}, {t_refine:.3f}s "
          f"({int(rf['improved'].sum())}/{int(solved.sum())} improved)",
          flush=True)

    t_total = t_solve + t_shortcut + t_refine
    in_band = solved & (final_cost <= ad_q[2])  # <= adaptive p90
    section = {
        "batch": B,
        "rollouts_per_iter": R,
        "calibration_rollouts_per_sec": cal_rate,
        "adaptive_cost_quantiles": ad_q,
        "adaptive_solve_rate": round(float(np.isfinite(ad).mean()), 4),
        "stages": {
            "solve": {"cost_quantiles": _q(res.costs[solved]),
                      "wall_s": round(t_solve, 4)},
            "shortcut": {"cost_quantiles": _q(sc_out["cost_after"][solved]),
                         "wall_s": round(t_shortcut, 4),
                         "rounds": scfg.rounds,
                         "candidates": scfg.candidates},
            "refine": {"cost_quantiles": _q(final_cost[solved]),
                       "wall_s": round(t_refine, 4),
                       "n_improved": int(rf["improved"].sum())},
        },
        "final_cost_quantiles": _q(final_cost[solved]),
        "cost_p50_ratio_vs_adaptive": round(
            float(np.median(final_cost[solved]) / ad_q[1]), 3),
        "total_wall_s": round(t_total, 4),
        "solves_per_sec_with_postprocessing": round(B / t_total, 1),
        "in_adaptive_band_rate": round(float(in_band.mean()), 4),
        "quality_adjusted_solves_per_sec": round(
            float(in_band.sum()) / t_total, 1),
        "note": ("quality_adjusted = problems/s whose FINAL cost <= the "
                 "adaptive p90, total pipeline wall counted "
                 "(VERDICT r4 item 4)"),
    }
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    key_name = ("postprocessed_pipeline" if R == 1024
                else f"postprocessed_pipeline_r{R}")
    data[key_name] = section
    OUT.write_text(json.dumps(data, indent=1))
    print(json.dumps({k: section[k] for k in
                      ("final_cost_quantiles", "cost_p50_ratio_vs_adaptive",
                       "solves_per_sec_with_postprocessing",
                       "quality_adjusted_solves_per_sec")}))


if __name__ == "__main__":
    main()
