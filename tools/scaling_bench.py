"""Scaling-efficiency measurement on the virtual CPU mesh (BASELINE.md:
">=80% scaling efficiency at 2+ hosts"; VERDICT r1 item 2).

Real multi-chip hardware is not available in this environment, so this tool
measures the two things the CPU mesh CAN measure honestly:

1. **Multi-query strong scaling** (BASELINE config 4 structure): a fixed
   global batch of demo problems on 1 vs 2 vs 4 vs 8 virtual devices.
   NOTE the box has ~2 physical cores — device counts beyond the core count
   are oversubscribed and reported as such; the 1->2 point is a genuine
   parallel-speedup measurement.

2. **Sharded-tree communication fraction**: wall per iteration of the
   sharded-tree planner (psum'd guidance + frontier-exchange all_gather +
   termination psum, every iteration) vs the IDENTICAL per-shard workload
   run as 8 independent solves (multi-query, zero collectives). The delta is
   the collective+sync overhead; efficiency = T_independent / T_sharded.
   On TPU the collectives ride ICI (orders faster than this CPU emulation
   which serializes through host memcpy), so the CPU number is a structural
   LOWER bound for the on-hardware efficiency of the same program.

Each measurement runs in a fresh subprocess (device count is fixed at
backend init). Results go to .scaling_bench.json (picked up by bench.py's
`extra.scaling`) and stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / ".scaling_bench.json"

MQ_WORKER = """
import os, sys, json, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(devices)d"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.parallel.mesh import make_planner_mesh
from cudasbmp_tpu.parallel.multi_query import MultiQueryPlanner

cfg = KGMTConfig(num_iterations=30, max_tree_size=4096,
                 rollouts_per_iter=1024, adaptive_waves=False,
                 stop_on_first_solution=False)  # fixed work per problem
mesh = make_planner_mesh(n_scenario=%(devices)d, n_tree=1)
planner = MultiQueryPlanner(cfg, mesh=mesh)
B = 16  # fixed GLOBAL batch: strong scaling
sc = Scenario.demo()
inits = np.tile(sc.init, (B, 1))
goals = np.tile(sc.goal, (B, 1))
obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)
planner.plan_batch(inits, goals, obstacles, seed=1)  # compile + warm
best = min(planner.plan_batch(inits, goals, obstacles, seed=2).wall_time_s
           for _ in range(3))
print("RESULT " + json.dumps({"devices": %(devices)d, "batch": B,
                              "wall_s": best,
                              "problems_per_sec": B / best}))
"""

SHARDED_WORKER = """
import os, sys, json, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.parallel.mesh import make_planner_mesh
from cudasbmp_tpu.parallel.multi_query import MultiQueryPlanner
from cudasbmp_tpu.parallel.sharded_tree import ShardedTreePlanner

ITERS = 20
cfg = KGMTConfig(num_iterations=ITERS, max_tree_size=8192,
                 rollouts_per_iter=1024, adaptive_waves=False,
                 stop_on_first_solution=False)  # run every iteration
sc = Scenario.demo()
obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)

# sharded: ONE logical tree over 8 shards — psum guidance + exchange
# all_gather + termination psum every iteration
st = ShardedTreePlanner(cfg, mesh=make_planner_mesh(n_scenario=1, n_tree=8))
st.plan(sc, seed=1)  # compile + warm
t_sh = min(st.plan(sc, seed=2).wall_time_s for _ in range(3))

# independent: the IDENTICAL per-shard workload with ZERO collectives
mq = MultiQueryPlanner(cfg, mesh=make_planner_mesh(n_scenario=8, n_tree=1))
inits = np.tile(sc.init, (8, 1))
goals = np.tile(sc.goal, (8, 1))
mq.plan_batch(inits, goals, obstacles, seed=1)  # compile + warm
t_mq = min(mq.plan_batch(inits, goals, obstacles, seed=2).wall_time_s
           for _ in range(3))

print("RESULT " + json.dumps({
    "iterations": ITERS,
    "sharded_wall_s": t_sh,
    "independent_wall_s": t_mq,
    "sharded_ms_per_iter": 1e3 * t_sh / ITERS,
    "independent_ms_per_iter": 1e3 * t_mq / ITERS,
    "comm_fraction": max(0.0, (t_sh - t_mq) / t_sh),
    "efficiency": min(1.0, t_mq / t_sh),
}))
"""


COMBINED_WORKER = """
import os, sys, json, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.parallel.mesh import make_planner_mesh
from cudasbmp_tpu.parallel.multi_query import MultiQueryPlanner
from cudasbmp_tpu.parallel.sharded_multi_query import ShardedMultiQueryPlanner

ITERS = 20
cfg = KGMTConfig(num_iterations=ITERS, max_tree_size=8192,
                 rollouts_per_iter=1024, adaptive_waves=False,
                 stop_on_first_solution=False)  # fixed work per problem
sc = Scenario.demo()
obstacles, _ = sc.padded_obstacles(cfg.max_obstacles)

# combined (scenario, tree) = (4, 2) mesh: 8 problems, each a 2-shard
# logical tree -> every device runs 2 problems x R rollouts/iter, with the
# tree collectives (guidance psum + exchange all_gather + termination psum)
# live inside each device pair every iteration
smq = ShardedMultiQueryPlanner(
    cfg, mesh=make_planner_mesh(n_scenario=4, n_tree=2))
B = 8
inits = np.tile(sc.init, (B, 1))
goals = np.tile(sc.goal, (B, 1))
smq.plan_batch(inits, goals, obstacles, seed=1)  # compile + warm
t_comb = min(smq.plan_batch(inits, goals, obstacles, seed=2).wall_time_s
             for _ in range(3))

# zero-collective baseline with the IDENTICAL per-device workload: 16
# independent problems on 8 devices = 2 problems x R rollouts per device
mq = MultiQueryPlanner(cfg, mesh=make_planner_mesh(n_scenario=8, n_tree=1))
inits16 = np.tile(sc.init, (16, 1))
goals16 = np.tile(sc.goal, (16, 1))
mq.plan_batch(inits16, goals16, obstacles, seed=1)  # compile + warm
t_ind = min(mq.plan_batch(inits16, goals16, obstacles, seed=2).wall_time_s
            for _ in range(3))

print("RESULT " + json.dumps({
    "iterations": ITERS,
    "mesh": "scenario=4 x tree=2",
    "combined_wall_s": t_comb,
    "independent_wall_s": t_ind,
    "combined_ms_per_iter": 1e3 * t_comb / ITERS,
    "independent_ms_per_iter": 1e3 * t_ind / ITERS,
    "comm_fraction": max(0.0, (t_comb - t_ind) / t_comb),
    "efficiency": min(1.0, t_ind / t_comb),
}))
"""


def _run(code: str, timeout: int = 1200) -> dict:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout, cwd=REPO)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    cores = os.cpu_count() or 1
    mq = []
    for d in (1, 2, 4, 8):
        r = _run(MQ_WORKER % {"devices": d, "repo": str(REPO)})
        r["oversubscribed"] = d > cores
        if mq:
            base = mq[0]["problems_per_sec"]
            r["speedup_vs_1dev"] = r["problems_per_sec"] / base
            r["efficiency_vs_1dev"] = r["speedup_vs_1dev"] / d
        mq.append(r)
        print(f"multi-query {d} dev: {r['problems_per_sec']:.2f} problems/s"
              + (f" (eff {r['efficiency_vs_1dev']:.2f})" if d > 1 else ""))
    sh = _run(SHARDED_WORKER % {"repo": str(REPO)})
    print(f"sharded-tree: {sh['sharded_ms_per_iter']:.1f} ms/iter vs "
          f"{sh['independent_ms_per_iter']:.1f} independent -> "
          f"comm fraction {sh['comm_fraction']:.3f}, "
          f"efficiency {sh['efficiency']:.3f}")
    comb = _run(COMBINED_WORKER % {"repo": str(REPO)})
    print(f"combined 4x2 mesh: {comb['combined_ms_per_iter']:.1f} ms/iter vs "
          f"{comb['independent_ms_per_iter']:.1f} independent -> "
          f"comm fraction {comb['comm_fraction']:.3f}, "
          f"efficiency {comb['efficiency']:.3f}")
    result = {
        "physical_cores": cores,
        "multi_query_strong_scaling": mq,
        "sharded_tree_comm_overhead": sh,
        "combined_scenario_tree_comm_overhead": comb,
        "note": ("CPU-mesh structural measurement: collectives are emulated "
                 "through host memory, so sharded-tree efficiency here is a "
                 "LOWER bound for the same program on ICI-attached TPU "
                 "chips; multi-query points beyond the physical core count "
                 "are oversubscribed."),
    }
    OUT.write_text(json.dumps(result, indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
