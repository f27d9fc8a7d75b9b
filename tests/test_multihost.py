"""Multi-host simulation without a cluster (SURVEY.md §4.4): two local
processes under jax.distributed, CPU backend, 4 virtual devices each —
exercising the same global-mesh + collective path a real 2-host TPU pod
slice uses (DCN-coordinated global arrays, cross-process psum)."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=proc_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    sys.path.insert(0, %r)
    from cudasbmp_tpu.config import KGMTConfig, Scenario
    from cudasbmp_tpu.parallel.mesh import make_planner_mesh
    from cudasbmp_tpu.parallel.multi_query import MultiQueryPlanner

    assert jax.device_count() == 8 and jax.local_device_count() == 4
    mesh = make_planner_mesh()  # 8-way scenario axis spanning both processes

    cfg = KGMTConfig(num_iterations=100, max_tree_size=16384,
                     rollouts_per_iter=2048)
    planner = MultiQueryPlanner(cfg, mesh=mesh)
    base = Scenario.demo()
    B = 8
    # every process builds the same global batch; jit shards it over the
    # global mesh (the standard multi-host SPMD input pattern)
    inits = np.tile(base.init, (B, 1))
    goals = np.tile(base.goal, (B, 1))
    obstacles, _ = base.padded_obstacles(cfg.max_obstacles)
    shard = NamedSharding(mesh, P("scenario"))
    garr = lambda x: jax.make_array_from_process_local_data(
        shard, np.asarray(x)[
            proc_id * (B // nprocs):(proc_id + 1) * (B // nprocs)],
        (B,) + np.asarray(x).shape[1:],
    )
    # PRNG keys as a global array: ship the raw key data per process and
    # re-wrap under the global sharding
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(B))
    keys_g = jax.jit(jax.random.wrap_key_data, out_shardings=shard)(
        garr(np.asarray(jax.random.key_data(keys))))
    costs, tree_sizes, iters, samples, lengths = planner._solve(
        garr(inits), garr(goals),
        garr(np.broadcast_to(obstacles, (B,) + obstacles.shape)),
        keys_g,
    )
    # fetch the fully-addressable scalar summary on every process
    solved = jax.jit(
        lambda c: jnp.isfinite(c).sum(), out_shardings=NamedSharding(mesh, P())
    )(costs)
    print(f"proc{proc_id}: solved={int(solved)}/8", flush=True)
    assert int(solved) >= 4

    # --- sharded-tree across processes: the region-stats psum rides the
    # cross-process (DCN-analog) link every iteration -----------------------
    from cudasbmp_tpu.parallel.sharded_tree import ShardedTreePlanner
    cfg2 = KGMTConfig(num_iterations=60, max_tree_size=2048,
                      rollouts_per_iter=512, adaptive_waves=False)
    tree_mesh = make_planner_mesh(n_scenario=1, n_tree=8)
    st = ShardedTreePlanner(cfg2, mesh=tree_mesh)
    r = st.plan(Scenario.demo())
    assert r.solved, "sharded tree must solve across 2 processes"
    sc = r.r1_scores_by_shard
    assert sc.shape == (8, 256)
    for i in range(1, 8):
        assert (sc[0] == sc[i]).all(), "shards disagree on global scores"
    print(f"proc{proc_id}: sharded-tree cost={r.cost:.3f}", flush=True)
    print(f"proc{proc_id}: MULTIHOST_OK", flush=True)
    """
) % str(REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_multi_query(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out
