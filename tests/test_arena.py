"""Batched-arena multi-query planner (parallel/batch_kgmt.py): the
scatter-free batched design. Validates solve quality, path integrity by
control replay (the reference's MATLAB cross-check, SURVEY.md §3.4),
determinism, and that sharding the problem axis is semantics-preserving."""

import jax
import numpy as np
import pytest

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.parallel.batch_kgmt import ArenaMultiQueryPlanner
from cudasbmp_tpu.parallel.mesh import make_planner_mesh
from cudasbmp_tpu.systems.registry import get_system

# wave width 512 keeps CPU runtime low; 40 windows give the thinner waves
# room to reach the goal
ARENA_CONFIG = KGMTConfig(
    rollouts_per_iter=512, max_tree_size=512 * 41, num_iterations=40,
    rollout_backend="jnp",
)


def _demo_batch(B, vary_goals=False, seed=0):
    base = Scenario.demo()
    inits = np.tile(base.init, (B, 1)).astype(np.float32)
    goals = np.tile(base.goal, (B, 1)).astype(np.float32)
    if vary_goals:
        rng = np.random.default_rng(seed)
        goals[:, 0] = rng.uniform(1.0, 3.0, B)
        goals[:, 1] = rng.uniform(16.5, 18.5, B)
    obstacles, _ = base.padded_obstacles(ARENA_CONFIG.max_obstacles)
    return inits, goals, obstacles


def _replay_path(path, num_disc):
    """Exact control replay of a stored path; returns max state error."""
    import jax.numpy as jnp

    system = get_system("bicycle")
    worst = 0.0
    for i in range(1, len(path)):
        x = jnp.asarray(path[i - 1][:4])
        ctrl = jnp.asarray(path[i][4:7])
        dt = path[i][6] / num_disc
        for _ in range(num_disc):
            x = system.step(x, ctrl, dt)
        worst = max(worst, float(jnp.abs(x - jnp.asarray(path[i][:4])).max()))
    return worst


@pytest.mark.slow
def test_arena_solves_and_paths_replay():
    B = 4
    inits, goals, obstacles = _demo_batch(B, vary_goals=True)
    res = ArenaMultiQueryPlanner(ARENA_CONFIG).plan_batch(
        inits, goals, obstacles, seed=3)
    assert res.solved.mean() >= 0.75, res.costs
    for b in range(B):
        if not res.solved[b]:
            continue
        L = int(res.path_lengths[b])
        path = res.paths[b, :L]
        end = path[-1]
        d = np.hypot(end[0] - goals[b, 0], end[1] - goals[b, 1])
        assert d < ARENA_CONFIG.goal_threshold
        # stored controls reproduce stored states exactly (replay invariant)
        assert _replay_path(path, ARENA_CONFIG.num_disc) < 1e-4
        # cost = sum of edge durations along the path
        assert res.costs[b] == pytest.approx(path[1:, 6].sum(), rel=1e-5)


@pytest.mark.slow
def test_arena_deterministic():
    inits, goals, obstacles = _demo_batch(2)
    p = ArenaMultiQueryPlanner(ARENA_CONFIG)
    r1 = p.plan_batch(inits, goals, obstacles, seed=11)
    r2 = p.plan_batch(inits, goals, obstacles, seed=11)
    np.testing.assert_array_equal(r1.costs, r2.costs)
    np.testing.assert_array_equal(r1.paths, r2.paths)
    r3 = p.plan_batch(inits, goals, obstacles, seed=12)
    assert not np.array_equal(r1.paths, r3.paths)


@pytest.mark.slow
def test_arena_sharded_matches_unsharded():
    """NamedSharding over the problem axis must not change results: the
    arena exchanges nothing between problems."""
    B = 8
    inits, goals, obstacles = _demo_batch(B, vary_goals=True, seed=1)
    cfg = ARENA_CONFIG.replace(num_iterations=20,
                               max_tree_size=512 * 21)
    r_mesh = ArenaMultiQueryPlanner(cfg, mesh=make_planner_mesh()).plan_batch(
        inits, goals, obstacles, seed=5)
    r_plain = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, obstacles, seed=5)
    np.testing.assert_array_equal(r_mesh.solved, r_plain.solved)
    np.testing.assert_allclose(r_mesh.costs, r_plain.costs, rtol=1e-6)
    np.testing.assert_array_equal(r_mesh.tree_sizes, r_plain.tree_sizes)


def test_arena_mesh_shared_obstacles_any_row_count():
    """Regression: a shared [K, 4] obstacle set is logically replicated, so
    the mesh path must not shard its K rows over the scenario axis — that
    crashed whenever K was not divisible by the device count (e.g. K=5 on 8
    devices) and mis-distributed a replicated constant even when it was."""
    B = 8
    inits, goals, obstacles = _demo_batch(B)
    odd = obstacles[:5]  # 5 rows: not divisible by the 8-device mesh
    cfg = ARENA_CONFIG.replace(num_iterations=12, max_tree_size=512 * 13)
    r_mesh = ArenaMultiQueryPlanner(cfg, mesh=make_planner_mesh()).plan_batch(
        inits, goals, odd, seed=5)
    r_plain = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, odd, seed=5)
    np.testing.assert_allclose(r_mesh.costs, r_plain.costs, rtol=1e-6)


@pytest.mark.slow
def test_arena_per_problem_obstacles():
    """[B, K, 4] obstacle batches take the vmapped kernel path and must
    produce per-problem-consistent results (problem 1's wall blocks only
    problem 1)."""
    B = 2
    base = Scenario.demo()
    inits = np.tile(base.init, (B, 1)).astype(np.float32)
    goals = np.tile(base.goal, (B, 1)).astype(np.float32)
    obs0, _ = base.padded_obstacles(ARENA_CONFIG.max_obstacles)
    obs1 = obs0.copy()
    obstacles = np.stack([obs0, obs1])
    res = ArenaMultiQueryPlanner(ARENA_CONFIG).plan_batch(
        inits, goals, obstacles, seed=3)
    assert res.solved.all(), res.costs
    # identical problems with identical obstacles: same trees
    # (the RNG stream is shared across the batch via the flattened wave,
    # so equal inputs give equal outputs only per-problem-deterministically;
    # just check both solved with valid endpoints)
    for b in range(B):
        L = int(res.path_lengths[b])
        end = res.paths[b, L - 1]
        assert np.hypot(end[0] - goals[b, 0], end[1] - goals[b, 1]) \
            < ARENA_CONFIG.goal_threshold


@pytest.mark.slow
def test_arena_goal_bias():
    """goal_bias > 0: part of each wave expands the top-k goal-nearest
    carry entries; the demo still solves and the runs stay deterministic."""
    cfg = ARENA_CONFIG.replace(goal_bias=0.25, goal_bias_k=8)
    inits, goals, obstacles = _demo_batch(4)
    p = ArenaMultiQueryPlanner(cfg)
    r1 = p.plan_batch(inits, goals, obstacles, seed=5)
    assert r1.solved.all(), r1.costs
    r2 = p.plan_batch(inits, goals, obstacles, seed=5)
    np.testing.assert_array_equal(r1.costs, r2.costs)
    # biased runs reach the goal in no more iterations (same RNG stream)
    base = ArenaMultiQueryPlanner(ARENA_CONFIG).plan_batch(
        inits, goals, obstacles, seed=5)
    assert r1.iterations.mean() <= base.iterations.mean() + 2


def test_arena_zero_iteration_budget():
    cfg = ARENA_CONFIG.replace(num_iterations=0)
    inits, goals, obstacles = _demo_batch(2)
    res = ArenaMultiQueryPlanner(cfg).plan_batch(inits, goals, obstacles)
    assert not res.solved.any()
    assert (res.path_lengths == 0).all()
    assert (res.tree_sizes == 1).all()  # just the root


def test_arena_start_in_goal_region():
    """A child landing in the goal region on the first wave solves in one
    iteration (start next to goal)."""
    cfg = ARENA_CONFIG.replace(num_iterations=5, max_tree_size=512 * 6)
    base = Scenario.demo()
    B = 2
    inits = np.tile(base.init, (B, 1)).astype(np.float32)
    goals = inits.copy()
    goals[:, 0] += 0.3  # well within one rollout's reach
    obstacles, _ = base.padded_obstacles(cfg.max_obstacles)
    res = ArenaMultiQueryPlanner(cfg).plan_batch(inits, goals, obstacles,
                                                 seed=0)
    assert res.solved.all()
    assert (res.iterations == 1).all()


@pytest.mark.slow
def test_arena_anytime_mode():
    """stop_on_first_solution=False: the arena keeps searching after the
    first solution and only ever improves the incumbent (the reference
    breaks at the first hit, KGMT.cu:251-254; anytime mode is the beyond-
    reference flag shared with the single planner)."""
    cfg = ARENA_CONFIG.replace(stop_on_first_solution=False)
    inits, goals, obstacles = _demo_batch(3, vary_goals=True, seed=4)
    first = ArenaMultiQueryPlanner(ARENA_CONFIG).plan_batch(
        inits, goals, obstacles, seed=6)
    anytime = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, obstacles, seed=6)
    assert anytime.solved.sum() >= first.solved.sum()
    both = first.solved & anytime.solved
    # identical RNG stream => the anytime run sees the same first solution,
    # then can only improve on it
    assert (anytime.costs[both] <= first.costs[both] + 1e-5).all()
    # anytime must run the full window budget
    assert (anytime.iterations >= first.iterations).all()


@pytest.mark.slow
def test_arena_monte_carlo_sweep():
    """MonteCarloPlanner(impl='arena'): random per-scenario obstacle sets
    ride the arena's vmapped kernel path; sweep solves a healthy fraction."""
    from cudasbmp_tpu.parallel.monte_carlo import MonteCarloPlanner

    cfg = ARENA_CONFIG.replace(num_iterations=30, max_tree_size=512 * 31)
    mc = MonteCarloPlanner(cfg, mesh=make_planner_mesh(), impl="arena")
    s = mc.run(num_scenarios=8, seed=3, num_obstacles=5)
    assert s.num_scenarios == 8
    assert s.solve_rate >= 0.5, s.costs
    assert np.isfinite(s.costs[s.solved]).all()


def test_arena_permutation_paths_bitwise_equal(monkeypatch):
    """The MXU one-hot permutation path (R <= _PERMUTE_MATMUL_MAX_R) must be
    BITWISE identical to the argsort + take_along_axis path it replaces: a
    permutation one-hot selects exactly one f32 term per output and index
    columns stay below 2^24, so no float rounding can differ (perf.md r3,
    tools/r3_probe3.py: the gather path was 78% of the arena iteration)."""
    import cudasbmp_tpu.parallel.batch_kgmt as bk

    cfg = KGMTConfig(rollouts_per_iter=128, max_tree_size=128 * 101,
                     num_iterations=100, rollout_backend="jnp")
    B = 4
    inits, goals, obstacles = _demo_batch(B, vary_goals=True)
    assert cfg.rollouts_per_iter <= bk._PERMUTE_MATMUL_MAX_R
    res_mxu = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, obstacles, seed=5)
    monkeypatch.setattr(bk, "_PERMUTE_MATMUL_MAX_R", 0)
    res_gather = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, obstacles, seed=5)
    assert res_mxu.solved.any()  # non-degenerate comparison
    np.testing.assert_array_equal(res_mxu.solved, res_gather.solved)
    np.testing.assert_array_equal(res_mxu.costs, res_gather.costs)
    np.testing.assert_array_equal(res_mxu.iterations, res_gather.iterations)
    np.testing.assert_array_equal(res_mxu.paths, res_gather.paths)
    np.testing.assert_array_equal(res_mxu.tree_sizes, res_gather.tree_sizes)


def test_arena_permutation_parity_with_goal_bias(monkeypatch):
    """Same bitwise parity through the goal-bias top-k parent assignment
    (j is an arbitrary index map there, not just round-robin)."""
    import cudasbmp_tpu.parallel.batch_kgmt as bk

    cfg = KGMTConfig(rollouts_per_iter=128, max_tree_size=128 * 101,
                     num_iterations=100, rollout_backend="jnp",
                     goal_bias=0.25, goal_bias_k=8)
    B = 2
    inits, goals, obstacles = _demo_batch(B)
    res_mxu = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, obstacles, seed=7)
    monkeypatch.setattr(bk, "_PERMUTE_MATMUL_MAX_R", 0)
    res_gather = ArenaMultiQueryPlanner(cfg).plan_batch(
        inits, goals, obstacles, seed=7)
    np.testing.assert_array_equal(res_mxu.solved, res_gather.solved)
    np.testing.assert_array_equal(res_mxu.costs, res_gather.costs)
    np.testing.assert_array_equal(res_mxu.paths, res_gather.paths)


def test_arena_auto_capacity_derivation():
    """auto_capacity derives tree capacity from the iteration budget:
    exactly num_iterations windows plus the root block, no max_tree_size
    coupling (VERDICT r3 weak 6)."""
    import warnings

    cfg = ARENA_CONFIG.replace(num_iterations=13, max_tree_size=1)  # ignored
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the window-clamp warning must not fire
        p = ArenaMultiQueryPlanner(cfg, auto_capacity=True)
    assert p.n_windows == 13
    assert p.M == (13 + 1) * cfg.rollouts_per_iter


def test_arena_budget_exhausted_flag():
    """Unsolved problems that ran out of windows carry budget_exhausted —
    capacity starvation is visible, not a silent rate collapse."""
    cfg = ARENA_CONFIG.replace(num_iterations=2, max_tree_size=512 * 3)
    inits, goals, obstacles = _demo_batch(2)  # demo needs ~25+ iters at R=512
    res = ArenaMultiQueryPlanner(cfg).plan_batch(inits, goals, obstacles,
                                                 seed=0)
    assert res.budget_exhausted is not None
    assert (res.budget_exhausted == ~res.solved).all()
    assert res.budget_exhausted.any()


@pytest.mark.slow
def test_arena_progressive_extension_solves():
    """max_extensions: budget-exhausted problems restart with a doubled
    window budget until solved (progressive doubling) — solve rate stops
    depending on a tuned capacity constant."""
    cfg = ARENA_CONFIG.replace(num_iterations=8)
    inits, goals, obstacles = _demo_batch(3, vary_goals=True, seed=9)
    planner = ArenaMultiQueryPlanner(cfg, auto_capacity=True)
    base = planner.plan_batch(inits, goals, obstacles, seed=2)
    assert base.budget_exhausted.any()  # 8 windows can't reach the demo goal
    ext = planner.plan_batch(inits, goals, obstacles, seed=2,
                             max_extensions=2)
    assert ext.solved.sum() > base.solved.sum()
    assert ext.budget_exhausted.sum() < base.budget_exhausted.sum()
    # solved problems carry real paths out of the extension rounds too
    for b in range(3):
        if ext.solved[b] and not base.solved[b]:
            L = int(ext.path_lengths[b])
            assert L >= 2
            assert _replay_path(ext.paths[b][:L], cfg.num_disc) < 1e-4
