"""Kinodynamic shortcutting tests: cost must not increase, the spliced path
must replay collision-free into the goal region."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudasbmp_tpu.config import Scenario
from cudasbmp_tpu.ops.rollout import rollout_batch
from cudasbmp_tpu.planners.kgmt import KGMT
from cudasbmp_tpu.shortcut import ShortcutConfig, shortcut_path


@pytest.mark.slow
def test_shortcut_improves_and_stays_valid(small_config, demo_scenario):
    planner = KGMT(small_config)
    result = planner.plan(demo_scenario)
    assert result.solved
    out = shortcut_path(
        planner.system, small_config, result.path, demo_scenario.goal,
        demo_scenario.obstacles, ShortcutConfig(rounds=48, candidates=128),
    )
    assert out["cost_after"] <= out["cost_before"] + 1e-5
    assert out["n_edges"] <= len(result.path) - 1
    # hard replay of the shortcut path
    path = out["path"]
    state = jnp.asarray(path[0][:4])[None]
    obstacles = jnp.asarray(demo_scenario.obstacles)
    for k in range(1, len(path)):
        state, valid = rollout_batch(
            planner.system, state, jnp.asarray(path[k][4:])[None],
            small_config.num_disc, obstacles, 20.0, 20.0,
        )
        assert bool(valid[0]), f"shortcut edge {k} invalid on replay"
    end = np.asarray(state[0])
    d = np.hypot(end[0] - demo_scenario.goal[0], end[1] - demo_scenario.goal[1])
    assert d < small_config.goal_threshold
    # stored node states must equal the replayed states (replay invariant)
    np.testing.assert_allclose(end, path[-1][:4], rtol=1e-4, atol=1e-4)


def test_shortcut_rejects_trivial_path(small_config, demo_scenario):
    planner = KGMT(small_config)
    with pytest.raises(ValueError):
        shortcut_path(planner.system, small_config,
                      np.zeros((1, 7), np.float32), demo_scenario.goal,
                      demo_scenario.obstacles)


@pytest.mark.slow
def test_shortcut_generic_over_systems(small_config, demo_scenario):
    """The suffix replay broadcasts the stored control at the system's own
    control dimension (regression for a hardcoded 3)."""
    # narrower wave: point2d needs ~41 iterations; at 2048/iter the tree
    # fills before the goal is reached
    cfg = small_config.replace(system="point2d", rollouts_per_iter=1024)
    planner = KGMT(cfg)
    result = planner.plan(demo_scenario)
    assert result.solved
    out = shortcut_path(planner.system, cfg, result.path,
                        demo_scenario.goal, demo_scenario.obstacles,
                        ShortcutConfig(rounds=16, candidates=64))
    assert out["cost_after"] <= out["cost_before"] + 1e-5
