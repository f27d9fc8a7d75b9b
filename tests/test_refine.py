"""Differentiable trajectory-refinement tests: refined solutions must remain
hard-valid and should not be worse than the input."""

import numpy as np
import pytest

from cudasbmp_tpu.config import Scenario
from cudasbmp_tpu.planners.kgmt import KGMT
from cudasbmp_tpu.refine import RefineConfig, refine_path


@pytest.mark.slow
def test_refine_demo_solution(small_config, demo_scenario):
    planner = KGMT(small_config)
    result = planner.plan(demo_scenario)
    assert result.solved
    out = refine_path(
        planner.system, small_config, result.path, demo_scenario.goal,
        demo_scenario.obstacles, RefineConfig(iterations=150),
    )
    assert np.isfinite(out["losses"]).all()
    # best-iterate tracking: the returned controls are never worse than the
    # input (chained-Euler gradients are chaotic; late iterates may diverge,
    # the refiner must fall back to the best seen)
    assert out["losses"].min() <= out["losses"][0] + 1e-5
    assert out["valid"], "best-iterate fallback must keep a valid trajectory"
    assert out["cost_after"] <= out["cost_before"] + 1e-5
    # refined controls stay inside the sampling box
    c = out["controls"]
    assert (c[:, 0] >= -5.0).all() and (c[:, 0] <= 5.0).all()
    assert (c[:, 2] >= 0.0).all() and (c[:, 2] <= 1.05).all()


def test_refine_rejects_too_short_path(small_config, demo_scenario):
    planner = KGMT(small_config)
    with pytest.raises(ValueError):
        refine_path(planner.system, small_config,
                    np.zeros((1, 7), np.float32), demo_scenario.goal,
                    demo_scenario.obstacles)
