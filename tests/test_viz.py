"""Visualization smoke tests (MATLAB-script replacement, SURVEY.md §3.4)."""

from pathlib import Path

from cudasbmp_tpu.planners.kgmt import KGMT
from cudasbmp_tpu.io.csv import write_artifacts
from cudasbmp_tpu.viz import plot_metrics, plot_tree


def test_plot_tree_from_result(small_config, demo_scenario, tmp_path):
    result = KGMT(small_config).plan(demo_scenario)
    out = plot_tree(result=result, config=small_config,
                    obstacles=demo_scenario.obstacles,
                    out_path=str(tmp_path / "tree.png"), max_edges=200)
    assert Path(out).stat().st_size > 10_000


def test_plot_tree_with_footprint_overlay(small_config, demo_scenario,
                                          tmp_path):
    cfg = small_config.replace(footprint_width=0.5)
    result = KGMT(cfg).plan(demo_scenario)
    out = plot_tree(result=result, config=cfg,
                    obstacles=demo_scenario.obstacles,
                    out_path=str(tmp_path / "tree_fp.png"), max_edges=200,
                    footprint=cfg.footprint)
    assert Path(out).stat().st_size > 10_000


def test_plot_tree_from_artifacts(small_config, demo_scenario, tmp_path):
    result = KGMT(small_config).plan(demo_scenario)
    write_artifacts(result.state, small_config, tmp_path)
    out = plot_tree(artifacts_dir=tmp_path, config=small_config,
                    out_path=str(tmp_path / "tree2.png"), max_edges=50)
    assert Path(out).exists()


def test_plot_metrics(small_config, demo_scenario, tmp_path):
    result = KGMT(small_config).plan(demo_scenario)
    out = plot_metrics(result.metrics, out_path=str(tmp_path / "m.png"))
    assert Path(out).stat().st_size > 5_000


def test_plot_steps_frames(tmp_path):
    from cudasbmp_tpu.config import KGMTConfig, Scenario
    from cudasbmp_tpu.viz import plot_steps

    cfg = KGMTConfig(num_iterations=6, max_tree_size=2048,
                     rollouts_per_iter=512)
    KGMT(cfg).plan_recorded(Scenario.demo(), tmp_path / "rec", dump_every=2)
    frames = plot_steps(tmp_path / "rec", config=cfg,
                        obstacles=Scenario.demo().obstacles,
                        out_dir=tmp_path / "frames", max_edges=50)
    assert len(frames) >= 1
    assert Path(frames[0]).exists()


def test_plot_sharded_path(tmp_path):
    """Shard-colored stitched-path rendering for sharded results."""
    from cudasbmp_tpu.config import KGMTConfig, Scenario
    from cudasbmp_tpu.parallel.mesh import make_planner_mesh
    from cudasbmp_tpu.parallel.sharded_tree import ShardedTreePlanner
    from cudasbmp_tpu.viz import plot_sharded_path

    cfg = KGMTConfig(num_iterations=60, max_tree_size=2048,
                     rollouts_per_iter=512, adaptive_waves=False)
    res = ShardedTreePlanner(
        cfg, mesh=make_planner_mesh(n_scenario=1, n_tree=8)
    ).plan(Scenario.demo())
    assert res.solved
    out = plot_sharded_path(res, config=cfg,
                            obstacles=Scenario.demo().obstacles,
                            out_path=str(tmp_path / "sp.png"))
    assert (tmp_path / "sp.png").stat().st_size > 10_000
