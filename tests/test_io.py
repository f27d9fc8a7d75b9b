"""IO tests: configurations/ loading (incl. the files the reference demo
ignores), reference-named artifact dumps, checkpoint round-trip + exact
resume, native CSV fast path."""

import numpy as np
import pytest

from cudasbmp_tpu.config import KGMTConfig, Scenario
from cudasbmp_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from cudasbmp_tpu.io.csv import (
    load_scenario,
    read_obstacles_csv,
    read_sample_csv,
    write_artifacts,
    write_csv,
)
from cudasbmp_tpu.planners.kgmt import KGMT


@pytest.fixture()
def config_dir(tmp_path):
    """A configurations/ tree in the reference layout."""
    (tmp_path / "init").mkdir()
    (tmp_path / "goal").mkdir()
    (tmp_path / "obstacles").mkdir()
    (tmp_path / "numR1").mkdir()
    (tmp_path / "R2").mkdir()
    (tmp_path / "init" / "init.csv").write_text("1.0,1.0,0,0,0,0,0")
    (tmp_path / "goal" / "goal.csv").write_text("9.0,9.0,0,0,0,0,0")
    (tmp_path / "obstacles" / "obstacles.csv").write_text(
        "2,2,4,4\n7,2,9,5\n3,18,6,20\n2,10,4,12\n0,6,18,8\n"
    )
    (tmp_path / "numR1" / "numR1.csv").write_text("16")
    (tmp_path / "R2" / "numR2.csv").write_text("16")
    return tmp_path


def test_load_scenario_honors_all_files(config_dir):
    scenario, grid = load_scenario(config_dir)
    np.testing.assert_allclose(scenario.init[:2], [1.0, 1.0])
    np.testing.assert_allclose(scenario.goal[:2], [9.0, 9.0])
    assert scenario.obstacles.shape == (5, 4)
    np.testing.assert_allclose(scenario.obstacles[4], [0, 6, 18, 8])
    assert grid == {"N": 16, "n": 16}


def test_read_sample_pads_short_rows(tmp_path):
    p = tmp_path / "s.csv"
    p.write_text("3.5,4.5")
    s = read_sample_csv(p)
    assert s.shape == (7,)
    np.testing.assert_allclose(s, [3.5, 4.5, 0, 0, 0, 0, 0])


def test_obstacles_csv_roundtrip(tmp_path):
    obs = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.float32)
    p = tmp_path / "o.csv"
    write_csv(obs, p, cols=4)
    got = read_obstacles_csv(p)
    np.testing.assert_allclose(got, obs)


def test_write_artifacts_names(tmp_path, small_config, demo_scenario):
    result = KGMT(small_config).plan(demo_scenario)
    written = write_artifacts(result.state, small_config, tmp_path)
    names = {p.split("/")[-1] for p in written}
    # the reference's artifact names (KGMT.cu:299-311)
    for required in ["samples.csv", "parentRelations.csv", "G.csv",
                     "R1.csv", "R1Avail.csv", "R1Valid.csv", "R1Invalid.csv",
                     "R1Score.csv", "R2Avail.csv", "R2Valid.csv",
                     "R2Invalid.csv"]:
        assert required in names
    samples = np.loadtxt(tmp_path / "samples.csv", delimiter=",")
    assert samples.shape == (small_config.max_tree_size, 7)
    r1 = np.loadtxt(tmp_path / "R1.csv", delimiter=",")
    assert r1.shape == (small_config.num_r1,)


def test_checkpoint_roundtrip_and_exact_resume(small_config, demo_scenario, tmp_path):
    """Snapshot mid-solve, restore, resume: identical final outcome to an
    uninterrupted run (SURVEY.md §5 failure-recovery plan)."""
    # run A: uninterrupted
    full = KGMT(small_config).plan(demo_scenario)

    # run B: stop after 5 iterations, checkpoint, reload, resume
    cfg_short = small_config.replace(num_iterations=5)
    partial = KGMT(cfg_short).plan(demo_scenario)
    assert not partial.solved
    ckpt = tmp_path / "state.npz"
    save_checkpoint(partial.state, ckpt)
    restored = load_checkpoint(ckpt)
    for name in restored._fields:
        a, b = getattr(partial.state, name), getattr(restored, name)
        if name == "key":
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    resumed = KGMT(small_config).resume(restored, demo_scenario)
    assert resumed.solved == full.solved
    assert resumed.cost == full.cost
    assert resumed.tree_size == full.tree_size
    np.testing.assert_array_equal(resumed.path, full.path)


def test_native_csv_available_and_fast():
    from cudasbmp_tpu.io.native import native_available

    assert native_available(), "native IO library should build in this image"
