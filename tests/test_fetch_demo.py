"""Real-physics demo: MuJoCo Fetch adapter contract + end-to-end pipeline.

These run genuine MuJoCo physics (no rendering needed for the state-only
path) — the only tests in the suite whose environment is not scripted.
"""

import numpy as np
import pytest

pytest.importorskip("mujoco")
pytest.importorskip("gymnasium_robotics")

from hulc_tpu.evaluation.gym_env_adapter import (  # noqa: E402
    FETCH_TASK,
    FetchCalvinEnv,
    GymSuccessOracle,
    scripted_expert,
)


@pytest.fixture(scope="module")
def env():
    e = FetchCalvinEnv(images=False, seed=0)
    yield e
    e.close()


def test_adapter_contract(env):
    obs = env.reset()
    assert set(obs) == {"rgb_obs", "depth_obs", "robot_obs", "scene_obs"}
    assert obs["robot_obs"].shape == (15,) and obs["robot_obs"].dtype == np.float32
    assert obs["scene_obs"].shape == (24,) and obs["scene_obs"].dtype == np.float32
    assert obs["rgb_obs"] == {}  # images=False renders nothing
    # object sits on the table in front of the gripper, goal is set
    assert np.linalg.norm(obs["scene_obs"][0:3]) > 0.1
    assert np.linalg.norm(obs["scene_obs"][6:9]) > 0.1
    assert env.get_info() == {"is_success": False}
    obs2 = env.step(np.array([1, 0, 0, 0, 0, 0, 1], np.float32))
    # +x action moves the gripper in +x (real physics responds to the action)
    assert obs2["robot_obs"][0] > obs["robot_obs"][0]
    assert obs2["robot_obs"][14] == 1.0  # last grip command tracked


def test_scripted_expert_solves_real_physics(env):
    oracle = GymSuccessOracle()
    solved = 0
    for ep in range(3):
        obs = env.reset()
        start = env.get_info()
        for _ in range(60):
            obs = env.step(scripted_expert(obs))
            if FETCH_TASK in oracle.get_task_info_for_set(start, env.get_info(), {FETCH_TASK}):
                solved += 1
                break
    assert solved == 3  # the expert reliably picks and places


def test_fetch_demo_pipeline(tmp_path):
    """collect -> CALVIN-schema dataset -> train (2 steps) -> closed-loop
    eval, all through the standard stack."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from fetch_demo import main

    main([
        "all", "--root", str(tmp_path), "--config", "fetch_state_debug",
        "--episodes", "3", "--ep-len", "40", "--steps", "2",
        "--batch-size", "8", "--eval-episodes", "1",
    ])
    # dataset landed in the exact CALVIN layout the loaders expect
    train_dir = tmp_path / "dataset" / "training"
    assert (train_dir / "ep_start_end_ids.npy").exists()
    assert (train_dir / "statistics.yaml").exists()
    assert (train_dir / "lang_paraphrase-MiniLM-L3-v2" / "auto_lang_ann.npy").exists()
    frame = np.load(train_dir / "episode_0000000.npz")
    assert set(frame.files) == {"actions", "rel_actions", "robot_obs", "scene_obs"}
    # real statistics were computed (object position varies across episodes)
    from hulc_tpu.data.dataset import DatasetStatistics

    stats = DatasetStatistics.load(train_dir)
    assert stats.scene_obs_std[0] > 1e-3  # object x
    assert (tmp_path / "run" / "saved_models").exists()
