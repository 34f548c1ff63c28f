"""Evaluation subsystem: tasks oracle, fake env, jitted policy, LH protocol."""

import json

import numpy as np
import jax
import pytest

from hulc_tpu.config import get_config
from hulc_tpu.evaluation.fake_env import FakeCalvinEnv
from hulc_tpu.evaluation.lh_eval import evaluate_policy, get_sequences, rollout
from hulc_tpu.evaluation.policy import HulcPolicy
from hulc_tpu.evaluation.tasks import ALL_TASKS, SceneObsTasks
from hulc_tpu.models import example_batch, init_params, make_model


def _info(scene):
    return {"scene_obs": np.asarray(scene, np.float64)}


def test_all_34_tasks_present():
    assert len(ALL_TASKS) == 34


def test_door_and_light_tasks():
    oracle = SceneObsTasks()
    s = np.zeros(24)
    e = np.zeros(24)
    e[0] = 0.2  # slider moved +
    e[1] = 0.15  # drawer opened
    e[4] = 1.0  # lightbulb on
    done = oracle.get_task_info(_info(s), _info(e))
    assert {"move_slider_left", "open_drawer", "turn_on_lightbulb"} <= done
    assert "move_slider_right" not in done and "close_drawer" not in done
    # reverse
    done2 = oracle.get_task_info(_info(e), _info(s))
    assert {"move_slider_right", "close_drawer", "turn_off_lightbulb"} <= done2


def test_rotate_and_push_tasks():
    oracle = SceneObsTasks()
    s = np.zeros(24)
    s[6:9] = [0.0, 0.0, 0.46]  # red block on table
    e = s.copy()
    e[11] = -np.deg2rad(80)  # rotate right (negative z)
    done = oracle.get_task_info(_info(s), _info(e))
    assert "rotate_red_block_right" in done and "rotate_red_block_left" not in done

    e2 = s.copy()
    e2[6] += 0.15  # pushed right
    done2 = oracle.get_task_info(_info(s), _info(e2))
    assert "push_red_block_right" in done2 and "push_red_block_left" not in done2


def test_lift_task_with_contacts():
    oracle = SceneObsTasks()
    s = np.zeros(24)
    s[12:15] = [0.1, 0.1, 0.46]  # blue block
    e = s.copy()
    e[14] += 0.1  # lifted 10cm
    start = {"scene_obs": s, "block_contacts": {"block_blue": ["table"]}}
    end = {"scene_obs": e, "block_contacts": {"block_blue": ["gripper"]}}
    done = oracle.get_task_info(start, end)
    assert "lift_blue_block_table" in done
    assert "lift_blue_block_drawer" not in done


def test_stack_task():
    oracle = SceneObsTasks()
    s = np.zeros(24)
    s[6:9] = [0.0, 0.0, 0.46]
    s[12:15] = [0.2, 0.0, 0.46]
    e = s.copy()
    e[12:15] = [0.0, 0.0, 0.51]  # blue on red
    assert "stack_block" in oracle.get_task_info(_info(s), _info(e))
    assert "unstack_block" in oracle.get_task_info(_info(e), _info(s))


def test_fake_env_contract():
    env = FakeCalvinEnv()
    obs = env.reset()
    assert obs["rgb_obs"]["rgb_static"].shape == (64, 64, 3)
    assert obs["robot_obs"].shape == (15,)
    obs2 = env.step(np.asarray([1, 0, 0, 0, 0, 0, 1.0]))
    assert obs2["robot_obs"][0] > obs["robot_obs"][0]
    assert "scene_obs" in env.get_info()


@pytest.fixture(scope="module")
def debug_policy():
    cfg = get_config("gcbc_debug")
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)
    lang_embeddings = {t: np.random.default_rng(1).normal(size=384).astype(np.float32) for t in ALL_TASKS}
    return HulcPolicy(cfg, params, lang_embeddings=lang_embeddings)


def test_policy_step_api(debug_policy):
    env = FakeCalvinEnv()
    obs = env.reset()
    debug_policy.reset()
    a1 = debug_policy.step(obs, "open_drawer")
    assert a1.shape == (7,)
    assert np.isfinite(a1).all()
    assert a1[-1] in (-1.0, 1.0)
    # subsequent steps reuse plan + carry
    a2 = debug_policy.step(env.step(a1), "open_drawer")
    assert a2.shape == (7,)


def test_policy_visual_goal(debug_policy):
    env = FakeCalvinEnv()
    obs = env.reset()
    goal_obs = env.get_obs()
    debug_policy.reset()
    a = debug_policy.step(obs, goal_obs)
    assert a.shape == (7,) and np.isfinite(a).all()


def test_rollout_scripted_success(debug_policy):
    """Scripted env: drawer opens over time -> rollout must report success."""
    env = FakeCalvinEnv()
    env.reset()
    env.script_scene(lambda e, t: e.scene_obs.__setitem__(1, min(0.2, 0.01 * (t + 1))))
    oracle = SceneObsTasks()
    ok = rollout(env, debug_policy, "open_drawer", "open_drawer", oracle, ep_len=40)
    assert ok
    # and an impossible task fails
    env.reset()
    env.script_scene(None.__class__ and (lambda e, t: None))
    ok2 = rollout(env, debug_policy, "turn_on_lightbulb", "turn_on_lightbulb", oracle, ep_len=5)
    assert not ok2


def test_evaluate_policy_results_schema(tmp_path, debug_policy):
    env = FakeCalvinEnv()
    # scripted: drawer + slider always move -> those tasks succeed
    env.script_scene(
        lambda e, t: (
            e.scene_obs.__setitem__(1, min(0.2, 0.02 * (t + 1))),
            e.scene_obs.__setitem__(0, min(0.3, 0.02 * (t + 1))),
        )
    )
    sequences = [["open_drawer", "move_slider_left", "turn_on_lightbulb", "close_drawer", "turn_on_led"]] * 2
    results = evaluate_policy(
        debug_policy, env, epoch=7, sequences=sequences, ep_len=15, output_dir=tmp_path
    )
    r = results["7"]
    assert set(r.keys()) == {"avg_seq_len", "chain_sr", "task_sr", "task_info"}
    assert set(r["chain_sr"].keys()) == {"1", "2", "3", "4", "5"}
    # first two chain positions succeed (scripted), third (lightbulb) fails
    assert r["chain_sr"]["1"] == 1.0 and r["chain_sr"]["2"] == 1.0
    assert r["chain_sr"]["3"] == 0.0
    assert r["avg_seq_len"] == 2.0
    assert r["task_sr"]["open_drawer"] == 1.0
    # results.json written and merge-updating
    on_disk = json.loads((tmp_path / "results.json").read_text())
    assert "7" in on_disk


def test_rollout_callback_task_sr(tmp_path):
    """Short-horizon Rollout callback: per-task SR + tasks/average_sr (the
    conf/callbacks/checkpoint/task_sr.yaml monitor source)."""
    import types

    from hulc_tpu.evaluation.rollout_callback import RolloutCallback
    from hulc_tpu.training.trainer import MetricLogger

    cfg = get_config("gcbc_debug")
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)
    env = FakeCalvinEnv()
    # scripted: the drawer opens over time -> open_drawer succeeds, lightbulb fails
    env.script_scene(lambda e, t: e.scene_obs.__setitem__(1, min(0.2, 0.02 * (t + 1))))
    emb = {t: np.zeros(384, np.float32) for t in ("open_drawer", "turn_on_lightbulb")}
    cb = RolloutCallback(env, num_rollouts=2, ep_len=12, lang_embeddings=emb)
    trainer = types.SimpleNamespace(cfg=cfg, logger=MetricLogger(tmp_path))
    state = types.SimpleNamespace(params=params, step=0)
    assert cb.on_epoch_end(trainer, state, epoch=0) is None  # skip_epochs=1
    metrics = cb.on_epoch_end(trainer, state, epoch=1)
    assert metrics["tasks/open_drawer_sr"] == 1.0
    assert metrics["tasks/turn_on_lightbulb_sr"] == 0.0
    assert metrics["tasks/average_sr"] == 0.5


def test_get_sequences_deterministic():
    a = get_sequences(5, seed=3)
    b = get_sequences(5, seed=3)
    assert a == b
    assert all(len(c) == 5 and len(set(c)) == 5 for c in a)


def test_calvin_env_adapter_contract():
    """Adapter converts a calvin_env-shaped mock to our env contract."""
    from hulc_tpu.evaluation.calvin_env_adapter import CalvinEnvAdapter

    class MockCalvinEnv:
        def __init__(self):
            self.scene = np.zeros(24)

        def _obs(self):
            return {
                "rgb_obs": {
                    "rgb_static": np.zeros((200, 200, 3), np.uint8),
                    "rgb_gripper": np.zeros((84, 84, 3), np.uint8),
                },
                "depth_obs": {"depth_static": np.zeros((200, 200))},
                "robot_obs": np.zeros(15),
            }

        def reset(self, robot_obs=None, scene_obs=None):
            if scene_obs is not None:
                self.scene = np.asarray(scene_obs)
            return self._obs()

        def step(self, action):
            self.scene[0] += 0.1
            return self._obs(), 0.0, False, {}

        def get_info(self):
            return {"scene_obs": self.scene.copy()}

    env = CalvinEnvAdapter(MockCalvinEnv())
    obs = env.reset(scene_obs=np.ones(24))
    assert obs["rgb_obs"]["rgb_static"].shape == (200, 200, 3)
    assert obs["robot_obs"].shape == (15,)
    obs2 = env.step(np.zeros(7))
    assert obs2["robot_obs"].dtype == np.float32
    info = env.get_info()
    assert info["scene_obs"][0] > 1.0  # stepped
    assert env.get_obs() is obs2


def test_oracle_calibration_from_traces(tmp_path):
    """calibrate_oracle recovers region boxes from labeled lift episodes and
    the calibrated oracle classifies containment with them."""
    import json

    from hulc_tpu.evaluation import calibrate_oracle as cal
    from hulc_tpu.evaluation.tasks import SceneObsTasks

    rng = np.random.default_rng(0)
    split = tmp_path / "training"
    split.mkdir()
    # ground-truth geometry (deliberately different from the nominal boxes)
    true_drawer = ((0.10, 0.20), (0.00, 0.10), (0.32, 0.36))
    true_slider = ((-0.30, -0.20), (0.05, 0.15), (0.54, 0.60))
    true_table_z = 0.44

    def sample(box):
        return [rng.uniform(lo, hi) for lo, hi in box]

    tasks, ranges = [], []
    frame = 0
    blocks = {"block_red": slice(6, 12), "block_blue": slice(12, 18), "block_pink": slice(18, 24)}
    for i, (task_surf, box) in enumerate(
        [("drawer", true_drawer)] * 12 + [("slider", true_slider)] * 12 + [("table", None)] * 6
    ):
        color = ["red", "blue", "pink"][i % 3]
        scene = rng.uniform(-1, 1, 24)
        pos = sample(box) if box else [rng.uniform(-0.1, 0.3), rng.uniform(-0.1, 0.2), true_table_z]
        scene[blocks[f"block_{color}"]][:] = np.concatenate([pos, rng.uniform(-1, 1, 3)])
        for k in range(2):  # 2-frame "episode" per annotation
            np.savez(split / f"episode_{frame:07d}.npz", scene_obs=scene.astype(np.float32))
            frame += 1
        tasks.append(f"lift_{color}_block_{task_surf}")
        ranges.append((frame - 2, frame - 1))
    np.save(split / "ep_start_end_ids.npy", np.asarray([[0, frame - 1]], np.int64))
    lang_dir = split / "lang_paraphrase-MiniLM-L3-v2"
    lang_dir.mkdir()
    np.save(
        lang_dir / "auto_lang_ann.npy",
        {"language": {"ann": tasks, "task": tasks, "emb": np.zeros((len(tasks), 1, 384), np.float32)},
         "info": {"indx": ranges}},
        allow_pickle=True,
    )

    out = tmp_path / "regions.json"
    cal.main(["--data", str(split), "--out", str(out), "--margin", "0.02"])
    regions = json.loads(out.read_text())
    # recovered boxes must contain the true regions
    for name, true_box in [("drawer_box", true_drawer), ("slider_box", true_slider)]:
        for (lo, hi), (tlo, thi) in zip(regions[name], true_box):
            assert lo <= tlo + 0.04 and hi >= thi - 0.04, (name, regions[name])
    assert abs(regions["table_z"] - true_table_z) < 0.01

    oracle = SceneObsTasks.from_calibration(out)
    def info_for(pos):
        scene = np.zeros(24)
        scene[6:9] = pos
        return {"scene_obs": scene}
    in_drawer = [np.mean(b) for b in true_drawer]
    assert oracle._contacts(info_for(in_drawer), "block_red") == {"drawer"}
    in_slider = [np.mean(b) for b in true_slider]
    assert oracle._contacts(info_for(in_slider), "block_red") == {"plank"}
    assert oracle._contacts(info_for([0.0, 0.0, true_table_z]), "block_red") == {"table"}
    # end-to-end: lift from the (calibrated) drawer succeeds
    end = info_for([in_drawer[0], in_drawer[1], in_drawer[2] + 0.2])
    assert "lift_red_block_drawer" in oracle.get_task_info(info_for(in_drawer), end)


def test_evaluate_policy_tsne_dump(tmp_path, debug_policy):
    """--tsne-dump protocol artifact: tsne_data_<epoch>.npz with
    ids/labels/latent_goals/plans (reference create_plots.py:402-445)."""
    env = FakeCalvinEnv()
    sequences = [["open_drawer", "move_slider_left"], ["turn_on_led", "close_drawer"]]
    tsne_path = tmp_path / "tsne_data_3.npz"
    evaluate_policy(
        debug_policy, env, epoch=3, sequences=sequences, ep_len=3,
        output_dir=tmp_path, tsne_path=tsne_path,
    )
    data = np.load(tsne_path, allow_pickle=True)
    n = len(data["ids"])
    assert n >= 2  # at least the first task of each chain was attempted
    assert data["labels"].shape == (n,)
    assert str(data["labels"][0]) in {"open_drawer", "turn_on_led"}
    assert data["latent_goals"].shape[0] == n and data["latent_goals"].ndim == 2
    assert data["plans"].shape[0] == n and data["plans"].ndim == 2


def test_tsne_figures_from_dump(tmp_path):
    from hulc_tpu.evaluation import plots

    run = tmp_path / "run_x"
    (run / "evaluation").mkdir(parents=True)
    results = {"5": {"avg_seq_len": 2.0, "chain_sr": {str(k): 0.5 for k in range(1, 6)},
                     "task_sr": {}}}
    import json
    (run / "evaluation" / "results.json").write_text(json.dumps(results))
    rng = np.random.default_rng(0)
    np.savez(
        run / "evaluation" / "tsne_data_5.npz",
        ids=np.arange(40),
        labels=np.asarray(["open_drawer"] * 20 + ["move_slider_left"] * 20),
        latent_goals=rng.normal(size=(40, 8)).astype(np.float32),
        plans=np.concatenate([rng.normal(0, 1, (20, 16)), rng.normal(4, 1, (20, 16))]).astype(np.float32),
    )
    written = plots.create_tsne_figures([run], tmp_path / "figs")
    assert len(written) == 1 and written[0].exists()


def test_fake_env_matches_config_sizes():
    """fake_env_for emits frames at the config's camera resolutions (the
    bare constructor is debug-sized; full-size configs crashed the policy
    encoder on mismatched flatten dims — caught in round 2)."""
    from hulc_tpu.evaluation.fake_env import fake_env_for

    env = fake_env_for(get_config("hulc"))
    obs = env.reset()
    assert obs["rgb_obs"]["rgb_static"].shape == (200, 200, 3)
    assert obs["rgb_obs"]["rgb_gripper"].shape == (84, 84, 3)
    env = fake_env_for(get_config("hulc_clip_vision"))
    assert env.reset()["rgb_obs"]["rgb_static"].shape == (200, 200, 3)  # dataset px, not 224
    env = fake_env_for(get_config("gcbc_debug"))
    assert env.reset()["rgb_obs"]["rgb_static"].shape[0] < 200
