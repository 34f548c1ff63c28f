"""Plots, t-SNE, parallel eval shard logic, interactive driver plumbing."""

import json

import numpy as np
import pytest

from hulc_tpu.evaluation import plots


@pytest.fixture()
def results(tmp_path):
    data = {
        "0": {
            "avg_seq_len": 1.2,
            "chain_sr": {"1": 0.6, "2": 0.3, "3": 0.2, "4": 0.1, "5": 0.0},
            "task_sr": {"open_drawer": 0.8, "move_slider_left": 0.4},
        },
        "5": {
            "avg_seq_len": 2.6,
            "chain_sr": {"1": 0.8, "2": 0.6, "3": 0.5, "4": 0.4, "5": 0.3},
            "task_sr": {"open_drawer": 0.9, "move_slider_left": 0.7},
        },
    }
    path = tmp_path / "results.json"
    path.write_text(json.dumps(data))
    return path


def test_plots_cli(results, tmp_path):
    out = tmp_path / "plots"
    plots.main(["--results", str(results), "--out-dir", str(out)])
    assert (out / "chain_sr.png").exists()
    assert (out / "avg_seq_len.png").exists()
    assert (out / "task_sr_epoch5.png").exists()


def test_tsne_plot(tmp_path):
    rng = np.random.default_rng(0)
    plans = np.concatenate([rng.normal(0, 1, (20, 16)), rng.normal(5, 1, (20, 16))])
    labels = ["a"] * 20 + ["b"] * 20
    emb = plots.plot_tsne(plans, labels, tmp_path / "tsne.png", perplexity=5)
    assert emb.shape == (40, 2)
    assert (tmp_path / "tsne.png").exists()


def test_run_parallel_shards_cover_all():
    epochs = list(range(7))
    shards = [epochs[i::3] for i in range(3)]
    flat = sorted(e for s in shards for e in s)
    assert flat == epochs


def _write_run(root, name, factor):
    """Fake run dir with results.json incl. task_info counts."""
    run = root / name
    (run / "evaluation").mkdir(parents=True)
    tasks = ["open_drawer", "move_slider_left", "lift_red_block_table", "turn_on_led"]
    data = {}
    for epoch in (0, 5):
        sr = min(0.9, 0.2 * factor + 0.1 * epoch / 5)
        data[str(epoch)] = {
            "avg_seq_len": 5 * sr,
            "chain_sr": {str(k): max(0.0, sr - 0.15 * k) for k in range(1, 6)},
            "task_sr": {t: sr for t in tasks},
            "task_info": {t: {"success": int(sr * 20), "total": 20} for t in tasks},
        }
    (run / "evaluation" / "results.json").write_text(json.dumps(data))
    return run


def test_multi_run_plots(tmp_path):
    for i, name in enumerate(["2026_01_01/run_a", "2026_01_01/run_b", "2026_01_02/run_c"]):
        _write_run(tmp_path, name, factor=i + 1)
    out = tmp_path / "cmp"
    plots.main([
        "--parent-dirs",
        f"{tmp_path}/2026_01_01,{tmp_path}/2026_01_02",
        "--out-dir", str(out),
    ])
    for f in ["avg_seq_len.png", "chain5.png", "chain_sr.png", "task_sr.png",
              "task_categories.png", "best_performance.png"]:
        assert (out / f).exists(), f


def test_multi_run_ranking_order(tmp_path):
    _write_run(tmp_path, "weak", factor=1)
    _write_run(tmp_path, "strong", factor=4)
    multi = plots.load_multi_results([tmp_path / "weak", tmp_path / "strong"])
    runs, labels = plots._ranked(
        multi, list(multi.keys()), lambda r: max(v["avg_seq_len"] for v in r.values())
    )
    assert labels[0] == "strong"
    assert plots.task_category("open_drawer") == "static"
    assert plots.task_category("lift_red_block_table") == "dynamic"


def test_task_rates_prefers_counts():
    epoch_result = {
        "task_sr": {"open_drawer": 1.0},
        "task_info": {"open_drawer": {"success": 3, "total": 5}},
    }
    assert plots._task_rates(epoch_result) == {"open_drawer": 60.0}
    assert plots._task_rates(epoch_result, min_total=10) == {}


class _StubPolicy:
    def __init__(self):
        self.lang_embeddings = {"open_drawer": np.zeros(4, np.float32)}
        self.steps = 0

    def reset(self):
        pass

    def step(self, obs, goal):
        self.steps += 1
        return np.zeros(7, np.float32)


@pytest.fixture()
def scrub_session(tmp_path):
    from hulc_tpu.data.dataset import EpisodeStore
    from hulc_tpu.data.fixtures import make_fixture_dataset
    from hulc_tpu.evaluation.fake_env import FakeCalvinEnv
    from hulc_tpu.evaluation.interactive import InteractiveSession
    from hulc_tpu.evaluation.tasks import SceneObsTasks

    root = make_fixture_dataset(tmp_path / "data", num_episodes=2, episode_len=16)
    store = EpisodeStore(
        root / "training", keys=["rgb_static", "rgb_gripper", "robot_obs", "scene_obs"],
        cache="ram",
    )
    env = FakeCalvinEnv()
    return InteractiveSession(store, env, _StubPolicy(), SceneObsTasks(), ep_len=3,
                              replay_dir=tmp_path / "frames")


def test_interactive_scrubbing(scrub_session):
    s = scrub_session
    assert s.frame == 0
    s.handle("d")
    assert s.frame == 1
    s.handle("q")  # clipped to episode start
    assert s.frame == 0
    s.handle("e")  # clipped to episode end (len 16 -> frame 15)
    assert s.frame == 15
    # env mirrors the scrubbed dataset frame
    want = s.frame_data()["robot_obs"]
    np.testing.assert_allclose(np.asarray(s.env.get_obs()["robot_obs"]), want)
    s.handle("n")
    assert s.ep_idx == 1 and s.frame == 16


def test_interactive_marks_and_rollouts(scrub_session):
    s = scrub_session
    s.handle("s")
    s.handle("e")
    msg = s.handle("w")
    assert "goal marked" in msg and s.goal_frame == 15
    out = s.handle("f")
    assert "visual rollout done" in out
    assert s.policy.steps == 3  # ep_len
    assert s.frame == s.start_frame  # reference: rollout returns to start
    out = s.handle("g open_drawer")
    assert "lang rollout" in out
    out = s.handle("g not_a_real_instruction")
    assert "no embedding" in out  # graceful, not a KeyError crash
    out = s.handle("v")
    assert "saved" in out


def test_moments_study_paired_divergence(tmp_path):
    """scripts/moments_study.py pairing math: same-seed arms matched on
    common logged steps, relative gap computed against the f32 arm."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from moments_study import paired_divergence, read_metric, smooth_tail

    rows = [
        {"mv_dtype": "float32", "seed": 42,
         "loss_curve": {"0": 10.0, "8": 8.0, "16": 4.0},
         "final_total_loss": 4.0, "final_val_mae": 1.0},
        {"mv_dtype": "bfloat16", "seed": 42,
         "loss_curve": {"0": 10.0, "8": 8.4, "24": 3.0},  # step 24 unmatched
         "final_total_loss": 3.9, "final_val_mae": 1.1},
        {"mv_dtype": "float32", "seed": 43,  # unpaired seed: skipped
         "loss_curve": {"0": 9.0}, "final_total_loss": 9.0,
         "final_val_mae": None},
    ]
    pairs = paired_divergence(rows, ["float32", "bfloat16"], [42, 43])
    assert list(pairs) == ["42"]
    p = pairs["42"]
    assert p["matched_points"] == 2  # steps 0 and 8 only
    assert p["max_rel_loss_diff"] == 0.05  # |8.0-8.4|/8.0
    assert p["mean_rel_loss_diff"] == 0.025
    assert p["final_loss"] == {"float32": 4.0, "bfloat16": 3.9}

    # read_metric / smooth_tail on a real-format metrics.jsonl
    run = tmp_path / "run"
    run.mkdir()
    (run / "metrics.jsonl").write_text(
        '{"prefix": "train", "step": 0, "total_loss": 5.0}\n'
        '{"prefix": "val", "step": 0, "vis_mae_pp": 2.0}\n'
        '{"prefix": "train", "step": 8, "total_loss": 3.0}\n'
    )
    series = read_metric(run, "train", "total_loss")
    assert series == [(0, 5.0), (8, 3.0)]
    assert smooth_tail(series, k=1) == 3.0
    assert smooth_tail(series, k=5) == 4.0
