"""Serving artifacts: export -> model-code-free reload -> action parity.

The exported StableHLO policy must reproduce the live HulcPolicy /
BatchedHulcPolicy action-for-action (same seed, same obs stream), including
across replan boundaries, for both language and visual goals.
"""

import jax
import numpy as np
import pytest

from hulc_tpu.config import get_config
from hulc_tpu.evaluation.batched_eval import BatchedHulcPolicy
from hulc_tpu.evaluation.fake_env import fake_env_for
from hulc_tpu.evaluation.policy import HulcPolicy
from hulc_tpu.models import example_batch, init_params, make_model
from hulc_tpu.serving import ServedBatchedPolicy, ServedPolicy, export_policy
from hulc_tpu.serving.export import flatten_params, unflatten_params


@pytest.fixture(scope="module")
def debug_setup(tmp_path_factory):
    cfg = get_config("hulc_debug", replan_freq=3)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)
    lang_embeddings = {"push_red_block_right": np.random.default_rng(1).normal(size=cfg.lang_dim).astype(np.float32)}
    art_dir = tmp_path_factory.mktemp("artifact")
    export_policy(cfg, params, art_dir, lang_embeddings=lang_embeddings, lanes=3)
    return cfg, params, lang_embeddings, art_dir


def test_params_roundtrip(debug_setup):
    _, params, _, _ = debug_setup
    flat = flatten_params(params)
    rebuilt = unflatten_params(flat)
    assert jax.tree_util.tree_structure(rebuilt) == jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_artifact_files(debug_setup):
    _, _, _, art_dir = debug_setup
    names = {p.name for p in art_dir.iterdir()}
    assert {"meta.json", "params.npz", "replan_lang.jaxexp", "replan_vision.jaxexp",
            "act.jaxexp", "step_batched.jaxexp", "lang_embeddings.npy"} <= names


def test_served_policy_matches_live_lang_goal(debug_setup):
    cfg, params, lang_embeddings, art_dir = debug_setup
    live = HulcPolicy(cfg, params, lang_embeddings=lang_embeddings, seed=7)
    served = ServedPolicy(art_dir, seed=7)
    assert served.lang_embeddings  # bundled in the artifact
    env = fake_env_for(cfg)
    obs = env.reset()
    live.reset()
    served.reset()
    # 7 steps with replan_freq=3 crosses two replan boundaries
    for t in range(7):
        a_live = live.step(obs, "push_red_block_right")
        a_served = served.step(obs, "push_red_block_right")
        np.testing.assert_allclose(a_served, a_live, rtol=1e-5, atol=1e-5)
        obs = env.step(a_live)
    # parity must survive reset(): both policies restart their RNG stream
    # from the base key each episode (lh_eval resets once per chain)
    obs = env.reset()
    live.reset()
    served.reset()
    for t in range(4):
        a_live = live.step(obs, "push_red_block_right")
        a_served = served.step(obs, "push_red_block_right")
        np.testing.assert_allclose(a_served, a_live, rtol=1e-5, atol=1e-5)
        obs = env.step(a_live)


def test_served_policy_matches_live_vision_goal(debug_setup):
    cfg, params, lang_embeddings, art_dir = debug_setup
    live = HulcPolicy(cfg, params, lang_embeddings=lang_embeddings, seed=3)
    served = ServedPolicy(art_dir, seed=3)
    env = fake_env_for(cfg)
    obs = env.reset()
    for _ in range(5):
        env.step(np.asarray([0.5, 0, 0, 0, 0, 0, 1.0]))
    goal = env.get_obs()
    live.reset()
    served.reset()
    for t in range(4):
        a_live = live.step(obs, goal)
        a_served = served.step(obs, goal)
        np.testing.assert_allclose(a_served, a_live, rtol=1e-5, atol=1e-5)
        obs = env.step(a_live)


def test_served_batched_matches_live(debug_setup):
    cfg, params, lang_embeddings, art_dir = debug_setup
    lanes = 3
    live = BatchedHulcPolicy(cfg, params, lanes, seed=11)
    served = ServedBatchedPolicy(art_dir, seed=11)
    assert served.num_envs == lanes
    envs = [fake_env_for(cfg) for _ in range(lanes)]
    obs_batch = [e.reset() for e in envs]
    embs = np.stack([lang_embeddings["push_red_block_right"]] * lanes)
    s_live, s_served = live.initial_state(), served.initial_state()
    replan = np.array([True, True, True])
    for t in range(4):
        a_live, s_live = live.step(obs_batch, embs, s_live, replan)
        a_served, s_served = served.step(obs_batch, embs, s_served, replan)
        np.testing.assert_allclose(a_served, a_live, rtol=1e-5, atol=1e-5)
        obs_batch = [e.step(a) for e, a in zip(envs, a_live)]
        replan = np.array([t % 2 == 0, False, t == 1])  # mixed per-lane replans


def test_served_policy_compiles_once(debug_setup):
    """Steady-state serving must not retrace/recompile: the zero carry and
    batched zero state are committed (runtime._commit) so the deserialized
    call's argument signature is identical on every step. An uncommitted
    zero carry recompiles the whole module on step 2 (~5 s at debug size)."""
    cfg, params, lang_embeddings, art_dir = debug_setup
    served = ServedPolicy(art_dir, seed=0)
    env = fake_env_for(cfg)
    obs = env.reset()
    served.reset()
    for _ in range(5):  # crosses a replan boundary (replan_freq=3)
        obs = env.step(served.step(obs, "push_red_block_right"))
    assert served._art.fn("act")._cache_size() == 1

    batched = ServedBatchedPolicy(art_dir, seed=0)
    obs_batch = [obs] * batched.num_envs
    embs = np.stack([lang_embeddings["push_red_block_right"]] * batched.num_envs)
    state = batched.initial_state()
    replan = np.ones((batched.num_envs,), bool)
    for t in range(3):
        _, state = batched.step(obs_batch, embs, state, replan if t == 0 else ~replan)
    assert batched._step._cache_size() == 1


def test_warmup_compiles_without_disturbing_state(debug_setup):
    cfg, _, lang_embeddings, art_dir = debug_setup
    warmed = ServedPolicy(art_dir, seed=5)
    warmed.warmup()  # compiles lang + vision replans and act
    assert warmed._art.fn("replan_lang")._cache_size() == 1
    assert warmed._art.fn("replan_vision")._cache_size() == 1
    cold = ServedPolicy(art_dir, seed=5)
    env = fake_env_for(cfg)
    obs = env.reset()
    warmed.reset()
    cold.reset()
    for _ in range(4):
        a_w = warmed.step(obs, "push_red_block_right")
        a_c = cold.step(obs, "push_red_block_right")
        np.testing.assert_array_equal(a_w, a_c)  # warmup must not touch RNG/state
        obs = env.step(a_w)
    assert warmed._art.fn("act")._cache_size() == 1

    b = ServedBatchedPolicy(art_dir, seed=5)
    b.warmup()
    assert b._step._cache_size() == 1


def test_served_policy_errors_without_batched_export(debug_setup, tmp_path):
    cfg, params, _, _ = debug_setup
    out = tmp_path / "nolanes"
    export_policy(cfg, params, out, lanes=0)
    with pytest.raises(ValueError, match="no batched step"):
        ServedBatchedPolicy(out)


def test_runtime_import_is_model_code_free():
    """A serving host importing ServedPolicy must not pull in the flax
    model stack (runtime.py is jax+numpy only; export_policy is lazy)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        "from hulc_tpu.serving import ServedPolicy, ServedBatchedPolicy\n"
        "banned = [m for m in sys.modules if m == 'flax' or m.startswith('flax.')\n"
        "          or m.startswith('hulc_tpu.models') or m.startswith('hulc_tpu.evaluation')]\n"
        "assert not banned, f'model code imported: {banned}'\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def test_export_cli_end_to_end(tmp_path):
    """Full deployment path: train a fixture checkpoint -> hulc-tpu-export
    main() restores it and writes an artifact -> ServedPolicy steps. Also
    covers the gcbc (plan_dim=0) export branch the other tests don't."""
    from hulc_tpu.serving.export import main as export_main
    from hulc_tpu.training.train import main as train_main

    run_dir = tmp_path / "run"
    train_main([
        # batch 8/modality: the fused batch must divide the 8-device test mesh
        "--config", "gcbc_debug", "--fixture", "--steps", "2",
        "--batch-size", "8", "--cache", "none", "--run-dir", str(run_dir),
    ])
    art_dir = tmp_path / "artifact"
    export_main([
        "--run-dir", str(run_dir), "--config", "gcbc_debug",
        "--out", str(art_dir), "--platforms", "native",
    ])
    served = ServedPolicy(art_dir, seed=0)
    cfg = get_config("gcbc_debug")
    env = fake_env_for(cfg)
    obs = env.reset()
    served.reset()
    for _ in range(2):
        action = served.step(obs, np.zeros((cfg.lang_dim,), np.float32))
        assert action.shape == (7,) and np.isfinite(action).all()
        obs = env.step(action)


def test_served_batched_drives_lh_eval(debug_setup):
    """A serving artifact can run the full LH-MTLC batched protocol with no
    model code: evaluate_policy_batched(policy=ServedBatchedPolicy). The
    evaluator caps lanes at the artifact's exported E; an under-filled final
    batch (fewer live chains than lanes) is padded inside the served step."""
    from hulc_tpu.evaluation.batched_eval import evaluate_policy_batched
    from hulc_tpu.evaluation.fake_env import FakeCalvinEnv
    from hulc_tpu.evaluation.tasks import ALL_TASKS

    cfg, _, _, art_dir = debug_setup
    served = ServedBatchedPolicy(art_dir, seed=2)

    def scripted_env_factory():
        env = FakeCalvinEnv()
        env.script_scene(
            lambda e, t: e.scene_obs.__setitem__(1, min(0.2, 0.03 * (t + 1)))
        )
        return env

    # 2 chains < 3 exported lanes: the evaluator runs 2 lanes and the served
    # step pads the third internally (exercises the fixed-E padding path)
    sequences = [["open_drawer"]] * 2
    lang = {t: np.zeros(cfg.lang_dim, np.float32) for t in ALL_TASKS}
    results = evaluate_policy_batched(
        cfg, None, scripted_env_factory,
        num_envs=8, ep_len=12, sequences=sequences, lang_embeddings=lang,
        policy=served, epoch=0,
    )
    r = results["0"]
    assert r["chain_sr"]["1"] == 1.0  # scripted drawer opens on every lane
    assert results["_policy"] is served
