"""Interactive playtable + scripted expert: the success-side proof of the
LH-MTLC pipeline.

The unscripted FakeCalvinEnv's scene never moves, so policy-driven protocol
runs structurally score zero. These tests pin the other half: with
``interactive=True`` dynamics and the ScriptedExpertPolicy, every one of the
34 tasks completes under the SceneObsTasks oracle, feasibility-filtered
chains run end to end, and the batched evaluator's chain/success accounting
produces the nonzero results.json the reference workflow yields with a real
simulator (reference hulc/evaluation/evaluate_policy.py + calvin_env Tasks).
"""

import numpy as np
import pytest

from hulc_tpu.evaluation import chain_sampler
from hulc_tpu.evaluation.expert import ScriptedExpertPolicy, task_embeddings
from hulc_tpu.evaluation.fake_env import FakeCalvinEnv
from hulc_tpu.evaluation.tasks import ALL_TASKS, SceneObsTasks

EMBS = task_embeddings(32)
ORACLE = SceneObsTasks()

BASE = {
    "led": 0, "lightbulb": 0, "slider": "right", "drawer": "open",
    "red_block": "table", "blue_block": "table", "pink_block": "table",
    "grasped": 0,
}
#: tasks whose preconditions never occur at reset (blocks in drawer /
#: grasped / stacked) get a setup chain instead of a solo run
SPECIAL = {
    **{
        f"lift_{c}_block_drawer": (
            {**BASE, f"{c}_block": "drawer"},
            [f"lift_{c}_block_drawer"],
        )
        for c in ("red", "blue", "pink")
    },
    "place_in_slider": (BASE, ["lift_red_block_table", "place_in_slider"]),
    "place_in_drawer": (BASE, ["lift_red_block_table", "place_in_drawer"]),
    "stack_block": (BASE, ["lift_red_block_table", "stack_block"]),
    "unstack_block": ({**BASE, "red_block": "stacked"}, ["unstack_block"]),
}


def _initial_for(task):
    return next(
        st
        for st in chain_sampler.valid_initial_states()
        if chain_sampler.feasible_effects(st, task)
    )


def _run_chain(chain, initial, ep_len=300):
    env = FakeCalvinEnv(interactive=True)
    robot, scene = chain_sampler.initial_state_to_obs(initial)
    obs = env.reset(robot_obs=robot, scene_obs=scene)
    policy = ScriptedExpertPolicy(1, EMBS)
    state = policy.initial_state()
    start_info = env.get_info()
    pos = steps = 0
    replan = np.ones(1, bool)
    while pos < len(chain):
        task = chain[pos]
        actions, state = policy.step([obs], np.stack([EMBS[task]]), state, replan)
        replan = np.zeros(1, bool)
        obs = env.step(actions[0])
        steps += 1
        if task in ORACLE.get_task_info_for_set(start_info, env.get_info(), {task}):
            pos += 1
            start_info = env.get_info()
            replan = np.ones(1, bool)
            steps = 0
        elif steps >= ep_len:
            break
    return pos


@pytest.mark.parametrize("task", ALL_TASKS)
def test_expert_solves_every_task(task):
    if task in SPECIAL:
        initial, chain = SPECIAL[task]
    else:
        initial, chain = _initial_for(task), [task]
    assert _run_chain(chain, initial) == len(chain), task


def test_expert_chains_through_sampler():
    pairs = chain_sampler.get_sequences(12, seed=3)
    done = sum(_run_chain(chain, initial) for initial, chain in pairs)
    assert done >= 0.9 * 12 * 5  # near-perfect through feasibility-filtered chains


def test_expert_through_batched_evaluator(tmp_path):
    """The production accounting path (evaluate_policy_batched) reports the
    expert's nonzero successes with the exact results.json schema."""
    import json

    from hulc_tpu.config import get_config
    from hulc_tpu.evaluation.batched_eval import evaluate_policy_batched

    cfg = get_config("hulc_debug")
    embs = task_embeddings(cfg.lang_dim)
    pairs = chain_sampler.get_sequences(8, seed=5)
    sequences = [chain for _, chain in pairs]
    envs = [FakeCalvinEnv(interactive=True, seed=i) for i in range(4)]
    initial_states = chain_sampler.resets_for_env(pairs, envs[0])
    policy = ScriptedExpertPolicy(4, embs)
    results = evaluate_policy_batched(
        cfg, None,
        num_sequences=8, num_envs=4, ep_len=240,
        oracle=SceneObsTasks(), sequences=sequences,
        lang_embeddings=embs, epoch=0, output_dir=tmp_path,
        envs=envs, policy=policy, initial_states=initial_states,
    )
    r = results["0"]
    assert r["avg_seq_len"] > 3.5
    assert r["chain_sr"]["1"] > 0.8
    on_disk = json.loads((tmp_path / "results.json").read_text())
    assert set(on_disk["0"].keys()) == {"avg_seq_len", "chain_sr", "task_sr", "task_info"}


# ---------------------------------------------------------------------------
# interactive dynamics unit behaviors
# ---------------------------------------------------------------------------


def _interactive_env(scene=None):
    env = FakeCalvinEnv(interactive=True)
    robot, base_scene = chain_sampler.initial_state_to_obs(BASE)
    env.reset(robot_obs=robot, scene_obs=scene if scene is not None else base_scene)
    return env


def test_grasp_requires_closing_transition_in_range():
    env = _interactive_env()
    block = env.scene_obs[6:9].copy()
    # teleport the TCP onto the red block, already-closed gripper: no grasp
    env.robot_obs[:3] = block
    env._gripper_closed = True
    env.step(np.array([0, 0, 0, 0, 0, 0, -1.0]))
    assert env._held is None
    # opening then closing again IS a transition: grasps
    env.step(np.array([0, 0, 0, 0, 0, 0, 1.0]))
    env.step(np.array([0, 0, 0, 0, 0, 0, -1.0]))
    assert env._held == "block_red"
    info = env.get_info()
    assert info["block_contacts"]["block_red"] == ["gripper"]


def test_gravity_pull_down_only():
    env = _interactive_env()
    # a block floating above the table falls to it
    env.scene_obs[6:9] = (0.0, 0.3, 0.6)
    env.step(np.zeros(7))
    assert abs(env.scene_obs[8] - 0.46) < 1e-6
    # a block inside the drawer does NOT teleport up when the drawer closes
    env.scene_obs[6:9] = (0.18, 0.05, 0.36)
    env.scene_obs[1] = 0.0  # drawer closed
    env.step(np.zeros(7))
    assert abs(env.scene_obs[8] - 0.36) < 1e-6


def test_light_toggle_is_edge_triggered():
    from hulc_tpu.evaluation.fake_env import BUTTON_SITE

    env = _interactive_env()
    assert env.scene_obs[5] == 0
    env.robot_obs[:3] = BUTTON_SITE + np.array([0, 0, 0.05])
    env.step(np.array([0, 0, -1.0, 0, 0, 0, 0]))  # descend into the radius
    env.step(np.array([0, 0, -1.0, 0, 0, 0, 0]))
    assert env.scene_obs[5] == 1  # toggled once on entry
    env.step(np.zeros(7))  # staying inside does not re-toggle
    assert env.scene_obs[5] == 1


def test_scripted_scene_still_inert_without_interactive():
    env = FakeCalvinEnv()  # default: unscripted scene never moves
    robot, scene = chain_sampler.initial_state_to_obs(BASE)
    env.reset(robot_obs=robot, scene_obs=scene)
    before = env.scene_obs.copy()
    for _ in range(5):
        env.step(np.array([1, 1, -1, 0, 0, 0, -1.0], np.float32))
    np.testing.assert_array_equal(env.scene_obs, before)
    assert "block_contacts" not in env.get_info()
