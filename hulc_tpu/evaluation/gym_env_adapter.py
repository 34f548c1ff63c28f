"""Real-physics CALVIN-contract adapter: MuJoCo Fetch via gymnasium-robotics.

The reference's environment surface is `calvin_env.envs.play_table_env.
PlayTableSimEnv` wrapped by calvin_agent's `CalvinEnvWrapper` (SURVEY §2.9),
which is PyBullet-only and absent here. This adapter proves the framework's
env contract — ``reset()/step(action7)/get_obs()/get_info()`` with
``{rgb_obs, robot_obs, scene_obs}`` observations — against a *real* physics
simulator (MuJoCo, headless EGL rendering), not just the scripted
`FakeCalvinEnv`. Together with :func:`scripted_expert` it powers the full
real-physics end-to-end demo (scripts/fetch_demo.py): collect play data in
the CALVIN npz schema -> train -> closed-loop eval.

Observation mapping (FetchPickAndPlace obs -> CALVIN layout):

  robot_obs (15): [0:3] gripper xyz, [3:6] zeros (no tcp orientation in
      Fetch's obs), [6] gripper width (both finger joints), [7:14] zeros
      (no joint readout), [14] last commanded gripper action (CALVIN slot).
  scene_obs (24): [0:3] object xyz, [3:6] object rotation (euler),
      [6:9] goal xyz (the desired_goal — CALVIN's scene_obs likewise encodes
      full scene state), rest zeros.
  rgb_obs: rgb_static = the env's rgb_array render at ``render_px``
      (images=False skips rendering entirely for state-only pipelines).

Action mapping: the 7-dof CALVIN rel_action [dx, dy, dz, da, db, dg, grip]
drives Fetch's 4-dof [dx, dy, dz, grip] via slots [0, 1, 2, 6]; the three
orientation slots are ignored (Fetch's end effector is orientation-locked).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

FETCH_TASK = "pick_and_place"
FETCH_INSTRUCTION = "pick up the block and place it at the goal"


class FetchCalvinEnv:
    """CalvinEnvWrapper-contract env over gymnasium-robotics Fetch."""

    def __init__(
        self,
        env_id: str = "FetchPickAndPlace-v4",
        render_px: int = 84,
        images: bool = True,
        seed: int = 0,
    ):
        os.environ.setdefault("MUJOCO_GL", "egl")
        import gymnasium as gym
        import gymnasium_robotics  # noqa: F401 — registers Fetch envs

        kwargs = {"max_episode_steps": 10_000}  # caller bounds rollouts
        if images:
            kwargs.update(render_mode="rgb_array", width=render_px, height=render_px)
        self.env = gym.make(env_id, **kwargs)
        self.images = images
        self.render_px = render_px
        self._seed = seed
        self._raw = None
        self._info: Dict = {"is_success": False}
        self._last_grip = 1.0

    # ------------------------------------------------------------------
    # env contract (matches FakeCalvinEnv / calvin_env_adapter)
    # ------------------------------------------------------------------

    def reset(self, robot_obs=None, scene_obs=None):
        # Fetch tasks are reset by the env's own sampler; CALVIN-style
        # explicit state resets are not expressible through gymnasium's API
        # (initial_states from the chain sampler don't apply here).
        self._raw, _ = self.env.reset(seed=self._seed)
        self._seed += 1
        self._info = {"is_success": False}
        self._last_grip = 1.0
        return self._obs()

    def step(self, action):
        action = np.asarray(action, np.float32).reshape(-1)
        fetch_action = np.clip(action[[0, 1, 2, 6]], -1.0, 1.0)
        self._last_grip = float(np.sign(fetch_action[3]) or self._last_grip)
        self._raw, _, _, _, info = self.env.step(fetch_action)
        self._info = {"is_success": bool(info.get("is_success", False))}
        return self._obs()

    def get_info(self) -> Dict:
        return dict(self._info)

    def get_obs(self):
        return self._obs()

    def close(self) -> None:
        self.env.close()

    # ------------------------------------------------------------------

    def _obs(self):
        o = self._raw["observation"]
        robot_obs = np.zeros(15, np.float32)
        robot_obs[0:3] = o[0:3]  # gripper xyz
        robot_obs[6] = o[9:11].sum()  # gripper width (finger joints)
        robot_obs[14] = self._last_grip
        scene_obs = np.zeros(24, np.float32)
        scene_obs[0:3] = o[3:6]  # object xyz
        scene_obs[3:6] = o[11:14]  # object rotation
        scene_obs[6:9] = self._raw["desired_goal"]
        obs = {
            "rgb_obs": {},
            "depth_obs": {},
            "robot_obs": robot_obs,
            "scene_obs": scene_obs,
        }
        if self.images:
            obs["rgb_obs"]["rgb_static"] = np.asarray(self.env.render(), np.uint8)
        return obs


class GymSuccessOracle:
    """Task oracle backed by the gym env's own success signal — the
    real-physics analogue of `SceneObsTasks` (which reads CALVIN scene_obs).
    Matches the oracle interface lh_eval/batched_eval call."""

    def get_task_info_for_set(self, start_info: Dict, end_info: Dict, tasks):
        return {FETCH_TASK} & set(tasks) if end_info.get("is_success") else set()


def scripted_expert(obs: Dict, rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Hand-coded pick-and-place expert over the CALVIN-mapped observation
    (solves FetchPickAndPlace in <60 steps, measured 20/20). Emits the 7-dof
    CALVIN rel_action the adapter consumes; optional rng adds exploration
    noise so collected play data isn't a single deterministic trajectory."""
    rob, scene = obs["robot_obs"], obs["scene_obs"]
    grip, width = rob[0:3], rob[6]
    obj, goal = scene[0:3], scene[6:9]
    above = obj + np.array([0.0, 0.0, 0.06], np.float32)
    if (
        np.linalg.norm(obj - grip) > 0.015
        and np.linalg.norm(grip - above) > 0.02
        and np.linalg.norm(grip[:2] - obj[:2]) > 0.02
    ):
        d, g = above - grip, 1.0  # move above the object, gripper open
    elif np.linalg.norm(obj - grip) > 0.015:
        d, g = obj - grip, 1.0  # descend onto it
    elif width > 0.052:
        d, g = np.zeros(3, np.float32), -1.0  # close the gripper
    else:
        d, g = goal - obj, -1.0  # carry to the goal
    if rng is not None:
        d = d + rng.normal(0.0, 0.004, 3)
    action = np.zeros(7, np.float32)
    action[0:3] = np.clip(d * 12.0, -1.0, 1.0)
    action[6] = g
    return action
