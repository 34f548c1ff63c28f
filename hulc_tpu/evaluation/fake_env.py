"""In-process fake CALVIN environment for rollout tests (no PyBullet).

Implements the env contract the evaluator drives (reconstructed from the
reference call sites — SURVEY.md §2.9 CalvinEnvWrapper):

    obs = env.reset(robot_obs=..., scene_obs=...)
    obs = env.step(action)          # 7-dof world-frame action
    info = env.get_info()           # consumed by the tasks oracle

obs = {"rgb_obs": {"rgb_static": (H,W,3) u8, "rgb_gripper": ...},
       "depth_obs": {}, "robot_obs": (15,) float}.

The dynamics are deliberately trivial (kinematic TCP integration + scripted
scene hooks): tests drive the scene with :meth:`script_scene` to emulate
task success/failure deterministically.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class FakeCalvinEnv:
    def __init__(self, static_px: int = 64, gripper_px: int = 48, seed: int = 0):
        self.static_px = static_px
        self.gripper_px = gripper_px
        self.rng = np.random.default_rng(seed)
        self.robot_obs = np.zeros(15, np.float32)
        self.scene_obs = np.zeros(24, np.float32)
        self.t = 0
        self._scripted = None

    # ------------------------------------------------------------------
    # env contract
    # ------------------------------------------------------------------

    def reset(self, robot_obs: Optional[np.ndarray] = None, scene_obs: Optional[np.ndarray] = None):
        if robot_obs is not None:
            self.robot_obs = np.asarray(robot_obs, np.float32).copy()
        else:
            self.robot_obs = np.zeros(15, np.float32)
            self.robot_obs[2] = 0.55  # tcp z above the table
        if scene_obs is not None:
            self.scene_obs = np.asarray(scene_obs, np.float32).copy()
        else:
            self.scene_obs = np.zeros(24, np.float32)
            for sl in (slice(6, 12), slice(12, 18), slice(18, 24)):
                self.scene_obs[sl][:3] = self.rng.uniform(-0.2, 0.2, 3)
                self.scene_obs[sl][2] = 0.46
        self.t = 0
        return self._obs()

    def step(self, action):
        action = np.asarray(action, np.float32).reshape(-1)
        # kinematic relative TCP integration (rel_actions scaling: pos/50, orn/20)
        self.robot_obs[:3] += np.clip(action[:3], -1, 1) / 50.0
        self.robot_obs[3:6] += np.clip(action[3:6], -1, 1) / 20.0
        self.robot_obs[14] = np.sign(action[6]) if action[6] != 0 else self.robot_obs[14]
        if self._scripted is not None:
            self._scripted(self, self.t)
        self.t += 1
        return self._obs()

    def get_info(self) -> Dict:
        return {"scene_obs": self.scene_obs.copy()}

    def get_obs(self):
        return self._obs()

    # ------------------------------------------------------------------

    def script_scene(self, fn) -> None:
        """fn(env, t): mutate env.scene_obs each step (test hook)."""
        self._scripted = fn

    def _obs(self):
        def img(px):
            base = (np.tanh(self.robot_obs[:3]).reshape(1, 1, 3) * 60 + 128).astype(np.uint8)
            return np.broadcast_to(base, (px, px, 3)).copy()

        return {
            "rgb_obs": {
                "rgb_static": img(self.static_px),
                "rgb_gripper": img(self.gripper_px),
            },
            "depth_obs": {},
            "robot_obs": self.robot_obs.copy(),
            # calvin_env exposes scene_obs in the state obs (used only by
            # robot_scene proprioception configs; everyone else ignores it)
            "scene_obs": self.scene_obs.copy(),
        }


def fake_env_for(cfg) -> "FakeCalvinEnv":
    """FakeCalvinEnv emitting frames at the config's camera resolutions
    (the constructor defaults are debug-sized; full-size configs crashed
    the policy's encoder on mismatched flatten dims — caught round 2)."""
    pe = cfg.perceptual_encoder
    if pe.rgb_static is None:  # state_only: frames exist but the policy ignores them
        static = 64
    else:
        static = pe.rgb_static.input_size if pe.rgb_static.kind != "clip" else 200
    gripper = pe.rgb_gripper.input_size if pe.rgb_gripper is not None else 84
    return FakeCalvinEnv(static_px=static, gripper_px=gripper)
