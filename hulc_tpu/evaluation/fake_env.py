"""In-process fake CALVIN environment for rollout tests (no PyBullet).

Implements the env contract the evaluator drives (reconstructed from the
reference call sites — SURVEY.md §2.9 CalvinEnvWrapper):

    obs = env.reset(robot_obs=..., scene_obs=...)
    obs = env.step(action)          # 7-dof world-frame action
    info = env.get_info()           # consumed by the tasks oracle

obs = {"rgb_obs": {"rgb_static": (H,W,3) u8, "rgb_gripper": ...},
       "depth_obs": {}, "robot_obs": (15,) float}.

Two dynamics levels:

* default: deliberately trivial (kinematic TCP integration + scripted scene
  hooks) — tests drive the scene with :meth:`script_scene` to emulate task
  success/failure deterministically; the scene never moves on its own.
* ``interactive=True``: a kinematic playtable where the scene RESPONDS to
  the TCP — slider/drawer handles drag their joints, button/switch sites
  toggle the lights, blocks can be grasped (gripper-closing transition in
  range), carried, rotated, pushed, stacked, and dropped into regions.
  ``get_info()`` then also emits real ``block_contacts`` (gripper / table /
  plank / drawer / block_*), which upgrades the SceneObsTasks oracle from
  its position-box fallbacks to contact-driven checks — including the
  otherwise-untestable place_* family (reference: calvin_env's PyBullet
  contact lists, conf/callbacks/rollout/tasks/new_playtable_tasks.yaml).
  Geometry constants are shared with chain_sampler.initial_state_to_obs /
  the SceneObsTasks region boxes so feasibility-filtered protocol chains
  are physically realizable end-to-end (see evaluation/expert.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# ---------------------------------------------------------------------------
# Interactive playtable geometry (shared with evaluation/expert.py).
# Consistent with chain_sampler's reset vectors and tasks.py region boxes:
# table z 0.46; SLIDER_BOX z (0.50, 0.65); DRAWER_BOX z (0.30, 0.42).
# ---------------------------------------------------------------------------
TABLE_Z = 0.46
SLIDER_RANGE = (0.0, 0.28)  # joint: 0 = right, 0.28 = left
DRAWER_RANGE = (0.0, 0.22)  # joint: 0 = closed, 0.22 = open
BUTTON_SITE = np.array([-0.12, -0.10, 0.52], np.float32)  # toggles led (scene[5])
SWITCH_SITE = np.array([0.30, 0.10, 0.54], np.float32)  # toggles bulb (scene[4])
DRAWER_OPENING_XY = ((0.0, 0.35), (-0.1, 0.2))  # blocks pushed here fall in
DRAWER_INSIDE_Z = 0.36
GRASP_R = 0.04  # gripper-closing transition within this of a block grasps it
PUSH_R = 0.05  # TCP xy-near a block at its height drags it along
HANDLE_R = 0.045  # TCP within this of a handle drags the joint
TOGGLE_R = 0.03  # entering this radius of a site toggles its light
STACK_XY = 0.04  # release near another block snaps on top of it
STACK_DZ = 0.05

_BLOCK_SLICES = {"block_red": slice(6, 12), "block_blue": slice(12, 18), "block_pink": slice(18, 24)}


def slider_handle(joint: float) -> np.ndarray:
    """Handle position for slider joint value (moves -x as the door goes left)."""
    return np.array([0.06 - joint, 0.02, 0.53], np.float32)


def drawer_handle(joint: float) -> np.ndarray:
    """Handle position for drawer joint value (moves -y as the drawer opens)."""
    return np.array([0.18, -0.12 - joint, 0.40], np.float32)


class FakeCalvinEnv:
    def __init__(
        self,
        static_px: int = 64,
        gripper_px: int = 48,
        seed: int = 0,
        interactive: bool = False,
    ):
        self.static_px = static_px
        self.gripper_px = gripper_px
        self.interactive = interactive
        self.rng = np.random.default_rng(seed)
        self.robot_obs = np.zeros(15, np.float32)
        self.scene_obs = np.zeros(24, np.float32)
        self.t = 0
        self._scripted = None
        self._held: Optional[str] = None  # interactive: block in the gripper
        self._gripper_closed = False

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
        self._held = None
        self._gripper_closed = self.robot_obs[14] < 0
        return self._obs()

    def step(self, action):
        action = np.asarray(action, np.float32).reshape(-1)
        prev_tcp = self.robot_obs[:3].copy()
        prev_yaw = float(self.robot_obs[5])
        # kinematic relative TCP integration (rel_actions scaling: pos/50, orn/20)
        self.robot_obs[:3] += np.clip(action[:3], -1, 1) / 50.0
        self.robot_obs[3:6] += np.clip(action[3:6], -1, 1) / 20.0
        self.robot_obs[14] = np.sign(action[6]) if action[6] != 0 else self.robot_obs[14]
        if self.interactive:
            self._scene_step(prev_tcp, prev_yaw, float(action[6]))
        if self._scripted is not None:
            self._scripted(self, self.t)
        self.t += 1
        return self._obs()

    def get_info(self) -> Dict:
        info = {"scene_obs": self.scene_obs.copy()}
        if self.interactive:
            info["block_contacts"] = self._block_contacts()
        return info

    def get_obs(self):
        return self._obs()

    # ------------------------------------------------------------------
    # interactive playtable dynamics
    # ------------------------------------------------------------------

    def _block_pos(self, block: str) -> np.ndarray:
        return self.scene_obs[_BLOCK_SLICES[block]][:3]

    def _scene_step(self, prev_tcp: np.ndarray, prev_yaw: float, grip_action: float) -> None:
        tcp = self.robot_obs[:3]
        d_tcp = tcp - prev_tcp
        d_yaw = float(self.robot_obs[5]) - prev_yaw

        # articulated joints: a TCP within handle range drags the joint by its
        # own displacement along the joint axis (handle tracks the joint, so an
        # engaged TCP moving at the same rate stays engaged)
        if np.linalg.norm(prev_tcp - slider_handle(float(self.scene_obs[0]))) < HANDLE_R:
            self.scene_obs[0] = np.clip(self.scene_obs[0] - d_tcp[0], *SLIDER_RANGE)
        if np.linalg.norm(prev_tcp - drawer_handle(float(self.scene_obs[1]))) < HANDLE_R:
            self.scene_obs[1] = np.clip(self.scene_obs[1] - d_tcp[1], *DRAWER_RANGE)

        # light sites: edge-triggered toggle on ENTERING the radius
        for site, joint_i, light_i in ((BUTTON_SITE, 2, 5), (SWITCH_SITE, 3, 4)):
            entered = (
                np.linalg.norm(tcp - site) < TOGGLE_R
                and np.linalg.norm(prev_tcp - site) >= TOGGLE_R
            )
            if entered:
                self.scene_obs[light_i] = 1.0 - round(float(self.scene_obs[light_i]))
                self.scene_obs[joint_i] = self.scene_obs[light_i]

        closing = grip_action < 0 and not self._gripper_closed
        opening = grip_action > 0 and self._gripper_closed

        if self._held is None and closing:
            # grasp the nearest block in range
            cands = [
                (float(np.linalg.norm(tcp - self._block_pos(b))), b)
                for b in _BLOCK_SLICES
            ]
            dist, best = min(cands)
            if dist < GRASP_R:
                self._held = best

        if self._held is not None:
            sl = _BLOCK_SLICES[self._held]
            self.scene_obs[sl][:3] = tcp
            self.scene_obs[sl][5] += d_yaw  # grasped block follows TCP yaw
            if opening:
                self._held = None
        else:
            # pushing: an un-grasped block near the TCP at its own height is
            # dragged along the TCP's horizontal displacement; a CLOSED
            # gripper in grasp range also spins it with the TCP yaw (friction
            # rotation — lets rotate_* tasks complete without a grasp, so the
            # block's "table" contact survives into the next subtask's start
            # snapshot)
            for b in _BLOCK_SLICES:
                pos = self._block_pos(b)
                in_spin_range = np.linalg.norm(prev_tcp - pos) < GRASP_R
                if (
                    np.linalg.norm(prev_tcp[:2] - pos[:2]) < PUSH_R
                    and abs(prev_tcp[2] - pos[2]) < 0.04
                ):
                    pos[:2] += d_tcp[:2]
                    if self._gripper_closed and in_spin_range:
                        self.scene_obs[_BLOCK_SLICES[b]][5] += d_yaw

        # gravity: every free block falls to its highest support below it
        # (pull-down only — a block already resting below a support level,
        # e.g. inside a now-closed drawer, never teleports upward)
        for b in _BLOCK_SLICES:
            if b != self._held:
                self._rest(b)

        if grip_action != 0:
            self._gripper_closed = grip_action < 0

    def _rest(self, block: str) -> None:
        """Drop ``block`` to the highest support under its xy position:
        another block's top, the slider plank, the open-drawer floor (a hole
        in the table), or the table surface."""
        from hulc_tpu.evaluation.tasks import SLIDER_BOX

        pos = self._block_pos(block)
        support = TABLE_Z
        (x0, x1), (y0, y1) = DRAWER_OPENING_XY
        if x0 <= pos[0] <= x1 and y0 <= pos[1] <= y1 and self.scene_obs[1] > 0.12:
            support = DRAWER_INSIDE_Z  # the open drawer is a hole in the table
        (sx0, sx1), (sy0, sy1), (sz0, _) = SLIDER_BOX
        if sx0 <= pos[0] <= sx1 and sy0 <= pos[1] <= sy1 and pos[2] >= sz0:
            support = 0.55  # the slider plank surface
        for other in _BLOCK_SLICES:
            if other == block:
                continue
            opos = self._block_pos(other)
            top = opos[2] + STACK_DZ
            if (
                np.linalg.norm(pos[:2] - opos[:2]) < STACK_XY
                and top > support
                and top <= pos[2] + 1e-6
            ):
                support = top
        if support < pos[2] - 1e-6:
            pos[2] = support

    def _block_contacts(self) -> Dict[str, list]:
        from hulc_tpu.evaluation.tasks import DRAWER_BOX, SLIDER_BOX, _in_box

        out: Dict[str, list] = {}
        for b in _BLOCK_SLICES:
            pos = self._block_pos(b)
            if b == self._held:
                out[b] = ["gripper"]
            elif any(
                o != b
                and np.linalg.norm(pos[:2] - self._block_pos(o)[:2]) < STACK_XY
                and 0.02 < pos[2] - self._block_pos(o)[2] < 0.09
                for o in _BLOCK_SLICES
            ):
                out[b] = [
                    o
                    for o in _BLOCK_SLICES
                    if o != b
                    and np.linalg.norm(pos[:2] - self._block_pos(o)[:2]) < STACK_XY
                    and 0.02 < pos[2] - self._block_pos(o)[2] < 0.09
                ]
            elif _in_box(pos, DRAWER_BOX):
                out[b] = ["drawer"]
            elif _in_box(pos, SLIDER_BOX):
                out[b] = ["plank"]
            elif abs(pos[2] - TABLE_Z) < 0.02:
                out[b] = ["table"]
            else:
                out[b] = []
        return out

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


def fake_env_for(cfg, interactive: bool = False) -> "FakeCalvinEnv":
    """FakeCalvinEnv emitting frames at the config's camera resolutions
    (the constructor defaults are debug-sized; full-size configs crashed
    the policy's encoder on mismatched flatten dims — caught round 2)."""
    pe = cfg.perceptual_encoder
    if pe.rgb_static is None:  # state_only: frames exist but the policy ignores them
        static = 64
    else:
        static = pe.rgb_static.input_size if pe.rgb_static.kind != "clip" else 200
    gripper = pe.rgb_gripper.input_size if pe.rgb_gripper is not None else 84
    return FakeCalvinEnv(static_px=static, gripper_px=gripper, interactive=interactive)
