"""Adapter for the real CALVIN PyBullet environment.

Bridges ``calvin_env``'s PlayTableSimEnv API (observation dicts reconstructed
from the reference call sites — SURVEY.md §2.9 CalvinEnvWrapper /
rollouts_interactive.py:61) to the env contract this framework's evaluators
drive::

    obs  = env.reset(robot_obs=..., scene_obs=...)
    obs  = env.step(action)       # (7,) world-frame relative action
    info = env.get_info()
    obs  = env.get_obs()

Usage with the eval CLI (calvin_env must be importable)::

    python -m hulc_tpu.evaluation.evaluate ... \
        --env-factory hulc_tpu.evaluation.calvin_env_adapter:make_env

The real simulator exposes per-camera observations as
``{"rgb_obs": {...}, "depth_obs": {...}, "robot_obs": (15,),
"scene_obs": (24,)}`` and task success via its own ``Tasks`` oracle, which
our evaluators accept directly (same ``get_task_info_for_set`` surface).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class CalvinEnvAdapter:
    def __init__(self, env, show_gui: bool = False):
        self._env = env
        self._last_obs = None

    # ------------------------------------------------------------------

    def _convert(self, raw: Dict) -> Dict:
        """calvin_env obs -> framework obs (uint8 HWC images, flat states)."""
        rgb = {k: np.asarray(v) for k, v in raw.get("rgb_obs", {}).items()}
        depth = {k: np.asarray(v, np.float32) for k, v in raw.get("depth_obs", {}).items()}
        obs = {
            "rgb_obs": rgb,
            "depth_obs": depth,
            "robot_obs": np.asarray(raw["robot_obs"], np.float32).reshape(-1)[:15],
        }
        return obs

    def reset(self, robot_obs: Optional[np.ndarray] = None, scene_obs: Optional[np.ndarray] = None):
        if robot_obs is not None or scene_obs is not None:
            raw = self._env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
        else:
            raw = self._env.reset()
        self._last_obs = self._convert(raw)
        return self._last_obs

    def step(self, action):
        # calvin_env accepts the 7-tuple relative action directly (scaled
        # like the dataset rel_actions — dataset/README.md:76-80)
        raw, _reward, _done, _info = self._env.step(np.asarray(action, np.float32))
        self._last_obs = self._convert(raw)
        return self._last_obs

    def get_obs(self):
        if self._last_obs is None:
            return self.reset()
        return self._last_obs

    def get_info(self) -> Dict:
        info = self._env.get_info()
        # our SceneObsTasks oracle wants scene_obs; the real calvin Tasks
        # oracle consumes the full info dict — pass both through
        if "scene_obs" not in info:
            scene = getattr(self._env, "get_scene_obs", None)
            if callable(scene):
                info = dict(info, scene_obs=np.asarray(scene(), np.float64))
        return info


def make_env(dataset_path: Optional[str] = None, show_gui: bool = False) -> Tuple[object, object]:
    """--env-factory entry point: (adapted env, calvin Tasks oracle)."""
    import hydra  # calvin_env configures itself via hydra
    from omegaconf import OmegaConf

    from calvin_env.envs.play_table_env import get_env  # noqa: PLC0415

    env = get_env(dataset_path, show_gui=show_gui)
    tasks_cfg = OmegaConf.load(
        hydra.utils.to_absolute_path("conf/callbacks/rollout/tasks/new_playtable_tasks.yaml")
    )
    oracle = hydra.utils.instantiate(tasks_cfg)
    return CalvinEnvAdapter(env), oracle
