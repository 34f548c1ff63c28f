"""Interactive rollout driver (reference: hulc/evaluation/rollouts_interactive.py).

Dataset-episode scrubbing with env mirroring plus rollout triggering,
keeping the reference's key bindings (rollouts_interactive.py:73-148):

  a / d : scrub one dataset frame back / forward (env reset to that frame)
  q / e : scrub 100 frames back / forward
  s     : mark the current frame as rollout START
  w     : mark the current frame as GOAL; print tasks solved start->here
  r     : re-reset the env to the current frame's scene state
  f     : policy rollout from START toward the visual GOAL (prints solved tasks)
  g <t> : language rollout for task/instruction <t> from the current frame
  v     : save current/start/goal frames (.npy raw arrays; PNG needs no dep here)
  n     : next episode        x: quit

Uses OpenCV windows when a display is available and falls back to a
terminal REPL otherwise (the reference is cv2-only). The command handling
lives in :class:`InteractiveSession` so tests can drive it headlessly.
"""

from __future__ import annotations

import argparse
import pathlib
from typing import Dict, Optional

import numpy as np


class InteractiveSession:
    """Scrub dataset frames, mirror them into the env, trigger rollouts."""

    def __init__(self, store, env, policy, oracle, ep_len: int = 360,
                 replay_dir: Optional[pathlib.Path] = None):
        self.store = store
        self.env = env
        self.policy = policy
        self.oracle = oracle
        self.ep_len = ep_len
        self.replay_dir = pathlib.Path(replay_dir) if replay_dir else None
        self.episodes = list(store.episode_ranges)
        self.ep_idx = 0
        self.frame = self.episodes[0][0]
        self.start_frame = self.frame
        self.goal_frame: Optional[int] = None
        self._start_info = None
        self._sync_env()

    # -- dataset access ----------------------------------------------------

    def frame_data(self, idx: Optional[int] = None) -> Dict[str, np.ndarray]:
        idx = self.frame if idx is None else idx
        return {k: v[0] for k, v in self.store.get_window(idx, 1).items()}

    def _sync_env(self):
        d = self.frame_data()
        self.env.reset(robot_obs=d.get("robot_obs"), scene_obs=d.get("scene_obs"))

    def _goal_obs(self, idx: int) -> Dict:
        d = self.frame_data(idx)
        return {
            "rgb_obs": {
                "rgb_static": d["rgb_static"],
                "rgb_gripper": d.get("rgb_gripper", d["rgb_static"]),
            },
            "robot_obs": d["robot_obs"],
        }

    # -- commands ----------------------------------------------------------

    def seek(self, delta: int) -> str:
        a, b = self.episodes[self.ep_idx]
        self.frame = int(np.clip(self.frame + delta, a, b))
        self._sync_env()
        return f"frame {self.frame} (episode {self.ep_idx}: [{a}, {b}])"

    def next_episode(self) -> str:
        self.ep_idx = (self.ep_idx + 1) % len(self.episodes)
        self.frame = self.episodes[self.ep_idx][0]
        self.start_frame = self.frame
        self.goal_frame = None
        self._start_info = None
        self._sync_env()
        return f"episode {self.ep_idx}: frames {self.episodes[self.ep_idx]}"

    def mark_start(self) -> str:
        self.start_frame = self.frame
        self._start_info = self.env.get_info()
        return f"start marked at frame {self.start_frame}"

    def mark_goal(self) -> str:
        self.goal_frame = self.frame
        solved = []
        if self._start_info is not None:
            solved = sorted(
                self.oracle.get_task_info(self._start_info, self.env.get_info())
            )
        steps = self.frame - self.start_frame
        return f"goal marked at frame {self.goal_frame} ({steps} steps; dataset solves: {solved})"

    def rollout_visual(self) -> str:
        """Policy rollout from the marked start toward the marked goal image
        (reference 'f': get_pp_plan_vision + predict_with_plan loop)."""
        if self.goal_frame is None:
            return "no goal marked (use w)"
        start = self.frame_data(self.start_frame)
        self.env.reset(robot_obs=start.get("robot_obs"), scene_obs=start.get("scene_obs"))
        self.policy.reset()
        start_info = self.env.get_info()
        goal = self._goal_obs(self.goal_frame)
        obs = self.env.get_obs()
        solved = set()
        for _ in range(self.ep_len):
            action = self.policy.step(obs, goal)
            obs = self.env.step(action)
            now = self.oracle.get_task_info(start_info, self.env.get_info())
            solved |= set(now)
        self.frame = self.start_frame
        self._sync_env()
        return f"visual rollout done; solved: {sorted(solved)}"

    def rollout_lang(self, instruction: str, task: Optional[str] = None) -> str:
        """Language-conditioned rollout; success judged by the oracle.

        The oracle judges *task names*, not free text, so the instruction must
        resolve to a known oracle task (it usually IS the task name, since
        lang embeddings are keyed by task). Pass ``task`` explicitly when the
        instruction is free text; otherwise an unresolvable instruction runs
        without success judgment and reports UNJUDGED instead of a bogus FAIL.
        """
        from hulc_tpu.evaluation.lh_eval import rollout
        from hulc_tpu.evaluation.tasks import ALL_TASKS

        embeddings = getattr(self.policy, "lang_embeddings", {}) or {}
        if instruction not in embeddings:
            known = ", ".join(sorted(embeddings)[:8])
            return (
                f"no embedding for {instruction!r}; known instructions include: "
                f"{known or '(none loaded)'}"
            )
        task = task or (instruction if instruction in ALL_TASKS else None)
        start = self.frame_data()
        self.env.reset(robot_obs=start.get("robot_obs"), scene_obs=start.get("scene_obs"))
        if task is None:
            print(
                f"[interactive] warning: {instruction!r} is not a known oracle "
                "task; running the rollout without success judgment "
                "(use 'g <task> <instruction>' to judge against a task)"
            )
            self.policy.reset()
            obs = self.env.get_obs()
            for _ in range(self.ep_len):
                obs = self.env.step(self.policy.step(obs, embeddings[instruction]))
            self._sync_env()
            return f"lang rollout UNJUDGED ({instruction}; no oracle task)"
        ok = rollout(
            self.env, self.policy, task, embeddings[instruction],
            self.oracle, self.ep_len,
        )
        self._sync_env()
        return f"lang rollout {'SUCCESS' if ok else 'FAIL'} ({instruction})"

    def save_frames(self, out_dir: pathlib.Path) -> str:
        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        written = []
        marks = {"current": self.frame, "start": self.start_frame}
        if self.goal_frame is not None:
            marks["goal"] = self.goal_frame
        for name, idx in marks.items():
            img = self.frame_data(idx)["rgb_static"]
            path = out_dir / f"{name}_{idx:07d}.npy"
            np.save(path, img)
            written.append(path.name)
        return f"saved {written} to {out_dir}"

    def handle(self, cmd: str) -> str:
        cmd = cmd.strip()
        if cmd == "a":
            return self.seek(-1)
        if cmd == "d":
            return self.seek(+1)
        if cmd == "q":
            return self.seek(-100)
        if cmd == "e":
            return self.seek(+100)
        if cmd == "s":
            return self.mark_start()
        if cmd == "w":
            return self.mark_goal()
        if cmd == "r":
            self._sync_env()
            return f"env re-reset to frame {self.frame}"
        if cmd == "f":
            return self.rollout_visual()
        if cmd.startswith("g "):
            # "g <instruction>" or "g <task> <instruction>" for free text
            rest = cmd[2:].strip()
            from hulc_tpu.evaluation.tasks import ALL_TASKS

            first, _, tail = rest.partition(" ")
            if tail and first in ALL_TASKS:
                return self.rollout_lang(tail.strip(), task=first)
            return self.rollout_lang(rest)
        if cmd == "v":
            return self.save_frames(self.replay_dir or pathlib.Path("/tmp/hulc_interactive"))
        if cmd == "n":
            return self.next_episode()
        return "keys: a/d +-1  q/e +-100  s start  w goal  f visual rollout  g <instr>  r reset  v save  n next ep  x quit"


def _cv2_loop(session: InteractiveSession) -> None:
    import cv2

    key_cmds = {ord(k): k for k in "adqeswrfvn"}
    while True:
        d = session.frame_data()
        cv2.imshow("current", cv2.cvtColor(d["rgb_static"], cv2.COLOR_RGB2BGR))
        start = session.frame_data(session.start_frame)["rgb_static"]
        cv2.imshow("start", cv2.cvtColor(start, cv2.COLOR_RGB2BGR))
        if session.goal_frame is not None:
            goal = session.frame_data(session.goal_frame)["rgb_static"]
            cv2.imshow("goal", cv2.cvtColor(goal, cv2.COLOR_RGB2BGR))
        k = cv2.waitKey(0) % 256
        if k == ord("x"):
            return
        if k == ord("g"):
            # the one command with an argument: read it from the terminal
            instr = input("instruction> ").strip()
            if instr:
                print(session.handle(f"g {instr}"))
            continue
        if k in key_cmds:
            print(session.handle(key_cmds[k]))


def _terminal_loop(session: InteractiveSession) -> None:
    print(session.handle("?"))
    while True:
        try:
            cmd = input(f"[frame {session.frame}]> ").strip()
        except EOFError:
            return
        if cmd == "x":
            return
        print(session.handle(cmd))


def main(argv=None):
    p = argparse.ArgumentParser(description="interactive rollouts")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--config", default="hulc")
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--dataset-dir", default=None,
                   help="CALVIN split dir to scrub (validation/ recommended)")
    p.add_argument("--cv2", action="store_true", help="force OpenCV windows")
    args = p.parse_args(argv)

    import jax

    from hulc_tpu.config import get_config
    from hulc_tpu.data.dataset import EpisodeStore
    from hulc_tpu.evaluation.fake_env import fake_env_for
    from hulc_tpu.evaluation.policy import HulcPolicy
    from hulc_tpu.evaluation.tasks import ALL_TASKS, SceneObsTasks
    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.training import checkpoint as ckpt

    cfg = get_config(args.config)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    template = init_params(model, jax.random.key(0), batch)
    latest = ckpt.latest_checkpoint(args.run_dir)
    params = ckpt.restore_params(latest, template) if latest else template
    policy = HulcPolicy(cfg, params)
    policy.lang_embeddings = {t: np.zeros(cfg.lang_dim, np.float32) for t in ALL_TASKS}

    if args.dataset_dir:
        store = EpisodeStore(
            args.dataset_dir,
            keys=["rgb_static", "rgb_gripper", "robot_obs", "scene_obs"],
            cache="none",
        )
    else:
        from hulc_tpu.data.fixtures import make_fixture_dataset

        root = make_fixture_dataset(pathlib.Path("/tmp/hulc_interactive_data"), small=False)
        store = EpisodeStore(
            root / "validation",
            keys=["rgb_static", "rgb_gripper", "robot_obs", "scene_obs"],
            cache="none",
        )
    env = fake_env_for(cfg)
    session = InteractiveSession(store, env, policy, SceneObsTasks(), args.ep_len)
    use_cv2 = args.cv2
    if not use_cv2:
        try:
            import cv2  # noqa: F401
            import os

            use_cv2 = bool(os.environ.get("DISPLAY"))
        except ImportError:
            use_cv2 = False
    (_cv2_loop if use_cv2 else _terminal_loop)(session)


if __name__ == "__main__":
    main()
