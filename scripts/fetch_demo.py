"""Real-physics end-to-end demo: MuJoCo Fetch pick-and-place.

The full HULC workflow against genuine physics instead of CALVIN's
PyBullet (absent here): a scripted expert collects play data through the
CALVIN-contract adapter (evaluation/gym_env_adapter.py), episodes are
written in the exact CALVIN npz schema (per-frame episode_XXXXXXX.npz,
ep_start_end_ids.npy, statistics.yaml, lang_annotations), the standard
trainer learns a state-based GCBC policy from them, and the standard
closed-loop rollout (lh_eval.rollout + HulcPolicy) measures real task
success via the env's own oracle.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/fetch_demo.py all \
        --root /tmp/fetch_demo --episodes 200 --steps 2000

Subcommands: collect | train | eval | all.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")

EP_FMT = "episode_{:07d}.npz"
LANG_FOLDER = "lang_paraphrase-MiniLM-L3-v2"  # loader default (CALVIN layout)


def _write_stats(split_dir: pathlib.Path, robot_obs: np.ndarray, scene_obs: np.ndarray):
    """statistics.yaml in the CALVIN transform-targets layout, with real
    per-dimension statistics (std floored: constant dims — unused CALVIN
    slots — must not blow up normalization)."""

    def stats(x):
        mean = x.mean(0)
        std = np.maximum(x.std(0), 1e-3)
        return [round(float(v), 6) for v in mean], [round(float(v), 6) for v in std]

    rob_mean, rob_std = stats(robot_obs)
    scene_mean, scene_std = stats(scene_obs)
    (split_dir / "statistics.yaml").write_text(
        "robot_obs:\n"
        "  - _target_: calvin_agent.utils.transforms.NormalizeVector\n"
        f"    mean: {rob_mean}\n"
        f"    std: {rob_std}\n"
        "scene_obs:\n"
        "  - _target_: calvin_agent.utils.transforms.NormalizeVector\n"
        f"    mean: {scene_mean}\n"
        f"    std: {scene_std}\n"
        f"act_min_bound: {[-1.0] * 7}\n"
        f"act_max_bound: {[1.0] * 7}\n"
    )


def _write_lang(split_dir: pathlib.Path, ranges, is_validation: bool):
    from hulc_tpu.data.language import HashEmbedder
    from hulc_tpu.evaluation.gym_env_adapter import FETCH_INSTRUCTION, FETCH_TASK

    emb = HashEmbedder(384).embed([FETCH_INSTRUCTION])[None, 0]  # (1, 384)
    lang_dir = split_dir / LANG_FOLDER
    lang_dir.mkdir(exist_ok=True)
    anns, tasks, embs, indxs = [], [], [], []
    for start, end in ranges:
        anns.append(FETCH_INSTRUCTION)
        tasks.append(FETCH_TASK)
        embs.append(emb)
        indxs.append((int(start), int(end)))
    np.save(
        lang_dir / "auto_lang_ann.npy",
        {"language": {"ann": anns, "task": tasks, "emb": np.stack(embs)},
         "info": {"indx": indxs}},
        allow_pickle=True,
    )
    if is_validation:
        np.save(
            lang_dir / "embeddings.npy",
            {FETCH_TASK: {"ann": [FETCH_INSTRUCTION], "emb": emb}},
            allow_pickle=True,
        )


def collect_split(
    split_dir: pathlib.Path,
    episodes: int,
    ep_len: int,
    images: bool,
    seed: int,
    is_validation: bool,
    noise: float = 0.004,
) -> float:
    """Run the scripted expert; returns its success rate (sanity signal)."""
    from hulc_tpu.evaluation.gym_env_adapter import FetchCalvinEnv, scripted_expert

    split_dir.mkdir(parents=True, exist_ok=True)
    env = FetchCalvinEnv(images=images, seed=seed)
    rng = np.random.default_rng(seed)
    ranges, all_rob, all_scene = [], [], []
    frame_idx, successes = 0, 0
    for _ in range(episodes):
        start = frame_idx
        obs = env.reset()
        for _t in range(ep_len):
            action = scripted_expert(obs, rng if noise > 0 else None)
            frame = {
                "actions": action,
                "rel_actions": action,
                "robot_obs": obs["robot_obs"],
                "scene_obs": obs["scene_obs"],
            }
            if images:
                frame["rgb_static"] = obs["rgb_obs"]["rgb_static"]
            np.savez(split_dir / EP_FMT.format(frame_idx), **frame)
            all_rob.append(obs["robot_obs"])
            all_scene.append(obs["scene_obs"])
            frame_idx += 1
            obs = env.step(action)
        successes += bool(env.get_info()["is_success"])
        ranges.append([start, frame_idx - 1])  # inclusive, like CALVIN
    env.close()
    np.save(split_dir / "ep_start_end_ids.npy", np.asarray(ranges, np.int64))
    _write_stats(split_dir, np.stack(all_rob), np.stack(all_scene))
    _write_lang(split_dir, ranges, is_validation)
    return successes / episodes


def cmd_collect(args) -> None:
    root = pathlib.Path(args.root) / "dataset"
    t0 = time.time()
    sr_train = collect_split(
        root / "training", args.episodes, args.ep_len, args.images, args.seed, False,
    )
    sr_val = collect_split(
        root / "validation", max(2, args.episodes // 10), args.ep_len, args.images,
        args.seed + 10_000, True,
    )
    print(
        f"[collect] {args.episodes}+{max(2, args.episodes // 10)} episodes "
        f"x {args.ep_len} steps -> {root} in {time.time() - t0:.0f}s "
        f"(expert SR train {sr_train:.2f} / val {sr_val:.2f})"
    )


def cmd_train(args) -> None:
    from hulc_tpu.training.train import main as train_main

    argv = [
        "--config", args.config,
        "--data-dir", str(pathlib.Path(args.root) / "dataset"),
        "--run-dir", str(pathlib.Path(args.root) / "run"),
        "--steps", str(args.steps),
        "--batch-size", str(args.batch_size),
        "--cache", "ram",
        "--bf16",
    ]
    if args.echo > 1:
        argv += ["--echo-factor", str(args.echo)]
    train_main(argv)


def cmd_eval(args) -> None:
    import jax

    from hulc_tpu.config import get_config
    from hulc_tpu.data.dataset import DatasetStatistics
    from hulc_tpu.evaluation.gym_env_adapter import (
        FETCH_TASK, FetchCalvinEnv, GymSuccessOracle,
    )
    from hulc_tpu.evaluation.lh_eval import rollout
    from hulc_tpu.evaluation.policy import HulcPolicy
    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.training import checkpoint as ckpt

    root = pathlib.Path(args.root)
    cfg = get_config(args.config)
    model = make_model(cfg)
    template = init_params(
        model, jax.random.key(0),
        {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)},
    )
    path = ckpt.latest_checkpoint(root / "run")
    if path is None:
        raise SystemExit(f"no checkpoint under {root / 'run'} — run train first")
    params = ckpt.restore_params(path, template)
    stats = DatasetStatistics.load(root / "dataset" / "validation")

    from hulc_tpu.data.language import load_task_embeddings

    lang_embeddings = load_task_embeddings(
        root / "dataset" / "validation" / LANG_FOLDER / "embeddings.npy"
    )
    if args.served:
        # deployment-grade path: AOT-export the checkpoint, then serve it
        # with NO model code in the loop (serving/runtime.py)
        from hulc_tpu.serving import ServedPolicy, export_policy

        export_policy(
            cfg, params, root / "artifact",
            statistics=stats, lang_embeddings=lang_embeddings,
        )
        policy = ServedPolicy(root / "artifact", seed=args.seed)
    else:
        policy = HulcPolicy(
            cfg, params, statistics=stats, lang_embeddings=lang_embeddings, seed=args.seed
        )
    vision = cfg.perceptual_encoder.rgb_static is not None
    env = FetchCalvinEnv(
        images=vision,
        render_px=cfg.perceptual_encoder.rgb_static.input_size if vision else 84,
        seed=args.seed + 50_000,
    )
    oracle = GymSuccessOracle()
    successes = 0
    t0 = time.time()
    for ep in range(args.eval_episodes):
        env.reset()  # rollout() assumes a freshly-reset env (lh_eval contract)
        successes += rollout(env, policy, FETCH_TASK, FETCH_TASK, oracle, args.ep_len)
    env.close()
    sr = successes / args.eval_episodes
    mode = "served artifact" if args.served else "live policy"
    print(
        f"[eval] {args.config} ({mode}) closed-loop on real MuJoCo physics: "
        f"{successes}/{args.eval_episodes} = SR {sr:.2f} "
        f"({time.time() - t0:.0f}s, ckpt {path.name})"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("cmd", choices=["collect", "train", "eval", "all"])
    p.add_argument("--root", default="/tmp/fetch_demo")
    p.add_argument("--config", default="fetch_state")
    p.add_argument("--episodes", type=int, default=200)
    p.add_argument("--ep-len", type=int, default=60)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--eval-episodes", type=int, default=50)
    p.add_argument("--images", action="store_true", help="render + store rgb_static")
    p.add_argument("--echo", type=int, default=1, help="data-echo factor (feed-bound rigs)")
    p.add_argument("--served", action="store_true",
                   help="eval via an exported StableHLO artifact (ServedPolicy)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.cmd in ("collect", "all"):
        cmd_collect(args)
    if args.cmd in ("train", "all"):
        cmd_train(args)
    if args.cmd in ("eval", "all"):
        cmd_eval(args)


if __name__ == "__main__":
    main()
