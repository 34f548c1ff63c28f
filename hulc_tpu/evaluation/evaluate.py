"""Evaluation CLI (reference: hulc/evaluation/evaluate_policy.py).

Checkpoint selection over a training run dir (last / all / specific epochs),
policy reconstruction, LH-MTLC protocol, results.json output.

By default drives the in-process FakeCalvinEnv INTERACTIVE playtable (the
kinematic scene where success is actually achievable — a zero score means
the policy failed, not that the env was inert; use --inert-env for the
scripted-scene plumbing variant). For the real CALVIN simulator, pass
--env-factory pointing at a "module:function" returning (env, oracle) with
the env contract of hulc_tpu.evaluation.fake_env and a calvin_env-compatible
Tasks oracle.
"""

from __future__ import annotations

import argparse
import importlib
import json
import pathlib

import numpy as np


def _load_env_factory(spec):
    mod_name, fn_name = spec.split(":")
    return getattr(importlib.import_module(mod_name), fn_name)


def main(argv=None):
    from hulc_tpu.utils.tunnel import compact_tunnel_journal

    compact_tunnel_journal()  # long eval loops retain all H2D otherwise; utils/tunnel.py

    p = argparse.ArgumentParser(description="hulc_tpu LH-MTLC evaluation")
    p.add_argument("--run-dir", required=True, help="training run dir with saved_models/")
    p.add_argument("--config", default="hulc")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE", dest="overrides",
        help="dotted config override (repeatable); must match the trained "
        "checkpoint's architecture, e.g. --set action_decoder.hidden_size=4096",
    )
    p.add_argument(
        "--checkpoint",
        default="last",
        help="last | best | all | comma-separated epochs ('best' uses the "
        "monitored-checkpoint journal written by the trainer)",
    )
    p.add_argument(
        "--monitor-preset",
        default=None,
        help="checkpoint preset for --checkpoint best (default: lh_sr)",
    )
    p.add_argument("--num-sequences", type=int, default=1000)
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--dataset-dir", default=None, help="for statistics + lang embeddings")
    p.add_argument("--lang-folder", default="lang_paraphrase-MiniLM-L3-v2")
    p.add_argument("--env-factory", default=None, help="module:function -> (env, oracle)")
    p.add_argument(
        "--inert-env", action="store_true",
        help="use the non-interactive FakeCalvinEnv (scripted-scene plumbing "
        "tests only: its scene never moves, so NO policy can score on it). "
        "The default is the interactive kinematic playtable, where the "
        "evaluator discriminates a working policy from a broken one",
    )
    p.add_argument(
        "--oracle-calibration",
        default=None,
        help="oracle_regions.json from calibrate_oracle (data-derived containment boxes)",
    )
    p.add_argument(
        "--tsne-dump", action="store_true",
        help="write evaluation/tsne_data_<epoch>.npz (ids/labels/latent_goals/plans)",
    )
    p.add_argument("--num-videos", type=int, default=0, help="record the first N chains")
    p.add_argument("--video-dir", default=None, help="video output dir (default <run>/evaluation/videos)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--batched", action="store_true",
        help="lockstep-batched evaluation: N env lanes through one jitted "
        "policy batch (~6x faster policy stepping; requires an env factory "
        "that can create independent instances)",
    )
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument(
        "--results-name", default="results.json",
        help="results filename (run_parallel gives each worker its own)",
    )
    args = p.parse_args(argv)

    import jax

    from hulc_tpu.config import get_config
    from hulc_tpu.data.dataset import DatasetStatistics
    from hulc_tpu.evaluation.fake_env import FakeCalvinEnv, fake_env_for
    from hulc_tpu.evaluation.lh_eval import evaluate_policy
    from hulc_tpu.evaluation.policy import HulcPolicy
    from hulc_tpu.evaluation.tasks import SceneObsTasks
    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.training import checkpoint as ckpt

    cfg = get_config(args.config)
    if args.overrides:
        from hulc_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)
    run_dir = pathlib.Path(args.run_dir)

    if args.checkpoint == "last":
        paths = [ckpt.latest_checkpoint(run_dir)]
    elif args.checkpoint == "best":
        policy_name = args.monitor_preset or "lh_sr"
        best = ckpt.best_checkpoint(run_dir, policy_name)
        pol = ckpt.resolve_checkpoint_policy(policy_name)
        journal_path = pathlib.Path(run_dir) / "saved_models" / "monitor.json"
        scored = False
        if pol.monitor and journal_path.exists():
            import json as _json

            journal = _json.loads(journal_path.read_text())
            scored = any(pol.monitor in v for v in journal.values())
        if not scored:
            print(
                f"[eval] WARNING: monitor '{pol.monitor}' was never recorded "
                f"(train with the matching callback, e.g. --rollout for lh_sr); "
                f"falling back to the LATEST checkpoint {best}"
            )
        paths = [best]
    elif args.checkpoint == "all":
        paths = ckpt.all_checkpoints(run_dir)
    else:
        wanted = {int(e) for e in args.checkpoint.split(",")}
        paths = [p_ for p_ in ckpt.all_checkpoints(run_dir) if ckpt.checkpoint_epoch(p_) in wanted]
    paths = [p_ for p_ in paths if p_ is not None]
    if not paths:
        raise SystemExit(f"no checkpoints found in {run_dir}/saved_models")

    # template params from a fresh init (shapes only)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    template = init_params(model, jax.random.key(0), batch)

    from hulc_tpu.data.language import load_task_embeddings, restrict_task_pool

    stats = None
    lang_embeddings = None
    if args.dataset_dir:
        val_dir = pathlib.Path(args.dataset_dir) / "validation"
        stats = DatasetStatistics.load(val_dir)
        emb_path = val_dir / args.lang_folder / "embeddings.npy"
        if emb_path.exists():
            lang_embeddings = load_task_embeddings(emb_path)

    if args.env_factory:
        env, oracle = _load_env_factory(args.env_factory)()
    else:
        env = fake_env_for(cfg, interactive=not args.inert_env)
        calibration = args.oracle_calibration
        if calibration is None:
            # calibration-by-default: use oracle_regions.json when one exists
            # next to the run or dataset (calibrate_oracle writes it there)
            candidates = [run_dir / "oracle_regions.json"]
            if args.dataset_dir:
                candidates += [
                    pathlib.Path(args.dataset_dir) / "validation" / "oracle_regions.json",
                    pathlib.Path(args.dataset_dir) / "oracle_regions.json",
                ]
            calibration = next((c for c in candidates if c.exists()), None)
            if calibration is not None:
                print(f"[eval] using oracle calibration {calibration}")
        oracle = (
            SceneObsTasks.from_calibration(calibration)
            if calibration
            else SceneObsTasks()
        )

    # restrict chains to tasks we hold language embeddings for
    from hulc_tpu.evaluation.lh_eval import get_sequences
    from hulc_tpu.evaluation.tasks import ALL_TASKS

    task_pool = restrict_task_pool(lang_embeddings, ALL_TASKS)
    initial_states = None
    if set(task_pool) == set(ALL_TASKS):
        # official protocol: feasibility-filtered chains + matched scene resets
        # (calvin_agent.evaluation.multistep_sequences equivalent)
        from hulc_tpu.evaluation import chain_sampler

        pairs = chain_sampler.get_sequences(args.num_sequences, seed=args.seed)
        sequences = [chain for _, chain in pairs]
        initial_states = chain_sampler.resets_for_env(pairs, env)
    else:
        # embedding-restricted pools fall back to uniform sampling (not the
        # official protocol; numbers are not comparable to published results)
        sequences = get_sequences(args.num_sequences, tasks=task_pool, seed=args.seed)

    out_dir = run_dir / "evaluation"
    batched_envs = None  # created once, reused across checkpoints
    batched_policy = None  # compiled once, params swapped per checkpoint
    policy = None
    for path in paths:
        epoch = ckpt.checkpoint_epoch(path)
        params = ckpt.restore_params(path, template)
        if args.batched:
            from hulc_tpu.evaluation.batched_eval import evaluate_policy_batched

            if batched_envs is None:
                if args.env_factory:
                    factory_fn = _load_env_factory(args.env_factory)
                    # reuse the oracle-creation env as the first lane
                    batched_envs = [env] + [factory_fn()[0] for _ in range(args.num_envs - 1)]
                else:
                    batched_envs = [env] + [
                        fake_env_for(cfg, interactive=not args.inert_env)
                        for _ in range(args.num_envs - 1)
                    ]
            results = evaluate_policy_batched(
                cfg, params,
                num_sequences=args.num_sequences,
                num_envs=args.num_envs,
                ep_len=args.ep_len,
                oracle=oracle,
                sequences=sequences,
                lang_embeddings=lang_embeddings
                or {t: np.zeros(cfg.lang_dim, np.float32) for t in task_pool},
                statistics=stats,
                epoch=epoch,
                output_dir=out_dir,
                seed=args.seed,
                envs=batched_envs,
                policy=batched_policy,
                results_name=args.results_name,
                initial_states=initial_states,
                num_videos=args.num_videos,
                video_dir=pathlib.Path(args.video_dir) if args.video_dir else out_dir / "videos",
                tsne_path=(out_dir / f"tsne_data_{epoch}.npz") if args.tsne_dump else None,
            )
            batched_policy = results.pop("_policy", batched_policy)
            r = results[str(epoch)]
            print(
                f"[eval] epoch {epoch} (batched x{args.num_envs}): "
                f"avg_seq_len={r['avg_seq_len']:.3f}"
            )
            continue
        if policy is None:
            policy = HulcPolicy(cfg, params, statistics=stats, seed=args.seed)
        else:
            policy.params = params  # reuse the compiled step functions
        if lang_embeddings:
            policy.lang_embeddings = lang_embeddings
        else:
            policy.lang_embeddings = {t: np.zeros(cfg.lang_dim, np.float32) for t in task_pool}
        results = evaluate_policy(
            policy,
            env,
            epoch=epoch,
            num_sequences=args.num_sequences,
            ep_len=args.ep_len,
            oracle=oracle,
            sequences=sequences,
            initial_states=initial_states,
            output_dir=out_dir,
            seed=args.seed,
            results_name=args.results_name,
            num_videos=args.num_videos,
            video_dir=pathlib.Path(args.video_dir) if args.video_dir else out_dir / "videos",
            tsne_path=(out_dir / f"tsne_data_{epoch}.npz") if args.tsne_dump else None,
        )
        r = results[str(epoch)]
        print(
            f"[eval] epoch {epoch}: avg_seq_len={r['avg_seq_len']:.3f} "
            f"chain_sr={[round(v, 3) for v in r['chain_sr'].values()]}"
        )
    print(f"[eval] results written to {out_dir}/results.json")


if __name__ == "__main__":
    main()
