"""Full LH-MTLC protocol receipts (VERDICT r3 #1).

Runs the reference's headline evaluation at its REAL scale: 1000 chains x
5 instructions x 360 steps (reference hulc/evaluation/evaluate_policy.py:82,
conf/callbacks/rollout_lh/default.yaml:10-14) through the batched lockstep
evaluator — policy on the real chip, env lanes in-process (fake env; pass
--env-factory for a real simulator) — with videos + t-SNE dump + plots on,
recording wall-clock and peak host RSS.

    make protocol-eval          (trains a fresh converge-style checkpoint)
    python scripts/protocol_eval.py --run-dir <run> --fixture-dir <data>
                                 (reuses an existing trained run)

Writes PROTOCOL.json at the repo root (or --out) with the timing summary,
plus the standard <run>/evaluation/{results.json, tsne_data_<e>.npz,
videos/} and <run>/plots/*.png artifacts.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import resource
import tempfile
import time


def main(argv=None):
    from hulc_tpu.utils.tunnel import compact_tunnel_journal

    compact_tunnel_journal()  # 1000 chains ship ~60 GB H2D; see utils/tunnel.py

    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default=None, help="existing trained run (skips training)")
    p.add_argument("--fixture-dir", default=None, help="dataset dir (default: generate learnable fixture)")
    p.add_argument("--steps", type=int, default=1000, help="training steps when no --run-dir")
    p.add_argument("--num-sequences", type=int, default=1000)
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--num-videos", type=int, default=8)
    p.add_argument("--env-factory", default=None, help="module:function -> (env, oracle)")
    p.add_argument(
        "--expert", action="store_true",
        help="drive the official protocol with the scripted expert on the "
        "interactive playtable (no training, no chip): proves the full "
        "chain/lane/results accounting with NONZERO success rates",
    )
    p.add_argument("--out", default="PROTOCOL.json")
    args = p.parse_args(argv)

    if args.expert:
        return expert_protocol(args)

    from hulc_tpu.data.fixtures import make_fixture_dataset

    fixture = args.fixture_dir
    if fixture is None:
        fixture = tempfile.mkdtemp(prefix="hulc_proto_data_")
        make_fixture_dataset(
            pathlib.Path(fixture), num_episodes=4, episode_len=96, small=False, learnable=True
        )
    run_dir = args.run_dir
    t_train0 = time.time()
    if run_dir is None:
        from hulc_tpu.training import train as train_cli

        run_dir = tempfile.mkdtemp(prefix="hulc_proto_run_")
        train_cli.main([
            "--config", "hulc", "--data-dir", str(fixture), "--run-dir", run_dir,
            "--steps", str(args.steps), "--batch-size", "16",
            "--min-window", "8", "--max-window", "8", "--bf16", "--lr", "5e-4",
            "--echo-factor", "8", "--cache", "ram", "--no-resume",
            "--val-max-batches", "1", "--log-every", "8", "--checkpoint-every", "100",
        ])
    train_s = time.time() - t_train0 if args.run_dir is None else 0.0

    from hulc_tpu.evaluation import evaluate as eval_cli

    eval_args = [
        "--run-dir", str(run_dir), "--config", "hulc", "--dataset-dir", str(fixture),
        "--checkpoint", "last", "--num-sequences", str(args.num_sequences),
        "--ep-len", str(args.ep_len), "--batched", "--num-envs", str(args.num_envs),
        "--num-videos", str(args.num_videos), "--tsne-dump",
    ]
    if args.env_factory:
        eval_args += ["--env-factory", args.env_factory]
    t0 = time.time()
    eval_cli.main(eval_args)
    eval_s = time.time() - t0
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    run_dir = pathlib.Path(run_dir)
    eval_dir = run_dir / "evaluation"
    results_path = eval_dir / "results.json"
    results = json.loads(results_path.read_text())
    epoch = sorted(results, key=int)[-1]

    from hulc_tpu.evaluation import plots as plots_cli

    plots_dir = run_dir / "plots"
    plots_cli.main(["--results", str(results_path), "--out-dir", str(plots_dir)])

    tsne = sorted(eval_dir.glob("tsne_data_*.npz"))
    videos = sorted((eval_dir / "videos").glob("chain_*.npz"))
    import numpy as np

    summary = {
        "num_sequences": args.num_sequences,
        "ep_len": args.ep_len,
        "num_envs": args.num_envs,
        "eval_wall_s": round(eval_s, 1),
        "eval_chains_per_min": round(args.num_sequences / eval_s * 60, 1),
        "train_wall_s": round(train_s, 1),
        "peak_host_rss_gb": round(peak_rss_gb, 2),
        "avg_seq_len": results[epoch]["avg_seq_len"],
        "chain_sr": results[epoch]["chain_sr"],
        "tsne_rows": int(np.load(tsne[-1])["ids"].shape[0]) if tsne else 0,
        "videos": len(videos),
        "figures": sorted(f.name for f in plots_dir.glob("*.png")),
        "run_dir": str(run_dir),
        "results_json": str(results_path),
    }
    print("[protocol] " + json.dumps(summary))
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    return summary


def expert_protocol(args):
    """Official LH-MTLC protocol at full scale with the scripted expert:
    feasibility-filtered chains + matched scene resets (chain_sampler), the
    34-task pool, 64 lockstep lanes, interactive playtable dynamics, real
    block_contacts driving the oracle. The receipt the policy-driven run
    cannot give (the fake env's unscripted scene never moves): nonzero
    chain_sr / avg_seq_len and all-task task_sr through the exact production
    accounting path (reference hulc/evaluation/evaluate_policy.py:82)."""
    import resource
    import numpy as np

    from hulc_tpu.config import get_config
    from hulc_tpu.evaluation import chain_sampler, plots as plots_cli
    from hulc_tpu.evaluation.batched_eval import evaluate_policy_batched
    from hulc_tpu.evaluation.expert import ScriptedExpertPolicy, task_embeddings
    from hulc_tpu.evaluation.fake_env import FakeCalvinEnv
    from hulc_tpu.evaluation.tasks import SceneObsTasks

    cfg = get_config("hulc_debug")  # config only shapes the obs the expert ignores
    run_dir = pathlib.Path(tempfile.mkdtemp(prefix="hulc_proto_expert_"))
    eval_dir = run_dir / "evaluation"

    pairs = chain_sampler.get_sequences(args.num_sequences, seed=0)
    sequences = [chain for _, chain in pairs]
    envs = [FakeCalvinEnv(interactive=True, seed=i) for i in range(args.num_envs)]
    initial_states = chain_sampler.resets_for_env(pairs, envs[0])
    embeddings = task_embeddings(cfg.lang_dim)
    policy = ScriptedExpertPolicy(min(args.num_envs, len(sequences)), embeddings)

    t0 = time.time()
    results = evaluate_policy_batched(
        cfg, None,
        num_sequences=args.num_sequences,
        num_envs=args.num_envs,
        ep_len=args.ep_len,
        oracle=SceneObsTasks(),
        sequences=sequences,
        lang_embeddings=embeddings,
        epoch=0,
        output_dir=eval_dir,
        envs=envs,
        policy=policy,
        initial_states=initial_states,
        num_videos=args.num_videos,
        video_dir=eval_dir / "videos",
    )
    eval_s = time.time() - t0
    results.pop("_policy", None)
    r = results["0"]

    plots_dir = run_dir / "plots"
    plots_cli.main(["--results", str(eval_dir / "results.json"), "--out-dir", str(plots_dir)])

    summary = {
        "mode": "expert",
        "num_sequences": args.num_sequences,
        "ep_len": args.ep_len,
        "num_envs": args.num_envs,
        "eval_wall_s": round(eval_s, 1),
        "eval_chains_per_min": round(args.num_sequences / eval_s * 60, 1),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
        ),
        "avg_seq_len": r["avg_seq_len"],
        "chain_sr": r["chain_sr"],
        "tasks_attempted": len(r["task_info"]),
        "task_sr_mean": round(
            float(np.mean([v[0] if isinstance(v, list) else v for v in r["task_sr"].values()])), 4
        ),
        "videos": len(sorted((eval_dir / "videos").glob("chain_*.npz"))),
        "figures": sorted(f.name for f in plots_dir.glob("*.png")),
        "run_dir": str(run_dir),
    }
    print("[protocol-expert] " + json.dumps(summary))
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    return summary


if __name__ == "__main__":
    main()
