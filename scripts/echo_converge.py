"""Echo-quality study at CONVERGE scale (VERDICT r3 #5).

The round-3 echo study ran hulc_debug at 600 steps and found seed variance
dominates — evidence of *no detected* harm, not of safety at the scale
where echo is actually used: scripts/converge.py defaults --echo 8 on the
full-size flagship. This study covers exactly that config: full-size HULC,
the SAME learnable fixture, the same total optimizer steps, echo in {1, 8},
>= 2 seeds each, comparing final smoothed train loss, final val action MAE,
and the batched LH avg_seq_len.

    make echo-converge     (or: python scripts/echo_converge.py
                            [--steps 1000] [--echos 1,8] [--seeds 42,43])

Each run is a full converge-style train (~25-40 min on this rig's chip);
the default grid is 4 runs. Writes ECHO_CONVERGE.json at the repo root and
prints a table. Interrupted grids resume: finished runs are detected by
their metrics.jsonl and reused.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import tempfile
import time


def read_metric(run_dir, prefix, key):
    out = []
    path = pathlib.Path(run_dir) / "metrics.jsonl"
    if not path.exists():
        return out
    for line in path.read_text().splitlines():
        rec = json.loads(line)
        if rec.get("prefix") == prefix and key in rec:
            out.append((rec["step"], rec[key]))
    return out


def smooth_tail(series, k=5):
    vals = [v for _, v in series]
    return sum(vals[-k:]) / min(k, len(vals)) if vals else None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--echos", default="1,8")
    p.add_argument("--seeds", default="42,43")
    p.add_argument("--work-dir", default="/tmp/hulc_echo_converge")
    p.add_argument("--rollout-sequences", type=int, default=16)
    p.add_argument("--rollout-ep-len", type=int, default=45)
    p.add_argument("--out", default="ECHO_CONVERGE.json")
    args = p.parse_args(argv)

    from hulc_tpu.data.fixtures import make_fixture_dataset
    from hulc_tpu.evaluation import evaluate as eval_cli
    from hulc_tpu.training import train as train_cli

    work = pathlib.Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    fixture = work / "fixture"
    if not (fixture / "training" / "ep_start_end_ids.npy").exists():
        # sized for flagship shapes (window 32): see scripts/moments_study.py
        make_fixture_dataset(fixture, num_episodes=16, episode_len=160,
                             small=False, learnable=True)

    echos = [int(e) for e in args.echos.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]
    rows = []
    for echo in echos:
        for seed in seeds:
            run_dir = work / f"echo{echo}_seed{seed}"
            total = read_metric(run_dir, "train", "total_loss")
            t0 = time.time()
            # the trainer logs every 8 loader batches (--log-every 8 below),
            # so a finished run's last metrics row is up to 8 steps shy of
            # the cap — requiring steps-1 made reuse NEVER fire and a crashed
            # study re-trained its finished arms from scratch on restart
            if total and total[-1][0] >= args.steps - 8:
                print(f"[echo-converge] reusing finished run {run_dir}")
                train_s = 0.0
            else:
                if run_dir.exists():
                    # a PARTIAL run would append to metrics.jsonl under
                    # --no-resume and pollute the trajectory (ADVICE r4)
                    import shutil

                    print(f"[echo-converge] clearing partial run {run_dir}")
                    shutil.rmtree(run_dir)
                train_cli.main([
                    "--config", "hulc", "--data-dir", str(fixture),
                    "--run-dir", str(run_dir), "--steps", str(args.steps),
                    "--batch-size", str(args.batch_size),
                    "--min-window", str(args.window), "--max-window", str(args.window),
                    "--bf16", "--lr", str(args.lr), "--echo-factor", str(echo),
                    "--cache", "ram", "--no-resume", "--seed", str(seed),
                    "--val-max-batches", "2", "--log-every", "8",
                    "--val-every-epochs", "4",
                    "--checkpoint-every", "100",
                ])
                train_s = time.time() - t0
                total = read_metric(run_dir, "train", "total_loss")

            val_mae = read_metric(run_dir, "val", "vis_mae_pp")
            # batched LH eval on the final checkpoint (same protocol converge uses)
            eval_cli.main([
                "--run-dir", str(run_dir), "--config", "hulc",
                "--dataset-dir", str(fixture), "--checkpoint", "last",
                "--num-sequences", str(args.rollout_sequences),
                "--ep-len", str(args.rollout_ep_len),
                "--batched", "--num-envs", "16", "--seed", str(seed),
            ])
            results = json.loads(
                (run_dir / "evaluation" / "results.json").read_text()
            )
            epoch = sorted(results, key=int)[-1]
            rows.append({
                "echo": echo,
                "seed": seed,
                "final_total_loss": round(smooth_tail(total), 3),
                "initial_total_loss": round(total[0][1], 3),
                "final_val_mae": round(smooth_tail(val_mae), 4) if val_mae else None,
                "lh_avg_seq_len": results[epoch]["avg_seq_len"],
                "train_s": round(train_s, 1),
            })
            print(f"[echo-converge] {rows[-1]}", flush=True)

    # aggregate per echo level
    agg = {}
    for echo in echos:
        sub = [r for r in rows if r["echo"] == echo]
        agg[str(echo)] = {
            "final_total_loss": [r["final_total_loss"] for r in sub],
            "final_val_mae": [r["final_val_mae"] for r in sub],
            "lh_avg_seq_len": [r["lh_avg_seq_len"] for r in sub],
        }
    summary = {"steps": args.steps, "batch_size": args.batch_size,
               "window": args.window, "runs": rows, "by_echo": agg}
    print("[echo-converge] " + json.dumps(summary))
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    return summary


if __name__ == "__main__":
    main()
