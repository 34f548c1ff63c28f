"""Adam moment-storage dtype certification at training scale.

STEP_EXPERIMENTS.json measured bf16-stored moments at -0.79 ms/step on the
bandwidth-bound flagship step (894 MB of HBM traffic saved) with 3-step
loss parity. This study supplies the *training-scale* evidence: paired
runs with the SAME seed, data schedule, and config — full-size HULC on the
converge learnable fixture — differing ONLY in TrainerConfig.adam_mv_dtype
(optimizers.py rounds mu/nu to the storage dtype at write-back; arithmetic
is f32 either way, so any trajectory divergence is moment rounding alone).

    make moments-study     (or: python scripts/moments_study.py
                            [--steps 400] [--seeds 42,43])

Compares the logged total-loss trajectory point-by-point (same-seed runs
are otherwise deterministic), final smoothed train loss, and final val
action MAE. Writes MOMENTS_STUDY.json at the repo root. Wall times are
recorded but NOT comparable across arms (this rig's 1-core host + tunnel
variance dominate); the -0.79 ms device number lives in STEP_EXPERIMENTS.

Reference has no counterpart (torch adam is f32-only); this certifies a
TPU-side optimization, gating the bench.py / converge default.
"""

from __future__ import annotations

import argparse
import json
import pathlib
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


def paired_divergence(rows, dtypes, seeds):
    """Same-seed trajectory divergence between the two dtype arms.

    Runs sharing a seed are otherwise deterministic, so the pointwise
    relative loss gap at matched logged steps isolates moment rounding.
    """
    pairs = {}
    for seed in seeds:
        by_dt = {r["mv_dtype"]: r for r in rows if r["seed"] == seed}
        if len(by_dt) < 2:
            continue
        a, b = by_dt[dtypes[0]], by_dt[dtypes[1]]
        common = sorted(set(a["loss_curve"]) & set(b["loss_curve"]), key=int)
        rel = [abs(a["loss_curve"][s] - b["loss_curve"][s])
               / max(abs(a["loss_curve"][s]), 1e-6) for s in common]
        pairs[str(seed)] = {
            "matched_points": len(common),
            "max_rel_loss_diff": round(max(rel), 4) if rel else None,
            "mean_rel_loss_diff": round(sum(rel) / len(rel), 4) if rel else None,
            "final_loss": {dt: by_dt[dt]["final_total_loss"] for dt in dtypes},
            "final_val_mae": {dt: by_dt[dt]["final_val_mae"] for dt in dtypes},
        }
    return pairs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--dtypes", default="float32,bfloat16")
    p.add_argument("--seeds", default="42,43")
    p.add_argument("--work-dir", default="/tmp/hulc_moments_study")
    p.add_argument("--out", default="MOMENTS_STUDY.json")
    args = p.parse_args(argv)

    from hulc_tpu.data.fixtures import make_fixture_dataset
    from hulc_tpu.training import train as train_cli

    work = pathlib.Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    fixture = work / "fixture"
    if not (fixture / "training" / "ep_start_end_ids.npy").exists():
        # sized so flagship shapes (window 32, batch 32+32) get ~32 steps per
        # epoch: per-epoch val + lang_gt H2D costs ~75 s on the degraded
        # tunnel wire, so short epochs made 500-step runs intractable
        make_fixture_dataset(fixture, num_episodes=16, episode_len=160,
                             small=False, learnable=True)

    dtypes = args.dtypes.split(",")
    if len(dtypes) != 2:
        # paired_divergence compares exactly one pair; extra dtypes would be
        # silently ignored in the paired analysis (ADVICE r4)
        p.error(f"--dtypes must name exactly two dtypes, got {dtypes}")
    seeds = [int(s) for s in args.seeds.split(",")]
    rows = []
    for seed in seeds:
        for dt in dtypes:
            run_dir = work / f"mv_{dt}_seed{seed}"
            total = read_metric(run_dir, "train", "total_loss")
            t0 = time.time()
            # last logged row can trail the cap by the --log-every cadence
            # (8): steps-1 made reuse never fire (see echo_converge.py)
            if total and total[-1][0] >= args.steps - 8:
                print(f"[moments-study] reusing finished run {run_dir}")
                train_s = 0.0
            else:
                # a PARTIAL prior run would otherwise pollute the fresh
                # trajectory: MetricLogger appends to metrics.jsonl, so the
                # stale prefix would shadow initial_total_loss and mix
                # hyperparameters (ADVICE r4) — start from a clean run dir
                if run_dir.exists():
                    import shutil

                    print(f"[moments-study] clearing partial run {run_dir}")
                    shutil.rmtree(run_dir)
                train_cli.main([
                    "--config", "hulc", "--data-dir", str(fixture),
                    "--run-dir", str(run_dir), "--steps", str(args.steps),
                    "--batch-size", str(args.batch_size),
                    "--min-window", str(args.window), "--max-window", str(args.window),
                    "--bf16", "--lr", str(args.lr),
                    "--adam-mv-dtype", dt,
                    "--cache", "ram", "--no-resume", "--seed", str(seed),
                    "--val-max-batches", "2", "--log-every", "8",
                    "--val-every-epochs", "4",
                    "--checkpoint-every", str(args.steps),
                ])
                train_s = time.time() - t0
                total = read_metric(run_dir, "train", "total_loss")

            val_mae = read_metric(run_dir, "val", "vis_mae_pp")
            if not total:
                # training died before the first log: report the partial
                # result instead of crashing after hours of chip time
                # (ADVICE r4)
                print(f"[moments-study] WARNING: no train metrics in {run_dir}; "
                      "flagging the row and continuing")
                rows.append({"mv_dtype": dt, "seed": seed, "loss_curve": {},
                             "final_total_loss": None, "initial_total_loss": None,
                             "final_val_mae": None, "train_s": round(train_s, 1),
                             "valid": False})
                continue
            rows.append({
                "mv_dtype": dt,
                "seed": seed,
                "loss_curve": {str(s): round(v, 4) for s, v in total},
                "final_total_loss": round(smooth_tail(total), 3),
                "initial_total_loss": round(total[0][1], 3),
                "final_val_mae": round(smooth_tail(val_mae), 4) if val_mae else None,
                "train_s": round(train_s, 1),
            })
            print(f"[moments-study] {dt} seed{seed}: "
                  f"final {rows[-1]['final_total_loss']} "
                  f"val_mae {rows[-1]['final_val_mae']}", flush=True)

    # paired same-seed trajectory divergence: bf16 vs f32 at matched steps
    pairs = paired_divergence(rows, dtypes, seeds)
    for seed, pair in pairs.items():
        print(f"[moments-study] seed {seed}: max rel loss diff "
              f"{pair['max_rel_loss_diff']}, final {pair['final_loss']}",
              flush=True)

    summary = {"steps": args.steps, "batch_size": args.batch_size,
               "window": args.window,
               "runs": [{k: v for k, v in r.items() if k != "loss_curve"}
                        for r in rows],
               "paired_by_seed": pairs}
    print("[moments-study] " + json.dumps(summary))
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    return summary


if __name__ == "__main__":
    main()
