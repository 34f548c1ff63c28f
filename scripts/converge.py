"""Convergence-evidence harness (VERDICT r2 #2): one command reproduces the
reference's debug-split workflow (reference README.md:48-76) end to end —
train the flagship HULC preset on a full-size fixture on the real chip,
assert the loss trajectory is healthy, then run the batched LH eval and the
plots from the same run dir.

    make converge        (or: python scripts/converge.py [--steps 400] ...)

Asserts:
  * final smoothed total loss < 0.5x the initial loss (memorization on the
    tiny fixture — the same sanity the reference gets from its debug split);
  * the CLIP auxiliary loss collapses (< 0.15x initial — contrastive pairs
    on a fixture are memorizable to ~0).

Leaves behind: <run>/metrics.jsonl, <run>/saved_models/,
<run>/evaluation/results.json, <run>/plots/*.png, and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import tempfile
import time


def read_metric(run_dir, prefix, key):
    """(step, value) series for one metric from metrics.jsonl."""
    out = []
    path = pathlib.Path(run_dir) / "metrics.jsonl"
    for line in path.read_text().splitlines():
        rec = json.loads(line)
        if rec.get("prefix") == prefix and key in rec:
            out.append((rec["step"], rec[key]))
    return out


def main(argv=None):
    from hulc_tpu.utils.tunnel import compact_tunnel_journal

    compact_tunnel_journal()  # see utils/tunnel.py (H2D journal retention)

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=16, help="per modality")
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--echo", type=int, default=1,
                   help="data echoing (this rig's tunneled wire degrades ~30x "
                   "after the first program; echo ~5x's wall-clock but the "
                   "converge-scale study (make echo-converge, "
                   "ECHO_CONVERGE.json) measured a real quality cost at "
                   "equal steps: echo 8 final loss 6.1/14.1 vs 4.6/4.0, val "
                   "MAE 1.70/1.90 vs 1.33/1.34. Default stays at the "
                   "certified echo 1; raise it only as an explicit "
                   "wire-starvation tradeoff.")
    p.add_argument("--adam-mv-dtype", default=None, choices=["float32", "bfloat16"],
                   help="adam moment storage dtype passthrough (certification "
                   "runs for the STEP_EXPERIMENTS.json byte-cutting knob)")
    p.add_argument("--run-dir", default=None)
    p.add_argument("--rollout-sequences", type=int, default=16)
    p.add_argument("--rollout-ep-len", type=int, default=45)
    p.add_argument("--keep-fixture", action="store_true")
    p.add_argument("--fixture-dir", default=None,
                   help="reuse an existing learnable fixture instead of generating one")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; run the loss asserts + eval + plots on an "
                   "existing --run-dir (resume path when the tunnel wedges mid-"
                   "pipeline — the 2026-08-17 backend drop killed an eval after "
                   "a finished 35-min train)")
    args = p.parse_args(argv)
    if args.eval_only and not (args.run_dir and args.fixture_dir):
        raise SystemExit("--eval-only needs --run-dir and --fixture-dir")

    from hulc_tpu.data.fixtures import make_fixture_dataset
    from hulc_tpu.training import train as train_cli

    run_dir = args.run_dir or tempfile.mkdtemp(prefix="hulc_converge_")
    if args.fixture_dir:
        fixture = pathlib.Path(args.fixture_dir)
    else:
        fixture = pathlib.Path(tempfile.mkdtemp(prefix="hulc_conv_data_"))
        make_fixture_dataset(fixture, num_episodes=4, episode_len=96, small=False, learnable=True)

    t0 = time.time()
    train_args = [
        "--config", "hulc",
        "--data-dir", str(fixture),
        "--run-dir", str(run_dir),
        "--steps", str(args.steps),
        "--batch-size", str(args.batch_size),
        "--min-window", str(args.window), "--max-window", str(args.window),
        "--bf16",
        "--lr", str(args.lr),
        "--echo-factor", str(args.echo),
        "--cache", "ram",
        "--no-resume",
        "--val-max-batches", "1",
        "--log-every", "4",
        "--checkpoint-every", "100",  # the --steps cap still saves at the end
    ]
    if args.adam_mv_dtype:
        train_args += ["--adam-mv-dtype", args.adam_mv_dtype]
    if not args.eval_only:
        train_cli.main(train_args)
    train_s = 0.0 if args.eval_only else time.time() - t0

    total = read_metric(run_dir, "train", "total_loss")
    clip = read_metric(run_dir, "train", "lang_clip_loss")
    assert len(total) >= 3, f"too few logged points: {total}"

    def smooth_tail(series, k=5):
        vals = [v for _, v in series]
        return sum(vals[-k:]) / min(k, len(vals))

    loss0, loss1 = total[0][1], smooth_tail(total)
    assert loss1 < 0.5 * loss0, f"total loss did not halve: {loss0:.3f} -> {loss1:.3f}"
    # the clip aux collapses to ~0 on batches the model has echo-memorized;
    # the logged value oscillates between 0 and the combinatorial floor
    # (ln of the per-task multiplicity — the fixture has 5 tasks), so assert
    # the tail MINIMUM reaches collapse
    clip0 = clip[0][1]
    clip_tail = [v for _, v in clip][-max(3, len(clip) // 3):]
    clip1 = min(clip_tail)
    assert clip1 < 0.05, f"clip aux never collapsed: {clip0:.3f} -> tail min {clip1:.3f}"

    # batched LH eval from the run's checkpoints (fake env; protocol chains)
    from hulc_tpu.evaluation import evaluate as eval_cli

    eval_cli.main([
        "--run-dir", str(run_dir),
        "--config", "hulc",
        "--dataset-dir", str(fixture),
        "--checkpoint", "last",
        "--num-sequences", str(args.rollout_sequences),
        "--ep-len", str(args.rollout_ep_len),
        "--batched", "--num-envs", "16",
    ])
    results_path = pathlib.Path(run_dir) / "evaluation" / "results.json"
    assert results_path.exists(), results_path

    # plots (single-run figures) from the eval results
    from hulc_tpu.evaluation import plots as plots_cli

    plots_dir = pathlib.Path(run_dir) / "plots"
    plots_cli.main(["--results", str(results_path), "--out-dir", str(plots_dir)])
    figures = sorted(f.name for f in plots_dir.glob("*.png"))
    assert figures, f"no figures in {plots_dir}"

    summary = {
        "steps": args.steps,
        "adam_mv_dtype": args.adam_mv_dtype or "bfloat16",  # train.py shipping default (round 5)
        "train_s": round(train_s, 1),
        "total_loss": [round(loss0, 3), round(loss1, 3)],
        "clip_aux_loss": [round(clip0, 4), round(clip1, 4)],
        "results_json": str(results_path),
        "figures": figures,
        "run_dir": str(run_dir),
    }
    print("[converge] PASS " + json.dumps(summary))
    if not args.keep_fixture and not args.fixture_dir:
        shutil.rmtree(fixture, ignore_errors=True)
    return summary


if __name__ == "__main__":
    main()
