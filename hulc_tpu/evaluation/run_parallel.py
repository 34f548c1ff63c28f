"""Parallel checkpoint evaluation fan-out (reference:
hulc/evaluation/run_multiple.py — splits checkpoints over 8 GPUs with
subprocess + taskset pinning).

TPU equivalent: one subprocess per accelerator slot; each evaluates a
disjoint slice of the checkpoint list via the evaluate CLI. Results merge
into the same results.json (the evaluator merge-updates it).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="parallel LH-MTLC evaluation")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--config", default="hulc")
    p.add_argument("--num-workers", type=int, default=1)
    p.add_argument("--num-sequences", type=int, default=1000)
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--dataset-dir", default=None)
    p.add_argument("--env-factory", default=None)
    args = p.parse_args(argv)

    from hulc_tpu.training import checkpoint as ckpt

    paths = ckpt.all_checkpoints(args.run_dir)
    if not paths:
        raise SystemExit(f"no checkpoints in {args.run_dir}/saved_models")
    epochs = [ckpt.checkpoint_epoch(p_) for p_ in paths]
    shards = [epochs[i :: args.num_workers] for i in range(args.num_workers)]

    procs = []
    for worker, shard in enumerate(shards):
        if not shard:
            continue
        cmd = [
            sys.executable, "-m", "hulc_tpu.evaluation.evaluate",
            "--run-dir", args.run_dir,
            "--config", args.config,
            "--checkpoint", ",".join(str(e) for e in shard),
            "--num-sequences", str(args.num_sequences),
            "--ep-len", str(args.ep_len),
            # per-worker file: the results.json merge is not lock-protected
            "--results-name", f"results_worker{worker}.json",
        ]
        if args.dataset_dir:
            cmd += ["--dataset-dir", args.dataset_dir]
        if args.env_factory:
            cmd += ["--env-factory", args.env_factory]
        env = dict(os.environ)
        env["HULC_TPU_EVAL_WORKER"] = str(worker)
        procs.append(subprocess.Popen(cmd, env=env))
    codes = [p_.wait() for p_ in procs]
    if any(codes):
        raise SystemExit(f"worker failures: {codes}")

    # merge the per-worker files into the canonical results.json
    import json

    out_dir = pathlib.Path(args.run_dir) / "evaluation"
    merged = {}
    final = out_dir / "results.json"
    if final.exists():
        merged.update(json.loads(final.read_text()))
    for f in sorted(out_dir.glob("results_worker*.json")):
        merged.update(json.loads(f.read_text()))
        f.unlink()
    final.write_text(json.dumps(merged, indent=2))
    print(f"[run_parallel] evaluated epochs {sorted(epochs)} with {len(procs)} workers -> {final}")


if __name__ == "__main__":
    main()
