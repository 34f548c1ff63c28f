#!/usr/bin/env python3
"""TPU-pod training launcher (reference: slurm_scripts/slurm_training.py).

Reproduces the reference's cluster workflow for TPU pods / any scheduler:
  * snapshots the repo into the run dir (so the running code is frozen);
  * writes ``resume_training.sh`` and ``evaluate.sh`` next to the run
    (reference slurm_training.py:111-155);
  * emits a self-resubmitting elastic wrapper (``elastic_run.sh``) that
    re-launches training after a wall-clock timeout — training resumes from
    the last checkpoint because the run dir is fixed (sbatch_lfp.sh:19-27);
  * for multi-host TPU pods, the generated command uses
    ``jax.distributed.initialize`` via --coordinator.

This script does not depend on any specific scheduler; plug the generated
shell scripts into gcloud TPU VM commands, k8s Jobs, or SLURM as needed.
"""

from __future__ import annotations

import argparse
import pathlib
import shlex
import shutil
import subprocess
import sys
import time

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

EXCLUDE = {".git", "runs", "__pycache__", ".jax_cache", ".pytest_cache"}


def snapshot_repo(dest: pathlib.Path, skip: pathlib.Path = None) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    for item in REPO_ROOT.iterdir():
        if item.name in EXCLUDE:
            continue
        # never copy the run dir into its own snapshot (recursive self-copy)
        if skip is not None and (item == skip or skip.is_relative_to(item)):
            continue
        target = dest / item.name
        if item.is_dir():
            shutil.copytree(item, target, ignore=shutil.ignore_patterns(*EXCLUDE), dirs_exist_ok=True)
        else:
            shutil.copy2(item, target)


def git_commit_hash() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO_ROOT, capture_output=True, text=True, check=True
        ).stdout.strip()
    except Exception:
        return "unknown"


def main(argv=None):
    p = argparse.ArgumentParser(description="launch hulc_tpu training on a TPU pod")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--config", default="hulc")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--timeout-hours", type=float, default=23.8, help="elastic resubmit period")
    p.add_argument("--coordinator", default=None, help="multi-host coordinator host:port")
    p.add_argument("--extra", default="", help="extra args passed to the trainer")
    p.add_argument("--no-snapshot", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    run_dir = pathlib.Path(args.run_dir).resolve()
    run_dir.mkdir(parents=True, exist_ok=True)
    code_dir = run_dir / "code"
    if not args.no_snapshot:
        snapshot_repo(code_dir, skip=run_dir)
        (run_dir / "git_commit.txt").write_text(git_commit_hash() + "\n")
    else:
        code_dir = REPO_ROOT

    train_cmd = (
        f"cd {shlex.quote(str(code_dir))} && "
        f"PYTHONPATH={shlex.quote(str(code_dir))}:$PYTHONPATH "
        f"python -m hulc_tpu.training.train --config {args.config} "
        f"--data-dir {shlex.quote(args.data_dir)} --run-dir {shlex.quote(str(run_dir))} "
        f"--epochs {args.epochs} --cache shm --bf16 {args.extra}".strip()
    )
    if args.coordinator:
        train_cmd = f"HULC_TPU_COORDINATOR={args.coordinator} {train_cmd}"

    resume = run_dir / "resume_training.sh"
    resume.write_text(f"#!/bin/bash\n{train_cmd}\n")
    resume.chmod(0o755)

    evaluate = run_dir / "evaluate.sh"
    evaluate.write_text(
        "#!/bin/bash\n"
        f"cd {shlex.quote(str(code_dir))} && "
        f"PYTHONPATH={shlex.quote(str(code_dir))}:$PYTHONPATH "
        f"python -m hulc_tpu.evaluation.evaluate --run-dir {shlex.quote(str(run_dir))} "
        f"--config {args.config} --dataset-dir {shlex.quote(args.data_dir)} --checkpoint all\n"
    )
    evaluate.chmod(0o755)

    timeout_s = int(args.timeout_hours * 3600)
    elastic = run_dir / "elastic_run.sh"
    elastic.write_text(
        "#!/bin/bash\n"
        "# elastic loop: run with a wall-clock timeout, resubmit on timeout\n"
        "# (resumes from the last checkpoint because the run dir is fixed)\n"
        "while true; do\n"
        f"  timeout {timeout_s} bash {shlex.quote(str(resume))}\n"
        "  code=$?\n"
        "  if [ $code -ne 124 ]; then exit $code; fi\n"
        '  echo "[elastic] wall-clock timeout, resubmitting"\n'
        "done\n"
    )
    elastic.chmod(0o755)

    print(f"[launch] run dir: {run_dir}")
    print(f"[launch] scripts: {resume.name}, {evaluate.name}, {elastic.name}")
    if not args.dry_run:
        subprocess.run(["bash", str(elastic)], check=True)


if __name__ == "__main__":
    main()
