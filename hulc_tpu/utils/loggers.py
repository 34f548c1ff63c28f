"""Metric logger backends (reference conf/logger/*: wandb default,
tensorboard alternative). The JSONL sink in trainer.MetricLogger always
runs; these adapters mirror metrics to wandb / tensorboard when those
libraries are present (optional in this environment).
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class WandbLogger:
    def __init__(self, project: str = "hulc_tpu", name: Optional[str] = None, **kwargs):
        import wandb  # optional dep

        self._run = wandb.init(project=project, name=name, **kwargs)

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = "train") -> None:
        self._run.log({f"{prefix}/{k}": v for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        self._run.finish()


class TensorBoardLogger:
    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter  # optional dep

        self._writer = SummaryWriter(log_dir)

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = "train") -> None:
        for k, v in metrics.items():
            try:
                self._writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                continue

    def close(self) -> None:
        self._writer.close()


def make_logger(kind: str, run_dir: str, **kwargs):
    """kind: "jsonl" (always available) | "wandb" | "tensorboard"."""
    if kind == "wandb":
        return WandbLogger(name=str(run_dir), **kwargs)
    if kind == "tensorboard":
        return TensorBoardLogger(str(run_dir))
    if kind != "jsonl":
        raise ValueError(f"unknown logger kind {kind!r} (jsonl | wandb | tensorboard)")
    from hulc_tpu.training.trainer import MetricLogger

    return MetricLogger(run_dir)


class MultiLogger:
    """Fan out to several sinks (JSONL + optional wandb/tb)."""

    def __init__(self, loggers):
        self.loggers = list(loggers)

    def log(self, metrics, step, prefix="train"):
        for lg in self.loggers:
            lg.log(metrics, step, prefix)

    def close(self):
        for lg in self.loggers:
            lg.close()
