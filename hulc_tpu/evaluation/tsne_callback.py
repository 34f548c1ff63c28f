"""t-SNE latent-plan plot callback (reference:
calvin_agent.visualization.tsne_plot.TSNEPlot wired via
conf/callbacks/tsne_plot/default.yaml).

After validation, collects sampled plans from the val metrics and writes a
t-SNE figure per epoch into <run_dir>/tsne/.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np


class TSNEPlotCallback:
    def __init__(self, val_loader, every_n_epochs: int = 1, max_batches: int = 4):
        self.val_loader = val_loader
        self.every_n_epochs = every_n_epochs
        self.max_batches = max_batches

    def on_epoch_end(self, trainer, state, epoch: int) -> Optional[str]:
        if (epoch + 1) % self.every_n_epochs != 0:
            return None
        import jax

        from hulc_tpu.evaluation.plots import plot_tsne
        from hulc_tpu.training.preprocess import preprocess_batch

        model = trainer.model
        plans, labels = [], []
        for i, raw in enumerate(self.val_loader):
            if i >= self.max_batches:
                break
            batch = preprocess_batch(trainer.cfg, raw, rng=None, train=False)
            metrics = model.apply(
                {"params": state.params}, jax.random.key(i), batch, method=model.val_metrics
            )
            for scope in ("vis", "lang"):
                key = f"sampled_plan_pr_{scope}"
                if key in metrics:
                    arr = np.asarray(metrics[key])
                    plans.append(arr)
                    labels.extend([scope] * len(arr))
        if not plans:
            return None
        out_dir = pathlib.Path(trainer.tcfg.run_dir) / "tsne"
        out_dir.mkdir(parents=True, exist_ok=True)
        out_path = out_dir / f"tsne_epoch_{epoch}.png"
        plot_tsne(np.concatenate(plans), labels, out_path)
        return str(out_path)
