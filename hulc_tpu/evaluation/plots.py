"""Result plotting (reference: hulc/evaluation/create_plots.py).

Consumes ``evaluation/results.json`` files in the schema
``{epoch: {avg_seq_len, chain_sr: {1..5}, task_sr: {...}}}`` and produces
the paper-style figures: chain success rate per position, average sequence
length over epochs, per-task success rates, and t-SNE latent-plan plots
(sklearn TSNE replaces the reference's MulticoreTSNE).
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, List, Optional, Sequence

import numpy as np


def load_results(path) -> Dict[str, Dict]:
    return json.loads(pathlib.Path(path).read_text())


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_chain_sr(results: Dict[str, Dict], out_path, labels: Optional[Dict[str, str]] = None):
    """Success rate vs chain position, one line per epoch/run."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 4))
    for epoch, r in sorted(results.items(), key=lambda kv: int(kv[0])):
        xs = sorted(int(k) for k in r["chain_sr"])
        ys = [r["chain_sr"][str(x)] for x in xs]
        ax.plot(xs, ys, marker="o", label=(labels or {}).get(epoch, f"epoch {epoch}"))
    ax.set_xlabel("instructions in a row")
    ax.set_ylabel("success rate")
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_avg_seq_len(results: Dict[str, Dict], out_path):
    plt = _mpl()
    epochs = sorted(int(e) for e in results)
    ys = [results[str(e)]["avg_seq_len"] for e in epochs]
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(epochs, ys, marker="o")
    ax.set_xlabel("epoch")
    ax.set_ylabel("avg successful sequence length")
    ax.set_ylim(0, 5)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_task_sr(results: Dict[str, Dict], epoch: str, out_path):
    plt = _mpl()
    r = results[str(epoch)]["task_sr"]
    tasks = sorted(r, key=r.get)
    fig, ax = plt.subplots(figsize=(6, max(3, 0.22 * len(tasks))))
    ax.barh(tasks, [r[t] for t in tasks])
    ax.set_xlabel("success rate")
    ax.set_xlim(0, 1)
    ax.tick_params(labelsize=6)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_tsne(
    plans: np.ndarray,
    labels: Sequence,
    out_path,
    perplexity: float = 30.0,
    seed: int = 0,
):
    """t-SNE of sampled latent plans colored by task label
    (reference TSNEPlot callback + create_plots.py:402-445)."""
    from sklearn.manifold import TSNE

    plt = _mpl()
    plans = np.asarray(plans).reshape(len(plans), -1)
    emb = TSNE(
        n_components=2, perplexity=min(perplexity, max(2, len(plans) // 4)), random_state=seed
    ).fit_transform(plans)
    uniq = sorted(set(labels))
    fig, ax = plt.subplots(figsize=(5, 5))
    for i, lab in enumerate(uniq):
        mask = np.asarray([l == lab for l in labels])
        ax.scatter(emb[mask, 0], emb[mask, 1], s=6, label=str(lab)[:24])
    if len(uniq) <= 20:
        ax.legend(fontsize=5, markerscale=1.5)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return emb


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="hulc_tpu result plots")
    p.add_argument("--results", required=True, help="evaluation/results.json")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--epoch", default=None, help="epoch for the task-SR plot (default: best)")
    args = p.parse_args(argv)

    results = load_results(args.results)
    out_dir = pathlib.Path(args.out_dir or pathlib.Path(args.results).parent)
    out_dir.mkdir(parents=True, exist_ok=True)
    plot_chain_sr(results, out_dir / "chain_sr.png")
    plot_avg_seq_len(results, out_dir / "avg_seq_len.png")
    epoch = args.epoch or max(results, key=lambda e: results[e]["avg_seq_len"])
    plot_task_sr(results, epoch, out_dir / f"task_sr_epoch{epoch}.png")
    print(f"[plots] wrote chain_sr / avg_seq_len / task_sr to {out_dir}")


if __name__ == "__main__":
    main()
