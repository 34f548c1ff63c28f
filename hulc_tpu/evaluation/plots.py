"""Result plotting (reference: hulc/evaluation/create_plots.py).

Consumes ``evaluation/results.json`` files in the schema
``{epoch: {avg_seq_len, chain_sr: {1..5}, task_sr: {...}, task_info: {...}}}``
and produces the paper-style figures: chain success rate per position,
average sequence length over epochs, per-task success rates, and t-SNE
latent-plan plots (sklearn TSNE replaces the reference's MulticoreTSNE).

Multi-experiment mode (reference create_plots.py:166-489): pass several
training dirs (or parent dirs of them) to compare runs — ranked epoch
curves, best-epoch chain SR, grouped per-task bars, static/dynamic task
category curves, and a best-performance ranking bar.
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


# ---------------------------------------------------------------------------
# Multi-experiment aggregation (reference create_plots.py:166-489)
# ---------------------------------------------------------------------------

# Reference task taxonomy (create_plots.py:21-56): "static" = fixtures
# (slider/drawer/lights/place targets), "dynamic" = free-block manipulation.
_STATIC_TASKS = frozenset(
    {
        "move_slider_left", "move_slider_right", "open_drawer", "close_drawer",
        "place_in_slider", "place_in_drawer", "turn_on_lightbulb",
        "turn_off_lightbulb", "turn_on_led", "turn_off_led",
    }
)


def task_category(task: str) -> str:
    return "static" if task in _STATIC_TASKS else "dynamic"


def load_multi_results(training_dirs: Sequence) -> Dict[str, Dict]:
    """{run_name: results} for every dir containing evaluation/results.json.

    Duplicate basenames (common with date-parent layouts) are disambiguated
    with the parent dir so runs never silently overwrite each other."""
    out = {}
    for d in training_dirs:
        d = pathlib.Path(d)
        f = d / "evaluation" / "results.json"
        if not f.exists():
            continue
        name = d.name
        if name in out:
            name = f"{d.parent.name}/{d.name}"
        out[name] = load_results(f)
    return out


def _best_epoch(run: Dict[str, Dict]) -> str:
    return max(run, key=lambda e: run[e]["avg_seq_len"])


def _ranked(multi: Dict[str, Dict], labels: Sequence[str], key):
    """Runs sorted by key(run) descending, paired with their labels."""
    items = sorted(zip(multi.values(), labels), key=lambda rl: -key(rl[0]))
    return [r for r, _ in items], [l for _, l in items]


def _epoch_curve(run: Dict[str, Dict], value):
    epochs = sorted(run, key=int)
    return [int(e) for e in epochs], [value(run[e]) for e in epochs]


def _multi_curves(curves, out_path, xlabel, ylabel, marker=None, ylim=None):
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 5))
    styles = ["solid", "dashed", "dashdot", "dotted"]
    for i, (xs, ys, label) in enumerate(curves):
        ax.plot(xs, ys, label=label, marker=marker, ls=styles[i % len(styles)])
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if ylim:
        ax.set_ylim(*ylim)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_multi_avg_seq_len(multi, labels, out_path):
    """Avg successful sequence length over epochs, one curve per run."""
    runs, labels = _ranked(multi, labels, lambda r: max(v["avg_seq_len"] for v in r.values()))
    _multi_curves(
        [(*_epoch_curve(r, lambda v: v["avg_seq_len"]), l) for r, l in zip(runs, labels)],
        out_path, "epoch", "avg successful sequence length", ylim=(0, 5),
    )


def plot_multi_chain5(multi, labels, out_path):
    """Five-in-a-row success rate over epochs per run."""
    runs, labels = _ranked(
        multi, labels, lambda r: max(v["chain_sr"]["5"] for v in r.values())
    )
    _multi_curves(
        [(*_epoch_curve(r, lambda v: 100 * v["chain_sr"]["5"]), l) for r, l in zip(runs, labels)],
        out_path, "epoch", "chain-5 success rate (%)",
    )


def plot_multi_chain_sr(multi, labels, out_path):
    """Best-epoch SR vs chain position, one curve per run."""
    runs, labels = _ranked(multi, labels, lambda r: max(v["avg_seq_len"] for v in r.values()))
    curves = []
    for run, label in zip(runs, labels):
        r = run[_best_epoch(run)]["chain_sr"]
        xs = sorted(int(k) for k in r)
        curves.append((xs, [100 * r[str(x)] for x in xs], label))
    _multi_curves(curves, out_path, "instructions in a row", "tasks completed (%)",
                  marker="o", ylim=(0, 100))


def _task_rates(epoch_result: Dict, min_total: int = 0) -> Dict[str, float]:
    """Per-task SR (%) at one epoch; prefers task_info counts (enables the
    reference's total>=10 filter), falls back to task_sr rates."""
    info = epoch_result.get("task_info")
    if info:
        return {
            t: 100.0 * v["success"] / max(v["total"], 1)
            for t, v in info.items()
            if v["total"] >= min_total
        }
    return {t: 100.0 * v for t, v in epoch_result.get("task_sr", {}).items()}


def plot_multi_task_sr(multi, labels, out_path, min_total: int = 10):
    """Grouped per-task bars at each run's best epoch (reference task_sr
    figure; tasks with < min_total attempts in the top run are dropped)."""
    plt = _mpl()
    runs, labels = _ranked(multi, labels, lambda r: max(v["avg_seq_len"] for v in r.values()))
    rates = [_task_rates(run[_best_epoch(run)], min_total=0) for run in runs]
    top = _task_rates(runs[0][_best_epoch(runs[0])], min_total=min_total)
    tasks = sorted(top, key=top.get, reverse=True)
    if not tasks:
        tasks = sorted(rates[0])
    n_runs = len(runs)
    width = 1.0 / (n_runs + 1)
    fig, ax = plt.subplots(figsize=(max(8, 0.5 * len(tasks)), 5))
    for i, (rate, label) in enumerate(zip(rates, labels)):
        xs = np.arange(len(tasks)) + i * width
        ax.bar(xs, [rate.get(t, 0.0) for t in tasks], width=width, label=label)
    ax.set_xticks(np.arange(len(tasks)) + width * (n_runs - 1) / 2)
    ax.set_xticklabels([t.replace("_", " ") for t in tasks], rotation=75, fontsize=6, ha="right")
    ax.set_ylabel("success rate (%)")
    ax.set_ylim(0, 100)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_multi_task_categories(multi, labels, out_path):
    """Static vs dynamic task-category SR over epochs (needs task_info)."""
    plt = _mpl()
    runs, labels = _ranked(multi, labels, lambda r: max(v["avg_seq_len"] for v in r.values()))
    fig, ax = plt.subplots(figsize=(7, 5))
    colors = [f"C{i}" for i in range(10)]
    for i, (run, label) in enumerate(zip(runs, labels)):
        epochs = sorted(run, key=int)
        for cat, style in (("static", "solid"), ("dynamic", "dashed")):
            ys = []
            for e in epochs:
                info = run[e].get("task_info", {})
                s = sum(v["success"] for t, v in info.items() if task_category(t) == cat)
                n = sum(v["total"] for t, v in info.items() if task_category(t) == cat)
                ys.append(100.0 * s / n if n else np.nan)
            ax.plot([int(e) for e in epochs], ys, color=colors[i % 10], ls=style,
                    label=f"{label} {cat}")
    ax.set_xlabel("epoch")
    ax.set_ylabel("success rate (%)")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_ranking(multi, labels, out_path):
    """Best avg_seq_len per run as a ranked bar chart."""
    plt = _mpl()
    best = [max(v["avg_seq_len"] for v in run.values()) for run in multi.values()]
    order = np.argsort(best)[::-1]
    fig, ax = plt.subplots(figsize=(max(5, 0.8 * len(best)), 4))
    ax.bar(range(len(best)), [best[i] for i in order])
    ax.set_xticks(range(len(best)))
    ax.set_xticklabels([labels[i].replace("_", " ") for i in order], rotation=60,
                       fontsize=8, ha="right")
    ax.set_ylabel("best avg sequence length")
    ax.set_ylim(0, 5)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def load_tsne_data(run_dir) -> Dict[int, pathlib.Path]:
    """{epoch: tsne_data_<epoch>.npz path} under <run>/evaluation
    (written by evaluate.py --tsne-dump; reference create_plots.py:150-163)."""
    out = {}
    for f in (pathlib.Path(run_dir) / "evaluation").glob("tsne_data_*.npz"):
        try:
            out[int(f.stem.split("_")[-1])] = f
        except ValueError:
            continue
    return out


def create_tsne_figures(training_dirs, out_dir) -> List[pathlib.Path]:
    """Best-epoch latent-plan t-SNE per run (reference create_tsne_plot)."""
    out_dir = pathlib.Path(out_dir)
    written = []
    for d in training_dirs:
        d = pathlib.Path(d)
        results_f = d / "evaluation" / "results.json"
        tsne_files = load_tsne_data(d)
        if not results_f.exists() or not tsne_files:
            continue
        results = load_results(results_f)
        epochs = [e for e in results if int(e) in tsne_files]
        if not epochs:
            continue
        best = max(epochs, key=lambda e: results[e]["avg_seq_len"])
        data = np.load(tsne_files[int(best)], allow_pickle=True)
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"latent_plans_{d.name}_{best}.png"
        plot_tsne(data["plans"], [str(l) for l in data["labels"]], path)
        written.append(path)
    return written


def create_multi_plots(training_dirs, out_dir, labels: Optional[Sequence[str]] = None):
    """All cross-run comparison figures into out_dir; returns written paths."""
    multi = load_multi_results(training_dirs)
    if not multi:
        raise FileNotFoundError(f"no evaluation/results.json under {list(training_dirs)}")
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if labels is None or len(labels) != len(multi):
        labels = list(multi.keys())
    written = []
    for fn, name in [
        (plot_multi_avg_seq_len, "avg_seq_len.png"),
        (plot_multi_chain5, "chain5.png"),
        (plot_multi_chain_sr, "chain_sr.png"),
        (plot_multi_task_sr, "task_sr.png"),
        (plot_multi_task_categories, "task_categories.png"),
        (plot_ranking, "best_performance.png"),
    ]:
        path = out_dir / name
        fn(multi, list(labels), path)
        written.append(path)
    written += create_tsne_figures(training_dirs, out_dir)
    return written


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="hulc_tpu result plots")
    p.add_argument("--results", default=None, help="single evaluation/results.json")
    p.add_argument("--training-dirs", default=None, help="comma-separated run dirs (multi-run mode)")
    p.add_argument("--parent-dirs", default=None, help="comma-separated parents of run dirs")
    p.add_argument("--labels", default=None, help="comma-separated run labels")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--epoch", default=None, help="epoch for the task-SR plot (default: best)")
    args = p.parse_args(argv)

    if args.training_dirs or args.parent_dirs:
        if args.training_dirs:
            dirs = [pathlib.Path(d) for d in args.training_dirs.split(",")]
        else:
            dirs = [
                run
                for parent in args.parent_dirs.split(",")
                for run in sorted(pathlib.Path(parent).iterdir())
                if run.is_dir()
            ]
        labels = args.labels.split(",") if args.labels else None
        out_dir = pathlib.Path(args.out_dir or "comparison_plots")
        written = create_multi_plots(dirs, out_dir, labels)
        print(f"[plots] wrote {len(written)} comparison figures to {out_dir}")
        return

    if not args.results:
        p.error("pass --results (single run) or --training-dirs/--parent-dirs (comparison)")
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
