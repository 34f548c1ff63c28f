"""Plots, t-SNE, parallel eval shard logic, interactive driver plumbing."""

import json

import numpy as np
import pytest

from hulc_tpu.evaluation import plots


@pytest.fixture()
def results(tmp_path):
    data = {
        "0": {
            "avg_seq_len": 1.2,
            "chain_sr": {"1": 0.6, "2": 0.3, "3": 0.2, "4": 0.1, "5": 0.0},
            "task_sr": {"open_drawer": 0.8, "move_slider_left": 0.4},
        },
        "5": {
            "avg_seq_len": 2.6,
            "chain_sr": {"1": 0.8, "2": 0.6, "3": 0.5, "4": 0.4, "5": 0.3},
            "task_sr": {"open_drawer": 0.9, "move_slider_left": 0.7},
        },
    }
    path = tmp_path / "results.json"
    path.write_text(json.dumps(data))
    return path


def test_plots_cli(results, tmp_path):
    out = tmp_path / "plots"
    plots.main(["--results", str(results), "--out-dir", str(out)])
    assert (out / "chain_sr.png").exists()
    assert (out / "avg_seq_len.png").exists()
    assert (out / "task_sr_epoch5.png").exists()


def test_tsne_plot(tmp_path):
    rng = np.random.default_rng(0)
    plans = np.concatenate([rng.normal(0, 1, (20, 16)), rng.normal(5, 1, (20, 16))])
    labels = ["a"] * 20 + ["b"] * 20
    emb = plots.plot_tsne(plans, labels, tmp_path / "tsne.png", perplexity=5)
    assert emb.shape == (40, 2)
    assert (tmp_path / "tsne.png").exists()


def test_run_parallel_shards_cover_all():
    epochs = list(range(7))
    shards = [epochs[i::3] for i in range(3)]
    flat = sorted(e for s in shards for e in s)
    assert flat == epochs
