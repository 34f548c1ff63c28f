"""Data-echoing quality cost measurement (VERDICT r2 #3).

``TrainerConfig.echo_factor`` trades input-pipeline pressure for sample
diversity: E optimizer steps per transferred host batch (fresh augmentation
RNG per echo). Choi et al. 2020 report echoing can cost sample efficiency;
this script measures that cost for THIS model/data: same learnable fixture,
same seed, same TOTAL optimizer steps, echo in {1, 4, 16} — then compares
the loss-vs-step curves and the final val action MAE.

    python scripts/echo_quality.py [--config hulc_debug] [--steps 600]

Prints a markdown table + one JSON line. Defaults to the debug-scale config
so the echo-1 arm (which transfers steps/1 fresh batches) stays feasible on
this rig's degraded tunnel; the optimization dynamics being compared are
architecture-identical.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import tempfile
import time


def run_arm(cfg_name, fixture, echo, steps, batch, window, lr, seed):
    import jax

    from hulc_tpu.config import get_config
    from hulc_tpu.data.loader import make_loaders
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    run_dir = tempfile.mkdtemp(prefix=f"hulc_echo{echo}_")
    cfg = get_config(cfg_name, compute_dtype="bfloat16")
    tcfg = TrainerConfig(
        run_dir=run_dir, lr=lr, seed=seed, echo_factor=echo,
        log_every=max(1, 32 // echo),  # ~same logging density in step space
        checkpoint_every_epochs=10**6,
    )
    trainer = Trainer(cfg, tcfg)
    train_loader = make_loaders(
        cfg, fixture, "training", batch, window, window, cache="ram", seed=seed
    )
    val_loader = make_loaders(
        cfg, fixture, "validation", batch, window, window,
        cache="ram", seed=seed + 100, deterministic=True,
    )
    t0 = time.time()
    state = trainer.fit(train_loader, None, max_epochs=10**9, max_steps=steps, resume=False)
    train_s = time.time() - t0
    val = trainer.validate(state, val_loader, jax.random.key(0))

    curve = []
    for line in (pathlib.Path(run_dir) / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        if rec.get("prefix") == "train":
            curve.append((rec["step"], rec["total_loss"]))
    tail = [v for _, v in curve[-3:]]
    return {
        "echo": echo,
        "final_total_loss": round(sum(tail) / len(tail), 3),
        "final_action_loss_pp": round(
            val.get("vis_action_loss_pp", float("nan")), 3
        ),
        "val_vis_mae_pp": round(val.get("vis_mae_pp", float("nan")), 3),
        "val_lang_mae_pp": round(val.get("lang_mae_pp", float("nan")), 3),
        "train_s": round(train_s, 1),
        "curve": [(s, round(v, 3)) for s, v in curve],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="hulc_debug")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--echoes", default="1,4,16")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from hulc_tpu.data.fixtures import make_fixture_dataset

    small = args.config.endswith("_debug")
    fixture = pathlib.Path(tempfile.mkdtemp(prefix="hulc_echoq_data_"))
    make_fixture_dataset(fixture, num_episodes=4, episode_len=96, small=small, learnable=True)

    arms = [
        run_arm(args.config, fixture, int(e), args.steps, args.batch_size,
                args.window, args.lr, args.seed)
        for e in args.echoes.split(",")
    ]

    print(f"\n| echo | final total loss | val vis MAE (pp) | val lang MAE (pp) | train s |")
    print("|---|---|---|---|---|")
    for a in arms:
        print(f"| {a['echo']} | {a['final_total_loss']} | {a['val_vis_mae_pp']} "
              f"| {a['val_lang_mae_pp']} | {a['train_s']} |")
    print(json.dumps({"steps": args.steps, "config": args.config,
                      "arms": [{k: v for k, v in a.items() if k != "curve"} for a in arms]}))
    return arms


if __name__ == "__main__":
    main()
