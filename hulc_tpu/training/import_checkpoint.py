"""Import a reference PyTorch checkpoint into an evaluable run directory.

Glue between the converter and the evaluation stack: takes a published HULC
``.ckpt`` (checkpoints/download_model_weights.sh), converts the state_dict
to our params, grafts it onto a fresh init (aux heads the checkpoint lacks
keep their init), and writes an orbax checkpoint under
``<run_dir>/saved_models/epoch_<N>`` — which the eval CLI / HulcPolicy can
load directly::

    python -m hulc_tpu.training.import_checkpoint \
        --ckpt HULC_D_D/epoch=30.ckpt --config hulc --run-dir runs/imported
    python -m hulc_tpu.evaluation.evaluate --run-dir runs/imported ...
"""

from __future__ import annotations

import argparse
import re


def import_checkpoint(ckpt_path, cfg, run_dir, epoch=None, exclude_plan_recognition=False):
    import jax

    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.training import checkpoint as ckpt
    from hulc_tpu.training.pretrain import initialize_pretrained_weights
    from hulc_tpu.training.torch_convert import load_torch_checkpoint

    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    template = init_params(model, jax.random.key(0), batch)
    converted, unused = load_torch_checkpoint(ckpt_path, cfg)
    params = initialize_pretrained_weights(template, converted, exclude_plan_recognition)

    if epoch is None:
        m = re.search(r"epoch[=_-]?(\d+)", str(ckpt_path))
        epoch = int(m.group(1)) if m else 0
    path = ckpt.save_checkpoint(run_dir, epoch, {"params": params, "opt_state": None, "step": 0})
    return path, unused


def main(argv=None):
    p = argparse.ArgumentParser(description="import a reference torch checkpoint")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--config", default="hulc")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--exclude-plan-recognition", action="store_true")
    args = p.parse_args(argv)

    from hulc_tpu.config import get_config

    path, unused = import_checkpoint(
        args.ckpt, get_config(args.config), args.run_dir, args.epoch,
        args.exclude_plan_recognition,
    )
    print(f"[import] wrote {path}")
    if unused:
        print(f"[import] {len(unused)} unconverted reference keys (buffers/aux): {unused[:5]}...")


if __name__ == "__main__":
    main()
