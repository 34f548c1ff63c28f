"""AOT policy export: versioned StableHLO serving artifacts via jax.export.

The reference has no serving story — its evaluation entrypoint
(`/root/reference/hulc/evaluation/evaluate_policy.py:163-186`) imports the
full Lightning training class and re-instantiates it from the hydra config
to run a policy. TPU-native redesign: the closed-loop policy's device
functions (evaluation/policy.py::build_policy_fns and the lockstep batched
step, evaluation/batched_eval.py::build_batched_step) are exported ONCE as
serialized StableHLO modules that any JAX runtime can deserialize and call
— no flax, no model code, no config system on the serving host. Params ride
alongside as a flat ``params.npz``; obs normalization, replan cadence and
decoder-carry shapes are meta-driven (``meta.json``).

Artifact layout (one directory):

    meta.json            format version, shapes, normalizer, carry spec
    params.npz           flat '/'-joined param tree (float32)
    replan_lang.jaxexp   (params, key_data, rgb_static, rgb_gripper,
                          rob_norm, lang_emb) -> (plan, latent_goal)
    replan_vision.jaxexp (params, key_data, 2-frame stacks)  -> (plan, goal)
    act.jaxexp           (params, key_data, plan, goal, frames, rob_norm,
                          rob_raw, carry) -> (action, carry)
    step_batched.jaxexp  optional E-lane lockstep step (--lanes E)
    lang_embeddings.npy  optional instruction -> embedding table

RNG crosses the boundary as raw ``jax.random.key_data`` (uint32) so the
artifact ABI has no typed-key extension types; images cross raw uint8 —
all preprocessing (normalize, resize) is inside the exported graph.

Export is multi-platform by default (cpu + tpu): one artifact serves both
the TPU fleet and CPU integration tests. The platform safety check is
disabled (the PJRT plugin on this rig registers a nonstandard platform
name); pass ``strict_platforms=True`` to keep it.
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hulc_tpu.config import HulcConfig
from hulc_tpu.data.dataset import DatasetStatistics
from hulc_tpu.evaluation.policy import StateObsNormalizer, build_policy_fns
from hulc_tpu.models import make_model
from hulc_tpu.models.decoders import decoder_carry
from hulc_tpu.serving.params_io import flatten_params, unflatten_params

__all__ = ["export_policy", "flatten_params", "unflatten_params"]

FORMAT_VERSION = 1


def _wrap_key(fn):
    """Typed-PRNG-key arg -> raw uint32 key_data arg (plain-dtype ABI)."""

    def wrapped(params, key_data, *args):
        return fn(params, jax.random.wrap_key_data(key_data), *args)

    return wrapped


def _carry_spec(cfg: HulcConfig) -> Dict:
    d = cfg.action_decoder
    return {"rnn_cell": d.rnn_cell, "num_layers": d.num_layers, "hidden_size": d.hidden_size}


def _export_one(fn, example_args, platforms, strict_platforms):
    from jax import export as jexport

    checks = () if strict_platforms else (jexport.DisabledSafetyCheck.platform(),)
    exp = jexport.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms else None,
        disabled_checks=list(checks),
    )(*example_args)
    return bytes(exp.serialize())


def export_policy(
    cfg: HulcConfig,
    params,
    out_dir,
    statistics: Optional[DatasetStatistics] = None,
    lang_embeddings: Optional[Dict[str, np.ndarray]] = None,
    platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
    strict_platforms: bool = False,
    lanes: int = 0,
) -> pathlib.Path:
    """Write a self-contained serving artifact directory.

    lanes > 0 additionally exports the E-lane lockstep batched step
    (lang-goal serving at throughput; see evaluation/batched_eval.py).
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # Canonicalize params to host arrays: a checkpoint restored from a
    # multi-device training run carries mesh shardings, and jax.export would
    # bake that device count into the artifact (nr_devices=N), making it
    # refuse to run on a single-device serving host. Serving artifacts are
    # single-device by contract (use lanes=E batching for throughput).
    params = jax.tree.map(np.asarray, params)
    model = make_model(cfg)
    norm = StateObsNormalizer(cfg, statistics)
    pe = cfg.perceptual_encoder

    def img_example(cam_cfg, e, s):
        if cam_cfg is None:
            return None
        px = cam_cfg.input_size
        return jnp.zeros((e, s, px, px, 3), jnp.uint8)

    prop_dim = int(sum(b - a for a, b in norm.keep))
    kd = jax.random.key_data(jax.random.key(0))

    replan_lang, replan_vision, act = build_policy_fns(model, cfg)
    rl = _wrap_key(replan_lang)
    rv = _wrap_key(replan_vision)
    ac = _wrap_key(act)

    rl_args = (
        params, kd,
        img_example(pe.rgb_static, 1, 1), img_example(pe.rgb_gripper, 1, 1),
        jnp.zeros((1, 1, prop_dim), jnp.float32),
        jnp.zeros((1, cfg.lang_dim), jnp.float32),
    )
    rv_args = (
        params, kd,
        img_example(pe.rgb_static, 1, 2), img_example(pe.rgb_gripper, 1, 2),
        jnp.zeros((1, 2, prop_dim), jnp.float32),
    )
    plan_shape, goal_shape = jax.eval_shape(rl, *rl_args)
    carry = decoder_carry(cfg.action_decoder, 1)
    act_args = (
        params, kd,
        jnp.zeros(plan_shape.shape, plan_shape.dtype),
        jnp.zeros(goal_shape.shape, goal_shape.dtype),
        img_example(pe.rgb_static, 1, 1), img_example(pe.rgb_gripper, 1, 1),
        jnp.zeros((1, 1, prop_dim), jnp.float32),
        jnp.zeros((1, 1, 15), jnp.float32),
        carry,
    )

    blobs = {}
    try:
        blobs["replan_lang"] = _export_one(rl, rl_args, platforms, strict_platforms)
    except Exception as e:  # noqa: BLE001 — fall back to single-platform export
        if platforms is None:
            raise
        print(f"[export] multi-platform export failed ({e!r}); retrying current-platform-only")
        platforms = None
        blobs["replan_lang"] = _export_one(rl, rl_args, platforms, strict_platforms)
    blobs["replan_vision"] = _export_one(rv, rv_args, platforms, strict_platforms)
    blobs["act"] = _export_one(ac, act_args, platforms, strict_platforms)

    if lanes > 0:
        from hulc_tpu.evaluation.batched_eval import build_batched_step

        step = build_batched_step(model, cfg)

        def batched(params, key_data, *args):
            return step(params, jax.random.wrap_key_data(key_data), *args)

        e = lanes
        plan_dim = 0 if cfg.model_kind == "gcbc" else cfg.distribution.plan_dim
        b_args = (
            params, kd,
            img_example(pe.rgb_static, e, 1), img_example(pe.rgb_gripper, e, 1),
            jnp.zeros((e, 1, prop_dim), jnp.float32),
            jnp.zeros((e, 1, 15), jnp.float32),
            jnp.zeros((e, cfg.lang_dim), jnp.float32),
            jnp.zeros((e, plan_dim), jnp.float32),
            jnp.zeros((e, cfg.visual_goal.latent_goal_features), jnp.float32),
            decoder_carry(cfg.action_decoder, e),
            jnp.zeros((e,), bool),
        )
        blobs["step_batched"] = _export_one(batched, b_args, platforms, strict_platforms)

    for name, blob in blobs.items():
        (out / f"{name}.jaxexp").write_bytes(blob)
    np.savez(out / "params.npz", **flatten_params(params))
    if lang_embeddings:
        np.save(
            out / "lang_embeddings.npy",
            {k: np.asarray(v, np.float32) for k, v in lang_embeddings.items()},
            allow_pickle=True,
        )

    meta = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "model_kind": cfg.model_kind,
        "replan_freq": cfg.replan_freq,
        "lang_dim": cfg.lang_dim,
        "prop_dim": prop_dim,
        "plan_dim": int(plan_shape.shape[-1]),
        "latent_goal_features": int(goal_shape.shape[-1]),
        "lanes": lanes,
        "cameras": {
            "rgb_static": pe.rgb_static.input_size if pe.rgb_static else None,
            "rgb_gripper": pe.rgb_gripper.input_size if pe.rgb_gripper else None,
        },
        "proprio": {
            "keep": [list(k) for k in norm.keep],
            "normalize": bool(norm.normalize),
            "include_scene": bool(norm.include_scene),
            "robot_obs_mean": np.asarray(norm.rob_mean).tolist(),
            "robot_obs_std": np.asarray(norm.rob_std).tolist(),
            "scene_obs_mean": np.asarray(norm.scene_mean).tolist(),
            "scene_obs_std": np.asarray(norm.scene_std).tolist(),
        },
        "carry": _carry_spec(cfg),
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    print(f"[export] wrote {sorted(p.name for p in out.iterdir())} -> {out}")
    return out


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Export a trained policy as a serving artifact")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--config", required=True, help="config preset name")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE", dest="overrides",
        help="dotted config override (repeatable); must match the trained "
        "checkpoint's architecture",
    )
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--checkpoint", default="last", help="last | best | <epoch>")
    p.add_argument("--dataset-dir", default=None, help="for statistics + lang embeddings")
    p.add_argument("--lang-folder", default="lang_annotations")
    p.add_argument("--lanes", type=int, default=0, help="also export an E-lane batched step")
    p.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma list, or 'native' for current-backend-only",
    )
    args = p.parse_args(argv)

    from hulc_tpu.config import get_config
    from hulc_tpu.models import example_batch, init_params
    from hulc_tpu.training import checkpoint as ckpt

    cfg = get_config(args.config)
    if args.overrides:
        from hulc_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    template = init_params(model, jax.random.key(0), batch)
    run_dir = pathlib.Path(args.run_dir)
    if args.checkpoint == "last":
        path = ckpt.latest_checkpoint(run_dir)
    elif args.checkpoint == "best":
        path = ckpt.best_checkpoint(run_dir, "lh_sr")
    else:
        wanted = int(args.checkpoint)
        path = next(
            (p_ for p_ in ckpt.all_checkpoints(run_dir) if ckpt.checkpoint_epoch(p_) == wanted),
            None,
        )
    if path is None:
        raise SystemExit(f"no checkpoint found in {run_dir}/saved_models")
    params = ckpt.restore_params(path, template)

    stats, lang_embeddings = None, None
    if args.dataset_dir:
        from hulc_tpu.data.language import load_task_embeddings

        val_dir = pathlib.Path(args.dataset_dir) / "validation"
        stats = DatasetStatistics.load(val_dir)
        emb_path = val_dir / args.lang_folder / "embeddings.npy"
        if emb_path.exists():
            lang_embeddings = load_task_embeddings(emb_path)

    platforms = None if args.platforms == "native" else tuple(args.platforms.split(","))
    export_policy(
        cfg, params, args.out,
        statistics=stats, lang_embeddings=lang_embeddings,
        platforms=platforms, lanes=args.lanes,
    )


if __name__ == "__main__":
    main()
