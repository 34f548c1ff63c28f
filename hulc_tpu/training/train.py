"""CLI training entry point (reference: python hulc/training.py ...).

Examples:
  python -m hulc_tpu.training.train --config gcbc_debug --steps 5 --fixture
  python -m hulc_tpu.training.train --config hulc --data-dir /data/task_D_D \
      --run-dir runs/hulc_d --epochs 30
"""

from __future__ import annotations

import argparse
import pathlib
import tempfile

from hulc_tpu.config import get_config
from hulc_tpu.data.fixtures import make_fixture_dataset
from hulc_tpu.data.loader import make_loaders
from hulc_tpu.training.schedules import KLSchedule
from hulc_tpu.training.trainer import Trainer, TrainerConfig


def resolve_mesh_devices(batch_size, tp=1, sp=1, n_avail=None, process_count=1):
    """Device count for the Trainer mesh, or None to use every device.

    Single-host only: clamps the data axis to the largest divisor of the
    per-modality batch that fits (pjit needs batch % data_axis == 0), and
    shrinks the mesh when tp*sp doesn't divide the device count (e.g. tp=3
    on 8 devices -> a valid 6-device mesh). Multi-host (process_count > 1)
    never clamps: jax.devices() is global while batch_size is per-host, and
    slicing devices[:k] would exclude other processes' local devices.
    """
    par = max(tp, 1) * max(sp, 1)
    if process_count > 1:
        return None
    n_data = max(n_avail // par, 1)
    n_data_clamped = next(d for d in range(n_data, 0, -1) if batch_size % d == 0)
    if n_data_clamped * par != n_avail:
        return n_data_clamped * par
    return None


def main(argv=None):
    p = argparse.ArgumentParser(description="hulc_tpu trainer")
    p.add_argument("--config", default="hulc", help="model preset (hulc|mcil|gcbc|*_debug)")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE", dest="overrides",
        help="dotted config override (repeatable), e.g. "
        "--set action_decoder.hidden_size=4096 --set loss.kl_beta=0.1 "
        "(reference: hydra CLI overrides)",
    )
    p.add_argument("--data-dir", default=None, help="CALVIN dataset root (training/ + validation/)")
    p.add_argument("--fixture", action="store_true", help="train on a synthetic fixture dataset")
    p.add_argument("--run-dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None, help="hard cap on optimizer steps")
    p.add_argument("--batch-size", type=int, default=32, help="per-modality batch size")
    p.add_argument("--min-window", type=int, default=None)
    p.add_argument("--max-window", type=int, default=None)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr-schedule", default="constant")
    p.add_argument("--kl-schedule", default="constant", choices=["constant", "linear", "sigmoid"])
    p.add_argument("--cache", default="ram", choices=["ram", "none", "shm"])
    p.add_argument(
        "--loader-workers", type=int, default=1,
        help="parallel batch-assembly threads (reference num_workers)",
    )
    p.add_argument(
        "--gather-threads", type=int, default=1,
        help="C++ threads per shm window gather (multi-core hosts)",
    )
    p.add_argument(
        "--fuse", action=argparse.BooleanOptionalAction, default=True,
        help="loader-side modality fusion: one [vis; lang] 2B train batch "
        "through one fused pass (identical estimator, ~1 ms faster device "
        "step; --no-fuse keeps two per-modality passes)",
    )
    p.add_argument(
        "--checkpoint-policy", default="all",
        help="checkpoint retention preset (all|val_action|lh_sr|task_sr|kl|"
        "clip_loss|state_recon — reference conf/callbacks/checkpoint/*.yaml)",
    )
    p.add_argument(
        "--echo-factor", type=int, default=1,
        help="optimizer steps per transferred host batch (data echoing; >1 "
        "when the input pipeline can't keep the device fed — see README "
        "for the measured training-quality cost per echo level)",
    )
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute dtype")
    p.add_argument(
        "--optimizer", default="adam", choices=["adam", "adamw", "sgd"],
        help="reference conf/model/optimizer/*.yaml (adamw: wd 1e-6; sgd: momentum 0.9)",
    )
    p.add_argument(
        "--adam-mv-dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="storage dtype for adam moments (computed f32 either way; "
        "bfloat16 — the default, certified by MOMENTS_STUDY.json — halves "
        "two of the six optimizer HBM streams, -0.79 ms on the bench step; "
        "float32 gives bit-exact reference-adam moment storage)",
    )
    p.add_argument(
        "--fsdp", action="store_true",
        help="ZeRO-3 param+optimizer sharding over the data axis",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor parallelism: size of the 'model' mesh axis (2D data x "
        "model mesh, Megatron-style column-partitioned kernels; composes "
        "with --fsdp)",
    )
    p.add_argument(
        "--sp", type=int, default=1,
        help="sequence parallelism: size of the 'seq' mesh axis (2D data x "
        "seq mesh; window/time dim of per-frame fields sharded, GSPMD "
        "gathers at the sequence joins; exclusive with --tp)",
    )
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-every", type=int, default=50, help="log every N loader batches")
    p.add_argument(
        "--val-every-epochs", type=int, default=1,
        help="run validation + per-epoch diagnostic callbacks every N epochs "
        "(the final/step-capped epoch always evaluates)",
    )
    p.add_argument(
        "--checkpoint-every", type=int, default=1,
        help="checkpoint every N epochs (a --steps-capped run always saves at the end)",
    )
    p.add_argument(
        "--checkpoint-every-steps", type=int, default=None,
        help="additionally checkpoint every N optimizer steps (long epochs "
        "on a drop-prone tunnel otherwise lose the whole epoch on a drop)",
    )
    p.add_argument(
        "--steps-total", type=int, default=None,
        help="cap the CUMULATIVE step counter instead of per-invocation "
        "steps: an elastic retry loop can relaunch the same command and "
        "train only the remainder (supersedes --steps when set)",
    )
    p.add_argument(
        "--rollout", action="store_true",
        help="run the long-horizon rollout callback each val epoch (fake env "
        "unless --env-factory module:function is given)",
    )
    p.add_argument("--env-factory", default=None)
    p.add_argument("--rollout-sequences", type=int, default=128)
    p.add_argument("--rollout-ep-len", type=int, default=360)
    p.add_argument(
        "--rollout-mode", default="batched", choices=["batched", "sequential"],
        help="batched = lockstep E-env jitted policy step (reuses the compiled "
        "policy across epochs); sequential = one env at a time",
    )
    p.add_argument("--rollout-num-envs", type=int, default=32)
    p.add_argument(
        "--rollout-videos", type=int, default=0,
        help="capture the first N chains as videos per rollout epoch "
        "(reference rollout_lh num_videos)",
    )
    p.add_argument(
        "--val-max-batches", type=int, default=None,
        help="cap validation batches per epoch (default: full val set)",
    )
    args = p.parse_args(argv)

    # multi-host pods: HULC_TPU_COORDINATOR=host:port triggers
    # jax.distributed.initialize before any backend use
    import os

    from hulc_tpu.utils.tunnel import compact_tunnel_journal

    compact_tunnel_journal()  # before first backend use (utils/tunnel.py)

    coordinator = os.environ.get("HULC_TPU_COORDINATOR")
    if coordinator:
        from hulc_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(coordinator)

    overrides = {}
    if args.bf16:
        overrides["compute_dtype"] = "bfloat16"
    cfg = get_config(args.config, **overrides)
    if args.overrides:
        from hulc_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)

    # Clamp the data-mesh size so tiny batches shard evenly: pjit requires
    # the global batch dim divisible by the data axis, and a debug run like
    # --batch-size 2 on an 8-device host would otherwise fail deep inside
    # device_put. The per-modality batch is the binding constraint (the val
    # loader is unfused even when training is fused, and if it divides then
    # the fused [vis; lang] 2B batch divides too).
    import jax

    n_avail = len(jax.devices())
    num_devices = resolve_mesh_devices(
        args.batch_size, args.tp, args.sp, n_avail, jax.process_count()
    )
    if num_devices is not None:
        print(
            f"[train] mesh clamped to {num_devices}/{n_avail} devices so the "
            f"per-modality batch ({args.batch_size}) and tp/sp shard evenly"
        )

    debug = args.config.endswith("_debug")
    min_w = args.min_window or (8 if debug else 20)
    max_w = args.max_window or (8 if debug else 32)

    if args.fixture or args.data_dir is None:
        root = pathlib.Path(tempfile.mkdtemp(prefix="hulc_fixture_"))
        make_fixture_dataset(root, num_episodes=2, episode_len=48, small=debug)
        print(f"[train] using synthetic fixture dataset at {root}")
    else:
        root = pathlib.Path(args.data_dir)

    run_dir = args.run_dir or f"runs/{args.config}"
    tcfg = TrainerConfig(
        run_dir=run_dir,
        num_devices=num_devices,
        max_epochs=args.epochs or (10**9 if args.steps else 100),  # --steps caps, not epochs
        lr=args.lr,
        lr_schedule=args.lr_schedule,
        kl_schedule=KLSchedule(kind=args.kl_schedule),
        seed=args.seed,
        val_max_batches=args.val_max_batches,
        val_every_epochs=args.val_every_epochs,
        checkpoint_policy=args.checkpoint_policy,
        echo_factor=args.echo_factor,
        log_every=args.log_every,
        checkpoint_every_epochs=args.checkpoint_every,
        checkpoint_every_steps=args.checkpoint_every_steps,
        fsdp=args.fsdp,
        tp=args.tp,
        sp=args.sp,
        optimizer=args.optimizer,
        adam_mv_dtype=args.adam_mv_dtype,
    )
    trainer = Trainer(cfg, tcfg)
    train_loader = make_loaders(
        cfg, root, "training", args.batch_size, min_w, max_w, cache=args.cache,
        seed=args.seed, num_workers=args.loader_workers, gather_threads=args.gather_threads,
        fuse=args.fuse,
    )
    try:
        val_loader = make_loaders(
            cfg, root, "validation", args.batch_size, min_w, max_w,
            cache=args.cache, seed=args.seed + 100, deterministic=True,
        )
    except FileNotFoundError:
        val_loader = None

    callbacks = []
    if cfg.use_clip_auxiliary_loss and val_loader is not None:
        from hulc_tpu.evaluation.metrics import ClipGroundtruthCallback

        callbacks.append(ClipGroundtruthCallback(val_loader))
    if args.rollout:
        from hulc_tpu.data.language import load_task_embeddings
        from hulc_tpu.evaluation.rollout_callback import RolloutLongHorizonCallback
        from hulc_tpu.evaluation.tasks import SceneObsTasks

        if args.env_factory:
            from hulc_tpu.evaluation.evaluate import _load_env_factory

            raw_factory = _load_env_factory(args.env_factory)
            env, oracle = raw_factory()
            env_factory = lambda: raw_factory()[0]  # noqa: E731
        else:
            from hulc_tpu.evaluation.fake_env import fake_env_for

            env, oracle = fake_env_for(cfg), SceneObsTasks()
            env_factory = lambda: fake_env_for(cfg)  # noqa: E731
        emb_path = root / "validation" / "lang_paraphrase-MiniLM-L3-v2" / "embeddings.npy"
        lang_embeddings = load_task_embeddings(emb_path) if emb_path.exists() else None
        from hulc_tpu.data.dataset import DatasetStatistics

        callbacks.append(
            RolloutLongHorizonCallback(
                env, oracle,
                num_sequences=args.rollout_sequences,
                ep_len=args.rollout_ep_len,
                skip_epochs=0,
                lang_embeddings=lang_embeddings,
                statistics=DatasetStatistics.load(root / "validation"),
                mode=args.rollout_mode,
                env_factory=env_factory,
                num_envs=args.rollout_num_envs,
                num_videos=args.rollout_videos,
            )
        )

    state = trainer.fit(
        train_loader,
        val_loader,
        max_epochs=tcfg.max_epochs,
        max_steps=None if args.steps_total is not None else args.steps,
        resume=not args.no_resume,
        callbacks=callbacks,
        max_total_steps=args.steps_total,
    )
    print(f"[train] done at step {int(state.step)}; checkpoints in {run_dir}/saved_models")
    return state


if __name__ == "__main__":
    main()
