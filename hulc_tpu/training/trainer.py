"""Data-parallel trainer: jitted train/val steps over a device mesh.

Replaces the reference's Lightning Trainer + DDPStrategy stack
(hulc/training.py): one jitted train step takes the uint8 host batch,
runs on-device preprocessing + forward + backward + adam update with the
batch sharded over the ``data`` mesh axis and params replicated — XLA
inserts the gradient psum over ICI (no NCCL, no gradient-sync hacks).

Features carried over from the reference runtime (SURVEY.md §5):
  * KL-beta annealing per epoch as a traced scalar (no recompiles);
  * warmup-step inference for lr schedules (hulc.py:189-237);
  * per-epoch orbax checkpoints + auto-resume from a fixed run dir;
  * metric logging (JSONL + stdout; wandb/tensorboard if available).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state as flax_train_state

from hulc_tpu.config import HulcConfig
from hulc_tpu.models import make_model
from hulc_tpu.models.hulc import HulcModel, ModalityBatch
from hulc_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch_tree,
)
from hulc_tpu.training import checkpoint as ckpt
from hulc_tpu.training.preprocess import preprocess_batch
from hulc_tpu.training.schedules import KLSchedule, make_lr_schedule

Array = jax.Array


class TrainState(flax_train_state.TrainState):
    pass


@dataclasses.dataclass
class TrainerConfig:
    run_dir: str = "runs/dev"
    max_epochs: int = 100
    lr: float = 2e-4
    lr_schedule: str = "constant"
    num_warmup_steps: float = 0.1
    kl_schedule: KLSchedule = dataclasses.field(default_factory=KLSchedule)
    seed: int = 42
    log_every: int = 50
    val_every_epochs: int = 1
    checkpoint_every_epochs: int = 1
    # additionally checkpoint every N optimizer steps (None = epoch-only).
    # Long epochs on a drop-prone tunnel otherwise lose the WHOLE epoch on a
    # connection drop (found round 5: 4143-step epochs under
    # AXON_JOURNAL_COMPACT, where a drop kills the process by design —
    # utils/tunnel.py). Mid-epoch saves overwrite the current epoch key.
    checkpoint_every_steps: Optional[int] = None
    num_devices: Optional[int] = None  # None -> all
    donate_state: bool = True
    # metric-monitored top-k checkpoint retention: a preset name from
    # checkpoint.CHECKPOINT_PRESETS ("all", "val_action", "lh_sr", "task_sr",
    # "kl", "clip_loss", "state_recon" — reference
    # conf/callbacks/checkpoint/*.yaml) or a CheckpointPolicy instance.
    checkpoint_policy: Any = "all"
    # ZeRO-3-style parameter sharding over the data axis. The 47M-param HULC
    # fits replicated (the default); enable for larger model variants.
    fsdp: bool = False
    # tensor parallelism: size of the 'model' mesh axis (1 = off). With
    # tp > 1 the mesh is 2D (data x model); matmul kernels are
    # column-partitioned over 'model' (parallel/mesh.py::tp_param_sharding)
    # and XLA's SPMD partitioner propagates activation shardings + inserts
    # the collectives. Combine with fsdp=True for ZeRO over the data axis.
    tp: int = 1
    # sequence parallelism: size of the 'seq' mesh axis (1 = off). With
    # sp > 1 the mesh is 2D (data x seq) and the window/time dim of every
    # per-frame batch field is sharded over 'seq' — the dominant per-frame
    # conv FLOPs split S-ways; GSPMD all-gathers the sequence where it
    # rejoins (plan-recognition attention, decoder scan). Params replicated.
    # Mutually exclusive with tp (both own the second mesh axis); single
    # process only. At HULC's S<=32 this is a scaling demonstration, not a
    # production need (SURVEY.md §5 long-context note).
    sp: int = 1
    # optimizer family (reference conf/model/optimizer/*.yaml): adam
    # (default), adamw (weight_decay 1e-6), sgd (momentum 0.9)
    optimizer: str = "adam"
    # storage dtype for the adam moment buffers; arithmetic stays f32 either
    # way (training/optimizers.py rounds at write-back). bf16 is the default
    # (VERDICT r4 weak #3: the advertised bench config must be the shipping
    # one): it halves two of the six optimizer-state HBM streams on the
    # bandwidth-bound step (-0.79 ms, STEP_EXPERIMENTS.json) and paired
    # same-seed full-size runs show no trajectory cost (MOMENTS_STUDY.json).
    # Set "float32" for bit-exact reference-adam moment storage.
    adam_mv_dtype: Optional[str] = "bfloat16"
    # jax.profiler trace of steps [profile_start, profile_start+profile_steps)
    # written to <run_dir>/profile (no profiling subsystem exists in the
    # reference to port — SURVEY.md §5)
    profile_start: Optional[int] = None
    profile_steps: int = 5
    # cap validation batches per epoch. None (default) = full val set, like
    # the reference; set a cap only for smoke runs — epoch-level model
    # selection on a small val sample is noisy (VERDICT round 1).
    val_max_batches: Optional[int] = None
    # batch echoing (Choi et al. 2020, "Faster Neural Network Training with
    # Data Echoing"): run E optimizer steps per transferred host batch. Each
    # echo reuses the device-resident uint8 batch but gets a fresh
    # augmentation/dropout RNG (the step rng folds in state.step), so echoes
    # see different random crops. Use when the input pipeline (host or
    # host->device link) can't keep up with the device step.
    echo_factor: int = 1


class MetricLogger:
    """JSONL + stdout metric sink (stands in for wandb/tb loggers)."""

    def __init__(self, run_dir):
        self.path = pathlib.Path(run_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = "train") -> None:
        rec = {"step": step, "prefix": prefix}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


class Trainer:
    def __init__(self, cfg: HulcConfig, tcfg: TrainerConfig):
        self.cfg = cfg
        self.tcfg = tcfg
        self.model: HulcModel = make_model(cfg)
        if tcfg.tp > 1 and tcfg.sp > 1:
            raise ValueError("tp and sp are mutually exclusive (both use the 2nd mesh axis)")
        if tcfg.tp > 1 or tcfg.sp > 1:
            from hulc_tpu.parallel.mesh import make_mesh_2d

            par = max(tcfg.tp, tcfg.sp)
            n_total = tcfg.num_devices or len(jax.devices())
            if n_total % par:
                raise ValueError(f"num_devices {n_total} not divisible by tp/sp={par}")
            axis = "model" if tcfg.tp > 1 else "seq"
            self.mesh = make_mesh_2d(n_total // par, par, second_axis=axis)
        else:
            self.mesh = make_mesh(tcfg.num_devices)
        self._seq_axis = "seq" if tcfg.sp > 1 else None
        self.logger = MetricLogger(tcfg.run_dir)
        self._train_step = None
        self._val_step = None
        self.epoch = 0
        self.checkpointer = ckpt.MonitoredCheckpointer(tcfg.run_dir, tcfg.checkpoint_policy)

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------

    def build_optimizer(self, steps_per_epoch: int) -> optax.GradientTransformation:
        # clamp to int32: a --steps-capped run sets max_epochs huge
        num_training_steps = min(steps_per_epoch * self.tcfg.max_epochs, 2**31 - 1)
        schedule = make_lr_schedule(
            self.tcfg.lr_schedule, self.tcfg.lr, num_training_steps, self.tcfg.num_warmup_steps
        )
        self._lr_schedule = schedule  # for lr monitoring (reference LearningRateMonitor)
        # reference conf/model/optimizer/{adam,adamw,sgd}.yaml (adam is the
        # default in every published experiment config)
        name = self.tcfg.optimizer
        if name == "adam":
            if self.tcfg.adam_mv_dtype and self.tcfg.adam_mv_dtype != "float32":
                from hulc_tpu.training.optimizers import adam_lowp

                return adam_lowp(schedule, mv_dtype=self.tcfg.adam_mv_dtype)
            return optax.adam(schedule)
        if name == "adamw":
            return optax.adamw(schedule, weight_decay=1e-6)
        if name == "sgd":
            return optax.sgd(schedule, momentum=0.9)
        raise ValueError(f"unknown optimizer {name!r} (adam|adamw|sgd)")

    def init_state(self, example_batch: Dict[str, ModalityBatch], steps_per_epoch: int) -> TrainState:
        tx = self.build_optimizer(steps_per_epoch)
        rng = jax.random.key(self.tcfg.seed)
        prep = preprocess_batch(self.cfg, example_batch, rng=None, train=False)

        def init_fn(rng):
            init_rng, drop_rng, loss_rng = jax.random.split(rng, 3)
            variables = self.model.init(
                {"params": init_rng, "dropout": drop_rng},
                loss_rng,
                prep,
                0.01,
                method=self.model.train_losses,
            )
            return variables["params"]

        if self.tcfg.tp > 1:
            from hulc_tpu.parallel.mesh import tp_param_sharding

            shapes = jax.eval_shape(init_fn, rng)
            shardings = tp_param_sharding(
                shapes, self.mesh, data_axis="data" if self.tcfg.fsdp else None
            )
            params = jax.jit(init_fn, out_shardings=shardings)(rng)
            return TrainState.create(apply_fn=self.model.apply, params=params, tx=tx)
        if self.tcfg.fsdp:
            from hulc_tpu.parallel.mesh import fsdp_param_sharding

            shapes = jax.eval_shape(init_fn, rng)
            shardings = fsdp_param_sharding(shapes, self.mesh)
            params = jax.jit(init_fn, out_shardings=shardings)(rng)
            # opt_state mirrors the param shardings (created from params)
            return TrainState.create(apply_fn=self.model.apply, params=params, tx=tx)
        params = jax.jit(init_fn, out_shardings=replicated(self.mesh))(rng)
        state = TrainState.create(apply_fn=self.model.apply, params=params, tx=tx)
        return replicate_tree(state, self.mesh)

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------

    def make_train_step(self) -> Callable:
        cfg, model = self.cfg, self.model

        def train_step(state: TrainState, raw_batch, rng, kl_beta):
            step_rng = jax.random.fold_in(rng, state.step)
            k_aug, k_loss, k_drop = jax.random.split(step_rng, 3)
            batch = preprocess_batch(cfg, raw_batch, rng=k_aug, train=True)

            def loss_fn(params):
                losses = model.apply(
                    {"params": params},
                    k_loss,
                    batch,
                    kl_beta,
                    method=model.train_losses,
                    rngs={"dropout": k_drop},
                )
                return losses["total_loss"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads)
            losses["grad_norm"] = optax.global_norm(grads)
            return new_state, losses

        donate = (0,) if self.tcfg.donate_state else ()
        if self.tcfg.fsdp or self.tcfg.tp > 1 or self.tcfg.sp > 1:
            # shardings inferred from input placement: params stay ZeRO-3 /
            # tensor-parallel sharded (sp: batch time-dim sharded); XLA
            # propagates activation shardings and inserts the
            # all-gather/reduce-scatter/psum collectives
            return jax.jit(train_step, donate_argnums=donate)
        return jax.jit(
            train_step,
            in_shardings=(
                replicated(self.mesh),
                batch_sharding(self.mesh),
                replicated(self.mesh),
                replicated(self.mesh),
            ),
            out_shardings=(replicated(self.mesh), replicated(self.mesh)),
            donate_argnums=donate,
        )

    def make_val_step(self) -> Callable:
        cfg, model = self.cfg, self.model

        def val_step(params, raw_batch, rng, kl_beta):
            batch = preprocess_batch(cfg, raw_batch, rng=None, train=False)
            metrics = model.apply(
                {"params": params}, rng, batch, kl_beta, method=model.val_metrics
            )
            # drop non-scalar outputs (sampled plans) for logging reduction
            return {k: v for k, v in metrics.items() if getattr(v, "ndim", 0) == 0}

        if self.tcfg.fsdp or self.tcfg.tp > 1 or self.tcfg.sp > 1:
            return jax.jit(val_step)  # shardings inferred from placement
        return jax.jit(
            val_step,
            in_shardings=(
                replicated(self.mesh),
                batch_sharding(self.mesh),
                replicated(self.mesh),
                replicated(self.mesh),
            ),
            out_shardings=replicated(self.mesh),
        )

    # ------------------------------------------------------------------
    # Loops
    # ------------------------------------------------------------------

    def fit(
        self,
        train_loader,
        val_loader=None,
        max_epochs: Optional[int] = None,
        max_steps: Optional[int] = None,
        resume: bool = True,
        callbacks: Optional[list] = None,
        max_total_steps: Optional[int] = None,
    ) -> TrainState:
        """max_steps caps steps run by THIS call (additive across resumes —
        the semantics the resume tests pin); max_total_steps caps the
        cumulative state.step counter instead, making elastic retry loops
        idempotent: a relaunch after a crash trains only the remainder."""
        tcfg = self.tcfg
        steps_per_epoch = len(train_loader)
        example = next(iter(train_loader))
        state = self.init_state(example, steps_per_epoch)

        start_epoch = 0
        if resume:
            latest = ckpt.latest_checkpoint(tcfg.run_dir)
            if latest is not None:
                template = {"params": state.params, "opt_state": state.opt_state, "step": 0}
                restored = ckpt.restore_checkpoint(latest, template)
                state = state.replace(
                    params=restored["params"],
                    opt_state=restored["opt_state"],
                    step=restored["step"],
                )
                start_epoch = ckpt.checkpoint_epoch(latest) + 1
                print(f"[trainer] resumed from {latest} (epoch {start_epoch})")

        base_step = int(state.step)  # one host sync, before the hot loop
        if max_total_steps is not None and base_step >= max_total_steps:
            print(f"[trainer] already at step {base_step} >= {max_total_steps}; nothing to do")
            return state

        def _hit_cap(total_steps: int) -> bool:
            if max_steps is not None and total_steps >= max_steps:
                return True
            return max_total_steps is not None and base_step + total_steps >= max_total_steps

        if self._train_step is None:
            self._train_step = self.make_train_step()
        rng = jax.random.key(tcfg.seed + 1)
        total_steps = 0
        max_epochs = tcfg.max_epochs if max_epochs is None else max_epochs

        for epoch in range(start_epoch, max_epochs):
            self.epoch = epoch
            kl_beta = jnp.asarray(
                tcfg.kl_schedule(epoch, self.cfg.loss.kl_beta), jnp.float32
            )
            t_epoch = time.time()
            seqs = 0
            for i, raw_batch in enumerate(train_loader):
                raw_batch = shard_batch_tree(raw_batch, self.mesh, seq_axis=self._seq_axis)
                for _ in range(max(1, tcfg.echo_factor)):
                    if tcfg.profile_start is not None and total_steps == tcfg.profile_start:
                        jax.profiler.start_trace(str(pathlib.Path(tcfg.run_dir) / "profile"))
                    state, losses = self._train_step(state, raw_batch, rng, kl_beta)
                    seqs += sum(b.actions.shape[0] for b in raw_batch.values())
                    total_steps += 1
                    if (
                        tcfg.profile_start is not None
                        and total_steps == tcfg.profile_start + tcfg.profile_steps
                    ):
                        jax.block_until_ready(losses["total_loss"])
                        jax.profiler.stop_trace()
                    if (
                        tcfg.checkpoint_every_steps
                        and total_steps % tcfg.checkpoint_every_steps == 0
                        and not _hit_cap(total_steps)  # end-of-run save below covers the cap
                    ):
                        self.checkpointer.save(
                            epoch,
                            {"params": state.params, "opt_state": state.opt_state,
                             "step": int(state.step)},
                            {},
                        )
                    if _hit_cap(total_steps):
                        break
                if i % tcfg.log_every == 0:
                    losses = jax.device_get(losses)
                    if getattr(self, "_lr_schedule", None) is not None:
                        losses["lr"] = float(self._lr_schedule(int(state.step)))
                    self.logger.log(losses, int(state.step), "train")
                    print(
                        f"[trainer] epoch {epoch} step {i}/{steps_per_epoch} "
                        f"loss={float(losses['total_loss']):.4f} "
                        f"act={float(losses['action_loss']):.4f} "
                        f"kl={float(losses['kl_loss']):.5f}"
                    )
                if _hit_cap(total_steps):
                    break
            dt = time.time() - t_epoch
            self.logger.log(
                {"epoch_time_s": dt, "seq_per_sec": seqs / max(dt, 1e-9), "kl_beta": float(kl_beta)},
                int(state.step),
                "epoch",
            )

            # metrics visible to the monitored checkpointer this epoch:
            # last-step train losses (train/), val means (val/), and whatever
            # callbacks return (rollout callbacks use eval_lh/ and tasks/)
            epoch_metrics: Dict[str, float] = {
                f"train/{k}": float(v)
                for k, v in jax.device_get(losses).items()
                if getattr(v, "ndim", 0) == 0 or np.isscalar(v)
            }
            hit_max_steps = _hit_cap(total_steps)
            # val + diagnostic callbacks share one cadence; a capped or final
            # epoch always evaluates so the run ends with fresh val metrics
            # (tiny-fixture studies at window 32 hit ~75 s/epoch of val +
            # lang_gt H2D on the degraded tunnel wire — val-every-epochs > 1
            # makes 500-step flagship-shape runs tractable on this rig)
            val_epoch = (
                (epoch + 1) % tcfg.val_every_epochs == 0
                or epoch == max_epochs - 1
                or hit_max_steps
            )
            if val_loader is not None and val_epoch:
                val_mean = self.validate(state, val_loader, rng, kl_beta=kl_beta)
                epoch_metrics.update({f"val/{k}": v for k, v in val_mean.items()})
            if val_epoch:
                for cb in callbacks or ():
                    cb_metrics = cb.on_epoch_end(self, state, epoch)
                    if isinstance(cb_metrics, dict):
                        epoch_metrics.update(
                            {k: v for k, v in cb_metrics.items() if isinstance(v, (int, float))}
                        )
            if (
                (epoch + 1) % tcfg.checkpoint_every_epochs == 0
                or epoch == max_epochs - 1
                or hit_max_steps  # a --steps-capped run always ends checkpointed
            ):
                self.checkpointer.save(
                    epoch,
                    {"params": state.params, "opt_state": state.opt_state, "step": int(state.step)},
                    epoch_metrics,
                )
            if hit_max_steps:
                break
        return state

    def validate(
        self,
        state: TrainState,
        val_loader,
        rng,
        max_batches: Optional[int] = None,
        kl_beta=None,
    ) -> Dict[str, float]:
        """Run validation. max_batches (default TrainerConfig.val_max_batches)
        caps the pass; the cap is logged when it truncates the val set."""
        if self._val_step is None:
            self._val_step = self.make_val_step()
        if max_batches is None:
            max_batches = self.tcfg.val_max_batches or len(val_loader)
        if max_batches < len(val_loader):
            print(f"[trainer] validation capped at {max_batches}/{len(val_loader)} batches")
        if kl_beta is None:
            kl_beta = jnp.asarray(self.cfg.loss.kl_beta, jnp.float32)
        agg: Dict[str, list] = {}
        for i, raw_batch in enumerate(val_loader):
            if i >= max_batches:
                break
            raw_batch = shard_batch_tree(raw_batch, self.mesh, seq_axis=self._seq_axis)
            metrics = jax.device_get(
                self._val_step(state.params, raw_batch, jax.random.fold_in(rng, i), kl_beta)
            )
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
        mean = {k: float(np.mean(v)) for k, v in agg.items()}
        self.logger.log(mean, int(state.step), "val")
        print(
            "[trainer] val:",
            {k: round(v, 4) for k, v in mean.items() if "act_loss" in k or "mae" in k or "sr" in k},
        )
        return mean
