"""Trainer: jitted sharded train step, checkpoint resume, schedules, and the
8-virtual-device data-parallel mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hulc_tpu.config import get_config
from hulc_tpu.data.fixtures import make_fixture_dataset
from hulc_tpu.data.loader import make_loaders
from hulc_tpu.training import checkpoint as ckpt
from hulc_tpu.training.schedules import KLSchedule, make_lr_schedule
from hulc_tpu.training.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return make_fixture_dataset(tmp_path_factory.mktemp("calvin_t"), num_episodes=2, episode_len=48)


def test_kl_schedules():
    const = KLSchedule("constant")
    assert const(0, 0.01) == 0.01 and const(99, 0.01) == 0.01
    lin = KLSchedule("linear", start_epoch=10, end_epoch=20, max_kl_beta=0.1)
    assert lin(5, 0.01) == 0.0
    assert abs(lin(15, 0.01) - 0.05) < 1e-9
    assert lin(25, 0.01) == 0.1
    sig = KLSchedule("sigmoid", start_epoch=10, end_epoch=20, max_kl_beta=0.1)
    assert sig(9, 0.01) == 0.0 and sig(21, 0.01) == 0.1
    assert 0.04 < sig(15, 0.01) < 0.06


def test_lr_schedules():
    s = make_lr_schedule("constant", 1e-3)
    assert float(s(0)) == 1e-3 and float(s(10_000)) == 1e-3
    c = make_lr_schedule("cosine_with_warmup", 1e-3, num_training_steps=100, num_warmup_steps=0.1)
    assert float(c(0)) < 1e-4  # warming up
    assert abs(float(c(10)) - 1e-3) < 1e-6  # peak after 10% warmup
    assert float(c(100)) < 1e-4  # decayed


def test_fit_and_resume(fixture_root, tmp_path):
    cfg = get_config("gcbc_debug")
    run_dir = tmp_path / "run"
    tcfg = TrainerConfig(
        run_dir=str(run_dir), max_epochs=1, log_every=1000, donate_state=False, num_devices=2
    )
    trainer = Trainer(cfg, tcfg)
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")
    state = trainer.fit(loader, None, max_epochs=1, max_steps=2, resume=False)
    assert int(state.step) == 2
    assert ckpt.latest_checkpoint(run_dir) is not None

    # resume continues the step counter
    trainer2 = Trainer(cfg, tcfg)
    state2 = trainer2.fit(loader, None, max_epochs=2, max_steps=1, resume=True)
    assert int(state2.step) == 3


def test_val_every_epochs_cadence(fixture_root, tmp_path):
    """Diagnostic callbacks (and validation) run on the val_every_epochs
    cadence, and a final or step-capped epoch always evaluates — the knob
    that makes flagship-shape studies tractable on wire-bound rigs."""
    cfg = get_config("gcbc_debug")
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")

    class CountingCallback:
        def __init__(self):
            self.epochs = []

        def on_epoch_end(self, trainer, state, epoch):
            self.epochs.append(epoch)
            return {}

    cb = CountingCallback()
    t = Trainer(cfg, TrainerConfig(run_dir=str(tmp_path / "r1"), max_epochs=4,
                                   log_every=1000, donate_state=False,
                                   num_devices=2, val_every_epochs=2))
    t.fit(loader, None, max_epochs=4, resume=False, callbacks=[cb])
    # full epochs 0..3 at cadence 2 -> callbacks fire on epochs 1 and 3
    assert cb.epochs == [1, 3], cb.epochs

    # a step-capped run always evaluates on its last epoch even off-cadence
    cb2 = CountingCallback()
    t2 = Trainer(cfg, TrainerConfig(run_dir=str(tmp_path / "r2"), max_epochs=100,
                                    log_every=1000, donate_state=False,
                                    num_devices=2, val_every_epochs=50))
    t2.fit(loader, None, max_epochs=100, max_steps=1, resume=False, callbacks=[cb2])
    assert cb2.epochs == [0], cb2.epochs


def test_resume_across_adam_mv_dtype(fixture_root, tmp_path):
    """A run checkpointed with f32 adam moments must resume under
    adam_mv_dtype="bfloat16" (and back): flipping the moment-storage knob
    on an existing run dir casts the restored moments instead of failing
    (the knob is a deployment tradeoff, not a new optimizer)."""
    cfg = get_config("gcbc_debug")
    run_dir = tmp_path / "run"
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")

    t1 = Trainer(cfg, TrainerConfig(run_dir=str(run_dir), max_epochs=1, log_every=1000,
                                    donate_state=False, num_devices=2,
                                    adam_mv_dtype="float32"))
    state = t1.fit(loader, None, max_epochs=1, max_steps=2, resume=False)
    assert int(state.step) == 2

    t2 = Trainer(cfg, TrainerConfig(run_dir=str(run_dir), max_epochs=2, log_every=1000,
                                    donate_state=False, num_devices=2,
                                    adam_mv_dtype="bfloat16"))
    state2 = t2.fit(loader, None, max_epochs=2, max_steps=1, resume=True)
    assert int(state2.step) == 3
    mus = [l for l in jax.tree.leaves(state2.opt_state) if l.dtype == jnp.bfloat16]
    assert mus, "resumed opt_state should hold bf16 moment buffers"

    # and back down: bf16-moments checkpoint resumed by an f32-moment trainer
    t3 = Trainer(cfg, TrainerConfig(run_dir=str(run_dir), max_epochs=3, log_every=1000,
                                    donate_state=False, num_devices=2,
                                    adam_mv_dtype="float32"))
    state3 = t3.fit(loader, None, max_epochs=3, max_steps=1, resume=True)
    assert int(state3.step) == 4


def test_monitored_topk_checkpointing(tmp_path):
    """Top-k retention prunes the worst epochs, never the latest (resume),
    and best_checkpoint answers post-hoc queries from the metric journal."""
    run_dir = tmp_path / "run"
    policy = ckpt.CheckpointPolicy("val/action_loss_pp", "min", top_k=2)
    mgr = ckpt.MonitoredCheckpointer(run_dir, policy)

    def state(i):
        return {"params": {"w": np.full(3, float(i))}, "step": i}

    for epoch, val in {0: 5.0, 1: 1.0, 2: 3.0, 3: 0.5, 4: 4.0}.items():
        mgr.save(epoch, state(epoch), {"val/action_loss_pp": val})

    kept = {ckpt.checkpoint_epoch(p) for p in ckpt.all_checkpoints(run_dir)}
    # top-2 by min value = epochs 3 (0.5) and 1 (1.0); latest (4) always kept
    assert kept == {1, 3, 4}
    assert ckpt.checkpoint_epoch(ckpt.best_checkpoint(run_dir, policy)) == 3
    # the journal holds all metrics -> a different monitor works post hoc
    best_max = ckpt.best_checkpoint(
        run_dir, ckpt.CheckpointPolicy("val/action_loss_pp", "max")
    )
    assert ckpt.checkpoint_epoch(best_max) == 4
    restored = ckpt.restore_checkpoint(ckpt.best_checkpoint(run_dir, policy), state(0))
    np.testing.assert_array_equal(restored["params"]["w"], np.full(3, 3.0))
    # presets mirror conf/callbacks/checkpoint/*.yaml
    assert ckpt.resolve_checkpoint_policy("lh_sr").monitor == "eval_lh/avg_seq_len"
    assert ckpt.resolve_checkpoint_policy("all").monitor is None
    with pytest.raises(ValueError):
        ckpt.resolve_checkpoint_policy("nope")


def test_restore_params_by_name(tmp_path):
    """restore_params matches leaves by pytree path, not position."""
    params = {"a": {"w": np.arange(3.0)}, "b": {"w": np.ones(2)}}
    ckpt.save_checkpoint(tmp_path, 0, {"params": params, "step": 0})
    path = ckpt.latest_checkpoint(tmp_path)
    out = ckpt.restore_params(path, {"a": {"w": np.zeros(3)}, "b": {"w": np.zeros(2)}})
    np.testing.assert_array_equal(out["a"]["w"], np.arange(3.0))
    # same arity, wrong names -> loud failure (not a positional transplant)
    with pytest.raises(ValueError, match="by name"):
        ckpt.restore_params(path, {"a": {"w": np.zeros(3)}, "c": {"w": np.zeros(2)}})
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.restore_params(path, {"a": {"w": np.zeros(4)}, "b": {"w": np.zeros(2)}})


def test_host_local_batch_to_global_single_process():
    """Single-process degenerate case: the host-local path must equal the
    plain device_put path bit-for-bit, with the same sharding."""
    from hulc_tpu.parallel.mesh import (
        host_local_batch_to_global,
        make_mesh,
        shard_batch_tree,
    )

    mesh = make_mesh(8)
    batch = {"x": np.arange(32.0).reshape(16, 2), "y": np.arange(16, dtype=np.int32)}
    g = host_local_batch_to_global(batch, mesh)
    s = shard_batch_tree(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(g[k]), batch[k])
        np.testing.assert_array_equal(np.asarray(s[k]), batch[k])
        assert g[k].sharding.spec == s[k].sharding.spec


def test_multidevice_data_parallel():
    """Full train step over the 8-virtual-device mesh; loss finite and the
    step must match a single-device run of the same global batch."""
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    pe = cfg.perceptual_encoder
    raw = _make_raw_batch(cfg, 8, 8, pe.rgb_static.input_size, pe.rgb_gripper.input_size)

    def run(n_dev):
        tcfg = TrainerConfig(run_dir="/tmp/na", num_devices=n_dev, donate_state=False)
        tr = Trainer(cfg, tcfg)
        state = tr.init_state(raw, steps_per_epoch=1)
        step = tr.make_train_step()
        sharded = shard_batch_tree(raw, tr.mesh)
        state, losses = step(state, sharded, jax.random.key(0), jnp.asarray(0.01))
        return float(losses["total_loss"]), state

    loss8, state8 = run(8)
    loss1, state1 = run(1)
    assert np.isfinite(loss8)
    # data-parallel math must equal single-device math on the same batch
    np.testing.assert_allclose(loss8, loss1, rtol=1e-4)
    p8 = jax.tree.leaves(state8.params)[0]
    p1 = jax.tree.leaves(state1.params)[0]
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-5)


def test_fsdp_param_sharding_step():
    """ZeRO-3 variant: params actually sharded over the mesh, one step runs,
    loss matches the replicated run on the same batch."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    pe = cfg.perceptual_encoder
    raw = _make_raw_batch(cfg, 8, 8, pe.rgb_static.input_size, pe.rgb_gripper.input_size)

    tcfg = TrainerConfig(run_dir="/tmp/na_fsdp", num_devices=8, donate_state=False, fsdp=True)
    tr = Trainer(cfg, tcfg)
    state = tr.init_state(raw, steps_per_epoch=1)
    # at least one big param must actually be sharded over the data axis
    shardings = [
        leaf.sharding for leaf in jax.tree.leaves(state.params) if leaf.size >= 2**16
    ]
    assert any(s.spec != jax.sharding.PartitionSpec() for s in shardings), "no param sharded"
    # adam moments must inherit the param shardings (true ZeRO-3, not just
    # sharded weights with replicated optimizer state)
    opt_shardings = [
        leaf.sharding
        for leaf in jax.tree.leaves(state.opt_state)
        if getattr(leaf, "size", 0) >= 2**16
    ]
    assert opt_shardings and any(
        s.spec != jax.sharding.PartitionSpec() for s in opt_shardings
    ), "opt_state not sharded"
    step = tr.make_train_step()
    sharded = shard_batch_tree(raw, tr.mesh)
    state, losses = step(state, sharded, jax.random.key(0), jnp.asarray(0.01))
    fsdp_loss = float(losses["total_loss"])

    tcfg2 = TrainerConfig(run_dir="/tmp/na_rep", num_devices=8, donate_state=False)
    tr2 = Trainer(cfg, tcfg2)
    state2 = tr2.init_state(raw, steps_per_epoch=1)
    step2 = tr2.make_train_step()
    _, losses2 = step2(state2, shard_batch_tree(raw, tr2.mesh), jax.random.key(0), jnp.asarray(0.01))
    np.testing.assert_allclose(fsdp_loss, float(losses2["total_loss"]), rtol=1e-4)


def test_echo_factor_steps(fixture_root, tmp_path):
    """echo_factor=E runs E optimizer steps per transferred host batch
    (data echoing; each echo folds a fresh RNG from state.step)."""
    cfg = get_config("gcbc_debug")
    tcfg = TrainerConfig(
        run_dir=str(tmp_path / "run"), max_epochs=1, log_every=1000,
        donate_state=False, num_devices=2, echo_factor=3,
    )
    trainer = Trainer(cfg, tcfg)
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")
    state = trainer.fit(loader, None, max_epochs=1, max_steps=6, resume=False)
    assert int(state.step) == 6  # 2 host batches x 3 echoes


@pytest.mark.skipif(
    not os.environ.get("HULC_RUN_SLOW"),
    reason="2-process DCN dryrun spawns 3 subprocesses (~3 min); HULC_RUN_SLOW=1 to run",
)
def test_dryrun_multihost_two_process():
    """The process_count() > 1 branch of shard_batch_tree actually executes:
    2 local processes x 4 virtual CPU devices, gloo collectives, loss equal
    to the single-process 8-device run (VERDICT r2 #5)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multihost

    dryrun_multihost(2)  # raises on divergence


def test_tp_tensor_parallel_step():
    """tp=4 over a 2x4 (data x model) mesh: matmul kernels column-partitioned
    over 'model', one train step runs via GSPMD-propagated collectives, loss
    matches the replicated data-parallel run on the same batch."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    raw = _make_raw_batch(cfg, 8, 8)

    tcfg = TrainerConfig(run_dir="/tmp/na_tp", num_devices=8, donate_state=False, tp=4)
    tr = Trainer(cfg, tcfg)
    assert tr.mesh.shape == {"data": 2, "model": 4}
    state = tr.init_state(raw, steps_per_epoch=1)
    # at least one big kernel must be sharded over the model axis (last dim)
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state.params)
        if leaf.size >= 2**16
    ]
    assert any(spec and spec[-1] == "model" for spec in specs), specs
    # adam moments inherit the tensor-parallel shardings
    opt_specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state.opt_state)
        if getattr(leaf, "size", 0) >= 2**16
    ]
    assert any(spec and spec[-1] == "model" for spec in opt_specs), opt_specs

    step = tr.make_train_step()
    sharded = shard_batch_tree(raw, tr.mesh)
    state, losses = step(state, sharded, jax.random.key(0), jnp.asarray(0.01))
    tp_loss = float(losses["total_loss"])
    assert np.isfinite(tp_loss)

    tcfg2 = TrainerConfig(run_dir="/tmp/na_tp_ref", num_devices=8, donate_state=False)
    tr2 = Trainer(cfg, tcfg2)
    state2 = tr2.init_state(raw, steps_per_epoch=1)
    step2 = tr2.make_train_step()
    _, losses2 = step2(state2, shard_batch_tree(raw, tr2.mesh), jax.random.key(0), jnp.asarray(0.01))
    np.testing.assert_allclose(tp_loss, float(losses2["total_loss"]), rtol=1e-4)


def test_tp_plus_fsdp_combined():
    """tp=2 with fsdp=True: kernels sharded over 'model' on the output dim
    AND ZeRO-sharded over 'data' on another dim; step runs, loss matches DP."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    raw = _make_raw_batch(cfg, 8, 8)

    tcfg = TrainerConfig(
        run_dir="/tmp/na_tpf", num_devices=8, donate_state=False, tp=2, fsdp=True
    )
    tr = Trainer(cfg, tcfg)
    assert tr.mesh.shape == {"data": 4, "model": 2}
    state = tr.init_state(raw, steps_per_epoch=1)
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(state.params)
        if leaf.size >= 2**16
    ]
    assert any(s and s[-1] == "model" and "data" in s for s in specs), specs
    step = tr.make_train_step()
    state, losses = step(
        state, shard_batch_tree(raw, tr.mesh), jax.random.key(0), jnp.asarray(0.01)
    )
    combined_loss = float(losses["total_loss"])
    assert np.isfinite(combined_loss)

    tcfg2 = TrainerConfig(run_dir="/tmp/na_tpf_ref", num_devices=8, donate_state=False)
    tr2 = Trainer(cfg, tcfg2)
    state2 = tr2.init_state(raw, steps_per_epoch=1)
    _, losses2 = tr2.make_train_step()(
        state2, shard_batch_tree(raw, tr2.mesh), jax.random.key(0), jnp.asarray(0.01)
    )
    np.testing.assert_allclose(combined_loss, float(losses2["total_loss"]), rtol=1e-4)


def test_checkpoint_restore_across_topologies(tmp_path):
    """A checkpoint saved from a tensor-parallel (2D mesh) run restores into
    a plain data-parallel trainer (and vice versa would mirror): orbax
    restores into the NEW topology's shardings from the resume template, so
    elastic topology changes need no conversion step."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree
    from hulc_tpu.training import checkpoint as ckpt

    cfg = get_config("gcbc_debug")
    raw = _make_raw_batch(cfg, 8, 8)

    tr_tp = Trainer(
        cfg, TrainerConfig(run_dir=str(tmp_path), num_devices=8, donate_state=False, tp=2)
    )
    state_tp = tr_tp.init_state(raw, steps_per_epoch=1)
    step_tp = tr_tp.make_train_step()
    state_tp, _ = step_tp(
        state_tp, shard_batch_tree(raw, tr_tp.mesh), jax.random.key(0), jnp.asarray(0.01)
    )
    ckpt.save_checkpoint(
        tmp_path, 0,
        {"params": state_tp.params, "opt_state": state_tp.opt_state, "step": int(state_tp.step)},
    )

    tr_dp = Trainer(
        cfg, TrainerConfig(run_dir=str(tmp_path), num_devices=8, donate_state=False)
    )
    state_dp = tr_dp.init_state(raw, steps_per_epoch=1)
    template = {"params": state_dp.params, "opt_state": state_dp.opt_state, "step": 0}
    restored = ckpt.restore_checkpoint(ckpt.latest_checkpoint(tmp_path), template)

    # values equal the tp-trained params; placement follows the dp mesh
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(state_tp.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding.mesh.shape == tr_dp.mesh.shape

    # the dp trainer can step with the restored state
    state_dp = state_dp.replace(
        params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
    )
    _, losses = tr_dp.make_train_step()(
        state_dp, shard_batch_tree(raw, tr_dp.mesh), jax.random.key(1), jnp.asarray(0.01)
    )
    assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.parametrize("opt", ["adamw", "sgd"])
def test_optimizer_variants_step(opt):
    """adamw / sgd variants (reference conf/model/optimizer/*.yaml) build and
    reduce the loss over a few steps on the same batch."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    raw = _make_raw_batch(cfg, 4, 8)
    tr = Trainer(
        cfg,
        TrainerConfig(run_dir=f"/tmp/na_opt_{opt}", num_devices=1,
                      donate_state=False, optimizer=opt, lr=1e-3),
    )
    state = tr.init_state(raw, steps_per_epoch=1)
    step = tr.make_train_step()
    sharded = shard_batch_tree(raw, tr.mesh)
    first = None
    for i in range(8):
        state, losses = step(state, sharded, jax.random.key(0), jnp.asarray(0.01))
        if first is None:
            first = float(losses["total_loss"])
    last = float(losses["total_loss"])
    assert np.isfinite(last)
    assert last < first, (opt, first, last)


def test_sp_sequence_parallel_step():
    """sp=4 over a 2x4 (data x seq) mesh: the window/time dim of every
    per-frame batch field is sharded over 'seq' (the per-frame conv FLOPs
    split S-ways; GSPMD gathers the sequence at the plan-recognition /
    decoder joins), and the loss matches the data-parallel run bit-for-bit
    up to reduction order."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    raw = _make_raw_batch(cfg, 8, 8)

    tcfg = TrainerConfig(run_dir="/tmp/na_sp", num_devices=8, donate_state=False, sp=4)
    tr = Trainer(cfg, tcfg)
    assert tr.mesh.shape == {"data": 2, "seq": 4}
    state = tr.init_state(raw, steps_per_epoch=1)

    sharded = shard_batch_tree(raw, tr.mesh, seq_axis="seq")
    # per-frame leaves carry ('data', 'seq'); per-sequence leaves only 'data'
    assert sharded["vis"].rgb_static.sharding.spec[:2] == ("data", "seq")
    assert sharded["vis"].actions.sharding.spec[:2] == ("data", "seq")
    assert sharded["lang"].lang.sharding.spec == ("data",)

    step = tr.make_train_step()
    state, losses = step(state, sharded, jax.random.key(0), jnp.asarray(0.01))
    sp_loss = float(losses["total_loss"])
    assert np.isfinite(sp_loss)

    tcfg2 = TrainerConfig(run_dir="/tmp/na_sp_ref", num_devices=8, donate_state=False)
    tr2 = Trainer(cfg, tcfg2)
    state2 = tr2.init_state(raw, steps_per_epoch=1)
    step2 = tr2.make_train_step()
    _, losses2 = step2(state2, shard_batch_tree(raw, tr2.mesh), jax.random.key(0), jnp.asarray(0.01))
    np.testing.assert_allclose(sp_loss, float(losses2["total_loss"]), rtol=1e-4)


def test_tp_sp_mutually_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(get_config("gcbc_debug"), TrainerConfig(num_devices=8, tp=2, sp=2))


def test_resolve_mesh_devices_clamp_rules():
    """Mesh clamp (ADVICE r3): maximal divisor not gcd, multi-host never
    clamps (global devices vs per-host batch), tp not dividing devices
    yields the largest valid mesh instead of an error."""
    from hulc_tpu.training.train import resolve_mesh_devices

    # batch divides: no clamp
    assert resolve_mesh_devices(32, n_avail=8) is None
    assert resolve_mesh_devices(8, n_avail=8) is None
    # maximal divisor, not gcd: batch 12 on 8 devices -> 6 (gcd was 4)
    assert resolve_mesh_devices(12, n_avail=8) == 6
    assert resolve_mesh_devices(6, n_avail=8) == 6
    assert resolve_mesh_devices(2, n_avail=8) == 2
    # tp=3 on 8 devices: valid 6-device 2x3 mesh even though batch divides
    assert resolve_mesh_devices(8, tp=3, n_avail=8) == 6
    assert resolve_mesh_devices(4, tp=2, n_avail=8) == 8 or \
        resolve_mesh_devices(4, tp=2, n_avail=8) is None  # 4x2 uses all 8
    # multi-host: never clamp (per-host batch vs global device count)
    assert resolve_mesh_devices(8, n_avail=16, process_count=2) is None
    assert resolve_mesh_devices(12, n_avail=16, process_count=2) is None


def test_adam_lowp_moments_bf16():
    """adam_mv_dtype="bfloat16" (training/optimizers.py): moments stored
    bf16, f32-storage variant bit-matches optax.adam, and the bf16 run
    tracks the f32 run closely over a few steps (the HBM-tail experiment
    from the round-3 roofline: the step is bandwidth-bound)."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree

    cfg = get_config("gcbc_debug")
    raw = _make_raw_batch(cfg, 4, 8)

    def run(mv_dtype):
        tr = Trainer(
            cfg,
            TrainerConfig(run_dir=f"/tmp/na_adamlp_{mv_dtype}", num_devices=1,
                          donate_state=False, lr=1e-3, adam_mv_dtype=mv_dtype),
        )
        state = tr.init_state(raw, steps_per_epoch=1)
        step = tr.make_train_step()
        sharded = shard_batch_tree(raw, tr.mesh)
        for _ in range(6):
            state, losses = step(state, sharded, jax.random.key(0), jnp.asarray(0.01))
        return state, float(losses["total_loss"])

    state32, loss32 = run(None)
    state_f32store, loss_f32store = run("float32")  # must bit-match optax.adam
    np.testing.assert_allclose(loss32, loss_f32store, rtol=1e-6)
    state16, loss16 = run("bfloat16")
    # bf16 moment storage: state dtype is bf16 and the trajectory stays close
    mus = [l for l in jax.tree.leaves(state16.opt_state) if l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment buffers in opt_state"
    np.testing.assert_allclose(loss16, loss32, rtol=2e-2)


def test_perceptual_remat_parity():
    """perceptual_encoder.remat=true is numerically identical (same ops,
    recomputed in bwd): loss and gradients bit-match the baseline."""
    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.config import apply_overrides
    from hulc_tpu.models import make_model
    from hulc_tpu.training.preprocess import preprocess_batch

    cfg = get_config("hulc_debug")
    pe = cfg.perceptual_encoder
    raw = _make_raw_batch(cfg, 2, 8, pe.rgb_static.input_size, pe.rgb_gripper.input_size)
    cfg_r = apply_overrides(get_config("hulc_debug"), ["perceptual_encoder.remat=true"])
    assert cfg_r.perceptual_encoder.remat

    def loss_and_grad(cfg):
        model = make_model(cfg)
        prep = preprocess_batch(cfg, raw, rng=None, train=False)
        params = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jax.random.key(2), prep, 0.01, method=model.train_losses,
        )["params"]

        def f(p):
            losses = model.apply(
                {"params": p}, jax.random.key(3), prep, 0.01,
                method=model.train_losses, rngs={"dropout": jax.random.key(4)},
            )
            return losses["total_loss"]

        return jax.value_and_grad(f)(params)

    l0, g0 = loss_and_grad(cfg)
    l1, g1 = loss_and_grad(cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
