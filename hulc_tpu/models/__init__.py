from hulc_tpu.models.hulc import HulcModel, ModalityBatch  # noqa: F401


def make_model(cfg):
    """Build the (resolved) model for a HulcConfig."""
    return HulcModel(cfg)


def example_batch(cfg, batch_size=2, seq_len=8, lang=False, rng=None):
    """Synthetic preprocessed ModalityBatch with config-consistent shapes."""
    import numpy as np

    from hulc_tpu.models.hulc import ModalityBatch

    rng = rng or np.random.default_rng(0)
    pe = cfg.perceptual_encoder
    b, s = batch_size, seq_len

    def img(size):
        return rng.normal(size=(b, s, size, size, 3)).astype(np.float32)

    n_state = pe.proprio.n_state_obs if pe.proprio else 8
    return ModalityBatch(
        rgb_static=img(pe.rgb_static.input_size) if pe.rgb_static else None,
        rgb_gripper=img(pe.rgb_gripper.input_size) if pe.rgb_gripper else None,
        robot_obs=rng.normal(size=(b, s, n_state)).astype(np.float32),
        actions=np.tanh(rng.normal(size=(b, s, 7))).astype(np.float32),
        state_info_robot_obs=rng.normal(size=(b, s, 15)).astype(np.float32),
        lang=rng.normal(size=(b, 384)).astype(np.float32) if lang else None,
        use_for_aux_lang_loss=(rng.uniform(size=(b,)) > 0.5) if lang else None,
        idx=np.arange(b) if lang else None,
    )


def init_params(model, rng, batch):
    """Initialize parameters by tracing train_losses on a tiny batch."""
    import jax

    init_rng, loss_rng = jax.random.split(jax.random.key(0))
    return model.init(
        {"params": rng, "dropout": init_rng},
        loss_rng,
        batch,
        0.01,
        method=model.train_losses,
    )["params"]
