"""World<->TCP frame conversion: inverse property + parity with reference."""

import numpy as np
import jax.numpy as jnp

from hulc_tpu.ops.frame_transforms import tcp_to_world_frame, world_to_tcp_frame


def make_inputs(b=8, s=16, seed=0):
    rng = np.random.default_rng(seed)
    action = rng.uniform(-1.0, 1.0, size=(b, s, 7)).astype(np.float32)
    action[..., 6] = np.sign(action[..., 6])  # gripper in {-1, 1}
    robot_obs = rng.uniform(-1.0, 1.0, size=(b, s, 15)).astype(np.float32)
    robot_obs[..., 3:6] = rng.uniform(-np.pi * 0.9, np.pi * 0.9, size=(b, s, 3))
    # The world<->TCP pair is an exact inverse only when Euler triples stay in
    # the canonical range (middle angle within +-pi/2) — same constraint holds
    # for the reference implementation; CALVIN TCP pitch satisfies it.
    robot_obs[..., 4] = np.clip(robot_obs[..., 4], -1.4, 1.4)
    return action, robot_obs


def test_world_tcp_roundtrip():
    action, robot_obs = make_inputs()
    tcp = world_to_tcp_frame(jnp.asarray(action), jnp.asarray(robot_obs))
    back = tcp_to_world_frame(tcp, jnp.asarray(robot_obs))
    np.testing.assert_allclose(np.asarray(back), action, atol=1e-3)


def test_gripper_channel_passthrough():
    action, robot_obs = make_inputs(seed=1)
    tcp = np.asarray(world_to_tcp_frame(jnp.asarray(action), jnp.asarray(robot_obs)))
    np.testing.assert_array_equal(tcp[..., 6], action[..., 6])


def test_parity_with_reference(ref_gripper_control):
    import torch

    action, robot_obs = make_inputs(seed=2)
    ours = np.asarray(world_to_tcp_frame(jnp.asarray(action), jnp.asarray(robot_obs)))
    theirs = ref_gripper_control.world_to_tcp_frame(
        torch.from_numpy(action), torch.from_numpy(robot_obs)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)

    ours_w = np.asarray(tcp_to_world_frame(jnp.asarray(action), jnp.asarray(robot_obs)))
    theirs_w = ref_gripper_control.tcp_to_world_frame(
        torch.from_numpy(action), torch.from_numpy(robot_obs)
    ).numpy()
    np.testing.assert_allclose(ours_w, theirs_w, atol=5e-4)
