"""World <-> TCP (tool-center-point) frame conversion of relative actions.

Reference behavior: hulc/models/decoders/utils/gripper_control.py:16-63.
The HULC action decoder predicts relative end-effector actions in the
gripper (TCP) frame; ground-truth world-frame relative actions are rotated
into the TCP frame for the loss, and predictions are rotated back for the
environment. Rotational deltas are scaled by 0.01 (pseudo-infinitesimal
rotation) before composing and by 100 after.

TPU-first details:
  * math is forced to fp32 (the reference wraps in autocast(float32)) — a
    bf16 training policy must not touch this path;
  * rotation-matrix inverses are transposes (orthogonal), never
    ``inv``/``solve`` — reference uses torch.inverse (gripper_control.py:20),
    which is both slower and less stable;
  * everything is shape-static and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from hulc_tpu.ops.rotations import euler_angles_to_matrix, matrix_to_euler_angles

_PI = jnp.pi


def _wrap_angle(x):
    """Wrap angles to (-pi, pi] the way the reference does (two wheres)."""
    x = jnp.where(x < -_PI, x + 2 * _PI, x)
    x = jnp.where(x > _PI, x - 2 * _PI, x)
    return x


def world_to_tcp_frame(action, robot_obs):
    """Rotate world-frame relative actions into the TCP frame.

    Args:
      action: (..., 7) relative action [dx dy dz dax day daz gripper], world frame.
      robot_obs: (..., >=6) unnormalized robot state; [..., 3:6] is the TCP
        orientation as XYZ Euler angles in the world frame.

    Returns:
      (..., 7) action in TCP frame, fp32.
    """
    action = action.astype(jnp.float32)
    robot_obs = robot_obs.astype(jnp.float32)
    tcp_orn = robot_obs[..., 3:6]
    world_T_tcp = euler_angles_to_matrix(tcp_orn, convention="XYZ")
    tcp_T_world = jnp.swapaxes(world_T_tcp, -1, -2)

    pos_w_rel = action[..., :3]
    pos_tcp_rel = jnp.einsum("...ij,...j->...i", tcp_T_world, pos_w_rel)

    # Downscale to a pseudo-infinitesimal rotation before composing.
    orn_w_rel = action[..., 3:6] * 0.01
    world_T_tcp_new = euler_angles_to_matrix(tcp_orn + orn_w_rel, convention="XYZ")
    tcp_new_T_tcp_old = jnp.swapaxes(world_T_tcp_new, -1, -2) @ world_T_tcp
    orn_tcp_rel = _wrap_angle(matrix_to_euler_angles(tcp_new_T_tcp_old, convention="XYZ"))
    orn_tcp_rel = orn_tcp_rel * 100.0

    return jnp.concatenate([pos_tcp_rel, orn_tcp_rel, action[..., 6:7]], axis=-1)


def tcp_to_world_frame(action, robot_obs):
    """Rotate TCP-frame relative actions back into the world frame.

    Inverse of :func:`world_to_tcp_frame` (same scaling convention).
    """
    action = action.astype(jnp.float32)
    robot_obs = robot_obs.astype(jnp.float32)
    tcp_orn = robot_obs[..., 3:6]
    world_T_tcp = euler_angles_to_matrix(tcp_orn, convention="XYZ")

    pos_tcp_rel = action[..., :3]
    pos_w_rel = jnp.einsum("...ij,...j->...i", world_T_tcp, pos_tcp_rel)

    orn_tcp_rel = action[..., 3:6] * 0.01
    tcp_new_T_tcp_old = euler_angles_to_matrix(orn_tcp_rel, convention="XYZ")
    world_T_tcp_new = world_T_tcp @ jnp.swapaxes(tcp_new_T_tcp_old, -1, -2)

    orn_w_new = matrix_to_euler_angles(world_T_tcp_new, convention="XYZ")
    orn_w_rel = _wrap_angle(orn_w_new - tcp_orn) * 100.0

    return jnp.concatenate([pos_w_rel, orn_w_rel, action[..., 6:7]], axis=-1)
