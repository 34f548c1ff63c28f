"""Frozen-golden parity: reference outputs captured into
tests/goldens/reference_goldens.npz (pure functions only — rotation math,
world<->TCP conversion, SpatialSoftmax). These keep the parity contract
asserting even where /root/reference is not available.
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from hulc_tpu.ops import rotations as R
from hulc_tpu.ops.frame_transforms import tcp_to_world_frame, world_to_tcp_frame
from hulc_tpu.models.vision import SpatialSoftmax

GOLDENS = pathlib.Path(__file__).parent / "goldens" / "reference_goldens.npz"


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.mark.parametrize("conv", ["XYZ", "ZYX", "XZY"])
def test_euler_matrix_goldens(g, conv):
    euler = g["euler_in"]
    ours_m = np.asarray(R.euler_angles_to_matrix(jnp.asarray(euler), conv))
    np.testing.assert_allclose(ours_m, g[f"matrix_{conv}"], atol=1e-5)
    ours_e = np.asarray(R.matrix_to_euler_angles(jnp.asarray(g[f"matrix_{conv}"]), conv))
    np.testing.assert_allclose(ours_e, g[f"euler_back_{conv}"], atol=1e-4)


def test_quaternion_goldens(g):
    ours_q = np.asarray(R.matrix_to_quaternion(jnp.asarray(g["matrix_XYZ"])))
    sign = np.where(g["quat"][:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(ours_q, g["quat"] * sign, atol=1e-4)
    ours_m = np.asarray(R.quaternion_to_matrix(jnp.asarray(g["quat"])))
    np.testing.assert_allclose(ours_m, g["quat_matrix"], atol=1e-5)


def test_gripper_control_goldens(g):
    tcp = np.asarray(world_to_tcp_frame(jnp.asarray(g["gc_action"]), jnp.asarray(g["gc_robot_obs"])))
    np.testing.assert_allclose(tcp, g["gc_tcp"], atol=5e-4)
    world = np.asarray(tcp_to_world_frame(jnp.asarray(g["gc_action"]), jnp.asarray(g["gc_robot_obs"])))
    np.testing.assert_allclose(world, g["gc_world"], atol=5e-4)


def test_spatial_softmax_goldens(g):
    ours = SpatialSoftmax(temperature=1.0).apply({}, jnp.asarray(g["ss_in"].transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), g["ss_out"], atol=1e-5)
