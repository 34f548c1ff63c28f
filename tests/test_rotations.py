"""Rotation math: round-trip properties + numerical parity with the
reference's vendored PyTorch3D implementation (golden oracle, not copied)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hulc_tpu.ops import rotations as R


def rand_euler(n, seed=0, scale=np.pi * 0.9):
    rng = np.random.default_rng(seed)
    # Keep middle angle away from gimbal lock (+-pi/2) for round-trip tests.
    e = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    e[:, 1] = np.clip(e[:, 1], -1.4, 1.4)
    return e


def test_euler_matrix_roundtrip():
    e = rand_euler(256)
    m = R.euler_angles_to_matrix(jnp.asarray(e), "XYZ")
    e2 = R.matrix_to_euler_angles(m, "XYZ")
    np.testing.assert_allclose(np.asarray(e2), e, atol=2e-5)


def test_matrix_orthogonality():
    e = rand_euler(64, seed=1)
    m = np.asarray(R.euler_angles_to_matrix(jnp.asarray(e), "XYZ"))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_quaternion_matrix_roundtrip():
    e = rand_euler(256, seed=2)
    m = R.euler_angles_to_matrix(jnp.asarray(e), "XYZ")
    q = R.matrix_to_quaternion(m)
    m2 = R.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(3)
    aa = rng.uniform(-2.0, 2.0, size=(128, 3)).astype(np.float32)
    q = R.axis_angle_to_quaternion(jnp.asarray(aa))
    aa2 = R.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_axis_angle_small_angle_stable():
    aa = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    q = R.axis_angle_to_quaternion(aa)
    assert np.isfinite(np.asarray(q)).all()
    m = R.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(m), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_rotation_6d_roundtrip():
    e = rand_euler(64, seed=4)
    m = R.euler_angles_to_matrix(jnp.asarray(e), "XYZ")
    d6 = R.matrix_to_rotation_6d(m)
    m2 = R.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


@pytest.mark.parametrize("convention", ["XYZ", "ZYX", "XZY"])
def test_euler_matrix_parity_with_reference(ref_pytorch3d, convention):
    import torch

    e = rand_euler(128, seed=5)
    ours = np.asarray(R.euler_angles_to_matrix(jnp.asarray(e), convention))
    theirs = ref_pytorch3d.euler_angles_to_matrix(torch.from_numpy(e), convention).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    ours_e = np.asarray(R.matrix_to_euler_angles(jnp.asarray(theirs), convention))
    theirs_e = ref_pytorch3d.matrix_to_euler_angles(torch.from_numpy(theirs), convention).numpy()
    np.testing.assert_allclose(ours_e, theirs_e, atol=1e-4)


def test_quaternion_parity_with_reference(ref_pytorch3d):
    import torch

    e = rand_euler(128, seed=6)
    m = np.asarray(R.euler_angles_to_matrix(jnp.asarray(e), "XYZ"))
    ours_q = np.asarray(R.matrix_to_quaternion(jnp.asarray(m)))
    theirs_q = ref_pytorch3d.matrix_to_quaternion(torch.from_numpy(m)).numpy()
    # Quaternions are sign-ambiguous; ours canonicalizes w >= 0.
    sign = np.where(theirs_q[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(ours_q, theirs_q * sign, atol=1e-4)

    ours_m = np.asarray(R.quaternion_to_matrix(jnp.asarray(theirs_q)))
    theirs_m = ref_pytorch3d.quaternion_to_matrix(torch.from_numpy(theirs_q)).numpy()
    np.testing.assert_allclose(ours_m, theirs_m, atol=1e-5)
