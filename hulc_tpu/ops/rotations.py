"""Rotation math in pure JAX (fp32).

Covers the API surface HULC consumes from its vendored PyTorch3D rotation
library (reference: hulc/models/decoders/utils/pytorch3d_transforms.py):
``euler_angles_to_matrix``, ``matrix_to_euler_angles``,
``matrix_to_quaternion``, ``quaternion_to_matrix``, plus axis-angle and 6D
rotation conversions for parity with the vendored file's public surface.

All functions are written for XLA: no data-dependent control flow, stable
formulations (transpose instead of inverse, clamped asin, branchless
largest-pivot quaternion extraction), and fp32 math regardless of the
surrounding compute dtype — mirroring the fp32 autocast island the reference
enforces for frame math (gripper_control.py:17).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_AXES = {"X": 0, "Y": 1, "Z": 2}


def _axis_rotation(axis: str, angle: Array) -> Array:
    """Rotation matrix about a principal axis. angle: (...,) -> (..., 3, 3)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        rows = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        rows = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        rows = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: Array, convention: str = "XYZ") -> Array:
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    R = R_c0(a0) @ R_c1(a1) @ R_c2(a2), matching the reference convention
    (pytorch3d_transforms.py euler_angles_to_matrix).
    """
    if len(convention) != 3 or any(a not in _AXES for a in convention):
        raise ValueError(f"invalid convention {convention}")
    euler_angles = euler_angles.astype(jnp.float32)
    m0 = _axis_rotation(convention[0], euler_angles[..., 0])
    m1 = _axis_rotation(convention[1], euler_angles[..., 1])
    m2 = _axis_rotation(convention[2], euler_angles[..., 2])
    return m0 @ m1 @ m2


def _angle_from_tan(
    axis: str, other_axis: str, data: Array, horizontal: bool, tait_bryan: bool
) -> Array:
    """Extract the first or third Euler angle from matrix row/column data.

    Mirrors the extraction logic of the reference matrix_to_euler_angles.
    """
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = axis + other_axis in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: Array, convention: str = "XYZ") -> Array:
    """Rotation matrices (..., 3, 3) -> Euler angles (..., 3).

    The asin/acos argument is clamped to [-1, 1] so near-gimbal inputs stay
    finite; the reference instead falls back through a quaternion round-trip
    on NaN (gripper_control.py:55-59), which a clamped formulation makes
    unnecessary under jit.
    """
    if len(convention) != 3 or any(a not in _AXES for a in convention):
        raise ValueError(f"invalid convention {convention}")
    matrix = matrix.astype(jnp.float32)
    i0 = _AXES[convention[0]]
    i2 = _AXES[convention[2]]
    tait_bryan = i0 != i2
    eps = 1e-7
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1.0 + eps, 1.0 - eps)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0 + eps, 1.0 - eps))
    a0 = _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan)
    a2 = _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan)
    return jnp.stack([a0, central, a2], axis=-1)


def quaternion_to_matrix(quaternions: Array) -> Array:
    """Quaternions (..., 4) in (w, x, y, z) order -> rotation matrices (..., 3, 3)."""
    q = quaternions.astype(jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = jnp.asarray(2.0, q.dtype)
    m = jnp.stack(
        (
            1 - two * (y * y + z * z),
            two * (x * y - w * z),
            two * (x * z + w * y),
            two * (x * y + w * z),
            1 - two * (x * x + z * z),
            two * (y * z - w * x),
            two * (x * z - w * y),
            two * (y * z + w * x),
            1 - two * (x * x + y * y),
        ),
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: Array) -> Array:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4), (w, x, y, z), w >= 0.

    Branchless largest-pivot extraction: compute all four candidate
    quaternions and select the numerically strongest via one-hot masking —
    XLA-friendly, no data-dependent control flow.
    """
    m = matrix.astype(jnp.float32)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four pivot magnitudes: 4w^2, 4x^2, 4y^2, 4z^2 (shifted by +1 each).
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # Candidate quaternions, one per pivot (unnormalized).
    qw = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1)
    denom = jnp.stack([tw, tx, ty, tz], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 pivots, 4 comps)
    cands = cands / (2.0 * safe_sqrt(denom)[..., None])

    pivot = jnp.argmax(denom, axis=-1)
    sel = jax.nn.one_hot(pivot, 4, dtype=m.dtype)  # (..., 4)
    q = jnp.sum(cands * sel[..., None], axis=-2)
    # Canonicalize to w >= 0 (both q and -q encode the same rotation).
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def axis_angle_to_quaternion(axis_angle: Array) -> Array:
    """Axis-angle (..., 3) (axis * angle) -> quaternion (..., 4) (w, x, y, z)."""
    aa = axis_angle.astype(jnp.float32)
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    eps = 1e-6
    small = angle < eps
    # sin(half)/angle -> 0.5 - angle^2/48 for small angles (Taylor).
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: Array) -> Array:
    """Quaternion (..., 4) (w, x, y, z) -> axis-angle (..., 3).

    pytorch3d-style formulation: xyz / (sin(angle/2) / angle), with the
    Taylor branch keyed on the ANGLE (not |xyz|) so w near -1 (angle ~ 2*pi,
    tiny xyz) still returns the full-turn rotation.
    """
    q = quaternions.astype(jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    norm_xyz = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm_xyz, q[..., :1])
    angle = 2.0 * half
    eps = 1e-6
    small = jnp.abs(angle) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angle * angle) / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angle),
    )
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: Array) -> Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: Array) -> Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: Array) -> Array:
    """6D rotation representation (..., 6) -> (..., 3, 3) via Gram-Schmidt."""
    a1, a2 = d6[..., :3].astype(jnp.float32), d6[..., 3:].astype(jnp.float32)
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: Array) -> Array:
    """(..., 3, 3) -> (..., 6): first two rows flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))
