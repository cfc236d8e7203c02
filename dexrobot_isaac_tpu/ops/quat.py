"""Batched quaternion / rotation math in JAX.

Quaternions use the ``[x, y, z, w]`` convention throughout (the same layout the
reference framework exposes in its observation tensors, e.g. `hand_pose` pos3 +
quat4; reference: dexhand_env/components/physics/tensor_manager.py:273-275).

All functions broadcast over arbitrary leading batch dimensions and are pure,
jit- and vmap-friendly. This module is the TPU-native equivalent of the
reference's `isaacgym.torch_utils` quaternion helpers plus
`dexhand_env/utils/torch_jit_utils.py:15-227` and
`dexhand_env/utils/coordinate_transforms.py:17-56`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_unit(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) [0, 0, 0, 1] with given batch shape."""
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (inverse for unit quaternions): [-x, -y, -z, w]."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b for xyzw quaternions (broadcasting)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (broadcasting)."""
    qvec = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + qw * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by the inverse of quaternion(s) q."""
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from (unit) rotation axis and angle (radians)."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    xyz = axis * jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_from_euler_xyz(
    roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray
) -> jnp.ndarray:
    """Quaternion from intrinsic XYZ Euler angles (matches isaacgym semantics)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def euler_xyz_from_quat(q: jnp.ndarray):
    """Intrinsic XYZ (roll, pitch, yaw) Euler angles from quaternion(s)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = 1.0 - 2.0 * (qx * qx + qy * qy)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = 1.0 - 2.0 * (qy * qy + qz * qz)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix (last two dims) from quaternion(s)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion(s) by world-frame angular velocity omega for dt.

    q' = normalize(q + 0.5 * dt * omega_quat * q) -- first-order (exponential
    map approximated), sufficient at physics substep rates.
    """
    omega_quat = jnp.concatenate(
        [omega, jnp.zeros_like(omega[..., :1])], axis=-1
    )
    dq = 0.5 * dt * quat_mul(omega_quat, q)
    return quat_unit(q + dq)


def point_in_hand_frame(
    point_world: jnp.ndarray, hand_pos: jnp.ndarray, hand_quat: jnp.ndarray
) -> jnp.ndarray:
    """Transform world-frame point(s) into the hand (body) frame.

    Parity with reference `utils/coordinate_transforms.py:17-36`.
    """
    return quat_rotate_inverse(hand_quat, point_world - hand_pos)


def point_in_world_frame(
    point_hand: jnp.ndarray, hand_pos: jnp.ndarray, hand_quat: jnp.ndarray
) -> jnp.ndarray:
    """Transform hand-frame point(s) back into the world frame.

    Parity with reference `utils/coordinate_transforms.py:39-56`.
    """
    return quat_rotate(hand_quat, point_hand) + hand_pos


def quat_from_rotvec(vec: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Scaled axis-angle (exponential coordinates, (..., 3)) -> quaternion
    (..., 4) xyzw. Parity: axisangle2quat (torch_jit_utils.py:77-108), which
    maps |vec| < eps to the identity; here the same limit falls out of a
    numerically safe half-sinc so the function stays differentiable at 0."""
    # gradient-safe at 0: the norm's derivative is 0/0 at the zero vector,
    # so both the mask and the Taylor branch are expressed in |v|^2 (smooth)
    # and the sqrt only ever sees a clamped argument
    sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    small = sq < eps * eps
    angle = jnp.sqrt(jnp.where(small, eps * eps, sq))
    half = 0.5 * angle
    # sin(angle/2)/angle with the exact Taylor limit 1/2 - |v|^2/48 at 0
    half_sinc = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    cos_half = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([vec * half_sinc, cos_half], axis=-1)


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) xyzw.

    Branchless Shepperd-style selection (parity with matrix_to_quaternion,
    torch_jit_utils.py:121-193, which returns wxyz; this module's convention
    is xyzw): build all four candidate quaternions scaled by their pivot and
    select the numerically largest pivot per element with a one-hot mask."""
    b = m.shape[:-2]
    f = m.reshape(b + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = (
        f[..., i] for i in range(9)
    )
    # squared 2*pivot magnitudes for (w, x, y, z)
    q_abs2 = jnp.stack(
        [1.0 + m00 + m11 + m22,
         1.0 + m00 - m11 - m22,
         1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22], axis=-1,
    )
    q_abs = jnp.sqrt(jnp.clip(q_abs2, 0.0, None))
    # candidate quats (xyzw), row k scaled by 2*q_abs[k]
    cand = jnp.stack(
        [
            jnp.stack([m21 - m12, m02 - m20, m10 - m01, q_abs[..., 0] ** 2],
                      axis=-1),
            jnp.stack([q_abs[..., 1] ** 2, m10 + m01, m02 + m20, m21 - m12],
                      axis=-1),
            jnp.stack([m10 + m01, q_abs[..., 2] ** 2, m12 + m21, m02 - m20],
                      axis=-1),
            jnp.stack([m20 + m02, m21 + m12, q_abs[..., 3] ** 2, m10 - m01],
                      axis=-1),
        ],
        axis=-2,
    ) / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=cand.dtype)
    return quat_unit(jnp.sum(cand * onehot[..., None], axis=-2))


def rotation_matrix_from_vectors(
    forward: jnp.ndarray, up: jnp.ndarray
) -> jnp.ndarray:
    """Orthonormal rotation matrix (..., 3, 3) with columns
    [right, up', forward] (Gram-Schmidt).

    Parity note: the reference's rotation_matrix_from_vectors
    (torch_jit_utils.py:196-224) uses right = forward x up, which makes the
    stacked [right, up', forward] LEFT-handed (det = -1) -- not a rotation,
    so its downstream matrix_to_quaternion output does not represent the
    matrix. Here right = up x forward, giving a proper right-handed rotation
    (right x up' = forward, det = +1) with the same documented intent."""
    def _norm(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-6)

    forward = _norm(forward)
    right = _norm(jnp.cross(up, forward))
    up2 = jnp.cross(forward, right)
    return jnp.stack([right, up2, forward], axis=-1)


def lookat_quaternion(
    cam_pos: jnp.ndarray, target_pos: jnp.ndarray, up: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Quaternion (xyzw) orienting local +z toward `target_pos` from
    `cam_pos` with `up` (default world +z) as the vertical reference
    (parity: lookat_quaternion, torch_jit_utils.py:227-257).

    When forward is (anti-)parallel to `up` — e.g. the common straight-down
    camera — the frame is completed with world +x instead of degenerating
    to a singular matrix."""
    if up is None:
        up = jnp.zeros_like(cam_pos).at[..., 2].set(1.0)
    forward = target_pos - cam_pos
    f_hat = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True).clip(1e-9)
    u_hat = up / jnp.linalg.norm(up, axis=-1, keepdims=True).clip(1e-9)
    parallel = (
        jnp.linalg.norm(jnp.cross(u_hat, f_hat), axis=-1, keepdims=True) < 1e-6
    )
    fallback = jnp.zeros_like(up).at[..., 0].set(1.0)
    up = jnp.where(parallel, fallback, up)
    return rotmat_to_quat(rotation_matrix_from_vectors(forward, up))
