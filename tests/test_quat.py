"""Golden tests for the quaternion/transform library.

Ported (conceptually, not textually) from the reference's analytic test cases
in dexhand_env/utils/test_coordinate_transforms.py:22-247: identity,
translation-only, pure rotations, and round-trip world<->hand transforms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.ops import quat as qm


def q_xyzw(x, y, z, w):
    return jnp.array([x, y, z, w], dtype=jnp.float32)


SQ2 = float(np.sqrt(0.5))


class TestQuatBasics:
    def test_identity_rotate(self):
        v = jnp.array([1.0, 2.0, 3.0])
        out = qm.quat_rotate(qm.quat_identity(), v)
        np.testing.assert_allclose(out, v, atol=1e-6)

    def test_mul_identity(self):
        q = qm.quat_unit(q_xyzw(0.1, 0.2, 0.3, 0.9))
        np.testing.assert_allclose(
            qm.quat_mul(q, qm.quat_identity()), q, atol=1e-6
        )

    def test_conjugate_inverse(self):
        q = qm.quat_unit(q_xyzw(0.1, -0.4, 0.2, 0.8))
        out = qm.quat_mul(q, qm.quat_conjugate(q))
        np.testing.assert_allclose(out, qm.quat_identity(), atol=1e-6)

    def test_rotate_90z(self):
        qz = qm.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        out = qm.quat_rotate(qz, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)

    def test_rotate_90y(self):
        qy = qm.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 2)
        out = qm.quat_rotate(qy, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-6)

    def test_euler_roundtrip(self):
        r, p, y = 0.3, -0.6, 1.1
        q = qm.quat_from_euler_xyz(jnp.array(r), jnp.array(p), jnp.array(y))
        rr, pp, yy = qm.euler_xyz_from_quat(q)
        np.testing.assert_allclose([rr, pp, yy], [r, p, y], atol=1e-5)

    def test_rotmat_matches_rotate(self):
        q = qm.quat_unit(q_xyzw(0.3, 0.1, -0.2, 0.9))
        v = jnp.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(
            qm.quat_to_rotmat(q) @ v, qm.quat_rotate(q, v), atol=1e-5
        )

    def test_batched_broadcasting(self):
        q = jnp.tile(qm.quat_identity()[None], (4, 1))
        v = jnp.ones((4, 3))
        assert qm.quat_rotate(q, v).shape == (4, 3)

    def test_integrate_constant_omega(self):
        # integrating omega_z = pi rad/s for 0.5 s ~ 90 deg about z
        omega = jnp.array([0.0, 0.0, jnp.pi])
        dt = 1e-3

        @jax.jit
        def rollout(q):
            return jax.lax.fori_loop(
                0, 500, lambda _, qq: qm.quat_integrate(qq, omega, dt), q
            )

        q = rollout(qm.quat_identity())
        expected = qm.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
        np.testing.assert_allclose(jnp.abs(q), jnp.abs(expected), atol=1e-3)


class TestHandFrameTransforms:
    """Analytic cases from the reference's coordinate-transform test suite."""

    def test_identity_frame(self):
        p = jnp.array([1.0, 2.0, 3.0])
        out = qm.point_in_hand_frame(p, jnp.zeros(3), qm.quat_identity())
        np.testing.assert_allclose(out, p, atol=1e-6)

    def test_translation_only(self):
        p = jnp.array([1.0, 2.0, 3.0])
        hand = jnp.array([1.0, 1.0, 1.0])
        out = qm.point_in_hand_frame(p, hand, qm.quat_identity())
        np.testing.assert_allclose(out, [0.0, 1.0, 2.0], atol=1e-6)

    def test_rotation_90z(self):
        # hand rotated +90 about z; world +x maps to hand-frame -y... world
        # point (1,0,0) with hand at origin: hand x-axis points at world +y.
        qz = q_xyzw(0.0, 0.0, SQ2, SQ2)
        out = qm.point_in_hand_frame(jnp.array([1.0, 0.0, 0.0]), jnp.zeros(3), qz)
        np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-6)

    def test_builtin_90y_rotation_case(self):
        # the hand model's built-in Ry(90): world +x is hand-frame +z... the
        # reference uses this to check ARR-aligned compensation.
        qy = q_xyzw(0.0, SQ2, 0.0, SQ2)
        out = qm.point_in_hand_frame(jnp.array([1.0, 0.0, 0.0]), jnp.zeros(3), qy)
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-6)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        p = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
        hand_pos = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
        hand_quat = qm.quat_unit(jnp.asarray(rng.normal(size=4), dtype=jnp.float32))
        local = qm.point_in_hand_frame(p, hand_pos, hand_quat)
        back = qm.point_in_world_frame(local, hand_pos, hand_quat)
        np.testing.assert_allclose(back, p, atol=1e-5)


class TestRotationExtras:
    """quat_from_rotvec / rotmat_to_quat / rotation_matrix_from_vectors /
    lookat_quaternion (parity: torch_jit_utils.py:77-257)."""

    def test_rotvec_matches_axis_angle(self):
        rng = np.random.default_rng(0)
        axis = rng.normal(size=(64, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        angle = rng.uniform(-np.pi, np.pi, size=(64,))
        got = qm.quat_from_rotvec(jnp.asarray(axis * angle[:, None], jnp.float32))
        want = qm.quat_from_axis_angle(
            jnp.asarray(axis, jnp.float32), jnp.asarray(angle, jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_rotvec_zero_is_identity(self):
        q = np.asarray(qm.quat_from_rotvec(jnp.zeros((3,))))
        np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-7)
        # tiny but nonzero stays finite and normalized
        q2 = np.asarray(qm.quat_from_rotvec(jnp.asarray([1e-8, 0, 0])))
        assert np.isfinite(q2).all()
        np.testing.assert_allclose(np.linalg.norm(q2), 1.0, atol=1e-6)

    def test_rotmat_quat_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(128, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q = jnp.asarray(q, jnp.float32)
        q2 = qm.rotmat_to_quat(qm.quat_to_rotmat(q))
        # equal up to global sign
        sign = np.sign(np.sum(np.asarray(q2) * np.asarray(q), axis=-1))
        np.testing.assert_allclose(
            np.asarray(q2) * sign[:, None], np.asarray(q), rtol=1e-4, atol=1e-4
        )

    def test_rotation_matrix_from_vectors_orthonormal(self):
        rng = np.random.default_rng(2)
        fwd = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        up = jnp.zeros_like(fwd).at[:, 2].set(1.0)
        R = np.asarray(qm.rotation_matrix_from_vectors(fwd, up))
        eye = np.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(
            eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5
        )
        # third column IS the normalized forward
        f = np.asarray(fwd) / np.linalg.norm(fwd, axis=-1, keepdims=True)
        np.testing.assert_allclose(R[:, :, 2], f, atol=1e-5)

    def test_lookat_points_local_z_at_target(self):
        cam = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        tgt = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
        q = qm.lookat_quaternion(cam, tgt)
        z_world = np.asarray(qm.quat_rotate(q, jnp.asarray([[0.0, 0.0, 1.0]])))
        want = np.asarray(tgt - cam)
        want = want / np.linalg.norm(want)
        np.testing.assert_allclose(z_world, want, atol=1e-5)

    def test_rotvec_gradient_finite_at_zero(self):
        g = jax.grad(lambda v: qm.quat_from_rotvec(v).sum())(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()

    def test_lookat_straight_down_is_valid(self):
        cam = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        tgt = jnp.zeros((1, 3), jnp.float32)
        q = qm.lookat_quaternion(cam, tgt)
        R = qm.quat_to_rotmat(q)[0]
        det = float(jnp.linalg.det(R))
        z_world = np.asarray(qm.quat_rotate(q, jnp.asarray([[0.0, 0.0, 1.0]])))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)
        np.testing.assert_allclose(z_world, [[0.0, 0.0, -1.0]], atol=1e-5)
