"""Physics engine validation: FK semantics, PD tracking, contacts, box dynamics.

Validates the documented reference model semantics:
- hand quaternion [0, sqrt(.5), 0, sqrt(.5)] at ARR=0 (docs/DESIGN_DECISIONS.md:49-73)
- ARTz moves the hand vertically relative to spawn (docs/reference-coordinate-systems.md:13-43)
- fingers extend along world +X at q=0, palm facing down
- strong PD position control tracks targets; joint limits hold
- free box falls under gravity and rests on the plane without jitter
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.constants import DOF_INDEX, NUM_DOFS
from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model
from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.types import PhysicsState, SimParams, make_initial_physics_state

SPAWN = jnp.array([[0.0, 0.0, 0.5]], dtype=jnp.float32)


@pytest.fixture(scope="module")
def phys():
    return HandPhysics(params=SimParams(dt=0.005, substeps=4))


@pytest.fixture(scope="module")
def model():
    return build_hand_model()


def fk_at(phys, q_np):
    state = make_initial_physics_state(1)
    state = PhysicsState(
        q=jnp.asarray(q_np, dtype=jnp.float32)[None],
        qd=state.qd, box_pos=state.box_pos, box_quat=state.box_quat,
        box_linvel=state.box_linvel, box_angvel=state.box_angvel,
    )
    return phys.kinematics(state, SPAWN)


class TestFK:
    def test_hand_base_builtin_rotation(self, phys, model):
        kin = fk_at(phys, np.zeros(NUM_DOFS))
        palm = model.body_index("right_hand_base")
        np.testing.assert_allclose(kin.body_pos[0, palm], [0.0, 0.0, 0.5], atol=1e-6)
        q = np.abs(np.asarray(kin.body_quat[0, palm]))
        np.testing.assert_allclose(q, [0.0, np.sqrt(0.5), 0.0, np.sqrt(0.5)], atol=1e-5)

    def test_artz_relative_motion(self, phys, model):
        q = np.zeros(NUM_DOFS)
        q[DOF_INDEX["ARTz"]] = 0.1
        kin = fk_at(phys, q)
        palm = model.body_index("right_hand_base")
        np.testing.assert_allclose(kin.body_pos[0, palm], [0.0, 0.0, 0.6], atol=1e-6)

    def test_fingers_point_forward(self, phys, model):
        kin = fk_at(phys, np.zeros(NUM_DOFS))
        palm_pos = np.asarray(kin.body_pos[0, model.body_index("right_hand_base")])
        for tip in ["r_f_link2_tip", "r_f_link3_tip", "r_f_link4_tip", "r_f_link5_tip"]:
            tp = np.asarray(kin.site_pos[0, model.site_index(tip)])
            rel = tp - palm_pos
            assert rel[0] > 0.10, f"{tip} should be forward (+X): {rel}"
            assert abs(rel[2]) < 0.03, f"{tip} roughly in palm plane: {rel}"

    def test_thumb_points_left(self, phys, model):
        kin = fk_at(phys, np.zeros(NUM_DOFS))
        palm_pos = np.asarray(kin.body_pos[0, model.body_index("right_hand_base")])
        tp = np.asarray(kin.site_pos[0, model.site_index("r_f_link1_tip")])
        assert (tp - palm_pos)[1] > 0.08, "thumb extends +Y at q=0"

    def test_thumb_rotation_opposes(self, phys, model):
        q = np.zeros(NUM_DOFS)
        q[DOF_INDEX["r_f_joint1_1"]] = np.pi / 2
        kin = fk_at(phys, q)
        base = np.asarray(
            kin.body_pos[0, model.body_index("r_f_link1_1")]
        )
        tp = np.asarray(kin.site_pos[0, model.site_index("r_f_link1_tip")])
        assert (tp - base)[2] < -0.05, "thumb rotated 90deg points down (opposition)"

    def test_finger_curl_goes_down(self, phys, model):
        q = np.zeros(NUM_DOFS)
        for j in ["r_f_joint2_2", "r_f_joint2_3", "r_f_joint2_4"]:
            q[DOF_INDEX[j]] = 1.0
        kin = fk_at(phys, q)
        tip_curl = np.asarray(kin.site_pos[0, model.site_index("r_f_link2_tip")])
        kin0 = fk_at(phys, np.zeros(NUM_DOFS))
        tip_flat = np.asarray(kin0.site_pos[0, model.site_index("r_f_link2_tip")])
        assert tip_curl[2] < tip_flat[2] - 0.03, "curling lowers the fingertip"

    def test_arrz_yaws_hand(self, phys, model):
        q = np.zeros(NUM_DOFS)
        q[DOF_INDEX["ARRz"]] = np.pi / 2
        kin = fk_at(phys, q)
        palm_pos = np.asarray(kin.body_pos[0, model.body_index("right_hand_base")])
        tp = np.asarray(kin.site_pos[0, model.site_index("r_f_link3_tip")])
        rel = tp - palm_pos
        assert rel[1] > 0.10 and abs(rel[0]) < 0.05, "yaw 90deg turns fingers to +Y"


class TestDynamics:
    def test_pd_holds_pose_under_gravity(self, phys):
        state = make_initial_physics_state(1)
        targets = jnp.zeros((1, NUM_DOFS))
        for _ in range(100):  # 0.5 s
            state, _ = phys.step(state, targets, SPAWN)
        q = np.asarray(state.q[0])
        assert np.abs(q[:6]).max() < 5e-3, f"base held at spawn: {q[:6]}"
        assert np.abs(q[6:]).max() < 0.12, f"fingers near zero: {q[6:]}"

    def test_pd_tracks_base_target(self, phys):
        state = make_initial_physics_state(1)
        targets = jnp.zeros((1, NUM_DOFS)).at[0, DOF_INDEX["ARTz"]].set(0.2)
        for _ in range(200):  # 1 s
            state, _ = phys.step(state, targets, SPAWN)
        assert abs(float(state.q[0, DOF_INDEX["ARTz"]]) - 0.2) < 0.01

    def test_pd_tracks_finger_target(self, phys):
        state = make_initial_physics_state(1)
        targets = jnp.zeros((1, NUM_DOFS)).at[0, DOF_INDEX["r_f_joint2_2"]].set(1.0)
        for _ in range(200):
            state, _ = phys.step(state, targets, SPAWN)
        assert abs(float(state.q[0, DOF_INDEX["r_f_joint2_2"]]) - 1.0) < 0.05

    def test_joint_limits_hold(self, phys):
        state = make_initial_physics_state(1)
        # command far beyond the upper limit of the index spread (0.3)
        targets = jnp.zeros((1, NUM_DOFS)).at[0, DOF_INDEX["r_f_joint2_1"]].set(5.0)
        for _ in range(100):
            state, _ = phys.step(state, targets, SPAWN)
        assert float(state.q[0, DOF_INDEX["r_f_joint2_1"]]) <= 0.3 + 1e-5

    def test_velocities_finite_and_bounded(self, phys):
        state = make_initial_physics_state(1)
        targets = jnp.full((1, NUM_DOFS), 0.5)
        for _ in range(50):
            state, _ = phys.step(state, targets, SPAWN)
        assert np.isfinite(np.asarray(state.qd)).all()
        assert np.abs(np.asarray(state.qd)).max() < 50.0


class TestBox:
    @pytest.fixture(scope="class")
    def bphys(self):
        return HandPhysics(
            params=SimParams(dt=0.01, substeps=4, has_box=True, box_size=0.05,
                             box_mass=0.1)
        )

    def test_box_falls_and_rests(self, bphys):
        state = make_initial_physics_state(1, box_pos=jnp.array([[0.3, 0.0, 0.2]]))
        # hand far away so it cannot touch the box
        spawn = jnp.array([[0.0, 0.0, 1.5]], dtype=jnp.float32)
        targets = jnp.zeros((1, NUM_DOFS))
        for _ in range(150):  # 1.5 s
            state, info = bphys.step(state, targets, spawn)
        z = float(state.box_pos[0, 2])
        assert 0.020 < z < 0.030, f"box rests near half-size 0.025: {z}"
        assert float(jnp.linalg.norm(state.box_linvel[0])) < 0.02
        # ground supports the box: net upward contact ~ m*g
        fz = float(info.box_contact_force[0, 2])
        assert abs(fz - 0.1 * 9.81) < 0.3, f"support force ~ mg: {fz}"

    def test_box_contact_with_hand_spheres(self, bphys):
        # drive the hand down onto the box and expect contact forces on the
        # distal links and a reaction on the box
        state = make_initial_physics_state(1, box_pos=jnp.array([[0.08, 0.0, 0.025]]))
        spawn = jnp.array([[0.0, 0.0, 0.12]], dtype=jnp.float32)
        targets = jnp.zeros((1, NUM_DOFS)).at[0, DOF_INDEX["ARTz"]].set(-0.06)
        hit = False
        for _ in range(100):
            state, info = bphys.step(state, targets, spawn)
            if float(jnp.abs(info.body_contact_force).sum()) > 0.01:
                hit = True
        assert hit, "hand should contact the box"
        assert np.isfinite(np.asarray(state.box_pos)).all()

    def test_batched_envs_independent(self, bphys):
        state = make_initial_physics_state(
            2, box_pos=jnp.array([[0.3, 0.0, 0.1], [0.3, 0.0, 0.3]])
        )
        spawn = jnp.tile(jnp.array([[0.0, 0.0, 1.5]], dtype=jnp.float32), (2, 1))
        targets = jnp.zeros((2, NUM_DOFS))
        state, _ = bphys.step(state, targets, spawn)
        # env 1's box (higher) is still falling from a different height
        assert float(state.box_pos[1, 2]) > float(state.box_pos[0, 2])


class TestGrasp:
    """Static-friction grasp capability: a pinched box must hang and ride a
    lifting hand. Guards the apparent-contact-mass + predicted-velocity
    impulse-bound contact model (engine.py compute_sphere_apparent_mass /
    _penalty_force) -- with bare link masses the fingertip force cap was
    ~0.2 N and this scenario is physically impossible (the failure mode
    behind zero BlindGrasping lift successes)."""

    @pytest.fixture(scope="class")
    def gphys(self):
        return HandPhysics(
            params=SimParams(dt=0.01, substeps=4, has_box=True,
                             box_size=0.05, box_mass=0.1)
        )

    def test_pinch_hang_and_lift(self, gphys):
        import dexrobot_isaac_tpu.ops.quat as qm

        spawn = jnp.array([[0.0, 0.0, 0.25]], dtype=jnp.float32)
        grip = np.zeros(NUM_DOFS, dtype=np.float32)
        grip[DOF_INDEX["r_f_joint1_1"]] = np.pi / 3
        for f in [2, 3]:
            for j in [2, 3, 4]:
                grip[DOF_INDEX[f"r_f_joint{f}_{j}"]] = 1.2
        for j in [2, 3, 4]:
            grip[DOF_INDEX[f"r_f_joint1_{j}"]] = 0.6

        st0 = PhysicsState(
            q=jnp.asarray(grip)[None], qd=jnp.zeros((1, NUM_DOFS)),
            box_pos=jnp.zeros((1, 3)), box_quat=jnp.array([[0.0, 0, 0, 1]]),
            box_linvel=jnp.zeros((1, 3)), box_angvel=jnp.zeros((1, 3)),
        )
        kin = gphys.kinematics(st0, spawn)
        sb = gphys._sphere_body
        sp = np.asarray(
            kin.body_pos[0, sb]
            + qm.quat_rotate(kin.body_quat[0, sb],
                             jnp.asarray(gphys._sphere_pos))
        )
        r = np.asarray(gphys._sphere_radius)
        thumb, fingers = sp[4], 0.5 * (sp[10] + sp[16])
        d = fingers - thumb
        gap = np.linalg.norm(d)
        d_hat = d / gap
        need = 0.05 + r[4] + 0.5 * (r[10] + r[16]) - 2 * 0.0015
        assert abs(gap - need) < 0.004, (
            f"grip pose drifted: pinch gap {gap*1000:.1f}mm vs {need*1000:.1f}mm"
        )
        # orient the box with one face axis along the 3D pinch direction
        ex = np.array([1.0, 0.0, 0.0])
        axis = np.cross(ex, d_hat)
        s, c = np.linalg.norm(axis), float(np.dot(ex, d_hat))
        th = np.arctan2(s, c)
        bq = np.concatenate(
            [axis / s * np.sin(th / 2), [np.cos(th / 2)]]
        ).astype(np.float32)
        center = 0.5 * (thumb + fingers)

        state = PhysicsState(
            q=st0.q, qd=st0.qd,
            box_pos=jnp.asarray(center, dtype=jnp.float32)[None],
            box_quat=jnp.asarray(bq)[None],
            box_linvel=jnp.zeros((1, 3)), box_angvel=jnp.zeros((1, 3)),
        )
        targets = jnp.asarray(grip)[None]
        z0 = float(state.box_pos[0, 2])
        assert z0 > 0.1, "box must hang clear of the ground"

        for _ in range(100):  # settle 1 s
            state, _ = gphys.step(state, targets, spawn)
        z_settle = float(state.box_pos[0, 2])
        assert z0 - z_settle < 0.02, (
            f"box fell out of the static pinch: {z0:.3f} -> {z_settle:.3f}"
        )

        lift = 0.15
        for i in range(150):  # raise base 15 cm over 1.5 s
            t2 = targets.at[0, DOF_INDEX["ARTz"]].set(lift * (i + 1) / 150)
            state, _ = gphys.step(state, t2, spawn)
        t2 = targets.at[0, DOF_INDEX["ARTz"]].set(lift)
        for _ in range(100):  # hold 1 s
            state, _ = gphys.step(state, t2, spawn)
        z_end = float(state.box_pos[0, 2])
        assert z_end > z0 + lift - 0.03, (
            f"box did not ride the lift: start {z0:.3f}, end {z_end:.3f}, "
            f"hand rose {lift}"
        )


class TestSelfCollision:
    """Finger-finger self-collision over the build-time-pruned sphere pairs
    (engine.compute_self_collision_pairs). The reference gets intra-hand
    collision from PhysX by creating the hand actor with collision filter 0
    (hand_initializer.py:386-388); here the same behavior comes from
    sphere-sphere penalty contacts on the statically pruned pair list."""

    def _ring_pinky_gap(self, phys, q):
        from dexrobot_isaac_tpu.physics import engine as eng

        m = phys.model
        fid = eng.sphere_finger_ids(m)
        sb = np.asarray(m.sphere_body)
        r = np.asarray(m.sphere_radius)
        pos, rot = eng._np_fk_pose(m, np.asarray(q, dtype=np.float64))
        sp = pos[sb] + np.einsum("bij,bj->bi", rot[sb], m.sphere_pos)
        ia, ib = np.nonzero(fid == 3)[0], np.nonzero(fid == 4)[0]
        d = np.linalg.norm(sp[ia][:, None] - sp[ib][None], axis=-1)
        return float((d - (r[ia][:, None] + r[ib][None])).min())

    def test_pair_list_sane(self):
        from dexrobot_isaac_tpu.physics import engine as eng

        m = build_hand_model()
        pairs = eng.compute_self_collision_pairs(m)
        fid = eng.sphere_finger_ids(m)
        ns = len(m.sphere_body)
        assert len(pairs) > 0
        for i, j in pairs:
            assert 0 <= i < ns and 0 <= j < ns and i != j
            # never within one finger (adjacent links would always "collide")
            assert fid[i] != fid[j] or fid[i] == -1

    def test_crossed_fingers_resolve(self):
        # ring spread to its max (0.3 rad, toward the pinky) with the pinky
        # held at 0.1: geometrically the sphere overlap reaches ~11 mm, so
        # without self-collision the tracked pose interpenetrates deeply
        targets = np.zeros(NUM_DOFS, dtype=np.float32)
        targets[DOF_INDEX["r_f_joint4_1"]] = 0.3
        targets[DOF_INDEX["r_f_joint5_1"]] = 0.1
        gaps = {}
        for sc in (False, True):
            phys = HandPhysics(
                params=SimParams(dt=0.005, substeps=4, self_collision=sc)
            )
            state = make_initial_physics_state(1)
            t = jnp.asarray(targets)[None]
            for _ in range(120):  # 0.6 s
                state, _ = phys.step(state, t, SPAWN)
            assert np.isfinite(np.asarray(state.q)).all()
            gaps[sc] = self._ring_pinky_gap(phys, np.asarray(state.q[0]))
        assert gaps[False] < -0.008, f"expected deep overlap when off: {gaps}"
        assert gaps[True] > -0.004, f"contact should resolve overlap: {gaps}"


class TestCoriolisTerms:
    """Optional RNEA velocity-product terms (SimParams.coriolis; round-4).

    The reference's PhysX articulated solver includes these
    (docs/reference-physics-implementation.md:27-29); our engine omits
    them by default with the omission MEASURED (tools/measure_coriolis.py).
    These tests pin the term's basic physics: exactly zero at zero
    velocity, small/finite/stable at speed."""

    def _engines(self):
        import dataclasses

        p = SimParams(dt=0.005, substeps=4, has_box=False)
        off = HandPhysics(params=p)
        on = HandPhysics(
            model=off.model, params=dataclasses.replace(p, coriolis=True)
        )
        return off, on

    def test_zero_velocity_identical(self):
        import dataclasses

        # ONE substep from rest: qd = 0 -> v x* (I v) == 0 exactly, so the
        # step is bitwise-identical (later substeps have qd != 0 and
        # legitimately differ by the tiny bias)
        p = SimParams(dt=0.005, substeps=1, has_box=False)
        off = HandPhysics(params=p)
        on = HandPhysics(
            model=off.model, params=dataclasses.replace(p, coriolis=True)
        )
        state = jax.tree.map(lambda x: x[0], make_initial_physics_state(1))
        tgt = jnp.zeros(NUM_DOFS)
        s_off, _ = off.step_single(state, tgt, SPAWN[0])
        s_on, _ = on.step_single(state, tgt, SPAWN[0])
        np.testing.assert_array_equal(np.asarray(s_off.q), np.asarray(s_on.q))
        np.testing.assert_array_equal(
            np.asarray(s_off.qd), np.asarray(s_on.qd)
        )

    def test_fast_motion_small_finite_effect(self):
        import dataclasses

        off, on = self._engines()
        state = jax.tree.map(lambda x: x[0], make_initial_physics_state(1))
        # spin the wrist fast (2 rad/s) with fingers moving
        qd0 = jnp.zeros(NUM_DOFS).at[3:6].set(2.0).at[6:].set(1.0)
        state = dataclasses.replace(state, qd=qd0)
        tgt = jnp.zeros(NUM_DOFS)
        spawn_high = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
        s_off, _ = off.step_single(state, tgt, spawn_high)
        s_on, _ = on.step_single(state, tgt, spawn_high)
        dqd = np.abs(np.asarray(s_on.qd - s_off.qd))
        assert np.isfinite(np.asarray(s_on.qd)).all()
        assert dqd.max() > 0.0           # the term does something...
        assert dqd.max() < 0.05          # ...but stays a small correction

    def test_pallas_path_declines_coriolis(self):
        _, on = self._engines()
        # the fused kernels never implement the bias: the control-step
        # factory must fall back to the XLA path even when asked for
        # pallas — executing on CPU proves no pallas_call was built
        fn = on.make_control_step(2, use_pallas=True)
        state = make_initial_physics_state(2)
        from dexrobot_isaac_tpu.physics.types import DRSample

        new_state, info, kin = fn(
            state, jnp.zeros((2, NUM_DOFS)),
            jnp.broadcast_to(SPAWN, (2, 3)), DRSample.nominal(2),
        )
        assert np.isfinite(np.asarray(new_state.q)).all()
