"""BlindGrasping task-logic unit tests against hand-computed values.

Drives `compute_step` directly with synthetic observations/states so the FSM,
contact heuristic, reward math, criteria, and reset randomization are checked
without physics in the loop (reference semantics:
dexhand_env/tasks/blind_grasping_task.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.envs.tasks.blind_grasping import BlindGraspingTask
from dexrobot_isaac_tpu.physics.types import PhysicsState

N = 4
DT = 0.04


@pytest.fixture(scope="module")
def task():
    return BlindGraspingTask({
        "box": {"size": 0.05, "initial_position": {"xy_range": 0.02, "z": 0.027}},
        "contact_binary_threshold": 0.1,
    })


def make_physics(box_pos=None, box_vel=None):
    z = jnp.zeros
    return PhysicsState(
        q=z((N, 26)), qd=z((N, 26)),
        box_pos=jnp.asarray(box_pos) if box_pos is not None else z((N, 3)),
        box_quat=z((N, 4)).at[:, 3].set(1.0),
        box_linvel=jnp.asarray(box_vel) if box_vel is not None else z((N, 3)),
        box_angvel=z((N, 3)),
    )


def make_obs(pad_positions, contact_binary=None, hand_pos=None):
    """pad_positions: (N, 5, 3) world fingerpad positions."""
    pads = np.zeros((N, 5, 7), np.float32)
    pads[:, :, :3] = pad_positions
    pads[:, :, 6] = 1.0
    obs = {
        "fingerpad_poses_world": jnp.asarray(pads.reshape(N, 35)),
        "fingertip_poses_world": jnp.asarray(pads.reshape(N, 35)),
        "contact_binary": (
            jnp.asarray(contact_binary) if contact_binary is not None
            else jnp.zeros((N, 5))
        ),
        "hand_pose": jnp.concatenate([
            jnp.asarray(hand_pos) if hand_pos is not None else jnp.zeros((N, 3)),
            jnp.zeros((N, 3)), jnp.ones((N, 1)),
        ], axis=1),
        "base_dof_vel": jnp.zeros((N, 6)),
        "all_finger_dof_pos": jnp.zeros((N, 20)),
    }
    return obs


def run_step(task, obs, ts, physics, box_force=None):
    return task.compute_step(
        obs, ts, physics, None,
        jnp.zeros((N, 26, 3)),
        box_force if box_force is not None else jnp.zeros((N, 3)),
        DT,
    )


class TestContactHeuristic:
    def test_requires_all_three_conditions(self, task):
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        near = np.tile([0.1, 0.0, 0.05], (N, 5, 1))   # within sqrt(3)*0.025*1.2
        far = np.tile([0.5, 0.5, 0.5], (N, 5, 1))
        contact = np.ones((N, 5), np.float32)
        boxf = jnp.full((N, 3), 1.0)

        ts = task.init_task_states(N)
        phys = make_physics(box_pos)
        # all three -> contact
        step = run_step(task, make_obs(near, contact), ts, phys, boxf)
        assert np.asarray(step.task_obs["grasp_state"]).all()
        # no box force -> no contact
        step = run_step(task, make_obs(near, contact), ts, phys, jnp.zeros((N, 3)))
        assert not np.asarray(step.task_obs["grasp_state"]).any()
        # far away -> no contact
        step = run_step(task, make_obs(far, contact), ts, phys, boxf)
        assert not np.asarray(step.task_obs["grasp_state"]).any()
        # no finger sensor -> no contact
        step = run_step(task, make_obs(near, np.zeros((N, 5))), ts, phys, boxf)
        assert not np.asarray(step.task_obs["grasp_state"]).any()

    def test_grasp_needs_thumb_plus_other(self, task):
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        near = np.tile([0.1, 0.0, 0.05], (N, 5, 1))
        boxf = jnp.full((N, 3), 1.0)
        phys = make_physics(box_pos)
        # only fingers 1,2 (no thumb): other_contact yes, grasp no
        cb = np.zeros((N, 5), np.float32); cb[:, 1] = 1; cb[:, 2] = 1
        step = run_step(task, make_obs(near, cb), task.init_task_states(N), phys, boxf)
        assert np.asarray(step.task_obs["other_fingers_contact"]).all()
        assert not np.asarray(step.task_obs["grasp_state"]).any()


class TestStageFSM:
    def test_stage1_to_2_time_based(self, task):
        ts = task.init_task_states(N)
        phys = make_physics(np.tile([0.1, 0, 0.025], (N, 1)))
        obs = make_obs(np.tile([0.5, 0.5, 0.5], (N, 5, 1)))
        # +1: f32 accumulation of 0.04 crosses the 4.0 s threshold one step late
        n_steps = int(task.stage1_duration / DT) + 1
        for i in range(n_steps):
            step = run_step(task, obs, ts, phys)
            ts = step.task_states
        assert (np.asarray(ts["current_stage"]) == 2).all()
        assert np.asarray(ts["just_transitioned_to_stage2"]).all()
        np.testing.assert_allclose(np.asarray(ts["time_in_stage"]), 0.0)

    def test_stage2_contact_fast_path(self, task):
        ts = task.init_task_states(N)
        ts["current_stage"] = jnp.full(N, 2, jnp.int32)
        phys = make_physics(np.tile([0.1, 0, 0.025], (N, 1)))
        cb = np.ones((N, 5), np.float32)
        obs = make_obs(np.tile([0.1, 0, 0.05], (N, 5, 1)), cb)
        boxf = jnp.full((N, 3), 1.0)
        # contact sustained: threshold 0.5 s = 13 steps at 0.04
        needed = math.ceil(task.stage2_contact_success_threshold / DT)
        for i in range(needed + 1):
            step = run_step(task, obs, ts, phys, boxf)
            ts = step.task_states
        assert (np.asarray(ts["current_stage"]) == 3).all()

    def test_stage2_timeout_path_flags_failure(self, task):
        ts = task.init_task_states(N)
        ts["current_stage"] = jnp.full(N, 2, jnp.int32)
        phys = make_physics(np.tile([0.1, 0, 0.025], (N, 1)))
        obs = make_obs(np.tile([0.5, 0.5, 0.5], (N, 5, 1)))  # never contacts
        last = None
        for i in range(int(task.stage2_duration / DT) + 1):
            last = run_step(task, obs, ts, phys)
            ts = last.task_states
        assert (np.asarray(ts["current_stage"]) == 3).all()
        # timeout transition without real grasp -> stage2_contact_failed
        assert np.asarray(last.failure_criteria["stage2_contact_failed"]).all()

    def test_stage3_grasp_lost(self, task):
        ts = task.init_task_states(N)
        ts["current_stage"] = jnp.full(N, 3, jnp.int32)
        phys = make_physics(np.tile([0.1, 0, 0.025], (N, 1)))
        obs = make_obs(np.tile([0.5, 0.5, 0.5], (N, 5, 1)))
        step = run_step(task, obs, ts, phys)
        assert np.asarray(step.failure_criteria["stage3_grasp_lost"]).all()


class TestRewardsAndCriteria:
    def test_stage1_height_alignment_formula(self, task):
        ts = task.init_task_states(N)
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        pads = np.tile([0.1, 0.0, 0.125], (N, 5, 1))   # 0.1 above box
        phys = make_physics(box_pos)
        step = run_step(task, make_obs(pads), ts, phys)
        expected = math.exp(-task.height_alignment_decay * 0.1)
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["s1_height_alignment"]), expected,
            rtol=1e-4,
        )

    def test_penetration_penalty(self, task):
        ts = task.init_task_states(N)
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        # fingertip exactly at box center: depth = half size = 0.025
        pads = np.tile([0.1, 0.0, 0.025], (N, 5, 1))
        step = run_step(task, make_obs(pads), ts, make_physics(box_pos))
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["penetration_penalty"]),
            0.025 * task.penetration_depth_scale, rtol=1e-4,
        )

    def test_success_after_sustained_lift(self, task):
        ts = task.init_task_states(N)
        ts["current_stage"] = jnp.full(N, 3, jnp.int32)
        box_pos = np.tile([0.1, 0.0, 0.25], (N, 1))     # above 0.2 threshold
        pads = np.tile([0.1, 0.0, 0.26], (N, 5, 1))
        cb = np.ones((N, 5), np.float32)
        boxf = jnp.full((N, 3), 1.0)
        needed = int(round(task.contact_duration_threshold / DT))
        success = None
        for i in range(needed + 1):
            step = run_step(task, make_obs(pads, cb), ts, make_physics(box_pos), boxf)
            ts = step.task_states
            success = step.success_criteria["grasp_lift_success"]
        assert np.asarray(success).all()

    def test_s1_completion_gated_on_quality(self, task):
        # good positioning at the exact transition step -> bonus fires
        ts = task.init_task_states(N)
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        ts["time_in_stage"] = jnp.full(N, task.stage1_duration - DT / 2)
        ts["initial_box_pos"] = jnp.asarray(box_pos, dtype=jnp.float32)
        good_pads = np.tile([0.1, 0.0, 0.03], (N, 5, 1))  # centroid near box
        step = run_step(task, make_obs(good_pads), ts, make_physics(box_pos))
        assert np.asarray(step.task_states["just_transitioned_to_stage2"]).all()
        np.testing.assert_allclose(np.asarray(step.reward_terms["s1_completion"]), 1.0)
        # bad positioning -> failure flagged, no bonus
        ts2 = task.init_task_states(N)
        ts2["time_in_stage"] = jnp.full(N, task.stage1_duration - DT / 2)
        ts2["initial_box_pos"] = jnp.asarray(box_pos, dtype=jnp.float32)
        bad_pads = np.tile([0.5, 0.5, 0.5], (N, 5, 1))
        step = run_step(task, make_obs(bad_pads), ts2, make_physics(box_pos))
        assert np.asarray(step.failure_criteria["stage1_pregrasp_failed"]).all()
        np.testing.assert_allclose(np.asarray(step.reward_terms["s1_completion"]), 0.0)


class TestReset:
    def test_randomization_ranges(self, task):
        r = task.reset_task(jax.random.key(0), 256,
                            jnp.zeros(26, dtype=jnp.float32))
        dof = np.asarray(r.dof_pos)
        assert np.all(np.abs(dof[:, 0:3]) <= task.hand_translation_range + 1e-6)
        assert np.all(np.abs(dof[:, 3:6]) <= task.hand_rotation_range + 1e-6)
        assert np.all(dof[:, 6:] >= -1e-7)
        assert dof[:, 6].max() > task.other_finger_range  # thumb wider range
        box = np.asarray(r.box_pos)
        assert np.all(np.abs(box[:, :2]) <= task.box_xy_range + 1e-6)
        np.testing.assert_allclose(box[:, 2], task.box_z)
        q = np.asarray(r.box_quat)
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(q[:, :2], 0.0, atol=1e-7)  # yaw-only

    def test_curriculum_scales_hand_pose_ranges(self):
        t = BlindGraspingTask({
            "curriculum": {"enabled": True, "min_range_fraction": 0.2},
        })
        zero = jnp.zeros(26, dtype=jnp.float32)

        def amplitudes(difficulty):
            r = t.reset_task(jax.random.key(0), 512, zero,
                             difficulty=jnp.asarray(difficulty, jnp.float32))
            dof = np.asarray(r.dof_pos)
            return np.abs(dof[:, 0:3]).max(), np.abs(dof[:, 3:6]).max()

        lo_t, lo_r = amplitudes(0.0)
        hi_t, hi_r = amplitudes(1.0)
        # difficulty 0 => 20% of full range; difficulty 1 => full range
        assert lo_t <= 0.2 * t.hand_translation_range + 1e-6
        assert lo_r <= 0.2 * t.hand_rotation_range + 1e-6
        assert hi_t > 0.8 * t.hand_translation_range   # 512 samples fill range
        assert hi_r > 0.8 * t.hand_rotation_range
        # finger noise unaffected by difficulty (full range at d=0)
        r0 = t.reset_task(jax.random.key(1), 512, zero,
                          difficulty=jnp.asarray(0.0, jnp.float32))
        assert np.asarray(r0.dof_pos)[:, 6].max() > 0.8 * t.thumb_rotation_range

    def test_curriculum_disabled_ignores_difficulty(self, task):
        zero = jnp.zeros(26, dtype=jnp.float32)
        r = task.reset_task(jax.random.key(0), 512, zero,
                            difficulty=jnp.asarray(0.0, jnp.float32))
        dof = np.asarray(r.dof_pos)
        assert np.abs(dof[:, 0:3]).max() > 0.8 * task.hand_translation_range


class TestUnderBoxClearancePenalty:
    """Round-3 shaping term: tips under the box footprint near the ground
    (weight 0 by default — the term itself must still be exact)."""

    def test_scooping_tip_pays_margin_minus_height(self, task):
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        pads = np.tile([0.5, 0.5, 0.5], (N, 5, 1))   # all tips far away
        pads[:, 2] = [0.11, 0.01, 0.002]             # one tip under the box
        step = run_step(task, make_obs(pads), task.init_task_states(N),
                        make_physics(box_pos))
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["under_box_penalty"]),
            task.under_box_margin - 0.002, atol=1e-6,
        )

    def test_zero_outside_footprint_or_above_margin(self, task):
        box_pos = np.tile([0.1, 0.0, 0.025], (N, 1))
        ts = task.init_task_states(N)
        # low tip but outside the XY footprint (half*1.4 = 0.035)
        pads = np.tile([0.5, 0.5, 0.5], (N, 5, 1))
        pads[:, 2] = [0.15, 0.0, 0.002]
        step = run_step(task, make_obs(pads), ts, make_physics(box_pos))
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["under_box_penalty"]), 0.0)
        # in footprint but above the clearance margin
        pads[:, 2] = [0.1, 0.0, 0.03]
        step = run_step(task, make_obs(pads), ts, make_physics(box_pos))
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["under_box_penalty"]), 0.0)

    def test_zero_once_box_lifted(self, task):
        box_pos = np.tile([0.1, 0.0, 0.25], (N, 1))  # above box_near_ground_z
        pads = np.tile([0.5, 0.5, 0.5], (N, 5, 1))
        pads[:, 2] = [0.1, 0.0, 0.002]
        step = run_step(task, make_obs(pads), task.init_task_states(N),
                        make_physics(box_pos))
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["under_box_penalty"]), 0.0)


class TestSpawnProjection:
    """Round-5 spawn-validity projection: XLA (task.reset_task) and the
    fused kernel's lane projection must produce IDENTICAL reset rows, and
    no projected spawn may start below the clearance."""

    def test_fused_lane_projection_matches_xla(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dexrobot_isaac_tpu.factory import make_env
        from dexrobot_isaac_tpu.physics.pallas_step import build_lane_sim
        from dexrobot_isaac_tpu.utils.config import load_config

        cfg = load_config([
            "task=BlindGrasping", "numEnvs=64", "device=cpu",
            "env.initialHandPos=[0.0, 0.0, 0.25]",  # the doomed-spawn regime
        ])
        env = make_env(cfg, seed=0)
        task = env.comps.task
        assert task.spawn_projection and task._min_tip_z_fn is not None
        key = jax.random.key(5)
        rv_proj = task.reset_task(key, 64, env._default_dof, difficulty=1.0)
        rv_raw = task.reset_task(
            key, 64, env._default_dof, difficulty=1.0, project=False
        )
        # the raw regime really contains doomed spawns at this height
        sim = build_lane_sim(
            env.comps.engine, env.comps.physics_steps_per_control
        )
        tips = np.asarray(env.comps.obs_cfg.fingertip_site_indices)
        spawn = tuple(float(x) for x in env.comps.spawn_pos)
        lanes = lambda d: tuple(d[:, i] for i in range(d.shape[1]))
        zero = jnp.zeros((64,), jnp.float32)
        mz_raw = np.asarray(
            sim.min_site_z(lanes(rv_raw.dof_pos), spawn, zero, tips)
        )
        assert (mz_raw < 0.0).any(), "fixture regime should have doomed draws"
        # kernel-identical lane projection of the raw rows == task-projected
        lift = jnp.maximum(0.0, task.spawn_projection_clearance - mz_raw)
        dof_lane = rv_raw.dof_pos.at[:, 2].add(lift)
        np.testing.assert_array_equal(
            np.asarray(dof_lane), np.asarray(rv_proj.dof_pos)
        )
        # and every projected spawn clears the ground
        mz_proj = np.asarray(
            sim.min_site_z(lanes(rv_proj.dof_pos), spawn, zero, tips)
        )
        assert (mz_proj >= task.spawn_projection_clearance - 1e-6).all()
