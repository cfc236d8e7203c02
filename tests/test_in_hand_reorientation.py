"""InHandReorientation task-logic unit tests (task built through the plugin
API only; envs/tasks/in_hand_reorientation.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.envs.tasks.in_hand_reorientation import (
    InHandReorientationTask,
)
from dexrobot_isaac_tpu.physics.types import PhysicsState

N = 4
DT = 0.04


@pytest.fixture(scope="module")
def task():
    return InHandReorientationTask({})


def make_physics(box_pos, box_quat=None):
    z = jnp.zeros
    return PhysicsState(
        q=z((N, 26)), qd=z((N, 26)),
        box_pos=jnp.asarray(box_pos, dtype=jnp.float32),
        box_quat=(jnp.asarray(box_quat, dtype=jnp.float32)
                  if box_quat is not None
                  else z((N, 4)).at[:, 3].set(1.0)),
        box_linvel=z((N, 3)), box_angvel=z((N, 3)),
    )


def make_obs(hand_pos=None, contact_binary=None, pad_positions=None):
    pads = np.zeros((N, 5, 7), np.float32)
    if pad_positions is not None:
        pads[:, :, :3] = pad_positions
    pads[:, :, 6] = 1.0
    return {
        "fingerpad_poses_world": jnp.asarray(pads.reshape(N, 35)),
        "contact_binary": (
            jnp.asarray(contact_binary, dtype=jnp.float32)
            if contact_binary is not None else jnp.zeros((N, 5))
        ),
        "hand_pose": jnp.concatenate([
            jnp.asarray(hand_pos, dtype=jnp.float32)
            if hand_pos is not None else jnp.zeros((N, 3)),
            jnp.zeros((N, 3)), jnp.ones((N, 1)),
        ], axis=1),
    }


def run_step(task, obs, ts, phys):
    return task.compute_step(
        obs, ts, phys, None,
        jnp.zeros((N, 26, 3)), jnp.full((N, 3), 1.0), DT,
    )


class TestBuildGeometry:
    def test_pinch_solve_places_box_between_tips(self, task):
        # box center below/for of the hand base, at pinch height
        off = task._box_center0 - task.hand_spawn
        assert off[2] < 0, "pinch point must be below the hand base"
        assert np.linalg.norm(off) < 0.2
        # quat is unit
        np.testing.assert_allclose(np.linalg.norm(task._box_quat0), 1.0,
                                   atol=1e-5)
        # grip flexes index+middle, thumb opposed
        from dexrobot_isaac_tpu.constants import DOF_INDEX
        q = task._grip_q
        assert q[DOF_INDEX["r_f_joint1_1"]] == pytest.approx(math.pi / 3)
        assert q[DOF_INDEX["r_f_joint2_2"]] > 0.5

    def test_reset_uses_pinch_pose(self, task):
        r = task.reset_task(jax.random.key(0), N,
                            jnp.zeros(26, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(r.dof_pos),
                                   np.tile(task._grip_q, (N, 1)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r.box_pos),
                                   np.tile(task._box_center0, (N, 1)),
                                   atol=1e-6)
        # targets require a real rotation
        err0 = np.asarray(r.task_states["prev_yaw_error"])
        assert np.all(np.abs(err0) >= task.min_initial_error - 1e-5)
        assert np.all(np.abs(err0) <= task._period / 2 + 1e-5)


class TestCriteria:
    def test_drop_and_escape_failures(self, task):
        ts = task.init_task_states(N)
        z_hang = task._hang_z
        pos = np.tile([0.0, 0.0, z_hang], (N, 1)).astype(np.float32)
        pos[1, 2] = z_hang - task.drop_band - 0.01       # dropped
        pos[2, 0] = task.escape_distance + 0.05          # escaped (hand at 0)
        step = run_step(task, make_obs(), ts, make_physics(pos))
        dropped = np.asarray(step.failure_criteria["box_dropped"])
        escaped = np.asarray(step.failure_criteria["box_escaped"])
        assert dropped.tolist() == [False, True, False, False]
        assert escaped.tolist() == [False, False, True, False]

    def test_success_requires_sustained_alignment(self, task):
        ts = task.init_task_states(N)
        ts["target_yaw"] = jnp.zeros(N)  # box yaw 0 == target -> aligned
        pos = np.tile([0.0, 0.0, task._hang_z], (N, 1)).astype(np.float32)
        threshold = int(round(task.align_duration_threshold / DT))
        for i in range(threshold):
            step = run_step(task, make_obs(), ts, make_physics(pos))
            ts = step.task_states
        assert np.asarray(step.success_criteria["reorient_success"]).all()
        # misaligned env never succeeds
        ts2 = task.init_task_states(N)
        ts2["target_yaw"] = jnp.full(N, 0.6)
        for i in range(threshold):
            step = run_step(task, make_obs(), ts2, make_physics(pos))
            ts2 = step.task_states
        assert not np.asarray(step.success_criteria["reorient_success"]).any()


class TestRewards:
    def test_orientation_tracking_and_delta(self, task):
        ts = task.init_task_states(N)
        ts["target_yaw"] = jnp.asarray([0.0, 0.3, 0.0, 0.0])
        ts["prev_yaw_error"] = jnp.asarray([0.0, -0.4, 0.0, 0.0])
        pos = np.tile([0.0, 0.0, task._hang_z], (N, 1)).astype(np.float32)
        step = run_step(task, make_obs(), ts, make_physics(pos))
        r = step.reward_terms
        # env0 perfectly aligned -> tracking = 1
        np.testing.assert_allclose(float(r["orientation_tracking"][0]), 1.0,
                                   atol=1e-5)
        # env1: |prev err| 0.4 -> |err| 0.3: delta = +0.1
        np.testing.assert_allclose(float(r["orientation_delta"][1]), 0.1,
                                   atol=1e-5)

    def test_grasp_maintenance_needs_thumb_plus_other(self, task):
        ts = task.init_task_states(N)
        pos = np.tile([0.0, 0.0, task._hang_z], (N, 1)).astype(np.float32)
        pads = np.tile(pos[:, None, :], (1, 5, 1))  # pads at box center
        cb = np.zeros((N, 5), np.float32)
        cb[0, 0] = cb[0, 1] = 1.0   # thumb + index
        cb[1, 1] = cb[1, 2] = 1.0   # two fingers, no thumb
        step = run_step(task, make_obs(contact_binary=cb, pad_positions=pads),
                        ts, make_physics(pos))
        g = np.asarray(step.reward_terms["grasp_maintenance"])
        assert g.tolist() == [1.0, 0.0, 0.0, 0.0]


class TestYawSymmetry:
    def test_cube_symmetric_error(self, task):
        yaw = jnp.asarray([0.0, math.pi / 2, math.pi, 0.1])
        tgt = jnp.zeros(4)
        err = np.asarray(task._yaw_error(yaw, tgt))
        np.testing.assert_allclose(err, [0.0, 0.0, 0.0, 0.1], atol=1e-6)
