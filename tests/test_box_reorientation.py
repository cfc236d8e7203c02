"""BoxReorientation task-logic unit tests against hand-computed values.

Drives `compute_step` directly with synthetic observations/states (no physics
in the loop): yaw-symmetry error math, alignment tracking, criteria, reward
signs, and reset randomization. Env-level integration is covered in
test_env.py-style smoke via the shape-only eval_shape construction.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.envs.tasks.box_reorientation import (
    BoxReorientationTask,
    _box_yaw,
)
from dexrobot_isaac_tpu.physics.types import PhysicsState

N = 4
DT = 0.04


@pytest.fixture(scope="module")
def task():
    return BoxReorientationTask({
        "box": {"size": 0.05, "initial_position": {"xy_range": 0.02, "z": 0.027}},
        "contact_binary_threshold": 0.1,
    })


def yaw_quat(yaw):
    """(N,) yaw -> (N, 4) xyzw quat about Z."""
    yaw = jnp.asarray(yaw, jnp.float32)
    z = jnp.zeros_like(yaw)
    return jnp.stack([z, z, jnp.sin(yaw / 2), jnp.cos(yaw / 2)], axis=-1)


def make_physics(box_pos=None, yaw=None, box_vel=None, angvel=None):
    z = jnp.zeros
    return PhysicsState(
        q=z((N, 26)), qd=z((N, 26)),
        box_pos=jnp.asarray(box_pos) if box_pos is not None else z((N, 3)),
        box_quat=yaw_quat(yaw) if yaw is not None else z((N, 4)).at[:, 3].set(1.0),
        box_linvel=jnp.asarray(box_vel) if box_vel is not None else z((N, 3)),
        box_angvel=jnp.asarray(angvel) if angvel is not None else z((N, 3)),
    )


def make_obs(pad_positions=None, contact_binary=None):
    pads = np.zeros((N, 5, 7), np.float32)
    if pad_positions is not None:
        pads[:, :, :3] = pad_positions
    pads[:, :, 6] = 1.0
    return {
        "fingerpad_poses_world": jnp.asarray(pads.reshape(N, 35)),
        "contact_binary": (
            jnp.asarray(contact_binary) if contact_binary is not None
            else jnp.zeros((N, 5))
        ),
    }


def run_step(task, obs, ts, physics, box_cf=None):
    return task.compute_step(
        obs, ts, physics, None, jnp.zeros((N, 26, 3)),
        box_cf if box_cf is not None else jnp.zeros((N, 3)), DT,
    )


class TestYawMath:
    def test_box_yaw_roundtrip(self):
        yaws = jnp.asarray([0.0, 0.5, -2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(_box_yaw(yaw_quat(yaws))), np.asarray(yaws), atol=1e-5
        )

    def test_symmetric_error_wraps_to_quarter_turn(self, task):
        # cube symmetry 4: period pi/2, so 100 deg error == 10 deg error
        err = task._yaw_error(
            jnp.asarray([math.radians(100.0)]), jnp.asarray([0.0])
        )
        np.testing.assert_allclose(
            np.asarray(err), [math.radians(10.0)], atol=1e-6
        )

    def test_error_sign_shortest_path(self, task):
        # -80 deg wraps to +10 deg under 90-deg symmetry
        err = task._yaw_error(
            jnp.asarray([math.radians(-80.0)]), jnp.asarray([0.0])
        )
        np.testing.assert_allclose(
            np.asarray(err), [math.radians(10.0)], atol=1e-6
        )


class TestAlignmentAndCriteria:
    def test_aligned_duration_counts_and_success_fires(self, task):
        ts = task.init_task_states(N)
        phys = make_physics(
            box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)), yaw=jnp.zeros(N)
        )
        obs = make_obs()
        threshold_steps = int(round(task.align_duration_threshold / DT))
        for i in range(threshold_steps):
            step = run_step(task, obs, ts, phys)
            ts = step.task_states
            assert int(ts["aligned_duration_steps"][0]) == i + 1
        assert bool(step.success_criteria["reorient_success"][0])

    def test_misaligned_resets_counter(self, task):
        ts = task.init_task_states(N)
        ts["aligned_duration_steps"] = jnp.full((N,), 10, jnp.int32)
        phys = make_physics(yaw=jnp.full((N,), 0.5))  # err 0.5 > tol 0.15
        step = run_step(task, make_obs(), ts, phys)
        assert int(step.task_states["aligned_duration_steps"][0]) == 0

    def test_pushed_away_and_lifted_failures(self, task):
        ts = task.init_task_states(N)
        pos = np.tile([0.0, 0.0, 0.027], (N, 1)).astype(np.float32)
        pos[0, 0] = 0.2    # beyond max_drift 0.15
        pos[1, 2] = 0.12   # above lift tolerance
        step = run_step(task, make_obs(), ts, make_physics(box_pos=pos))
        fails = step.failure_criteria
        assert bool(fails["box_pushed_away"][0])
        assert not bool(fails["box_pushed_away"][1])
        assert bool(fails["box_lifted"][1])
        assert not bool(fails["box_lifted"][0])


class TestRewards:
    def test_orientation_tracking_peaks_at_zero_error(self, task):
        ts = task.init_task_states(N)
        aligned = run_step(task, make_obs(), ts, make_physics(yaw=jnp.zeros(N)))
        off = run_step(task, make_obs(), ts, make_physics(yaw=jnp.full((N,), 0.7)))
        assert float(aligned.reward_terms["orientation_tracking"][0]) > float(
            off.reward_terms["orientation_tracking"][0]
        )
        np.testing.assert_allclose(
            float(aligned.reward_terms["orientation_tracking"][0]), 1.0,
            atol=1e-5,
        )

    def test_orientation_delta_rewards_progress(self, task):
        ts = task.init_task_states(N)
        ts["prev_yaw_error"] = jnp.full((N,), 0.6)
        step = run_step(task, make_obs(), ts, make_physics(yaw=jnp.full((N,), 0.2)))
        # improvement |0.6| - |0.2| = 0.4
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["orientation_delta"]), 0.4, atol=1e-5
        )
        # and the new baseline is stored for the next step
        np.testing.assert_allclose(
            np.asarray(step.task_states["prev_yaw_error"]), 0.2, atol=1e-5
        )

    def test_finger_contact_requires_force_and_proximity(self, task):
        ts = task.init_task_states(N)
        pads = np.tile([0.0, 0.0, 0.03], (N, 5, 1)).astype(np.float32)
        obs = make_obs(pad_positions=pads, contact_binary=np.ones((N, 5)))
        phys = make_physics(box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)))
        with_force = run_step(
            task, obs, ts, phys, box_cf=jnp.full((N, 3), 1.0)
        )
        without_force = run_step(task, obs, ts, phys)
        assert float(with_force.reward_terms["finger_contact"][0]) == 1.0
        assert float(without_force.reward_terms["finger_contact"][0]) == 0.0


class TestReset:
    def test_reset_distributions(self, task):
        n = 512
        reset = task.reset_task(
            jax.random.key(0), n, jnp.zeros(26, jnp.float32)
        )
        ts = reset.task_states
        yaw0 = np.asarray(_box_yaw(reset.box_quat))
        tgt = np.asarray(ts["target_yaw"])
        err0 = np.abs(np.asarray(ts["prev_yaw_error"]))
        period = 2 * math.pi / task.yaw_symmetry
        # every episode starts with a real rotation to do, within symmetry
        assert (err0 <= period / 2 + 1e-5).all()
        # offsets are sampled in [min_initial_error, period/2]; after symmetry
        # wrapping the error magnitude stays >= min down to the wrap boundary
        raw = np.abs(tgt - yaw0)
        assert (raw >= task.min_initial_error - 1e-5).all()
        # box stays near origin at rest height
        box = np.asarray(reset.box_pos)
        assert (np.abs(box[:, :2]) <= task.box_xy_range + 1e-6).all()
        np.testing.assert_allclose(box[:, 2], task.box_z, atol=1e-6)
        assert np.asarray(ts["aligned_duration_steps"]).sum() == 0


class TestEnvIntegration:
    def test_env_builds_with_task(self):
        from dexrobot_isaac_tpu.factory import make_env
        from dexrobot_isaac_tpu.utils.config import load_config

        cfg = load_config(["task=BoxReorientation", "numEnvs=2"])
        env = make_env(cfg)
        # policy obs width is discovered via eval_shape (no physics compile)
        assert env.num_obs > 0
        assert env.num_actions == 18
        for key in ("yaw_error", "target_yaw_sincos", "fingers_on_box"):
            assert key in env.obs_slices
