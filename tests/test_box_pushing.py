"""BoxPushing task-logic unit tests against hand-computed values.

Drives `compute_step` directly with synthetic observations/states (no physics
in the loop): target-distance math, hold tracking, criteria, reward signs,
curriculum scaling, and reset randomization. Env-level integration is covered
by the eval_shape-only env construction at the bottom.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.envs.tasks.box_pushing import BoxPushingTask
from dexrobot_isaac_tpu.physics.types import PhysicsState

N = 4
DT = 0.04


@pytest.fixture(scope="module")
def task():
    return BoxPushingTask({
        "box": {"size": 0.05, "initial_position": {"xy_range": 0.02, "z": 0.027}},
        "contact_binary_threshold": 0.1,
    })


def make_physics(box_pos=None, box_vel=None):
    z = jnp.zeros
    return PhysicsState(
        q=z((N, 26)), qd=z((N, 26)),
        box_pos=jnp.asarray(box_pos, jnp.float32) if box_pos is not None
        else z((N, 3)),
        box_quat=z((N, 4)).at[:, 3].set(1.0),
        box_linvel=jnp.asarray(box_vel, jnp.float32) if box_vel is not None
        else z((N, 3)),
        box_angvel=z((N, 3)),
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


class TestHoldAndCriteria:
    def test_hold_counts_and_success_fires(self, task):
        ts = task.init_task_states(N)
        ts["target_xy"] = jnp.zeros((N, 2))
        ts["initial_dist"] = jnp.full((N,), 0.1)
        # box exactly at target, at rest
        phys = make_physics(box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)))
        obs = make_obs()
        threshold_steps = int(round(task.hold_duration_threshold / DT))
        for i in range(threshold_steps):
            step = run_step(task, obs, ts, phys)
            ts = step.task_states
            assert int(ts["hold_duration_steps"][0]) == i + 1
        assert bool(step.success_criteria["push_success"][0])

    def test_moving_box_does_not_hold(self, task):
        # at target position but still moving faster than rest tolerance
        ts = task.init_task_states(N)
        ts["target_xy"] = jnp.zeros((N, 2))
        ts["hold_duration_steps"] = jnp.full((N,), 5, jnp.int32)
        phys = make_physics(
            box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)),
            box_vel=np.tile([0.3, 0.0, 0.0], (N, 1)),
        )
        step = run_step(task, make_obs(), ts, phys)
        assert int(step.task_states["hold_duration_steps"][0]) == 0

    def test_lost_and_lifted_failures(self, task):
        ts = task.init_task_states(N)
        ts["target_xy"] = jnp.zeros((N, 2))
        ts["initial_dist"] = jnp.full((N,), 0.08)
        pos = np.tile([0.0, 0.0, 0.027], (N, 1)).astype(np.float32)
        pos[0, 0] = 0.25   # dist 0.25 > initial 0.08 + overshoot 0.1
        pos[1, 2] = 0.12   # above lift tolerance
        step = run_step(task, make_obs(), ts, make_physics(box_pos=pos))
        fails = step.failure_criteria
        assert bool(fails["box_lost"][0])
        assert not bool(fails["box_lost"][1])
        assert bool(fails["box_lifted"][1])
        assert not bool(fails["box_lifted"][0])


class TestRewards:
    def test_distance_tracking_peaks_at_target(self, task):
        ts = task.init_task_states(N)
        ts["target_xy"] = jnp.zeros((N, 2))
        at = run_step(
            task, make_obs(), ts,
            make_physics(box_pos=np.tile([0.0, 0.0, 0.027], (N, 1))),
        )
        away = run_step(
            task, make_obs(), ts,
            make_physics(box_pos=np.tile([0.1, 0.0, 0.027], (N, 1))),
        )
        np.testing.assert_allclose(
            float(at.reward_terms["distance_tracking"][0]), 1.0, atol=1e-5
        )
        assert float(away.reward_terms["distance_tracking"][0]) < 1.0

    def test_distance_delta_rewards_progress(self, task):
        ts = task.init_task_states(N)
        ts["target_xy"] = jnp.zeros((N, 2))
        ts["prev_dist"] = jnp.full((N,), 0.1)
        step = run_step(
            task, make_obs(), ts,
            make_physics(box_pos=np.tile([0.06, 0.0, 0.027], (N, 1))),
        )
        # improvement 0.1 - 0.06 = 0.04, and the new baseline is stored
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["distance_delta"]), 0.04, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(step.task_states["prev_dist"]), 0.06, atol=1e-5
        )

    def test_finger_contact_requires_force_and_proximity(self, task):
        ts = task.init_task_states(N)
        ts["target_xy"] = jnp.zeros((N, 2))
        pads = np.tile([0.0, 0.0, 0.03], (N, 5, 1)).astype(np.float32)
        obs = make_obs(pad_positions=pads, contact_binary=np.ones((N, 5)))
        phys = make_physics(box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)))
        with_force = run_step(task, obs, ts, phys, box_cf=jnp.full((N, 3), 1.0))
        without_force = run_step(task, obs, ts, phys)
        assert float(with_force.reward_terms["finger_contact"][0]) == 1.0
        assert float(without_force.reward_terms["finger_contact"][0]) == 0.0


class TestReset:
    def test_reset_distributions(self, task):
        n = 512
        reset = task.reset_task(jax.random.key(0), n, jnp.zeros(26, jnp.float32))
        ts = reset.task_states
        box = np.asarray(reset.box_pos)
        tgt = np.asarray(ts["target_xy"])
        dist0 = np.linalg.norm(tgt - box[:, :2], axis=-1)
        # target distance sampled within [min, max]
        assert (dist0 >= task.target_dist_min - 1e-5).all()
        assert (dist0 <= task.target_dist_max + 1e-5).all()
        # directions cover the plane (all four quadrants hit at n=512)
        d = tgt - box[:, :2]
        assert ((d[:, 0] > 0) & (d[:, 1] > 0)).any()
        assert ((d[:, 0] < 0) & (d[:, 1] < 0)).any()
        # delta baseline starts at the true initial distance
        np.testing.assert_allclose(np.asarray(ts["prev_dist"]), dist0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ts["initial_dist"]), dist0, atol=1e-5
        )
        # box near origin at rest height, hold counter cleared
        assert (np.abs(box[:, :2]) <= task.box_xy_range + 1e-6).all()
        np.testing.assert_allclose(box[:, 2], task.box_z, atol=1e-6)
        assert np.asarray(ts["hold_duration_steps"]).sum() == 0

    def test_curriculum_scales_target_distance(self):
        t = BoxPushingTask({
            "curriculum": {"enabled": True, "min_fraction": 0.4},
        })
        n = 256
        easy = t.reset_task(
            jax.random.key(1), n, jnp.zeros(26, jnp.float32),
            difficulty=jnp.float32(0.0),
        )
        hard = t.reset_task(
            jax.random.key(1), n, jnp.zeros(26, jnp.float32),
            difficulty=jnp.float32(1.0),
        )
        d_easy = np.linalg.norm(
            np.asarray(easy.task_states["target_xy"])
            - np.asarray(easy.box_pos)[:, :2], axis=-1,
        )
        d_hard = np.linalg.norm(
            np.asarray(hard.task_states["target_xy"])
            - np.asarray(hard.box_pos)[:, :2], axis=-1,
        )
        # same key: easy distances are exactly min_fraction of hard ones
        np.testing.assert_allclose(d_easy, 0.4 * d_hard, atol=1e-6)


class TestEnvIntegration:
    def test_env_builds_with_task(self):
        from dexrobot_isaac_tpu.factory import make_env
        from dexrobot_isaac_tpu.utils.config import load_config

        cfg = load_config(["task=BoxPushing", "numEnvs=2"])
        env = make_env(cfg)
        assert env.num_obs > 0
        assert env.num_actions == 18
        for key in ("to_target", "dist_to_target", "fingers_on_box"):
            assert key in env.obs_slices
