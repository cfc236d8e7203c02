"""BoxStacking task-logic unit tests against hand-computed values.

Drives `compute_step` directly with synthetic observations/states (no physics
in the loop): stack-point math, hold tracking, criteria, reward gating,
curriculum scaling, and reset randomization. A real 2-env step through the
multi-body engine runs at the bottom (the physics itself is covered by
tests/test_physics_multibody.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.envs.tasks.box_stacking import BoxStackingTask
from dexrobot_isaac_tpu.physics.types import PhysicsState

N = 4
DT = 0.04
S1, S2 = 0.05, 0.08
STACK_Z = S2 + S1 / 2  # 0.105


@pytest.fixture(scope="module")
def task():
    return BoxStackingTask({
        "box": {"size": S1, "initial_position": {"xy_range": 0.02, "z": 0.027}},
        "platform": {"size": S2, "mass": 0.5},
        "contact_binary_threshold": 0.1,
    })


def make_physics(box_pos=None, box_vel=None, plat_pos=None):
    z = jnp.zeros
    plat_default = np.tile([0.2, 0.0, S2 / 2], (N, 1)).astype(np.float32)
    return PhysicsState(
        q=z((N, 26)), qd=z((N, 26)),
        box_pos=jnp.asarray(box_pos, jnp.float32) if box_pos is not None
        else z((N, 3)),
        box_quat=z((N, 4)).at[:, 3].set(1.0),
        box_linvel=jnp.asarray(box_vel, jnp.float32) if box_vel is not None
        else z((N, 3)),
        box_angvel=z((N, 3)),
        box2_pos=jnp.asarray(
            plat_pos if plat_pos is not None else plat_default, jnp.float32
        ),
        box2_quat=z((N, 4)).at[:, 3].set(1.0),
        box2_linvel=z((N, 3)),
        box2_angvel=z((N, 3)),
    )


def make_obs(pad_positions=None, contact_binary=None, tip_positions=None,
             hand_pos=None):
    pads = np.zeros((N, 5, 7), np.float32)
    if pad_positions is not None:
        pads[:, :, :3] = pad_positions
    pads[:, :, 6] = 1.0
    tips = np.full((N, 5, 7), 0.5, np.float32)   # tips far away by default
    if tip_positions is not None:
        tips[:, :, :3] = tip_positions
    tips[:, :, 6] = 1.0
    return {
        "fingerpad_poses_world": jnp.asarray(pads.reshape(N, 35)),
        "fingertip_poses_world": jnp.asarray(tips.reshape(N, 35)),
        "hand_pose": jnp.concatenate([
            jnp.asarray(hand_pos, jnp.float32) if hand_pos is not None
            else jnp.full((N, 3), 0.3, jnp.float32),
            jnp.zeros((N, 3)), jnp.ones((N, 1)),
        ], axis=1),
        "contact_binary": (
            jnp.asarray(contact_binary) if contact_binary is not None
            else jnp.zeros((N, 5))
        ),
    }


def run_step(task, obs, ts, physics, box_cf=None):
    return task.compute_step(
        obs, ts, physics, None, jnp.zeros((N, 26, 3)),
        box_cf if box_cf is not None else jnp.zeros((N, 3)), DT,
        box2_contact_force=jnp.zeros((N, 3)),
    )


def stacked_physics():
    """Pick cube perfectly stacked on the platform at [0.2, 0]."""
    return make_physics(
        box_pos=np.tile([0.2, 0.0, STACK_Z], (N, 1))
    )


class TestStackDetectionAndCriteria:
    def test_hold_counts_and_success_fires(self, task):
        ts = task.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(
            jnp.asarray([0.2, 0.0]), (N, 1)
        )
        phys = stacked_physics()
        obs = make_obs()
        threshold_steps = int(round(task.hold_duration_threshold / DT))
        for i in range(threshold_steps):
            step = run_step(task, obs, ts, phys)
            ts = step.task_states
            assert int(ts["hold_duration_steps"][0]) == i + 1
        assert bool(step.success_criteria["stack_success"][0])

    def test_offset_or_moving_does_not_hold(self, task):
        ts = task.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        obs = make_obs()
        # off-center beyond tolerance
        off = make_physics(box_pos=np.tile([0.2 + 0.04, 0.0, STACK_Z], (N, 1)))
        step = run_step(task, obs, ts, off)
        assert int(step.task_states["hold_duration_steps"][0]) == 0
        # centered but still moving
        moving = make_physics(
            box_pos=np.tile([0.2, 0.0, STACK_Z], (N, 1)),
            box_vel=np.tile([0.3, 0.0, 0.0], (N, 1)),
        )
        step = run_step(task, obs, ts, moving)
        assert int(step.task_states["hold_duration_steps"][0]) == 0
        # on the GROUND next to the platform (right xy, wrong height)
        grounded = make_physics(box_pos=np.tile([0.2, 0.0, S1 / 2], (N, 1)))
        step = run_step(task, obs, ts, grounded)
        assert int(step.task_states["hold_duration_steps"][0]) == 0

    def test_failures(self, task):
        ts = task.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        obs = make_obs()
        far = make_physics(box_pos=np.tile([0.5, 0.0, 0.025], (N, 1)))
        step = run_step(task, obs, ts, far)
        assert bool(step.failure_criteria["box_too_far"][0])
        # platform knocked away from its spawn
        plat_moved = make_physics(
            box_pos=np.tile([0.0, 0.0, 0.025], (N, 1)),
            plat_pos=np.tile([0.3, 0.0, S2 / 2], (N, 1)),
        )
        step = run_step(task, obs, ts, plat_moved)
        assert bool(step.failure_criteria["platform_moved"][0])


class TestRewards:
    def test_transport_gated_on_holding(self, task):
        ts = task.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        # cube held mid-air between spawn and platform
        pos = np.tile([0.1, 0.0, 0.12], (N, 1))
        phys = make_physics(box_pos=pos)
        # not held: no contact -> transport = 0
        step = run_step(task, make_obs(), ts, phys)
        assert float(step.reward_terms["transport"][0]) == 0.0
        assert float(step.reward_terms["lift"][0]) == 0.0
        # held: 3 fingers in contact at the cube + box contact force
        pads = np.tile([0.1, 0.0, 0.12], (N, 5, 1))
        contact = np.zeros((N, 5), np.float32)
        contact[:, :3] = 1.0
        obs = make_obs(pad_positions=pads, contact_binary=contact)
        cf = jnp.ones((N, 3))
        step = run_step(task, obs, ts, phys, box_cf=cf)
        assert float(step.reward_terms["lift"][0]) == 1.0
        assert float(step.reward_terms["transport"][0]) > 0.0

    def test_place_peaks_at_stack_pose(self, task):
        ts = task.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        obs = make_obs()
        at = run_step(task, obs, ts, stacked_physics())
        near = run_step(
            task, obs, ts,
            make_physics(box_pos=np.tile([0.2, 0.03, STACK_Z], (N, 1))),
        )
        assert float(at.reward_terms["place"][0]) == pytest.approx(1.0)
        assert float(near.reward_terms["place"][0]) < 1.0

    def test_transport_delta_rewards_progress(self, task):
        ts = task.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        ts["prev_transport_dist"] = jnp.full((N,), 0.2)
        obs = make_obs()
        # now 0.105 above ground at the platform: closer than 0.2 before
        step = run_step(task, obs, ts, stacked_physics())
        assert float(step.reward_terms["transport_delta"][0]) > 0.0


class TestReset:
    def test_reset_distributions(self, task):
        r = task.reset_task(jax.random.key(0), 512, jnp.zeros(26))
        plat = np.asarray(r.box2_pos)
        d = np.linalg.norm(plat[:, :2], axis=-1)
        assert d.min() >= task.plat_dist_min - 1e-6
        assert d.max() <= task.plat_dist_max + 1e-6
        np.testing.assert_allclose(plat[:, 2], S2 / 2, atol=1e-6)
        # pick cube near origin at rest height
        box = np.asarray(r.box_pos)
        assert np.abs(box[:, :2]).max() <= task.box_xy_range + 1e-6
        # prev_transport_dist starts at the true initial distance
        stack_pt = plat.copy()
        stack_pt[:, 2] = S2 + S1 / 2
        expect = np.linalg.norm(stack_pt - box, axis=-1)
        np.testing.assert_allclose(
            np.asarray(r.task_states["prev_transport_dist"]), expect,
            rtol=1e-5,
        )

    def test_reverse_spawns_off_by_default_and_caged_when_enabled(self):
        """Reverse spawns default OFF (round 3: the hovering variant made
        reverse episodes do-nothing successes and collapsed the policy to
        freebie-farming avoidance — BASELINE.md BoxStacking). When enabled
        via curriculum.reverse_spawn_fraction, spawns use the caged
        posture: hand base at the platform (tip-cluster FK offset 0.177),
        fingers pre-curled around the cube on the platform top."""
        t_off = BoxStackingTask({
            "box": {"size": S1}, "platform": {"size": S2},
            "curriculum": {"enabled": True},
        })
        assert t_off.reverse_spawn_fraction == 0.0
        r0 = t_off.reset_task(
            jax.random.key(5), 256, jnp.zeros(26),
            difficulty=jnp.asarray(0.0),
        )
        assert (np.asarray(r0.box_pos)[:, 2] < 0.09).all()  # no rev spawns

        t = BoxStackingTask({
            "box": {"size": S1}, "platform": {"size": S2},
            "curriculum": {"enabled": True, "reverse_spawn_fraction": 0.25},
        })
        r = t.reset_task(
            jax.random.key(5), 256, jnp.zeros(26),
            difficulty=jnp.asarray(0.0),
        )
        box = np.asarray(r.box_pos)
        dof = np.asarray(r.dof_pos)
        plat = np.asarray(r.box2_pos)
        rev = box[:, 2] > 0.09  # cube spawned on the platform top
        assert 0.12 < rev.mean() < 0.40  # ~fraction*(1-d) at d=0
        np.testing.assert_allclose(
            dof[rev, 0], plat[rev, 0] - 0.177, atol=0.006
        )
        np.testing.assert_allclose(
            dof[rev, 2], (S2 + S1 / 2) - 0.19, atol=1e-5
        )
        assert (dof[rev, 6:26] > 0.25).all()
        # cube centered on the platform, upright
        np.testing.assert_allclose(box[rev, :2], plat[rev, :2], atol=0.006)
        # at difficulty 1.0 (eval) no reverse spawns regardless
        r1 = t.reset_task(
            jax.random.key(5), 256, jnp.zeros(26),
            difficulty=jnp.asarray(1.0),
        )
        assert (np.asarray(r1.box_pos)[:, 2] < 0.09).all()

    def test_curriculum_scales_platform_distance(self):
        t = BoxStackingTask({
            "box": {"size": S1}, "platform": {"size": S2},
            "curriculum": {"enabled": True, "min_fraction": 0.4},
        })
        easy = t.reset_task(
            jax.random.key(1), 512, jnp.zeros(26),
            difficulty=jnp.asarray(0.0),
        )
        hard = t.reset_task(
            jax.random.key(1), 512, jnp.zeros(26),
            difficulty=jnp.asarray(1.0),
        )
        d_easy = np.linalg.norm(np.asarray(easy.box2_pos)[:, :2], axis=-1)
        d_hard = np.linalg.norm(np.asarray(hard.box2_pos)[:, :2], axis=-1)
        # min distance is not scaled away; the random spread is
        assert d_easy.max() < d_hard.max()
        assert d_easy.min() >= t.plat_dist_min - 1e-6


class TestEnvIntegration:
    def test_env_builds_and_steps(self):
        from dexrobot_isaac_tpu.factory import make_env
        from dexrobot_isaac_tpu.utils.config import load_config

        cfg = load_config(["task=BoxStacking", "numEnvs=2"])
        env = make_env(cfg)
        assert env.num_actions == 18
        for key in ("platform_pos", "to_stack_target", "fingers_on_box"):
            assert key in env.obs_slices
        # multi-object fused support (round 3): the env-step kernel builds
        # for has_box2 scenes — layout carries the platform's 13 state
        # lanes (parity: tests/test_fused_step.py::test_box_stacking)
        fused = env.make_fused(interpret=True)
        assert fused.layout.has_box2
        for nm in ("box2_pos", "box2_quat", "box2_linvel", "box2_angvel"):
            assert nm in fused.layout.offs_f
        obs = env.reset()
        assert np.isfinite(np.asarray(obs)).all()
        for _ in range(3):
            obs, rew, done, extras = env.step(
                jnp.zeros((2, env.num_actions))
            )
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(np.asarray(rew)).all()
        # both free bodies are live in the state
        assert env.state.physics.box2_pos is not None
        assert np.isfinite(np.asarray(env.state.physics.box2_pos)).all()
        # strict-spawn extras (round-4 eval-matched gating): the task
        # reports spawn_difficulty, so both step paths emit the flags
        assert "success_strict" in extras and "done_strict" in extras
        assert extras["success_strict"].shape == (2,)


class TestBridgeAnneal:
    """Round-3 at-pose bridge: tolerances/hold/contact-allowance share one
    anneal scalar driven by spawn_difficulty (strict at eval)."""

    def _task(self):
        return BoxStackingTask({
            "box": {"size": S1, "initial_position": {"z": 0.027}},
            "platform": {"size": S2},
            "curriculum": {
                "enabled": True,
                "release_anneal_end": 0.75,
                "tolerance_relax": 2.0,
                "hold_anneal_min": 0.2,
            },
        })

    def test_relaxed_pocket_and_short_hold_at_difficulty_zero(self):
        t = self._task()
        ts = t.init_task_states(N)
        ts["spawn_difficulty"] = jnp.zeros(N, jnp.float32)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        # 3 cm XY off the stack point: outside the strict 2 cm pocket,
        # inside the relaxed 4 cm one
        phys = make_physics(box_pos=np.tile([0.23, 0.0, STACK_Z], (N, 1)))
        obs = make_obs()
        step = None
        for i in range(5):   # hold_anneal_min 0.2 s / 0.04 = 5 steps
            step = t.compute_step(
                obs, ts, phys, None, jnp.zeros((N, 26, 3)),
                jnp.zeros((N, 3)), DT, box2_contact_force=jnp.zeros((N, 3)),
            )
            ts = step.task_states
            assert int(ts["hold_duration_steps"][0]) == i + 1
        assert bool(step.success_criteria["stack_success"][0])

    def test_strict_at_difficulty_one(self):
        t = self._task()
        ts = t.init_task_states(N)   # spawn_difficulty defaults to 1.0
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        phys = make_physics(box_pos=np.tile([0.23, 0.0, STACK_Z], (N, 1)))
        step = t.compute_step(
            make_obs(), ts, phys, None, jnp.zeros((N, 26, 3)),
            jnp.zeros((N, 3)), DT, box2_contact_force=jnp.zeros((N, 3)),
        )
        # 3 cm off: not stacked under the strict 2 cm tolerance
        assert int(step.task_states["hold_duration_steps"][0]) == 0
        # and a perfectly stacked cube needs the FULL hold at difficulty 1
        phys = stacked_physics()
        for i in range(5):
            step = t.compute_step(
                make_obs(), ts, phys, None, jnp.zeros((N, 26, 3)),
                jnp.zeros((N, 3)), DT, box2_contact_force=jnp.zeros((N, 3)),
            )
            ts = step.task_states
        assert not bool(step.success_criteria["stack_success"][0])  # 5 < 12

    def test_platform_drift_tolerance_rides_the_bridge(self):
        t = self._task()
        ts = t.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        # platform drifted 8 cm from spawn: beyond the strict 5 cm limit,
        # within the relaxed 10 cm one
        phys = make_physics(plat_pos=np.tile([0.28, 0.0, S2 / 2], (N, 1)))
        def step_at(d):
            ts2 = dict(ts)
            ts2["spawn_difficulty"] = jnp.full(N, d, jnp.float32)
            return t.compute_step(
                make_obs(), ts2, phys, None, jnp.zeros((N, 26, 3)),
                jnp.zeros((N, 3)), DT, box2_contact_force=jnp.zeros((N, 3)),
            )
        assert not bool(step_at(0.0).failure_criteria["platform_moved"][0])
        assert bool(step_at(1.0).failure_criteria["platform_moved"][0])

    def test_difficulty_band_spawns(self):
        t = BoxStackingTask({
            "box": {"size": S1}, "platform": {"size": S2},
            "curriculum": {
                "enabled": True, "release_anneal_end": 0.75,
                "difficulty_band": 0.3,
            },
        })
        zero = jnp.zeros(26, dtype=jnp.float32)
        r = t.reset_task(jax.random.key(0), 512, zero,
                         difficulty=jnp.asarray(0.5, jnp.float32))
        sd = np.asarray(r.task_states["spawn_difficulty"])
        assert sd.min() >= 0.2 - 1e-6 and sd.max() <= 0.5 + 1e-6
        assert sd.std() > 0.05          # genuinely spread over the band
        # band collapses at difficulty 1.0 (eval distribution exact)
        r1 = t.reset_task(jax.random.key(1), 64, zero,
                          difficulty=jnp.asarray(1.0, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(r1.task_states["spawn_difficulty"]), 1.0)

    def test_bridged_hitting_ground_and_under_box_penalty(self):
        t = BoxStackingTask({
            "box": {"size": S1, "initial_position": {"z": 0.027}},
            "platform": {"size": S2},
            "curriculum": {"enabled": True, "release_anneal_end": 0.75},
            "termination": {"height_safety": {
                "handbase_threshold": 0.0, "fingertip_threshold": 0.0,
                "fingertip_bridge_margin": 0.006,
            }},
        })
        ts = t.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        phys = make_physics(box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)))
        # one tip 3 mm below ground, under the cube footprint
        tips = np.full((N, 5, 3), 0.5, np.float32)
        tips[:, 1] = [0.01, 0.0, -0.003]

        def step_at(d):
            ts2 = dict(ts)
            ts2["spawn_difficulty"] = jnp.full(N, d, jnp.float32)
            return t.compute_step(
                make_obs(tip_positions=tips), ts2, phys, None,
                jnp.zeros((N, 26, 3)), jnp.zeros((N, 3)), DT,
                box2_contact_force=jnp.zeros((N, 3)),
            )

        # at difficulty 0 the bridged margin (-6 mm) tolerates the graze
        s0 = step_at(0.0)
        assert not bool(s0.failure_criteria["hitting_ground"][0])
        # the scoop still pays the under-box penalty (margin 1 cm + 3 mm)
        np.testing.assert_allclose(
            np.asarray(s0.reward_terms["under_box_penalty"]), 0.013,
            atol=1e-6,
        )
        # at difficulty 1.0 the criterion is strict reference semantics
        assert bool(step_at(1.0).failure_criteria["hitting_ground"][0])

    def test_pocket_margin_is_per_tip_and_strict_at_full_difficulty(self):
        t = BoxStackingTask({
            "box": {"size": S1, "initial_position": {"z": 0.027}},
            "platform": {"size": S2},
            "curriculum": {"enabled": True, "release_anneal_end": 0.75},
            "termination": {"height_safety": {
                "handbase_threshold": 0.0, "fingertip_threshold": 0.0,
                "pocket_margin": 0.008, "pocket_radius": 0.05,
            }},
        })
        ts = t.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        # cube at the stack point (inside the pocket)
        phys = stacked_physics()

        def step_at(d, tips):
            ts2 = dict(ts)
            ts2["spawn_difficulty"] = jnp.full(N, d, jnp.float32)
            return t.compute_step(
                make_obs(tip_positions=tips), ts2, phys, None,
                jnp.zeros((N, 26, 3)), jnp.zeros((N, 3)), DT,
                box2_contact_force=jnp.zeros((N, 3)),
            )

        # tip grazing 3 mm below ground AT the stack point: relaxed at d=0
        near = np.full((N, 5, 3), 0.5, np.float32)
        near[:, 1] = [0.21, 0.0, -0.003]
        assert not bool(
            step_at(0.0, near).failure_criteria["hitting_ground"][0])
        # ...but strict at difficulty 1.0 (eval distribution)
        assert bool(
            step_at(1.0, near).failure_criteria["hitting_ground"][0])
        # same graze FAR from the platform while the cube sits in the
        # pocket: the per-tip gate keeps the strict rule -> failure at d=0
        far = np.full((N, 5, 3), 0.5, np.float32)
        far[:, 1] = [0.0, 0.0, -0.003]
        assert bool(
            step_at(0.0, far).failure_criteria["hitting_ground"][0])
        # cube NOT in the pocket: the near-platform graze is strict too
        phys_away = make_physics(
            box_pos=np.tile([0.0, 0.0, 0.027], (N, 1)))

        def step_away(tips):
            ts2 = dict(ts)
            ts2["spawn_difficulty"] = jnp.zeros(N, jnp.float32)
            return t.compute_step(
                make_obs(tip_positions=tips), ts2, phys_away, None,
                jnp.zeros((N, 26, 3)), jnp.zeros((N, 3)), DT,
                box2_contact_force=jnp.zeros((N, 3)),
            )

        assert bool(step_away(near).failure_criteria["hitting_ground"][0])


class TestRound4Levers:
    """Dense platform-drift penalty + strict top-of-band spawns."""

    def _task(self, **cur):
        return BoxStackingTask({
            "box": {"size": S1, "initial_position": {"z": 0.027}},
            "platform": {"size": S2},
            "curriculum": {"enabled": True, **cur},
        })

    def test_platform_drift_penalty_values(self):
        t = self._task()
        ts = t.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        # platform drifted 3 cm: penalty = drift - 1 cm free margin
        # (no release_anneal_end here -> bridge 0 -> full strength)
        phys = make_physics(plat_pos=np.tile([0.23, 0.0, S2 / 2], (N, 1)))
        step = run_step(t, make_obs(), ts, phys)
        np.testing.assert_allclose(
            np.asarray(step.reward_terms["platform_drift_penalty"]), 0.02,
            atol=1e-6,
        )
        # within the free margin: zero
        phys2 = make_physics(plat_pos=np.tile([0.205, 0.0, S2 / 2], (N, 1)))
        step2 = run_step(t, make_obs(), ts, phys2)
        np.testing.assert_allclose(
            np.asarray(step2.reward_terms["platform_drift_penalty"]), 0.0,
            atol=1e-6,
        )

    def test_platform_drift_penalty_rides_the_bridge(self):
        t = self._task(release_anneal_end=0.75)
        ts = t.init_task_states(N)
        ts["platform_spawn_xy"] = jnp.tile(jnp.asarray([0.2, 0.0]), (N, 1))
        phys = make_physics(plat_pos=np.tile([0.23, 0.0, S2 / 2], (N, 1)))

        def pen_at(d):
            ts2 = dict(ts)
            ts2["spawn_difficulty"] = jnp.full(N, d, jnp.float32)
            s = run_step(t, make_obs(), ts2, phys)
            return float(s.reward_terms["platform_drift_penalty"][0])

        # zero at difficulty 0 (grasp discovery keeps the old landscape),
        # full strength at/after the anneal end
        assert pen_at(0.0) == pytest.approx(0.0, abs=1e-7)
        assert pen_at(0.375) == pytest.approx(0.01, abs=1e-6)  # half bridge
        assert pen_at(0.75) == pytest.approx(0.02, abs=1e-6)
        assert pen_at(1.0) == pytest.approx(0.02, abs=1e-6)

    def test_band_top_fraction_pins_spawns(self):
        t = self._task(
            release_anneal_end=0.75, difficulty_band=0.3,
            band_top_fraction=0.25,
        )
        zero = jnp.zeros(26, dtype=jnp.float32)
        r = t.reset_task(jax.random.key(0), 4096, zero,
                         difficulty=jnp.asarray(0.6, jnp.float32))
        sd = np.asarray(r.task_states["spawn_difficulty"])
        at_top = (sd >= 0.6 - 1e-6).mean()
        assert 0.2 < at_top < 0.3, at_top          # ~25% pinned at d
        below = sd[sd < 0.6 - 1e-6]
        assert below.min() >= 0.3 - 1e-6           # band lower edge
        assert below.std() > 0.05                  # rest spread over band
