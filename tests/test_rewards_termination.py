"""Unit tests for reward terms and termination evaluation against
hand-computed values (reference formula parity, reward_calculator.py:66-275
and termination_manager.py:120-321)."""

import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.envs import rewards as rew
from dexrobot_isaac_tpu.envs import termination as term

N = 4


def make_reward_cfg(weights):
    return rew.RewardConfig(
        weights=weights,
        finger_lower_limits=np.zeros(20, np.float32),
        finger_upper_limits=np.full(20, 1.3, np.float32),
    )


def base_inputs():
    obs = {
        "fingertip_poses_world": jnp.tile(
            jnp.asarray([0, 0, 0.5, 0, 0, 0, 1] * 5, jnp.float32)[None], (N, 1)
        ),
        "contact_forces": jnp.zeros((N, 15)),
    }
    zeros26 = jnp.zeros((N, 26))
    return dict(
        obs_dict=obs,
        dof_pos=zeros26,
        dof_vel=zeros26,
        hand_vel=jnp.zeros((N, 3)),
        hand_ang_vel=jnp.zeros((N, 3)),
        prev_finger_dof_vel=jnp.zeros((N, 20)),
        prev_hand_vel=jnp.zeros((N, 3)),
        prev_hand_ang_vel=jnp.zeros((N, 3)),
        prev_contacts=jnp.zeros((N, 5), bool),
    )


class TestCommonRewards:
    def test_alive_is_one(self):
        r, _ = rew.compute_common_reward_terms(make_reward_cfg({}), **base_inputs())
        np.testing.assert_allclose(np.asarray(r["alive"]), 1.0)

    def test_height_safety_formula(self):
        # min fingertip z = 0.5: clip(1 - exp(-(0.5-0.02)*20), 0, 1) ~ 1.0
        r, _ = rew.compute_common_reward_terms(make_reward_cfg({}), **base_inputs())
        np.testing.assert_allclose(np.asarray(r["height_safety"]), 1.0, atol=1e-4)
        # fingertips at ground: 1 - exp(0.4) < 0 -> clipped to 0
        inp = base_inputs()
        inp["obs_dict"]["fingertip_poses_world"] = jnp.zeros((N, 35))
        r, _ = rew.compute_common_reward_terms(make_reward_cfg({}), **inp)
        np.testing.assert_allclose(np.asarray(r["height_safety"]), 0.0, atol=1e-6)

    def test_velocity_penalties(self):
        inp = base_inputs()
        inp["hand_vel"] = jnp.tile(jnp.asarray([[3.0, 0, 0]]), (N, 1))
        inp["dof_vel"] = inp["dof_vel"].at[:, 6].set(2.0)
        r, _ = rew.compute_common_reward_terms(make_reward_cfg({}), **inp)
        np.testing.assert_allclose(
            np.asarray(r["hand_velocity"]), np.exp(-0.2 * 3.0), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(r["finger_velocity"]), np.exp(-0.1 * 2.0), rtol=1e-5
        )

    def test_joint_limit_penalty(self):
        inp = base_inputs()
        # all fingers mid-range (normalized 0) except one at its upper limit
        # (normalized 1 -> over-margin 0.2)
        inp["dof_pos"] = inp["dof_pos"].at[:, 6:].set(0.65).at[:, 6].set(1.3)
        r, _ = rew.compute_common_reward_terms(make_reward_cfg({}), **inp)
        np.testing.assert_allclose(
            np.asarray(r["joint_limit"]), 1.0 - 0.2 / 20, rtol=1e-4
        )

    def test_contact_stability_counts_flips(self):
        inp = base_inputs()
        cf = np.zeros((N, 15), np.float32)
        cf[:, 0] = 5.0  # finger 0 now in contact; prev_contacts all False
        inp["obs_dict"]["contact_forces"] = jnp.asarray(cf)
        r, track = rew.compute_common_reward_terms(make_reward_cfg({}), **inp)
        np.testing.assert_allclose(
            np.asarray(r["contact_stability"]), np.exp(-1.0), rtol=1e-5
        )
        assert bool(track["prev_contacts"][0, 0])

    def test_weighted_sum_skips_zero_weights(self):
        cfg = make_reward_cfg({"alive": 0.1, "height_safety": 0.0})
        common, _ = rew.compute_common_reward_terms(cfg, **base_inputs())
        total, comps = rew.compute_total_reward(cfg, common, {})
        np.testing.assert_allclose(np.asarray(total), 0.1, atol=1e-5)
        assert "alive_weighted" in comps and "height_safety" not in comps


class TestTermination:
    def make_cfg(self, **kw):
        defaults = dict(
            active_success_criteria=("win",),
            active_failure_criteria=("lose",),
            max_episode_length=10,
            success_reward=10.0,
            failure_penalty=5.0,
            timeout_penalty=1.0,
        )
        defaults.update(kw)
        return term.TerminationConfig(**defaults)

    def run(self, cfg, counts, win, lose):
        return term.evaluate_termination(
            cfg,
            jnp.asarray(counts),
            {"win": jnp.asarray(win)},
            {"lose": jnp.asarray(lose)},
            {}, {},
        )

    def test_timeout_at_max_minus_one(self):
        cfg = self.make_cfg()
        reset, info, r, _, _, _ = self.run(
            cfg, [9, 8, 0, 9], [False] * 4, [False] * 4
        )
        np.testing.assert_array_equal(
            np.asarray(reset), [True, False, False, True]
        )
        np.testing.assert_allclose(np.asarray(r), [-1.0, 0, 0, -1.0])

    def test_mutually_exclusive_success_wins(self):
        cfg = self.make_cfg()
        reset, info, r, _, _, _ = self.run(
            cfg, [9, 0, 0, 0], [True, True, False, False],
            [True, False, True, False],
        )
        # env0: success AND failure AND timeout -> counts as success
        np.testing.assert_array_equal(
            np.asarray(info["success"]), [True, True, False, False]
        )
        np.testing.assert_array_equal(
            np.asarray(info["failure"]), [False, False, True, False]
        )
        np.testing.assert_allclose(np.asarray(r), [10.0, 10.0, -5.0, 0.0])

    def test_inactive_criteria_ignored(self):
        cfg = self.make_cfg(active_failure_criteria=())
        # empty active list means "use all available" (reference semantics)
        reset, info, r, _, _, _ = self.run(
            cfg, [0] * 4, [False] * 4, [True, False, False, False]
        )
        assert bool(reset[0])

    def test_reason_flags_accumulate(self):
        cfg = self.make_cfg()
        _, _, _, _, sflags, fflags = self.run(
            cfg, [0] * 4, [True, False, False, False], [False] * 4
        )
        np.testing.assert_array_equal(
            np.asarray(sflags["win"]), [True, False, False, False]
        )

    def test_validation_fail_fast(self):
        cfg = self.make_cfg(active_success_criteria=("nonexistent",))
        try:
            cfg.validate({"win"}, {"lose"})
            assert False, "should have raised"
        except RuntimeError as e:
            assert "nonexistent" in str(e)
