"""PPO learner mechanics: shapes, adaptive LR, learning on a toy problem.

Uses a trivial analytic environment (no physics) so the learner's machinery
is validated fast; the end-to-end env+PPO path is covered by the train CLI
smoke test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner
from dexrobot_isaac_tpu.rl.running_stats import RunningMeanStd

NUM_ENVS = 16
NUM_OBS = 4
NUM_ACT = 2


def toy_env_step(state, actions):
    """Reward = -|obs - action[0:2] pattern|; obs random walk. The optimal
    policy sets action ~ obs[:2], so reward improves if learning works."""
    key, obs = state
    key, sub = jax.random.split(key)
    target = obs[:, :NUM_ACT]
    reward = -jnp.sum((actions - target) ** 2, axis=-1)
    new_obs = jax.random.normal(sub, obs.shape)
    done = jnp.zeros(obs.shape[0], dtype=bool)
    extras = {"timeout": jnp.zeros(obs.shape[0], dtype=bool)}
    return (key, new_obs), new_obs, reward, done, extras


@pytest.fixture(scope="module")
def learner():
    cfg = PPOConfig(
        num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
        horizon_length=8, minibatch_size=32, mini_epochs=2,
        units=(32, 32),
    )
    return PPOLearner(cfg, toy_env_step, seed=0)


class TestPPO:
    def test_init_state(self, learner):
        st = learner.init_state()
        assert float(st.lr) == pytest.approx(3e-4)
        assert int(st.epoch) == 0

    def test_train_iteration_shapes(self, learner):
        st = learner.init_state()
        key = jax.random.key(1)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        st2, env_state, obs, metrics, _ = learner.train_iteration(st, env_state, obs)
        assert int(st2.epoch) == 1
        assert np.isfinite(float(metrics["kl"]))
        assert np.isfinite(float(metrics["reward_mean"]))

    def test_learning_improves_reward(self, learner):
        st = learner.init_state()
        key = jax.random.key(2)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        rewards = []
        for _ in range(60):
            st, env_state, obs, metrics, _ = learner.train_iteration(
                st, env_state, obs
            )
            rewards.append(float(metrics["reward_mean"]))
        early = np.mean(rewards[:5])
        late = np.mean(rewards[-5:])
        assert late > early + 0.3, f"no learning: early={early:.3f} late={late:.3f}"

    def test_adaptive_lr_moves(self, learner):
        st = learner.init_state()
        key = jax.random.key(3)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        lrs = set()
        for _ in range(10):
            st, env_state, obs, metrics, _ = learner.train_iteration(
                st, env_state, obs
            )
            lrs.add(round(float(st.lr), 8))
        assert len(lrs) > 1, "adaptive LR should adjust within 10 epochs"

    @pytest.mark.parametrize("schedule_type", ["standard", "legacy", "per_iteration"])
    def test_schedule_types_run_and_adapt(self, schedule_type):
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), schedule_type=schedule_type,
        )
        lrn = PPOLearner(cfg, toy_env_step, seed=0)
        st = lrn.init_state()
        key = jax.random.key(4)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        lrs = []
        for _ in range(10):
            st, env_state, obs, metrics, _ = lrn.train_iteration(
                st, env_state, obs
            )
            lrs.append(float(st.lr))
        assert all(1e-6 <= lr <= 1e-2 for lr in lrs)
        assert len(set(round(lr, 10) for lr in lrs)) > 1, (
            f"{schedule_type}: adaptive LR never moved in 10 epochs"
        )

    def test_legacy_schedule_adapts_fastest(self):
        """Per-minibatch ('legacy') adaptation can move the LR further in one
        iteration than per-mini-epoch ('standard') or per-iteration, because
        it applies the 1.5x step once per minibatch (here 4 minibatches x 2
        mini-epochs = 8 steps/iter vs 2 vs 1)."""
        def run(schedule_type):
            cfg = PPOConfig(
                num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
                horizon_length=8, minibatch_size=32, mini_epochs=2,
                units=(32, 32), schedule_type=schedule_type,
                # force every KL reading below 0.5*threshold so each
                # adaptation step multiplies by exactly 1.5
                kl_threshold=1e3,
            )
            lrn = PPOLearner(cfg, toy_env_step, seed=0)
            st = lrn.init_state()
            key = jax.random.key(5)
            env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
            st, _, _, _, _ = lrn.train_iteration(st, env_state, env_state[1])
            return float(st.lr)

        lr0 = 3e-4
        assert run("per_iteration") == pytest.approx(lr0 * 1.5, rel=1e-5)
        assert run("standard") == pytest.approx(lr0 * 1.5**2, rel=1e-5)
        assert run("legacy") == pytest.approx(lr0 * 1.5**8, rel=1e-5)

    def test_deterministic_eval_action(self, learner):
        st = learner.init_state()
        obs = jnp.ones((NUM_ENVS, NUM_OBS))
        a1 = learner.act_deterministic(st, obs)
        a2 = learner.act_deterministic(st, obs)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert np.all(np.abs(np.asarray(a1)) <= 1.0)


class TestRunningMeanStd:
    def test_tracks_moments(self):
        rms = RunningMeanStd.create((3,))
        rng = np.random.default_rng(0)
        data = rng.normal(loc=2.0, scale=3.0, size=(1000, 3)).astype(np.float32)
        for i in range(10):
            rms = rms.update(jnp.asarray(data[i * 100:(i + 1) * 100]))
        np.testing.assert_allclose(np.asarray(rms.mean), data.mean(0), atol=0.05)
        np.testing.assert_allclose(
            np.sqrt(np.asarray(rms.var)), data.std(0), atol=0.1
        )

    def test_normalize_roundtrip(self):
        rms = RunningMeanStd.create(())
        rms = rms.update(jnp.arange(100, dtype=jnp.float32))
        x = jnp.asarray(42.0)
        np.testing.assert_allclose(
            float(rms.denormalize(rms.normalize(x))), 42.0, rtol=1e-4
        )


NUM_STATES = 3


def asym_env_step(state, actions):
    """Toy env emitting [policy obs | privileged states]: the privileged
    slice is the reward target, so only an asymmetric critic can see it."""
    key, obs = state
    key, sub = jax.random.split(key)
    target = obs[:, NUM_OBS:NUM_OBS + NUM_ACT]  # privileged slice
    reward = -jnp.sum((actions - target) ** 2, axis=-1)
    new_obs = jax.random.normal(sub, obs.shape)
    done = jnp.zeros(obs.shape[0], dtype=bool)
    extras = {"timeout": jnp.zeros(obs.shape[0], dtype=bool)}
    return (key, new_obs), new_obs, reward, done, extras


class TestAsymmetricActorCritic:
    """Asymmetric actor-critic: separate critic trunk on a privileged
    ("states") slice appended after the policy obs (rl/networks.py)."""

    @pytest.fixture(scope="class")
    def asym_learner(self):
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_states=NUM_STATES,
            num_envs=NUM_ENVS, horizon_length=8, minibatch_size=32,
            mini_epochs=2, units=(32, 32),
        )
        return PPOLearner(cfg, asym_env_step, seed=0)

    def test_separate_trunks(self, asym_learner):
        st = asym_learner.init_state()
        names = set(st.params["params"])
        assert any(n.startswith("actor_") for n in names)
        assert any(n.startswith("critic_") for n in names)

    def test_actor_blind_to_privileged_slice(self, asym_learner):
        """mu must be invariant to the privileged slice; value must not be."""
        st = asym_learner.init_state()
        key = jax.random.key(0)
        obs = jax.random.normal(key, (NUM_ENVS, NUM_OBS + NUM_STATES))
        obs2 = obs.at[:, NUM_OBS:].add(10.0)
        mu1, _, v1 = asym_learner.network.apply(st.params, obs)
        mu2, _, v2 = asym_learner.network.apply(st.params, obs2)
        np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))
        assert not np.allclose(np.asarray(v1), np.asarray(v2))

    def test_train_iteration_runs(self, asym_learner):
        st = asym_learner.init_state()
        key = jax.random.key(1)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS + NUM_STATES)))
        obs = env_state[1]
        st2, env_state, obs, metrics, _ = asym_learner.train_iteration(
            st, env_state, obs
        )
        assert int(st2.epoch) == 1
        assert np.isfinite(float(metrics["kl"]))


class TestDeviceBreakdown:
    """The device-side windowed reducer must reproduce the host observer's
    per-(type, component) episode accounting exactly (rl/observer.py)."""

    def _random_extras(self, rng, T, N, comps):
        # mutually exclusive done masks, ~25% done per step
        kind = rng.integers(0, 8, size=(T, N))
        return {
            "success": jnp.asarray(kind == 0),
            "failure": jnp.asarray(kind == 1),
            "timeout": jnp.asarray(kind == 2),
            "reward_components": {
                k: jnp.asarray(
                    rng.normal(size=(T, N)).astype(np.float32)
                ) for k in comps
            },
        }

    def test_matches_host_accounting(self):
        from dexrobot_isaac_tpu.rl.observer import DeviceBreakdown

        rng = np.random.default_rng(0)
        T, N = 5, 8
        comps = ["alive", "alive_weighted", "s1_x"]
        batches = [self._random_extras(rng, T, N, comps) for _ in range(4)]

        db = DeviceBreakdown.create(batches[0])
        for b in batches:
            db.update(b)
        got = db.fetch_and_reset(global_step=123)

        # host reference accounting
        acc = {k: np.zeros(N) for k in comps}
        steps = np.zeros(N, dtype=np.int64)
        ep_count = np.zeros(3, dtype=np.int64)
        step_sum = np.zeros(3)
        comp_sum = {k: np.zeros(3) for k in comps}
        for b in batches:
            succ = np.asarray(b["success"])
            fail = np.asarray(b["failure"])
            tout = np.asarray(b["timeout"])
            cv = {k: np.asarray(v) for k, v in b["reward_components"].items()}
            for t in range(T):
                for k in comps:
                    acc[k] += cv[k][t]
                steps += 1
                for ti, mask in enumerate((succ[t], fail[t], tout[t])):
                    for env in np.nonzero(mask)[0]:
                        ep_count[ti] += 1
                        step_sum[ti] += steps[env]
                        for k in comps:
                            comp_sum[k][ti] += acc[k][env]
                done = succ[t] | fail[t] | tout[t]
                for k in comps:
                    acc[k][done] = 0.0
                steps[done] = 0

        assert got["global_step"] == 123
        np.testing.assert_array_equal(np.asarray(got["ep_count"]), ep_count)
        np.testing.assert_allclose(
            np.asarray(got["step_sum"]), step_sum, rtol=1e-6
        )
        for k in comps:
            np.testing.assert_allclose(
                got["comp_sum"][k], comp_sum[k], rtol=1e-4, atol=1e-4
            )

        # window totals reset; per-env episode accumulators persist
        empty = db.fetch_and_reset()
        assert np.asarray(empty["ep_count"]).sum() == 0
        db.update(batches[0])  # must still accept extras after reset

    def test_summary_feeds_observer(self):
        from dexrobot_isaac_tpu.rl.observer import (
            DeviceBreakdown,
            RewardComponentObserver,
        )

        class FakeWriter:
            def __init__(self):
                self.scalars = {}

            def add_scalar(self, key, value, step):
                self.scalars[key] = (value, step)

        rng = np.random.default_rng(1)
        extras = self._random_extras(rng, 6, 16, ["alive", "alive_weighted"])
        db = DeviceBreakdown.create(extras)
        db.update(extras)
        w = FakeWriter()
        obs = RewardComponentObserver(w, log_interval=1)
        obs.process_device_window(db.fetch_and_reset(global_step=96))
        keys = set(w.scalars)
        assert "reward_breakdown/all/raw/episode/alive" in keys
        assert "reward_breakdown/all/weighted/episode/alive" in keys
        assert "training/episode_length" in keys
        rates = [
            w.scalars[f"training/termination_rates/{t}"][0]
            for t in ("success", "failure", "timeout")
        ]
        assert abs(sum(rates) - 1.0) < 1e-6


class TestKLSkipRecovery:
    """Adaptive-LR floor recovery (rl/ppo.py kl_skip_factor): minibatches
    whose accumulated policy drift exceeds factor*kl_threshold skip their
    update, bounding per-iteration KL so the scheduler can recover instead
    of wedging at lr_floor (BASELINE.md round-2 DR-leg failure)."""

    def _learner(self, **kw):
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), **kw,
        )
        return PPOLearner(cfg, toy_env_step, seed=0)

    def test_all_updates_skipped_when_gate_trips(self):
        # kl_threshold tiny => every minibatch's drift measures above the
        # gate (the first minibatch has kl == 0 only in exact arithmetic;
        # use factor/threshold so 0 < gate < any real drift)
        lrn = self._learner(kl_skip_factor=1.0, kl_threshold=0.0)
        st = lrn.init_state()
        key = jax.random.key(7)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        st2, _, _, _, _ = lrn.train_iteration(st, env_state, env_state[1])
        # kl of the very first minibatch is exactly 0 (params unchanged), so
        # 0 > 0 is False and that one applies; all later minibatches see
        # drift > 0 and skip. Verify the first epoch's later updates did not
        # move params: compare against a run that applies only minibatch 0.
        # Simpler invariant: with an impossible gate (negative threshold the
        # skip condition kl > -1 is always true) nothing at all moves.
        lrn2 = self._learner(kl_skip_factor=-1.0, kl_threshold=1.0)
        stA = lrn2.init_state()
        # train_iteration donates its input state: snapshot to host first
        params_before = jax.tree.map(np.asarray, stA.params)
        stB, _, _, m, _ = lrn2.train_iteration(
            stA, (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS))),
            jax.random.normal(key, (NUM_ENVS, NUM_OBS)),
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                a, np.asarray(b)
            ),
            params_before, stB.params,
        )

    def test_gate_off_matches_parity(self):
        """An untripped gate (huge factor) must match the rl_games-parity
        learner. One iteration, tight tolerance: the two configs compile to
        different XLA programs, so exact bit equality isn't guaranteed, but
        the math is identical."""
        def run(**kw):
            lrn = self._learner(**kw)
            st = lrn.init_state()
            key = jax.random.key(8)
            env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
            st, _, _, _, _ = lrn.train_iteration(st, env_state, env_state[1])
            return st

        a = run()
        b = run(kl_skip_factor=1e9)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=0, atol=1e-6
            ),
            a.params, b.params,
        )

    def test_learning_survives_with_gate(self):
        lrn = self._learner(kl_skip_factor=8.0)
        st = lrn.init_state()
        key = jax.random.key(2)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        rewards = []
        for _ in range(60):
            st, env_state, obs, metrics, _ = lrn.train_iteration(
                st, env_state, obs
            )
            rewards.append(float(metrics["reward_mean"]))
        early, late = np.mean(rewards[:5]), np.mean(rewards[-5:])
        assert late > early + 0.3, f"no learning: early={early:.3f} late={late:.3f}"


class TestChunkedDispatch:
    """Discriminating test for the round-2 'chunking learning regression'
    suspicion: `make_chunked_train_step(c)` is lax.scan over the SAME
    `_train_iteration` body, so N iterations chunked must produce
    bit-identical learner state to N unchunked iterations (same seeds,
    fixed difficulty). If this holds, any learning difference observed
    under dispatch_chunk>1 is host-side cadence, not the scanned program."""

    def _run(self, chunk, iters=8):
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32),
        )
        lrn = PPOLearner(cfg, toy_env_step, seed=0)
        st = lrn.init_state()
        key = jax.random.key(9)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        if chunk == 1:
            for _ in range(iters):
                st, env_state, obs, metrics, _ = lrn.train_iteration(
                    st, env_state, obs
                )
            last_metrics = metrics
        else:
            step = lrn.make_chunked_train_step(chunk)
            for _ in range(iters // chunk):
                st, env_state, obs, metrics, _ = step(st, env_state, obs)
            last_metrics = jax.tree.map(lambda x: x[-1], metrics)
        return st, obs, last_metrics

    def test_chunked_bitwise_equals_unchunked(self):
        st1, obs1, m1 = self._run(1)
        st4, obs4, m4 = self._run(4)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            st1.params, st4.params,
        )
        np.testing.assert_array_equal(np.asarray(st1.lr), np.asarray(st4.lr))
        np.testing.assert_array_equal(
            np.asarray(st1.obs_rms.mean), np.asarray(st4.obs_rms.mean)
        )
        np.testing.assert_array_equal(
            np.asarray(st1.value_rms.var), np.asarray(st4.value_rms.var)
        )
        np.testing.assert_array_equal(np.asarray(obs1), np.asarray(obs4))
        for k in m1:
            np.testing.assert_array_equal(
                np.asarray(m1[k]), np.asarray(m4[k]), err_msg=k
            )


class TestRotationShuffle:
    def test_learning_with_rotation_shuffle(self):
        """The sort-free rotation shuffle must still learn the toy task."""
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), shuffle="rotation",
        )
        learner = PPOLearner(cfg, toy_env_step, seed=0)
        st = learner.init_state()
        key = jax.random.key(2)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        rewards = []
        for _ in range(60):
            st, env_state, obs, metrics, _ = learner.train_iteration(
                st, env_state, obs
            )
            rewards.append(float(metrics["reward_mean"]))
        early, late = np.mean(rewards[:5]), np.mean(rewards[-5:])
        assert late > early + 0.3, f"no learning: early={early:.3f} late={late:.3f}"


class TestAffineShuffle:
    def test_affine_index_map_is_bijection(self):
        """(k*i + c) mod N over the static multiplier table must permute
        [0, N) for every table entry (oddness <=> coprime with 2^k)."""
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), shuffle="affine",
        )
        learner = PPOLearner(cfg, toy_env_step, seed=0)
        n = 128
        mults = np.asarray(learner._affine_mults(n))
        assert mults.shape == (64,)
        assert (mults % 2 == 1).all()
        i = np.arange(n, dtype=np.uint32)
        for k in mults:
            idx = (k * i + np.uint32(3)) & np.uint32(n - 1)
            assert len(set(idx.tolist())) == n
        # distinct epochs should see distinct strides (decorrelation — the
        # failure mode that sank shuffle=rotation)
        assert len(set(mults.tolist())) > 16

    def test_affine_rejects_non_power_of_two(self):
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), shuffle="affine",
        )
        learner = PPOLearner(cfg, toy_env_step, seed=0)
        with pytest.raises(ValueError, match="power-of-two"):
            learner._affine_mults(96)

    def test_learning_with_affine_shuffle(self):
        """The sort-free affine shuffle must learn the toy task."""
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), shuffle="affine",
        )
        learner = PPOLearner(cfg, toy_env_step, seed=0)
        st = learner.init_state()
        key = jax.random.key(2)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        rewards = []
        for _ in range(60):
            st, env_state, obs, metrics, _ = learner.train_iteration(
                st, env_state, obs
            )
            rewards.append(float(metrics["reward_mean"]))
        early, late = np.mean(rewards[:5]), np.mean(rewards[-5:])
        assert late > early + 0.3, f"no learning: early={early:.3f} late={late:.3f}"

    def test_learning_with_perm_roll_shuffle(self):
        """perm_roll (fresh per-iteration permutation + per-epoch roll)
        must learn the toy task. Unlike rotation's static permutation,
        successive iterations are fully re-randomized."""
        cfg = PPOConfig(
            num_actions=NUM_ACT, num_obs=NUM_OBS, num_envs=NUM_ENVS,
            horizon_length=8, minibatch_size=32, mini_epochs=2,
            units=(32, 32), shuffle="perm_roll",
        )
        learner = PPOLearner(cfg, toy_env_step, seed=0)
        st = learner.init_state()
        key = jax.random.key(2)
        env_state = (key, jax.random.normal(key, (NUM_ENVS, NUM_OBS)))
        obs = env_state[1]
        rewards = []
        for _ in range(60):
            st, env_state, obs, metrics, _ = learner.train_iteration(
                st, env_state, obs
            )
            rewards.append(float(metrics["reward_mean"]))
        early, late = np.mean(rewards[:5]), np.mean(rewards[-5:])
        assert late > early + 0.3, f"no learning: early={early:.3f} late={late:.3f}"


class TestPackedExtras:
    """The trainer's slimmed rollout extras pack the reward-component dict
    into one (T, N, C) array (rl/ppo.py _slim_extras); DeviceBreakdown must
    accept that form and produce identical accounting to the dict form."""

    def test_packed_matches_dict_accounting(self):
        from dexrobot_isaac_tpu.rl.observer import DeviceBreakdown

        rng = np.random.default_rng(7)
        T, N = 4, 8
        comps = ["alive", "s1_x", "s2_y"]
        kind = rng.integers(0, 6, size=(T, N))
        dict_extras = {
            "success": jnp.asarray(kind == 0),
            "failure": jnp.asarray(kind == 1),
            "timeout": jnp.asarray(kind == 2),
            "reward_components": {
                k: jnp.asarray(rng.normal(size=(T, N)).astype(np.float32))
                for k in comps
            },
        }
        comp_names = tuple(sorted(comps))
        packed_extras = {
            "success": dict_extras["success"],
            "failure": dict_extras["failure"],
            "timeout": dict_extras["timeout"],
            "reward_components_packed": jnp.stack(
                [dict_extras["reward_components"][k] for k in comp_names],
                axis=-1,
            ),
        }

        db_dict = DeviceBreakdown.create(dict_extras)
        db_dict.update(dict_extras)
        want = db_dict.fetch_and_reset(global_step=1)

        db_packed = DeviceBreakdown.create(packed_extras, comp_names=comp_names)
        db_packed.update(packed_extras)
        got = db_packed.fetch_and_reset(global_step=1)

        np.testing.assert_array_equal(
            np.asarray(got["ep_count"]), np.asarray(want["ep_count"])
        )
        for k in comps:
            np.testing.assert_allclose(
                got["comp_sum"][k], want["comp_sum"][k], rtol=1e-6
            )

    def test_packed_requires_comp_names(self):
        from dexrobot_isaac_tpu.rl.observer import DeviceBreakdown

        extras = {
            "success": jnp.zeros((2, 4), dtype=bool),
            "failure": jnp.zeros((2, 4), dtype=bool),
            "timeout": jnp.zeros((2, 4), dtype=bool),
            "reward_components_packed": jnp.zeros((2, 4, 3)),
        }
        with pytest.raises(ValueError, match="comp_names"):
            DeviceBreakdown.create(extras)

    def test_learner_rollout_packs_components(self):
        """A rollout over an env whose extras carry reward_components must
        emit the packed form and record comp_names on the learner."""

        def env_step(state, actions):
            key, obs = state
            key, sub = jax.random.split(key)
            reward = -jnp.sum(actions**2, axis=-1)
            new_obs = jax.random.normal(sub, obs.shape)
            done = jnp.zeros(obs.shape[0], dtype=bool)
            extras = {
                "timeout": jnp.zeros(obs.shape[0], dtype=bool),
                "success": jnp.zeros(obs.shape[0], dtype=bool),
                "failure": done,
                "reward_components": {
                    "alive": jnp.ones(obs.shape[0]),
                    "effort": reward,
                },
            }
            return (key, new_obs), new_obs, reward, done, extras

        cfg = PPOConfig(
            num_envs=NUM_ENVS, num_obs=NUM_OBS, num_actions=NUM_ACT,
            horizon_length=3, minibatch_size=NUM_ENVS * 3, mini_epochs=1,
        )
        learner = PPOLearner(cfg, env_step, seed=0)
        ppo = learner.init_state()
        key = jax.random.PRNGKey(0)
        env_state = (key, jnp.zeros((NUM_ENVS, NUM_OBS)))
        obs = jnp.zeros((NUM_ENVS, NUM_OBS))
        _, _, _, metrics, roll_extras = learner.train_iteration(
            ppo, env_state, obs
        )
        assert learner.comp_names == ("alive", "effort")
        assert "reward_components_packed" in roll_extras
        assert roll_extras["reward_components_packed"].shape == (
            3, NUM_ENVS, 2,
        )
        assert "reward_components" not in roll_extras


class TestStrictEpisodeCounting:
    """ep_count_strict: the device reducer's strict-spawn totals feeding
    the eval-matched promotion gate (train.py promote_strict)."""

    def test_strict_counts_accumulate_and_reset(self):
        from dexrobot_isaac_tpu.rl.observer import DeviceBreakdown

        rng = np.random.default_rng(3)
        T, N = 4, 16
        kind = rng.integers(0, 6, size=(T, N))
        strict = rng.integers(0, 2, size=(T, N)).astype(bool)
        extras = {
            "success": jnp.asarray(kind == 0),
            "failure": jnp.asarray(kind == 1),
            "timeout": jnp.asarray(kind == 2),
            "success_strict": jnp.asarray((kind == 0) & strict),
            "done_strict": jnp.asarray((kind <= 2) & strict),
            "reward_components": {
                "alive": jnp.asarray(
                    rng.normal(size=(T, N)).astype(np.float32))
            },
        }
        db = DeviceBreakdown.create(extras)
        db.update(extras)
        db.update(extras)
        s = db.fetch_and_reset()
        expect_succ = int(((kind == 0) & strict).sum()) * 2
        expect_done = int(((kind <= 2) & strict).sum()) * 2
        assert list(np.asarray(s["ep_count_strict"])) == [
            expect_succ, expect_done
        ]
        # window totals zeroed after fetch
        s2 = db.fetch_and_reset()
        assert np.asarray(s2["ep_count_strict"]).sum() == 0

    def test_absent_without_strict_extras(self):
        from dexrobot_isaac_tpu.rl.observer import DeviceBreakdown

        rng = np.random.default_rng(4)
        kind = rng.integers(0, 6, size=(3, 8))
        extras = {
            "success": jnp.asarray(kind == 0),
            "failure": jnp.asarray(kind == 1),
            "timeout": jnp.asarray(kind == 2),
            "reward_components": {
                "alive": jnp.asarray(
                    rng.normal(size=(3, 8)).astype(np.float32))
            },
        }
        db = DeviceBreakdown.create(extras)
        db.update(extras)
        s = db.fetch_and_reset()
        # stays zero (no strict extras): the controller's .get() fallback
        assert np.asarray(s["ep_count_strict"]).sum() == 0
