"""Utility subsystem tests: experiment manager, checkpoints, observer, MJCF."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.rl.checkpoint import load_checkpoint, save_checkpoint
from dexrobot_isaac_tpu.rl.observer import RewardComponentObserver
from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner
from dexrobot_isaac_tpu.utils.experiment import (
    ExperimentManager,
    resolve_checkpoint,
)


class TestExperimentManager:
    def test_run_creation_and_symlinks(self, tmp_path):
        em = ExperimentManager(str(tmp_path), max_train_runs=2)
        d1 = em.create_run("BaseTask", "train", cfg={"a": 1})
        assert os.path.isdir(d1)
        assert os.path.isfile(os.path.join(d1, "config.yaml"))
        assert os.path.isfile(os.path.join(d1, "git_metadata.txt"))
        latest = os.path.join(tmp_path, "runs", "latest_train")
        assert os.path.realpath(latest) == os.path.realpath(d1)

    def test_pruning(self, tmp_path):
        import time

        em = ExperimentManager(str(tmp_path), max_train_runs=2)
        for i in range(4):
            em.create_run("BaseTask", "train", experiment_name=f"BaseTask_train_{i:02d}")
            time.sleep(0.01)
        links = [n for n in os.listdir(tmp_path / "runs")
                 if not n.startswith("latest")]
        assert len(links) == 2, f"workspace pruned to 2: {links}"
        # archive keeps everything
        assert len(os.listdir(tmp_path / "runs_all")) == 4

    def test_resolve_partial_match(self, tmp_path):
        em = ExperimentManager(str(tmp_path))
        d = em.create_run("BaseTask", "train", experiment_name="BaseTask_train_xyz")
        ck = os.path.join(d, "nn", "model.ckpt")
        with open(ck, "wb") as f:
            f.write(b"x" * 10)
        assert os.path.realpath(resolve_checkpoint("xyz", str(tmp_path))) == \
            os.path.realpath(ck)
        assert os.path.realpath(resolve_checkpoint("latest", str(tmp_path))) == \
            os.path.realpath(ck)


class TestCheckpointRoundtrip:
    def test_save_load(self, tmp_path):
        cfg = PPOConfig(num_actions=2, num_obs=3, num_envs=4, units=(8,))
        learner = PPOLearner(cfg, lambda s, a: None, seed=0)
        st = learner.init_state()
        import dataclasses

        st2 = dataclasses.replace(st, lr=jnp.asarray(1.5e-4))
        path = str(tmp_path / "m.ckpt")
        save_checkpoint(path, st2, {"iteration": 7})
        restored = load_checkpoint(path, learner.init_state())
        assert float(restored.lr) == pytest.approx(1.5e-4)
        a = jax.tree.leaves(st2.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestObserver:
    def test_episode_splitting(self):
        class Writer:
            def __init__(self):
                self.scalars = {}

            def add_scalar(self, k, v, step):
                self.scalars[k] = v

        w = Writer()
        obs = RewardComponentObserver(w, log_interval=2)
        T, N = 4, 3
        comps = {
            "alive": np.ones((T, N)),
            "alive_weighted": np.full((T, N), 0.1),
        }
        success = np.zeros((T, N), bool)
        failure = np.zeros((T, N), bool)
        timeout = np.zeros((T, N), bool)
        success[3, 0] = True   # env0 succeeds at t=3 (episode sum = 4)
        failure[1, 1] = True   # env1 fails at t=1 (episode sum = 2)
        obs.process_rollout({
            "reward_components": comps,
            "success": success, "failure": failure, "timeout": timeout,
        })
        key = "reward_breakdown/success/raw/episode/alive"
        assert key in w.scalars and w.scalars[key] == pytest.approx(4.0)
        key = "reward_breakdown/failure/raw/episode/alive"
        assert w.scalars[key] == pytest.approx(2.0)
        assert w.scalars["training/termination_rates/success"] == pytest.approx(0.5)


class TestMJCFLoader:
    def test_parse_minimal_hand(self, tmp_path):
        xml = """
<mujoco model=\"mini\">
  <default><joint damping=\"1\" limited=\"true\"/></default>
  <actuator>
    <position name=\"a1\" joint=\"j1\" kp=\"20\"/>
    <position name=\"a2\" joint=\"j2\" kp=\"30\"/>
  </actuator>
  <worldbody>
    <body name=\"base\" pos=\"0 0 0.1\">
      <joint name=\"j1\" type=\"slide\" axis=\"0 0 1\" range=\"-1 1\"/>
      <inertial mass=\"0.5\" pos=\"0 0 0\" diaginertia=\"1e-3 1e-3 1e-3\"/>
      <geom type=\"sphere\" size=\"0.02\"/>
      <body name=\"link\" pos=\"0.1 0 0\">
        <joint name=\"j2\" type=\"hinge\" axis=\"0 1 0\" range=\"0 1.3\"/>
        <inertial mass=\"0.1\" pos=\"0.05 0 0\" diaginertia=\"1e-4 1e-4 1e-4\"/>
        <geom type=\"capsule\" fromto=\"0 0 0 0.1 0 0\" size=\"0.01\"/>
        <site name=\"tip\" pos=\"0.1 0 0\"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""
        path = tmp_path / "mini.xml"
        path.write_text(xml)
        from dexrobot_isaac_tpu.models.mjcf import load_mjcf

        m = load_mjcf(str(path))
        assert m.body_names == ["base", "link"]
        assert m.parent.tolist() == [-1, 0]
        assert m.joint_type.tolist() == [0, 1]  # slide, hinge
        np.testing.assert_allclose(m.stiffness, [20.0, 30.0])
        np.testing.assert_allclose(m.damping, [1.0, 1.0])
        np.testing.assert_allclose(m.lower_limit, [-1.0, 0.0])
        np.testing.assert_allclose(m.upper_limit, [1.0, 1.3])
        assert m.site_names == ["tip"]
        assert len(m.sphere_radius) == 4  # 1 sphere + 3 capsule spheres
        np.testing.assert_allclose(m.mass, [0.5, 0.1])
