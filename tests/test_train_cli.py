"""End-to-end CLI test: train -> checkpoint -> resume -> evaluate.

Exercises the reference's primary workflows (train.py:123-421 semantics)
through the real entry point on tiny shapes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def runs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("runs")
    os.environ["DEXHAND_RUNS_DIR"] = str(d)
    yield str(d)
    os.environ.pop("DEXHAND_RUNS_DIR", None)


BASE_ARGS = [
    "device=cpu", "task=BaseTask", "numEnvs=4", "env.episodeLength=8",
    "sim.substeps=1", "sim.physics_steps_per_control=2",
    "train.logging.noLogFile=true",
    "train.params.config.save_frequency=2",
    "train.params.network.units=[32,32]",
    "train.params.config.horizon_length=4",
    "train.params.config.minibatch_size=8",
    "train.params.config.mini_epochs=1",
]


class TestTrainCLI:
    def test_train_creates_checkpoints(self, runs_dir):
        import train as train_mod

        rc = train_mod.main(BASE_ARGS + ["maxIterations=2"])
        assert rc == 0
        runs_all = os.path.join(runs_dir, "runs_all")
        run = sorted(os.listdir(runs_all))[-1]
        nn = os.path.join(runs_all, run, "nn")
        files = os.listdir(nn)
        assert "latest.ckpt" in files
        assert any(f.startswith("BaseTask_ep") for f in files)
        assert os.path.isfile(os.path.join(runs_all, run, "config.yaml"))

    def test_resume_from_latest(self, runs_dir):
        import train as train_mod

        rc = train_mod.main(BASE_ARGS + ["maxIterations=1", "checkpoint=latest"])
        assert rc == 0

    def test_evaluate_checkpoint(self, runs_dir):
        import train as train_mod

        rc = train_mod.main(
            BASE_ARGS + ["test=true", "checkpoint=latest", "testGamesNum=4"]
        )
        assert rc == 0

    def test_viewer_mode(self, runs_dir):
        """test=true viewer=true drives the interactive ViewerController
        (env.viewer is a live config key: renderer + pacing + callbacks)."""
        import train as train_mod

        rc = train_mod.main(
            BASE_ARGS + ["test=true", "viewer=true", "testGamesNum=2"]
        )
        assert rc == 0

    def test_resume_restores_curriculum_difficulty(self, runs_dir):
        """Checkpoints persist the reset-curriculum difficulty and a resumed
        run continues there instead of restarting at initial_difficulty."""
        import train as train_mod
        from dexrobot_isaac_tpu.rl.checkpoint import load_checkpoint_meta

        cur = [
            "task.curriculum.enabled=true",
            "task.curriculum.initial_difficulty=0.55",
            # promotion threshold > 1 so the difficulty never moves
            "task.curriculum.promote_success_rate=2.0",
        ]
        rc = train_mod.main(BASE_ARGS + ["maxIterations=2"] + cur)
        assert rc == 0
        runs_all = os.path.join(runs_dir, "runs_all")
        run = sorted(os.listdir(runs_all))[-1]
        meta = load_checkpoint_meta(
            os.path.join(runs_all, run, "nn", "latest.ckpt")
        )
        assert abs(float(meta["difficulty"]) - 0.55) < 1e-9
        # resume with a different initial_difficulty: the saved value wins
        rc = train_mod.main(BASE_ARGS + [
            "maxIterations=1", "checkpoint=latest",
            "task.curriculum.enabled=true",
            "task.curriculum.initial_difficulty=0.1",
            "task.curriculum.promote_success_rate=2.0",
        ])
        assert rc == 0
        run2 = sorted(os.listdir(runs_all))[-1]
        meta2 = load_checkpoint_meta(
            os.path.join(runs_all, run2, "nn", "latest.ckpt")
        )
        assert abs(float(meta2["difficulty"]) - 0.55) < 1e-9

    def test_chunked_dispatch(self, runs_dir):
        """dispatch_chunk > 1 scans iterations inside one program; logging,
        checkpoints, and the breakdown reducer operate at chunk granularity."""
        import train as train_mod

        rc = train_mod.main(BASE_ARGS + [
            "maxIterations=4",
            "train.params.config.dispatch_chunk=2",
            "train.params.config.log_interval=2",
        ])
        assert rc == 0
        runs_all = os.path.join(runs_dir, "runs_all")
        run = sorted(os.listdir(runs_all))[-1]
        files = os.listdir(os.path.join(runs_all, run, "nn"))
        assert "BaseTask_ep4.ckpt" in files
