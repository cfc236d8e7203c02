#!/usr/bin/env python
"""CLI entry point: train or evaluate PPO policies on DexHand TPU envs.

Parity with the reference's `train.py` (train.py:123-421): `python train.py
key=value ...` with alias expansion, experiment directory + config/git
snapshot, seeding, TensorBoard + reward-breakdown logging, checkpoint
save/resume with `latest` resolution, test mode with finite/indefinite game
counts and checkpoint hot-reload. The rl_games Runner is replaced by the
in-repo jitted PPO learner (dexrobot_isaac_tpu/rl/ppo.py).

Examples:
    python train.py task=BaseTask numEnvs=1024 maxIterations=1000
    python train.py task=BlindGrasping numEnvs=4096
    python train.py test=true checkpoint=latest task=BlindGrasping
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    from dexrobot_isaac_tpu.utils.config import (
        get_by_path,
        load_config,
        usage_text,
    )

    if any(a in ("--help", "-h", "help") for a in argv):
        print(usage_text())
        return 0

    cfg = load_config(argv)

    # device selection must happen before jax initializes a backend
    device = str(cfg.get("device", "tpu")).lower()
    if device.startswith("cpu"):
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if device.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    # multi-host: must run before any backend use so all processes join the
    # same global device mesh (parallel/distributed.py launch contract)
    from dexrobot_isaac_tpu.parallel.distributed import maybe_init_distributed

    multi_host = maybe_init_distributed()
    is_main = jax.process_index() == 0

    from dexrobot_isaac_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.rl.checkpoint import (
        HotReloadMonitor,
        load_checkpoint,
        save_checkpoint,
    )
    from dexrobot_isaac_tpu.rl.observer import RewardComponentObserver
    from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner
    from dexrobot_isaac_tpu.utils.experiment import (
        ExperimentManager,
        resolve_checkpoint,
    )
    from dexrobot_isaac_tpu.utils.logging import setup_logging

    test_mode = bool(get_by_path(cfg, "train.test", False))
    mode = "test" if test_mode else "train"
    task_name = get_by_path(cfg, "task.name", "BaseTask")

    # run-dir / log-file / TB / checkpoint writes are process-0 only in
    # multi-host jobs; other processes work out of a scratch dir
    if is_main:
        exp = ExperimentManager(
            base_dir=os.environ.get("DEXHAND_RUNS_DIR", "."),
            max_train_runs=int(get_by_path(cfg, "train.experiment.maxTrainRuns", 10)),
            max_test_runs=int(get_by_path(cfg, "train.experiment.maxTestRuns", 10)),
        )
        run_dir = exp.create_run(
            task_name, mode,
            experiment_name=get_by_path(cfg, "train.logging.experimentName"),
            cfg=cfg,
        )
    else:
        import tempfile

        run_dir = tempfile.mkdtemp(prefix="dexhand_nonmain_")
    log_file = (
        None if get_by_path(cfg, "train.logging.noLogFile", False) or not is_main
        else os.path.join(run_dir, f"{mode}.log")
    )
    logger = setup_logging(get_by_path(cfg, "train.logging.logLevel", "info"), log_file)
    if multi_host:
        logger.info(
            f"Multi-host: process {jax.process_index()}/{jax.process_count()}"
            f" ({jax.local_device_count()} local / "
            f"{jax.device_count()} global devices)"
        )
    logger.info(f"Run directory: {run_dir}")
    logger.info(f"Task: {task_name} | mode: {mode} | devices: {jax.devices()}")

    seed = int(get_by_path(cfg, "train.seed", 42))
    np.random.seed(seed)

    env = make_env(cfg, seed=seed)
    logger.info(
        f"Env: {env.num_envs} envs, obs {env.num_obs}"
        + (f" (+{env.num_states} critic states)" if env.num_states else "")
        + f", actions {env.num_actions}, control_dt {env.control_dt:.3f}s"
    )

    tp = get_by_path(cfg, "train.params.config", {}) or {}
    ppo_cfg = PPOConfig(
        num_actions=env.num_actions,
        num_obs=env.num_obs,
        num_states=env.num_states,
        num_envs=env.num_envs,
        horizon_length=int(tp.get("horizon_length", 16)),
        minibatch_size=tp.get("minibatch_size"),
        mini_epochs=int(tp.get("mini_epochs", 4)),
        gamma=float(tp.get("gamma", 0.99)),
        tau=float(tp.get("tau", 0.95)),
        learning_rate=float(tp.get("learning_rate", 3e-4)),
        lr_schedule=str(tp.get("lr_schedule", "adaptive")),
        schedule_type=str(tp.get("schedule_type", "standard")),
        kl_threshold=float(tp.get("kl_threshold", 0.008)),
        lr_floor=float(tp.get("lr_floor", 1e-6)),
        lr_ceiling=float(tp.get("lr_ceiling", 1e-2)),
        e_clip=float(tp.get("e_clip", 0.2)),
        grad_norm=float(tp.get("grad_norm", 1.0)),
        critic_coef=float(tp.get("critic_coef", 4.0)),
        entropy_coef=float(tp.get("entropy_coef", 0.0)),
        bounds_loss_coef=float(tp.get("bounds_loss_coef", 1e-4)),
        clip_value=bool(tp.get("clip_value", True)),
        normalize_input=bool(tp.get("normalize_input", True)),
        normalize_value=bool(tp.get("normalize_value", True)),
        normalize_advantage=bool(tp.get("normalize_advantage", True)),
        value_bootstrap=bool(tp.get("value_bootstrap", True)),
        value_clip_sigma=(
            float(tp["value_clip_sigma"])
            if tp.get("value_clip_sigma") is not None else None
        ),
        kl_skip_factor=(
            float(tp["kl_skip_factor"])
            if tp.get("kl_skip_factor") is not None else None
        ),
        units=tuple(get_by_path(cfg, "train.params.network.units", [512, 256, 128])),
        network_dtype=str(get_by_path(cfg, "train.params.network.dtype", "float32")),
        reward_shaper_scale=float(tp.get("reward_shaper_scale", 1.0)),
        shuffle=str(tp.get("shuffle", "permutation")),
    )
    n_devices = len(jax.devices())
    distributed = n_devices > 1 and env.num_envs % n_devices == 0
    axis = None
    if distributed:
        from dexrobot_isaac_tpu.parallel.mesh import DATA_AXIS

        axis = DATA_AXIS
        env.axis_name = DATA_AXIS
        logger.info(
            f"Distributed: sharding {env.num_envs} envs over {n_devices} "
            f"devices via shard_map"
        )
    # Fused single-Pallas-kernel env step (envs/fused_step.py): the whole
    # control step — action pipeline, physics, obs, task, termination,
    # rewards, masked auto-reset — in one kernel instead of ~140 XLA
    # kernels. TPU-only (the kernel is a Pallas TPU program) and
    # training-only (eval/video paths read EnvState internals). Composes
    # with the distributed path: pallas_call cannot be GSPMD-partitioned,
    # so shard_map runs the kernel PER SHARD on its local batch (the kernel
    # grid is derived from the runtime batch size) with explicit pmean
    # collectives around it — multi-chip keeps the single-kernel step.
    # train.params.config.fused: auto (default) | on | off.
    fused = None
    # YAML parses bare off/on as booleans, so normalize: False/"off"/"0"
    # disable, True/"on"/"1" force, "auto" (default) enables when supported
    fused_raw = tp.get("fused", "auto")
    fused_mode = {False: "off", True: "on"}.get(
        fused_raw, str(fused_raw).lower()
    )
    if fused_mode in ("false", "0"):
        fused_mode = "off"
    elif fused_mode in ("true", "1"):
        fused_mode = "on"
    if (not test_mode and fused_mode != "off"
            and jax.default_backend() == "tpu"):
        try:
            fused = env.make_fused()
        except Exception as e:
            if fused_mode == "on":
                raise
            logger.info(f"Fused env-step unavailable ({e}); XLA step")
    learner = PPOLearner(
        ppo_cfg, fused.step_fn if fused is not None else env.step_fn,
        seed=seed, axis_name=axis,
    )
    if fused is not None:
        learner.comp_names = fused.comp_names
        env._fused = fused
        logger.info(f"Fused env-step kernel enabled (block {fused.block})")
    ppo = learner.init_state()

    ckpt_spec = get_by_path(cfg, "train.checkpoint")
    resume_meta = None
    if ckpt_spec:
        from dexrobot_isaac_tpu.rl.checkpoint import load_checkpoint_meta

        path = resolve_checkpoint(
            str(ckpt_spec), base_dir=os.environ.get("DEXHAND_RUNS_DIR", ".")
        )
        logger.info(f"Loading checkpoint: {path}")
        ppo = load_checkpoint(path, ppo)
        resume_meta = load_checkpoint_meta(path)

    if test_mode:
        if multi_host:
            # fail fast (reference philosophy): eval is a single-program
            # loop over the global batch; run it as one process
            raise RuntimeError(
                "test=true is single-process: launch eval without the "
                "multi-host coordinator env vars"
            )
        if distributed:
            env.axis_name = None  # evaluation runs single-program
        return run_test(cfg, env, learner, ppo, run_dir, logger)
    return run_train(cfg, env, learner, ppo, run_dir, logger, distributed,
                     resume_meta=resume_meta)


def run_train(cfg, env, learner, ppo, run_dir, logger, distributed=False,
              resume_meta=None) -> int:
    import jax
    import numpy as np

    from dexrobot_isaac_tpu.rl.checkpoint import save_checkpoint
    from dexrobot_isaac_tpu.rl.observer import (
        DeviceBreakdown,
        RewardComponentObserver,
    )
    from dexrobot_isaac_tpu.utils.config import get_by_path

    is_main = jax.process_index() == 0
    writer = None
    if is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(run_dir, "tb"))
        except Exception:
            writer = None
    observer = RewardComponentObserver(
        writer, int(get_by_path(cfg, "train.logging.rewardLogInterval", 100))
    )

    max_iters = int(get_by_path(cfg, "train.maxIterations", 10000))
    save_freq = int(get_by_path(cfg, "train.params.config.save_frequency", 100))
    # every logging window forces a device sync (and on the remote-TPU tunnel
    # each sync is a round trip that stalls the dispatch pipeline): logging
    # every iteration was measured to cost ~2x at 8192 envs even with the
    # device-side breakdown reducer. 10 keeps the console readable at full
    # speed; the reference's per-iteration print is an rl_games artifact.
    log_interval = max(1, int(get_by_path(cfg, "train.params.config.log_interval", 10)))
    task_name = get_by_path(cfg, "task.name", "BaseTask")
    nn_dir = os.path.join(run_dir, "nn")

    # dispatch chunking: scan `chunk` train iterations inside one jitted
    # program, so the remote-TPU host round trip is paid once per chunk
    # (distributed: the scan runs inside the shard_map body)
    chunk = max(1, int(get_by_path(cfg, "train.params.config.dispatch_chunk", 1)))
    if chunk > 1 and max_iters % chunk:
        # the scan length is compiled in: every dispatch executes a full
        # chunk, so round the budget up rather than misreport iterations
        max_iters = (max_iters // chunk + 1) * chunk
        logger.info(
            f"maxIterations rounded up to {max_iters} "
            f"(multiple of dispatch_chunk={chunk})"
        )

    fused = getattr(env, "_fused", None)
    if distributed:
        from dexrobot_isaac_tpu.parallel.distributed import (
            make_sharded_reset, make_sharded_train_step,
        )
        from dexrobot_isaac_tpu.parallel.mesh import make_mesh, replicate_pytree

        # per-shard env construction: every process materializes only its
        # local slice of the global env batch (multi-host safe), sampling
        # keys decorrelated by global shard index
        mesh = make_mesh()
        env_state, obs = make_sharded_reset(env, mesh)(
            jax.random.key(env._seed)
        )
        if fused is not None:
            env_state = jax.jit(fused.pack)(env_state)
        train_step = make_sharded_train_step(
            learner, mesh, env_state, obs, chunk=chunk
        )
        ppo = replicate_pytree(ppo, mesh)
    else:
        # reset runs with axis_name unset (it executes outside shard_map)
        saved_axis, env.axis_name = env.axis_name, None
        env_state, obs = env._reset_jit(jax.random.key(env._seed))
        env.axis_name = saved_axis
        if fused is not None:
            # re-pack EnvState into the fused kernel's lane-major row layout
            env_state = jax.jit(fused.pack)(env_state)
        train_step = (
            learner.make_chunked_train_step(chunk) if chunk > 1
            else learner.train_iteration
        )

    best_reward = -np.inf
    t_start = time.time()
    window_t, window_it = t_start, 0
    steps_per_iter = learner.cfg.horizon_length * env.num_envs

    # curriculum controller (beyond-reference capability): promote the reset
    # randomization difficulty when the windowed success rate clears the
    # threshold. The difficulty is a runtime scalar leaf of EnvState, so
    # promotion is a host-side leaf replacement -- no recompilation.
    import dataclasses as _dc

    import jax.numpy as jnp
    cur_cfg = get_by_path(cfg, "task.curriculum", {}) or {}
    cur_enabled = bool(cur_cfg.get("enabled", False))
    difficulty = (
        float(cur_cfg.get("initial_difficulty", 0.0)) if cur_enabled else 1.0
    )
    if cur_enabled and resume_meta and "difficulty" in resume_meta:
        # resumed run continues at the saved difficulty instead of
        # restarting the curriculum from initial_difficulty
        difficulty = float(resume_meta["difficulty"])
        env_state = _dc.replace(
            env_state, difficulty=jnp.asarray(difficulty, jnp.float32)
        )
        logger.info(f"Resumed curriculum difficulty: {difficulty:.2f}")
    cur_inc = float(cur_cfg.get("increment", 0.15))
    cur_thresh = float(cur_cfg.get("promote_success_rate", 0.3))
    cur_min_episodes = int(cur_cfg.get("min_episodes", 500))
    # eval-matched gating: promote on the success rate of episodes spawned
    # EXACTLY at the current difficulty (the band's pinned top fraction)
    # instead of the whole spawn band — the band's easier spawns otherwise
    # inflate the windowed rate and promote settings the policy has not
    # mastered at the distribution eval uses (the BlindGrasping
    # threshold-margin lesson; requires the task to report
    # spawn_difficulty, e.g. BoxStacking band_top_fraction > 0)
    cur_strict = bool(cur_cfg.get("promote_strict", False))
    cur_succ = cur_done = cur_nonstrict_done = 0
    # promotion cooldown: only count episodes SPAWNED at the current
    # difficulty. Without it, the thousands of in-flight episodes spawned
    # at the previous (easier) difficulty finish within seconds of a
    # promotion and immediately clear the threshold again — measured as a
    # 0 -> 0.45 promotion cascade inside ~80 iterations that overshot the
    # policy's actual mastery and stalled the run. An episode spawned just
    # before a promotion can last max_episode_length more steps, i.e.
    # ceil(episodeLength / horizon) iterations.
    cur_cooldown_iters = (
        int(get_by_path(cfg, "env.episodeLength", 500))
        + learner.cfg.horizon_length - 1
    ) // learner.cfg.horizon_length + 1
    cur_cooldown_until = 0
    breakdown = None  # DeviceBreakdown, created from the first iteration's extras

    # profiling (reference exposes only Isaac's overlay; here a real trace):
    # train.profile=N captures a jax profiler trace of iterations 2..2+N
    profile_iters = int(get_by_path(cfg, "train.profile", 0) or 0)

    profiling = False
    for it_prev in range(0, max_iters, chunk):
        it = min(it_prev + chunk, max_iters)

        def crossed(interval):
            return it_prev // interval != it // interval

        # start only after at least one executed dispatch so the trace never
        # contains the fresh-program compile
        if profile_iters and not profiling and it_prev >= 1:
            jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            profiling = True
            profile_start = it_prev
        if profile_iters and profiling and it >= profile_start + profile_iters:
            jax.profiler.stop_trace()
            profiling = False
            profile_iters = 0
            logger.info(f"Profiler trace written to {run_dir}/profile")
        ppo, env_state, obs, metrics, roll_extras = train_step(
            ppo, env_state, obs
        )
        if chunk > 1:
            # stacked (chunk, T, N, ...) -> (chunk*T, N, ...) chronological;
            # metrics: keep the final iteration's values
            roll_extras = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), roll_extras
            )
            metrics = jax.tree.map(lambda x: x[-1], metrics)
        # fold this chunk's extras into the device-resident breakdown
        # reducer: one async dispatch, no host transfer (the full (T, N, C)
        # extras fetch every iteration throttled training ~10x over the
        # remote-TPU tunnel)
        if breakdown is None:
            breakdown = DeviceBreakdown.create(
                roll_extras, comp_names=getattr(learner, "comp_names", None)
            )
        breakdown.update(roll_extras)
        if crossed(log_interval) or it == max_iters:
            m = {k: float(v) for k, v in metrics.items()}
            if not (np.isfinite(m["reward_mean"]) and np.isfinite(m["kl"])):
                # fail fast (reference philosophy): a value-bootstrap
                # runaway (returns -> value_rms variance -> denormalized
                # bootstrap reward feedback) turns non-finite within a few
                # hundred iterations; training past it is wasted compute.
                # outside nn/ so checkpoint=latest can never resolve to the
                # diverged state
                save_checkpoint(
                    os.path.join(run_dir, "diverged.ckpt"), ppo,
                    {"iteration": it, "difficulty": difficulty},
                )
                logger.error(
                    f"Non-finite training metrics at iter {it} "
                    f"(reward_mean={m['reward_mean']}, kl={m['kl']}): "
                    "aborting. Resume from the last finite checkpoint with "
                    "a lower train.params.config.lr_ceiling."
                )
                return 1
            # windowed rate: the first execution of a fresh program pays a
            # multi-minute device-side kernel compile; a cumulative average
            # would understate steady-state throughput for hours
            now = time.time()
            sps = (it - window_it) * steps_per_iter / max(now - window_t, 1e-9)
            window_t, window_it = now, it
            logger.info(
                f"iter {it}/{max_iters} reward {m['reward_mean']:+.3f} "
                f"kl {m['kl']:.4f} lr {m['lr']:.2e} | {sps:,.0f} env-steps/s"
                + (f" | difficulty {difficulty:.2f}" if cur_enabled else "")
            )
            if writer:
                step = it * steps_per_iter
                for k, v in m.items():
                    writer.add_scalar(f"training/{k}", v, step)
                writer.add_scalar("performance/env_steps_per_s", sps, step)
                if cur_enabled:
                    writer.add_scalar("training/difficulty", difficulty, step)
            summary = breakdown.fetch_and_reset(
                global_step=it * steps_per_iter
            )
            observer.process_device_window(summary)

            if cur_enabled and difficulty < 1.0:
                ep_count = np.asarray(summary["ep_count"])
                if it < cur_cooldown_until:
                    pass  # episodes still spawned at the previous difficulty
                elif cur_strict:
                    strict = np.asarray(
                        summary.get("ep_count_strict", [0, 0])
                    )
                    cur_succ += int(strict[0])
                    cur_done += int(strict[1])
                    cur_nonstrict_done += int(ep_count.sum())
                    if (
                        cur_done == 0
                        and cur_nonstrict_done >= 4 * cur_min_episodes
                    ):
                        # promote_strict needs the task to report
                        # spawn_difficulty (e.g. band_top_fraction > 0);
                        # without it the strict counters stay zero forever
                        # and the curriculum would silently never promote
                        logger.warning(
                            "curriculum.promote_strict is set but "
                            f"{cur_nonstrict_done} episodes completed with "
                            "zero strict-spawn counters — the task likely "
                            "never reports spawn_difficulty "
                            "(success_strict/done_strict); falling back to "
                            "non-strict promotion counting"
                        )
                        cur_strict = False
                        cur_succ = int(ep_count[0])
                        cur_done = int(ep_count.sum())
                else:
                    cur_succ += int(ep_count[0])
                    cur_done += int(ep_count.sum())
                if cur_done >= cur_min_episodes:
                    rate = cur_succ / cur_done
                    if rate >= cur_thresh:
                        difficulty = min(1.0, difficulty + cur_inc)
                        env_state = _dc.replace(
                            env_state,
                            difficulty=jnp.asarray(difficulty, jnp.float32),
                        )
                        logger.info(
                            f"Curriculum: success rate {rate:.2f} over "
                            f"{cur_done} episodes -> difficulty {difficulty:.2f}"
                        )
                        cur_cooldown_until = it + cur_cooldown_iters
                    cur_succ = cur_done = 0

            if m["reward_mean"] > best_reward and it >= int(
                get_by_path(cfg, "train.params.config.save_best_after", 1)
            ):
                best_reward = m["reward_mean"]
                if is_main:
                    save_checkpoint(
                        os.path.join(nn_dir, f"{task_name}_best.ckpt"), ppo,
                        {"iteration": it, "reward": best_reward,
                         "difficulty": difficulty},
                    )
        if (crossed(save_freq) or it == max_iters) and is_main:
            path = os.path.join(nn_dir, f"{task_name}_ep{it}.ckpt")
            meta = {"iteration": it, "difficulty": difficulty}
            save_checkpoint(path, ppo, meta)
            save_checkpoint(os.path.join(nn_dir, "latest.ckpt"), ppo, meta)
            logger.info(f"Saved checkpoint: {path}")
    if writer:
        writer.close()
    logger.info("Training complete")
    return 0


def run_test(cfg, env, learner, ppo, run_dir, logger) -> int:
    """Policy evaluation (reference test mode, train.py:341-407): run the
    deterministic player for testGamesNum episodes (0 = indefinite) with
    checkpoint hot-reload."""
    import jax
    import numpy as np

    from dexrobot_isaac_tpu.rl.checkpoint import HotReloadMonitor, load_checkpoint
    from dexrobot_isaac_tpu.utils.config import get_by_path
    from dexrobot_isaac_tpu.utils.experiment import resolve_checkpoint

    games_target = int(get_by_path(cfg, "train.testGamesNum", 100))
    reload_interval = float(get_by_path(cfg, "train.reloadInterval", 30))

    ppo_box = {"state": ppo}
    ckpt_spec = get_by_path(cfg, "train.checkpoint")
    monitor = None
    if ckpt_spec:
        path = resolve_checkpoint(
            str(ckpt_spec), base_dir=os.environ.get("DEXHAND_RUNS_DIR", ".")
        )

        def on_reload(p):
            ppo_box["state"] = load_checkpoint(p, ppo_box["state"])
            logger.info(f"Reloaded weights from {p}")

        monitor = HotReloadMonitor(path, on_reload, reload_interval)
        monitor.start()

    # graphics sidecar: render from returned states (off the hot loop).
    # viewer=true adds the interactive controller (keyboard semantics +
    # view modes, graphics/viewer.py) and real-time pacing to control_dt
    # (reference render path, dexhand_base.py:999-1067).
    video_record = bool(get_by_path(cfg, "env.videoRecord", False))
    video_stream = bool(get_by_path(cfg, "env.videoStream", False))
    viewer_on = bool(get_by_path(cfg, "env.viewer", False))
    renderer = recorder = streamer = viewer = None
    rand_actions = {"on": False}
    reset_request = {"env": None}
    if video_record or video_stream or viewer_on:
        from dexrobot_isaac_tpu.graphics.renderer import SceneRenderer

        resolution = get_by_path(cfg, "env.video.resolution", [640, 480])
        renderer = SceneRenderer(
            env.comps.model, resolution=tuple(resolution),
            box_size=env.comps.engine.params.box_size,
        )
        if video_record:
            from dexrobot_isaac_tpu.graphics.video import VideoRecorder

            out_dir = get_by_path(cfg, "env.video.outputDir") or os.path.join(
                run_dir, "videos"
            )
            recorder = VideoRecorder(
                out_dir,
                max_duration_seconds=float(
                    get_by_path(cfg, "env.video.maxDurationSeconds", 60)
                ),
            )
            recorder.finalize_fps(env.control_dt)
            recorder.start_episode()
        if video_stream:
            from dexrobot_isaac_tpu.graphics.streamer import HTTPVideoStreamer

            streamer = HTTPVideoStreamer(
                host=get_by_path(cfg, "env.stream.host", "127.0.0.1"),
                port=int(get_by_path(cfg, "env.stream.port", 8080)),
            )
            streamer.start()
    if viewer_on:
        from dexrobot_isaac_tpu.graphics.viewer import ViewerController

        def on_toggle_random():
            rand_actions["on"] = not rand_actions["on"]
            logger.info(f"Random actions: {rand_actions['on']}")

        viewer = ViewerController(
            renderer, env.num_envs,
            # E key: masked single-env reset, applied at the next loop step
            on_reset_env=lambda i: reset_request.__setitem__("env", i),
            on_toggle_random_actions=on_toggle_random,
            streamer=streamer,
            box2_size=env.comps.engine.params.box2_size,
        )

    # evaluation always runs the FULL reset distribution: with a curriculum
    # configured, initial_difficulty would otherwise silently evaluate on
    # the easiest ranges and inflate success rates. Set before the first
    # reset so it bakes into the trace (difficulty starts at this constant).
    if env.comps.initial_difficulty != 1.0:
        env.comps.initial_difficulty = 1.0
        logger.info("Eval: curriculum difficulty forced to 1.0 "
                    "(full reset distribution)")
    import jax.numpy as jnp

    step_jit = jax.jit(env.step_fn)
    act_jit = jax.jit(learner.act_deterministic)
    env_state, obs = env._reset_jit(jax.random.key(env._seed))
    np_rng = np.random.default_rng(env._seed)

    if viewer is not None:
        # masked single-env reset for the viewer's E key (reference
        # viewer_controller.py E-key semantics): fresh reset values merged
        # into only the selected env's slice of the state
        def _masked_reset(state, key, env_idx):
            fresh, _ = env.reset_fn(key)
            mask = jnp.arange(env.num_envs) == env_idx

            def merge(new, cur):
                if getattr(new, "ndim", 0) >= 1 and \
                        new.shape[0] == env.num_envs:
                    m = mask.reshape(
                        (env.num_envs,) + (1,) * (new.ndim - 1)
                    )
                    return jnp.where(m, new, cur)
                return cur

            return jax.tree.map(merge, fresh, state)

        masked_reset = jax.jit(_masked_reset)

    games = 0
    returns = []
    ep_ret = np.zeros(env.num_envs)
    succ = fail = tout = 0
    # per-reason termination breakdown (reference per-criterion tracking,
    # termination_manager.py:160-266): the XLA step path's extras carry
    # episode-scoped `{success,failure}_reason_<name>` flags; counted at
    # the done step they attribute each terminal to its fired criteria.
    reason_counts: dict = {}
    try:
        while games_target == 0 or games < games_target:
            t_frame = time.time()
            if viewer is not None and reset_request["env"] is not None:
                env_state = masked_reset(
                    env_state,
                    jax.random.key(int(np_rng.integers(2**31))),
                    reset_request["env"],
                )
                logger.info(f"Viewer: reset env {reset_request['env']}")
                reset_request["env"] = None
            if rand_actions["on"]:
                actions = jnp.asarray(
                    np_rng.uniform(
                        -1, 1, (env.num_envs, env.num_actions)
                    ),
                    dtype=jnp.float32,
                )
            else:
                actions = act_jit(ppo_box["state"], obs)
            env_state, obs, rew, done, extras = step_jit(env_state, actions)
            if viewer is not None:
                kin = env.comps.engine.kinematics(env_state.physics, env._spawn)
                frame = viewer.render(
                    kin, env_state.physics,
                    body_contact_force=env_state.body_contact_force,
                    has_box=env.comps.engine.params.has_box,
                )
                if recorder is not None:
                    recorder.add_frame(frame)
            elif renderer is not None:
                import numpy as _np

                kin = env.comps.engine.kinematics(env_state.physics, env._spawn)
                frame = renderer.render_state(
                    _np.asarray(kin.body_pos[0]), _np.asarray(kin.body_quat[0]),
                    box_pos=(_np.asarray(env_state.physics.box_pos[0])
                             if env.comps.engine.params.has_box else None),
                    box_quat=_np.asarray(env_state.physics.box_quat[0]),
                    contact_force_bodies=_np.linalg.norm(
                        _np.asarray(env_state.body_contact_force[0]), axis=-1
                    ),
                    title=f"games {games}",
                    box2_pos=(
                        _np.asarray(env_state.physics.box2_pos[0])
                        if env_state.physics.box2_pos is not None else None
                    ),
                    box2_quat=(
                        _np.asarray(env_state.physics.box2_quat[0])
                        if env_state.physics.box2_quat is not None else None
                    ),
                    box2_size=env.comps.engine.params.box2_size,
                )
                if recorder is not None:
                    recorder.add_frame(frame)
                if streamer is not None:
                    streamer.add_frame(frame)
            if viewer is not None:
                # real-time pacing to control_dt (reference sync_frame_time
                # analog, dexhand_base.py:1046-1064)
                lag = env.control_dt - (time.time() - t_frame)
                if lag > 0:
                    time.sleep(lag)
            rew_h = np.asarray(rew)
            done_h = np.asarray(done)
            ep_ret += rew_h
            if done_h.any():
                idx = np.nonzero(done_h)[0]
                returns.extend(ep_ret[idx].tolist())
                ep_ret[idx] = 0.0
                games += len(idx)
                succ += int(np.asarray(extras["success"])[idx].sum())
                fail += int(np.asarray(extras["failure"])[idx].sum())
                tout += int(np.asarray(extras["timeout"])[idx].sum())
                for k, v in extras.items():
                    if k.startswith(("success_reason_", "failure_reason_")):
                        reason_counts[k] = reason_counts.get(k, 0) + int(
                            np.asarray(v)[idx].sum()
                        )
                logger.info(
                    f"games {games}/{games_target or 'inf'} "
                    f"avg return {np.mean(returns):.2f} "
                    f"success {succ} failure {fail} timeout {tout}"
                )
    except KeyboardInterrupt:
        logger.info("Interrupted")
    finally:
        if monitor:
            monitor.stop()
        if viewer is not None:
            viewer.close()
        if recorder is not None:
            recorder.stop_episode()
            recorder.close()
        if streamer is not None:
            streamer.stop()
    if returns:
        logger.info(
            f"Evaluation: {len(returns)} episodes, avg return "
            f"{np.mean(returns):.3f}, success rate "
            f"{succ / max(1, len(returns)):.3f}"
        )
        if reason_counts:
            n_ep = max(1, len(returns))
            split = ", ".join(
                f"{k.replace('_reason_', ':')} {v / n_ep:.3f}"
                for k, v in sorted(reason_counts.items()) if v
            )
            logger.info(f"Termination reasons: {split or 'none fired'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
