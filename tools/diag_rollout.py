"""Diagnostic rollout: drive a checkpoint policy on the CPU XLA step path
and attribute terminations per criterion, with task-state summaries.

Usage: python tools/diag_rollout.py <ckpt_dir_or_file> [task] [difficulty]
       [num_envs] [steps]

Runs `num_envs` envs for `steps` control steps at the given curriculum
difficulty (training-time attribution needs the TRAINING difficulty, not
eval's forced 1.0) and prints: per-reason termination counts, platform
drift / box distance percentiles at failure, and at-pose statistics.
"""

import os
import sys

# default CPU (never contend with a live TPU job by accident);
# DEXHAND_DIAG_DEVICE=tpu runs on the chip when it is free
_DEV = os.environ.get("DEXHAND_DIAG_DEVICE", "cpu")
if _DEV == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    if _DEV == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.rl.checkpoint import load_checkpoint
    from dexrobot_isaac_tpu.rl.ppo import PPOConfig, PPOLearner
    from dexrobot_isaac_tpu.utils.config import load_config
    from dexrobot_isaac_tpu.utils.experiment import resolve_checkpoint

    ckpt = resolve_checkpoint(sys.argv[1])
    task = sys.argv[2] if len(sys.argv) > 2 else "BoxStacking"
    difficulty = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    steps = int(sys.argv[5]) if len(sys.argv) > 5 else 600

    cfg = load_config([f"task={task}", f"numEnvs={n}", "device=cpu"])
    env = make_env(cfg, seed=7)
    env.comps.initial_difficulty = difficulty

    pcfg = PPOConfig(
        num_actions=env.num_actions, num_obs=env.num_obs,
        num_states=env.num_states, num_envs=n,
    )
    learner = PPOLearner(pcfg, env.step_fn, seed=0)
    ppo = load_checkpoint(ckpt, learner.init_state())
    print(f"loaded {ckpt}; task={task} difficulty={difficulty} envs={n}")

    step_jit = jax.jit(env.step_fn)
    act_jit = jax.jit(learner.act_deterministic)
    state, obs = env._reset_jit(jax.random.key(3))

    reason_counts: dict = {}
    done_total = 0
    min_stackdist = np.full(n, 1e9)
    # platform_moved anatomy: at-failure snapshots (the state handed INTO
    # the failing step — within one control step of the failure condition;
    # the returned state is already reset for done envs)
    pm = {k: [] for k in (
        "drift", "radial", "cube_plat_xy", "cube_z", "hand_plat_xy", "step",
    )}
    for t in range(steps):
        if task == "BoxStacking":
            snap_plat = np.asarray(state.physics.box2_pos[:, :2])
            snap_spawn = np.asarray(state.task_states["platform_spawn_xy"])
            snap_box = np.asarray(state.physics.box_pos)
            snap_hand = np.asarray(state.physics.q[:, :2]) \
                + np.asarray(env._spawn_const)[None, :2]
            snap_count = np.asarray(state.episode_step_count)
        actions = act_jit(ppo, obs)
        state, obs, rew, done, extras = step_jit(state, actions)
        if task == "BoxStacking":
            fk = np.asarray(extras.get(
                "failure_reason_platform_moved", np.zeros(n))) > 0.5
            sel = fk & np.asarray(done)
            if sel.any():
                v = snap_plat[sel] - snap_spawn[sel]
                pm["drift"].extend(np.linalg.norm(v, axis=1))
                sp = snap_spawn[sel]
                spn = sp / np.maximum(
                    np.linalg.norm(sp, axis=1, keepdims=True), 1e-9)
                pm["radial"].extend((v * spn).sum(axis=1))
                pm["cube_plat_xy"].extend(np.linalg.norm(
                    snap_box[sel, :2] - snap_plat[sel], axis=1))
                pm["cube_z"].extend(snap_box[sel, 2])
                pm["hand_plat_xy"].extend(np.linalg.norm(
                    snap_hand[sel] - snap_plat[sel], axis=1))
                pm["step"].extend(snap_count[sel])
        # task-state probes (before auto-reset overwrites them is not
        # possible from outside; use extras + current state)
        if task == "BoxStacking":
            plat = np.asarray(state.physics.box2_pos[:, :2])
            spawn = np.asarray(state.task_states["platform_spawn_xy"])
            box = np.asarray(state.physics.box_pos)
            tgt_z = plat  # xy only
            d = np.linalg.norm(
                np.concatenate(
                    [box[:, :2] - plat,
                     (box[:, 2:3]
                      - np.asarray(state.physics.box2_pos[:, 2:3])
                      - (0.08 + 0.05) / 2)], axis=1
                ), axis=1,
            )
            min_stackdist = np.minimum(min_stackdist, d)
        done_h = np.asarray(done)
        if done_h.any():
            idx = np.nonzero(done_h)[0]
            done_total += len(idx)
            for k, v in extras.items():
                if k.startswith(("success_reason_", "failure_reason_")):
                    reason_counts[k] = reason_counts.get(k, 0) + int(
                        np.asarray(v)[idx].sum()
                    )
            if task == "BoxStacking":
                fail_idx = idx[np.asarray(extras["failure"])[idx]]
                if len(fail_idx):
                    # NOTE: state is post-reset for done envs; these probes
                    # use the per-step means below instead
                    pass
        if t % 100 == 0:
            fm = {
                k[8:]: float(np.asarray(v))
                for k, v in extras.items()
                if k.startswith("failure_") and np.asarray(v).ndim == 0
            }
            print(f"t={t} inst-criterion-rates {fm}")

    print(f"\nepisodes finished: {done_total}")
    for k, v in sorted(reason_counts.items()):
        print(f"  {k}: {v} ({v / max(1, done_total):.3f}/episode)")
    if task == "BoxStacking":
        print(
            "min stack-distance percentiles over surviving envs (m): "
            f"p10={np.percentile(min_stackdist, 10):.3f} "
            f"p50={np.percentile(min_stackdist, 50):.3f} "
            f"p90={np.percentile(min_stackdist, 90):.3f}"
        )
        if pm["drift"]:
            def pct(a):
                a = np.asarray(a, np.float64)
                return (f"p10={np.percentile(a, 10):.3f} "
                        f"p50={np.percentile(a, 50):.3f} "
                        f"p90={np.percentile(a, 90):.3f}")

            print(f"\nplatform_moved anatomy ({len(pm['drift'])} failures, "
                  "state one step before the fail):")
            print(f"  platform drift |v| (m):      {pct(pm['drift'])}")
            print("  radial drift (+away/-toward origin, m): "
                  f"{pct(pm['radial'])}")
            print(f"  cube-platform XY dist (m):   {pct(pm['cube_plat_xy'])}")
            print(f"  cube height z (m):           {pct(pm['cube_z'])}")
            print(f"  handbase-platform XY (m):    {pct(pm['hand_plat_xy'])}")
            print(f"  episode step at failure:     {pct(pm['step'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
