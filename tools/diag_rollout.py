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

    # prefer the run's SAVED config (experiments overlays change network/
    # critic shapes — rebuilding from the task name alone loses them and the
    # checkpoint fails to restore into the fresh model)
    run_cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(ckpt)), "config.yaml"
    )
    if os.path.exists(run_cfg_path):
        import yaml

        from dexrobot_isaac_tpu.utils.config import set_by_path

        with open(run_cfg_path) as f:
            cfg = yaml.safe_load(f)
        set_by_path(cfg, "env.numEnvs", n)
        set_by_path(cfg, "device", "cpu")
        set_by_path(cfg, "env.viewer", False)
        set_by_path(cfg, "env.videoRecord", False)
        set_by_path(cfg, "env.videoStream", False)
        print(f"using run config {run_cfg_path}")
    else:
        cfg = load_config([f"task={task}", f"numEnvs={n}", "device=cpu"])
    env = make_env(cfg, seed=7)
    env.comps.initial_difficulty = difficulty

    from dexrobot_isaac_tpu.utils.config import get_by_path

    net = get_by_path(cfg, "train.params.network", {}) or {}
    pcfg = PPOConfig(
        num_actions=env.num_actions, num_obs=env.num_obs,
        num_states=env.num_states, num_envs=n,
        units=tuple(net.get("units", (512, 256, 128))),
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
    # hitting_ground anatomy (BlindGrasping): at-failure snapshots of the
    # fingertip geometry — which tip grazed, where relative to the box,
    # had the box been lifted yet (approach scoop vs regrasp-after-drop)
    bg = {k: [] for k in (
        "tip_z", "tip_id", "n_tips_under", "tip_box_xy", "box_z",
        "box_max_z", "hand_z", "step", "stage",
    )}
    # stage1_pregrasp anatomy: which quality condition failed at the
    # stage-1 -> 2 transition (blind_grasping._pregrasp_quality)
    pg = {k: [] for k in (
        "height_bad", "centroid_bad", "drift_bad", "vel_bad", "max_hdiff3",
        "centroid_dist", "drift", "box_speed", "hand_box_xy",
    )}
    if task == "BlindGrasping":
        eng = env.comps.engine
        tip_idx = np.asarray(env.comps.obs_cfg.fingertip_site_indices)
        pad_idx = np.asarray(env.comps.obs_cfg.fingerpad_site_indices)
        spawn_b = jnp.broadcast_to(
            jnp.asarray(env._spawn_const)[None], (n, 3)
        )

        @jax.jit
        def _tips(q, qd):
            kin = jax.vmap(eng.fk, in_axes=(0, 0, 0))(q, qd, spawn_b)
            return kin.site_pos[:, tip_idx], kin.site_pos[:, pad_idx]

        tip_thresh = float(env.comps.term_cfg.fingertip_threshold)
        box_peak = np.zeros(n)
    for t in range(steps):
        if task == "BlindGrasping":
            snap_tips_d, snap_pads_d = _tips(state.physics.q, state.physics.qd)
            snap_tips = np.asarray(snap_tips_d)
            snap_pads = np.asarray(snap_pads_d)
            snap_box = np.asarray(state.physics.box_pos)
            snap_boxv = np.asarray(state.physics.box_linvel)
            snap_box0 = np.asarray(state.task_states["initial_box_pos"])
            snap_stage = np.asarray(state.task_states["current_stage"])
            snap_count = np.asarray(state.episode_step_count)
            snap_handz = (
                np.asarray(state.physics.q[:, 2]) + float(env._spawn_const[2])
            )
            snap_hand_xy = (
                np.asarray(state.physics.q[:, :2])
                + np.asarray(env._spawn_const)[None, :2]
            )
            box_peak = np.maximum(box_peak, snap_box[:, 2])
        if task == "BoxStacking":
            snap_plat = np.asarray(state.physics.box2_pos[:, :2])
            snap_spawn = np.asarray(state.task_states["platform_spawn_xy"])
            snap_box = np.asarray(state.physics.box_pos)
            snap_hand = np.asarray(state.physics.q[:, :2]) \
                + np.asarray(env._spawn_const)[None, :2]
            snap_count = np.asarray(state.episode_step_count)
        actions = act_jit(ppo, obs)
        state, obs, rew, done, extras = step_jit(state, actions)
        if task == "BlindGrasping":
            hg = np.asarray(extras.get(
                "failure_reason_hitting_ground", np.zeros(n))) > 0.5
            sel = hg & np.asarray(done)
            if sel.any():
                tz = snap_tips[sel][:, :, 2]              # (k, 5)
                low = tz.argmin(axis=1)
                k_ = np.arange(len(low))
                bg["tip_z"].extend(tz[k_, low])
                bg["tip_id"].extend(low)
                bg["n_tips_under"].extend((tz < tip_thresh).sum(axis=1))
                bg["tip_box_xy"].extend(np.linalg.norm(
                    snap_tips[sel][k_, low, :2] - snap_box[sel, :2], axis=1
                ))
                bg["box_z"].extend(snap_box[sel, 2])
                bg["box_max_z"].extend(box_peak[sel])
                bg["hand_z"].extend(snap_handz[sel])
                bg["step"].extend(snap_count[sel])
                bg["stage"].extend(snap_stage[sel])
            pgm = np.asarray(extras.get(
                "failure_reason_stage1_pregrasp_failed", np.zeros(n))) > 0.5
            sel2 = pgm & np.asarray(done)
            if sel2.any():
                pads3 = snap_pads[sel2][:, :3, :]            # (k, 3, 3)
                bx = snap_box[sel2]
                hd = np.abs(pads3[:, :, 2] - bx[:, None, 2]).max(axis=1)
                cen = pads3.mean(axis=1)
                cd = np.linalg.norm(cen - bx, axis=1)
                dr_ = np.linalg.norm(bx - snap_box0[sel2], axis=1)
                spd = np.linalg.norm(snap_boxv[sel2], axis=1)
                pg["vel_bad"].extend(spd > 0.005)
                pg["box_speed"].extend(spd)
                pg["height_bad"].extend(hd > 0.03)
                pg["centroid_bad"].extend(cd > 0.08)
                pg["drift_bad"].extend(dr_ > 0.01)
                pg["max_hdiff3"].extend(hd)
                pg["centroid_dist"].extend(cd)
                pg["drift"].extend(dr_)
                pg["hand_box_xy"].extend(np.linalg.norm(
                    snap_hand_xy[sel2] - bx[:, :2], axis=1
                ))
            box_peak[np.asarray(done)] = 0.0
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
    if task == "BlindGrasping" and bg["tip_z"]:
        def pct(a):
            a = np.asarray(a, np.float64)
            return (f"p10={np.percentile(a, 10):.3f} "
                    f"p50={np.percentile(a, 50):.3f} "
                    f"p90={np.percentile(a, 90):.3f}")

        nf = len(bg["tip_z"])
        print(f"\nhitting_ground anatomy ({nf} failures, state one step "
              f"before the fail; fingertip threshold {tip_thresh:+.3f}):")
        print(f"  lowest tip z (m):            {pct(bg['tip_z'])}")
        tid = np.asarray(bg["tip_id"])
        names = ["thumb", "index", "middle", "ring", "pinky"]
        hist = {names[i]: int((tid == i).sum()) for i in range(5)}
        print(f"  lowest-tip finger histogram: {hist}")
        print(f"  tips under threshold:        {pct(bg['n_tips_under'])}")
        print(f"  lowest-tip to box XY (m):    {pct(bg['tip_box_xy'])}")
        print(f"  box z at failure (m):        {pct(bg['box_z'])}")
        print(f"  box PEAK z this episode (m): {pct(bg['box_max_z'])}")
        lifted = (np.asarray(bg["box_max_z"]) > 0.15).mean()
        print(f"  fraction with peak box z > 0.15 (drop-regrasp): "
              f"{lifted:.3f}")
        print(f"  hand base z (m):             {pct(bg['hand_z'])}")
        print(f"  episode step at failure:     {pct(bg['step'])}")
        stg = np.asarray(bg["stage"])
        print("  stage histogram:             "
              f"{ {int(s): int((stg == s).sum()) for s in np.unique(stg)} }")
    if task == "BlindGrasping" and pg["max_hdiff3"]:
        def pctp(a):
            a = np.asarray(a, np.float64)
            return (f"p10={np.percentile(a, 10):.3f} "
                    f"p50={np.percentile(a, 50):.3f} "
                    f"p90={np.percentile(a, 90):.3f}")

        npg = len(pg["max_hdiff3"])
        print(f"\nstage1_pregrasp anatomy ({npg} failures, state one step "
              "before the transition):")
        print("  condition failed: "
              f"height(>3cm)={np.mean(pg['height_bad']):.2f} "
              f"centroid(>8cm)={np.mean(pg['centroid_bad']):.2f} "
              f"drift(>1cm)={np.mean(pg['drift_bad']):.2f} "
              f"box_vel(>5mm/s)={np.mean(pg['vel_bad']):.2f}")
        print(f"  box speed at transition (m/s): {pctp(pg['box_speed'])}")
        print(f"  max pad-box height diff (m): {pctp(pg['max_hdiff3'])}")
        print(f"  pad-centroid to box (m):     {pctp(pg['centroid_dist'])}")
        print(f"  box drift from spawn (m):    {pctp(pg['drift'])}")
        print(f"  hand-box XY distance (m):    {pctp(pg['hand_box_xy'])}")
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
