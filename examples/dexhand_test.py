#!/usr/bin/env python
"""Interactive/scripted environment verification harness.

Parity with the reference's `examples/dexhand_test.py` (1788 LoC harness,
SURVEY §4): builds a real env, verifies action-space size against the control
flags, sweeps each action -1 -> +1 -> -1 and checks the corresponding DOFs
respond ("action-to-DOF verification"), exercises both control modes, and can
record video of the sweep via the host-side renderer.

Usage:
    python examples/dexhand_test.py                      # full sweep, headless
    python examples/dexhand_test.py task=BlindGrasping steps=40
    python examples/dexhand_test.py videoRecord=true     # render sweep to mp4
    python examples/dexhand_test.py plot=true            # save obs/reward PNGs
    python examples/dexhand_test.py live=true            # live charts over HTTP
    python examples/dexhand_test.py mode=contact         # box-contact exercise
    python examples/dexhand_test.py mode=rulebased       # rule-based controllers

live=true serves real-time reward/DOF/contact series at
http://127.0.0.1:8090 while the sweep runs (the reference harness streams the
same series to Rerun, examples/dexhand_test.py:241-766; graphics/liveplot.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def expected_action_mapping(pcb: bool, pcf: bool):
    """action index -> [(dof_index, coupling_scale), ...] from the
    authoritative constants (FINGER_COUPLING_MAP; constants.py)."""
    from dexrobot_isaac_tpu.constants import (
        DOF_INDEX,
        FINGER_COUPLING_MAP,
        NUM_BASE_DOFS,
    )

    mapping = {}
    a = 0
    if pcb:
        for d in range(NUM_BASE_DOFS):
            mapping[a] = [(d, 1.0)]
            a += 1
    if pcf:
        for control in range(12):
            mapping[a] = [
                (DOF_INDEX[j], s) for j, s in FINGER_COUPLING_MAP[control]
            ]
            a += 1
    return mapping


def verify_action_mapping(pipeline, num_actions, pcb, pcf, steps=40):
    """Mapped-DOF verification through the real action pipeline (reference
    dexhand_test.py:1395-1409, strengthened to exactness): action k must
    change exactly its coupled DOFs' targets — through the coupling,
    including the 2.0 scale on r_f_joint5_1 — and must NOT touch any other
    DOF's target; r_f_joint3_1 stays pinned at 0. Returns failure strings
    (empty = verified). A transposed/corrupted coupling table fails both the
    mapped-response and the cross-talk checks."""
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.constants import DOF_INDEX, DOF_NAMES, NUM_DOFS
    from dexrobot_isaac_tpu.envs import action as action_mod

    mapping = expected_action_mapping(pcb, pcf)
    j31 = DOF_INDEX["r_f_joint3_1"]
    failures = []

    def targets_after(a_idx, mag):
        active = jnp.zeros((1, 18), dtype=jnp.float32)
        actions = jnp.zeros((1, num_actions), dtype=jnp.float32)
        actions = actions.at[:, a_idx].set(mag)
        full = action_mod.apply_coupling(pipeline, active)
        for _ in range(steps):
            full, active = action_mod.process_actions(
                pipeline, actions, active, active
            )
        return np.asarray(full[0])

    for a_idx in range(num_actions):
        hi = targets_after(a_idx, 0.4)
        lo = targets_after(a_idx, -0.4)
        for t in (hi, lo):
            if abs(t[j31]) > 1e-7:
                failures.append(
                    f"action {a_idx}: r_f_joint3_1 target not pinned at 0"
                )
        diff = hi - lo
        mapped = dict(mapping[a_idx])
        for d in range(NUM_DOFS):
            if d == j31:
                continue
            if d in mapped:
                if abs(diff[d]) < 1e-4:
                    failures.append(
                        f"action {a_idx}: mapped DOF {DOF_NAMES[d]} "
                        f"did not respond (|diff|={abs(diff[d]):.2e})"
                    )
            elif abs(diff[d]) > 1e-6:
                failures.append(
                    f"action {a_idx}: cross-talk onto unmapped DOF "
                    f"{DOF_NAMES[d]} ({diff[d]:+.2e})"
                )
        # coupling scale ratios are exact (scales apply AFTER the shared
        # active target): e.g. r_f_joint5_1 must move 2.0x r_f_joint2_1
        items = mapping[a_idx]
        base_d, base_s = items[0]
        for d, s in items[1:]:
            want = diff[base_d] * (s / base_s)
            if abs(diff[d] - want) > 1e-5 * max(1.0, abs(want)):
                failures.append(
                    f"action {a_idx}: coupling scale mismatch on "
                    f"{DOF_NAMES[d]} (got {diff[d]:+.5f}, want {want:+.5f})"
                )
    return failures


def verify_custom_rule_modes(pipeline, num_actions, steps=20):
    """Custom action rules in BOTH control modes (reference
    dexhand_test.py:1182-1285): a rule that halves the action must produce
    exactly the targets of the default rule at half magnitude."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.envs import action as action_mod

    failures = []

    def targets_after(pl, a_idx, mag):
        active = jnp.zeros((1, 18), dtype=jnp.float32)
        actions = jnp.zeros((1, num_actions), dtype=jnp.float32)
        actions = actions.at[:, a_idx].set(mag)
        full = action_mod.apply_coupling(pl, active)
        for _ in range(steps):
            full, active = action_mod.process_actions(
                pl, actions, active, active
            )
        return np.asarray(full[0])

    for mode, base_rule in (
        ("position", action_mod.position_action_rule),
        ("position_delta", action_mod.position_delta_action_rule),
    ):
        def half_rule(pl, prev, rule_t, actions, _base=base_rule):
            return _base(pl, prev, rule_t, actions * 0.5)

        pl_base = dataclasses.replace(
            pipeline, control_mode=mode, custom_action_rule=None
        )
        pl_custom = dataclasses.replace(
            pipeline, control_mode=mode, custom_action_rule=half_rule
        )
        for a_idx in (0, num_actions - 1):
            got = targets_after(pl_custom, a_idx, 0.8)
            want = targets_after(pl_base, a_idx, 0.4)
            if not np.allclose(got, want, rtol=0, atol=1e-7):
                failures.append(
                    f"{mode}: custom half-rule != default at half magnitude "
                    f"(action {a_idx}, max err {np.abs(got - want).max():.2e})"
                )
    return failures


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    steps = 30
    mode = "sweep"
    plot = False
    live = False
    keep = []
    for a in argv:
        if a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
        elif a.startswith("mode="):
            mode = a.split("=", 1)[1]
        elif a.startswith("plot="):
            plot = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        elif a.startswith("live="):
            live = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        else:
            keep.append(a)

    # device=cpu must take effect before any jnp dispatch (train.py:39-46
    # does the same; jax is already imported via sitecustomize, so BOTH the
    # env var and the config update are required — CLAUDE.md gotchas)
    if any(a.split("=", 1) == ["device", "cpu"] for a in keep):
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.utils.config import get_by_path, load_config
    from dexrobot_isaac_tpu.utils.logging import setup_logging

    cfg = load_config(keep + ["numEnvs=2"])
    logger = setup_logging(get_by_path(cfg, "train.logging.logLevel", "info"))
    env = make_env(cfg)
    logger.info(
        f"Env built: task={get_by_path(cfg, 'task.name')} "
        f"num_obs={env.num_obs} num_actions={env.num_actions}"
    )

    # --- action space sizing vs control flags (dexhand_test.py:1159-1168) ---
    pcb = bool(get_by_path(cfg, "task.policy_controls_hand_base", True))
    pcf = bool(get_by_path(cfg, "task.policy_controls_fingers", True))
    expected = 6 * pcb + 12 * pcf
    assert env.num_actions == expected, (
        f"action space {env.num_actions} != expected {expected}"
    )
    logger.info(f"Action-space check OK ({env.num_actions})")

    # --- exact mapped-DOF verification through the action pipeline, both
    # control modes, plus custom-rule checks (dexhand_test.py:1182-1409) ---
    import dataclasses as _dc

    map_failures = []
    for mode_name in ("position", "position_delta"):
        pl = _dc.replace(
            env.comps.pipeline, control_mode=mode_name,
            custom_action_rule=None,
        )
        f = verify_action_mapping(pl, env.num_actions, pcb, pcf)
        map_failures += [f"[{mode_name}] {x}" for x in f]
        logger.info(
            f"Mapped-DOF verification ({mode_name}): "
            f"{'OK' if not f else f'{len(f)} FAILURES'}"
        )
    rule_failures = verify_custom_rule_modes(env.comps.pipeline, env.num_actions)
    logger.info(
        "Custom-rule verification (both modes): "
        + ("OK" if not rule_failures else f"{len(rule_failures)} FAILURES")
    )
    if map_failures or rule_failures:
        for x in map_failures + rule_failures:
            logger.error(x)
        return 1

    if mode == "contact":
        # spawn the hand just above the box so contacts happen within a few
        # dozen steps even at the task's 0.1 m/s base velocity limit
        contact_overrides = [
            "numEnvs=2", "task=BlindGrasping",
            "env.initialHandPos=[0.0, 0.0, 0.10]",
        ]
        cfg = load_config(keep + contact_overrides)
        return run_contact_test(cfg, max(steps, 60), logger)
    if mode == "rulebased":
        return run_rule_based_test(cfg, max(steps, 40), logger)

    record = bool(get_by_path(cfg, "env.videoRecord", False))
    recorder = renderer = None
    if record:
        from dexrobot_isaac_tpu.graphics.renderer import SceneRenderer
        from dexrobot_isaac_tpu.graphics.video import VideoRecorder

        renderer = SceneRenderer(env.comps.model)
        recorder = VideoRecorder("dexhand_test_videos")
        recorder.finalize_fps(env.control_dt)
        recorder.start_episode()

    # --- physics action-to-DOF sweep (dexhand_test.py:1395-1409): each
    # action's MAPPED DOFs (through the coupling) must respond in the
    # simulated state, not just "some DOF" ---
    from dexrobot_isaac_tpu.constants import DOF_INDEX, DOF_NAMES

    mapping = expected_action_mapping(pcb, pcf)
    j31 = DOF_INDEX["r_f_joint3_1"]
    env.reset()
    failures = []
    series = {"reward": [], "dof": []} if plot else None
    liveplot = None
    if live:
        from dexrobot_isaac_tpu.graphics.liveplot import LivePlotServer

        liveplot = LivePlotServer()
        liveplot.start()
        logger.info(f"Live charts: http://127.0.0.1:{liveplot.port}/")
    for a_idx in range(env.num_actions):
        env.reset()
        base_q = np.asarray(env.state.physics.q[0]).copy()
        dev = np.zeros_like(base_q)
        for t in range(steps):
            phase = t / max(steps - 1, 1)
            mag = (1.0 - abs(2 * phase - 1.0)) * 2 - 1.0  # -1 -> +1 -> -1
            actions = jnp.zeros((2, env.num_actions)).at[:, a_idx].set(mag)
            _, rew_t, _, _ = env.step(actions)
            if series is not None and a_idx == 0:
                series["reward"].append(float(rew_t[0]))
                series["dof"].append(float(env.state.physics.q[0, 0]))
            if liveplot is not None:
                liveplot.log_many({
                    "reward (env 0)": float(rew_t[0]),
                    "action magnitude": float(mag),
                    f"q[{a_idx}] sweep DOF": float(
                        env.state.physics.q[0, mapping[a_idx][0][0]]
                    ),
                    "contacts (env 0)": float(
                        np.asarray(env.state.prev_contact_binary[0]).sum()
                    ),
                })
            dev = np.maximum(
                dev, np.abs(np.asarray(env.state.physics.q[0]) - base_q)
            )
            if recorder is not None and a_idx < 3:
                kin = env.comps.engine.kinematics(env.state.physics, env._spawn)
                frame = renderer.render_state(
                    np.asarray(kin.body_pos[0]), np.asarray(kin.body_quat[0]),
                    box_pos=np.asarray(env.state.physics.box_pos[0])
                    if env.comps.engine.params.has_box else None,
                    box_quat=np.asarray(env.state.physics.box_quat[0]),
                    title=f"action {a_idx} t={t}",
                )
                recorder.add_frame(frame)
        weak = [
            DOF_NAMES[d] for d, _s in mapping[a_idx]
            if d != j31 and dev[d] < 5e-4
        ]
        if weak:
            failures.append(a_idx)
            logger.warning(
                f"action {a_idx}: mapped DOFs with no physics response: {weak}"
            )
        else:
            logger.info(
                f"action {a_idx}: mapped-DOF response OK "
                f"(min dev {min(dev[d] for d, _ in mapping[a_idx] if d != j31):.4f})"
            )

    if recorder is not None:
        recorder.stop_episode()
        recorder.close()
        renderer.close()
    if liveplot is not None:
        liveplot.stop()

    if series is not None and series["reward"]:
        # obs/reward time-series plots (the reference harness streams these
        # to Rerun; here they are saved as PNGs)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(8, 6))
        axes[0].plot(series["reward"]); axes[0].set_title("reward (env 0, action 0 sweep)")
        axes[1].plot(series["dof"]); axes[1].set_title("ARTx position")
        fig.tight_layout()
        fig.savefig("dexhand_test_series.png", dpi=100)
        logger.info("Saved dexhand_test_series.png")

    if failures:
        logger.error(f"Actions with no DOF response: {failures}")
        return 1
    logger.info("All actions drive DOFs — verification PASSED")
    return 0


def run_contact_test(cfg, steps, logger):
    """Box-contact exercise (parity: the reference harness's ContactTestTask,
    examples/dexhand_test.py:950-1028): drive the hand onto the box and report
    per-finger contact forces."""
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.factory import make_env

    env = make_env(cfg)
    env.reset()
    hit_steps = 0
    for t in range(steps):
        a = jnp.zeros((env.num_envs, env.num_actions)).at[:, 2].set(-1.0)
        a = a.at[:, 7].set(0.5).at[:, 9].set(0.5).at[:, 11].set(0.5)
        obs, rew, done, extras = env.step(a)
        start, end = env.get_obs_slice("contact_binary")
        contacts = np.asarray(obs[0, start:end])
        if contacts.any():
            hit_steps += 1
    logger.info(f"Contact exercise: contact observed on {hit_steps}/{steps} steps")
    if hit_steps == 0:
        logger.warning("No contacts observed — check box placement/steps")
    return 0


def run_rule_based_test(cfg, steps, logger):
    """Rule-based base/finger controllers for non-policy DOFs (parity:
    reference harness circular base + adaptive grasp,
    examples/dexhand_test.py:107-240, 1287-1325)."""
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.envs.rule_based import (
        adaptive_grasp, circular_base_motion, make_pre_action_rule,
    )
    from dexrobot_isaac_tpu.factory import TASK_REGISTRY, make_env

    task_name = cfg["task"].get("name", "BaseTask")
    task_cls = TASK_REGISTRY[task_name]

    class RuleTask(task_cls):
        pre_action_rule = staticmethod(make_pre_action_rule(
            base_controller=circular_base_motion(radius=0.05, period=2.0),
            finger_controller=adaptive_grasp(),
        ))

    TASK_REGISTRY["_RuleTask"] = RuleTask
    cfg["task"]["name"] = "_RuleTask"
    cfg["task"]["policy_controls_hand_base"] = False
    cfg["task"]["policy_controls_fingers"] = False
    env = make_env(cfg)
    assert env.num_actions == 0 or env.num_actions >= 0
    env.reset()
    xs = []
    for t in range(steps):
        a = jnp.zeros((env.num_envs, max(env.num_actions, 0)))
        env.step(a)
        xs.append(float(env.state.physics.q[0, 0]))
    moved = max(xs) - min(xs)
    logger.info(f"Rule-based base motion amplitude over {steps} steps: {moved:.4f} m")
    if moved < 1e-3:
        logger.error("Rule-based base controller produced no motion")
        return 1
    logger.info("Rule-based control verification PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
