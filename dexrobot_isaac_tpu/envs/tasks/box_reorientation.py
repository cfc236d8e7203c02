"""BoxReorientation: finger-driven in-place reorientation of the box.

A third task beyond the reference's BaseTask/BlindGrasping pair (SURVEY §2.8),
built purely through the task plugin API (envs/tasks/api.py) to demonstrate
that the contract generalizes the way the reference's DexTask ABC does
(dexhand_env/tasks/task_interface.py:14-405): scene configuration, task
temporal state, privileged observations, shaped rewards, and success/failure
criteria are all supplied by the plugin without env changes.

Task: the box rests on the ground in front of the hand; a target yaw is
sampled per episode. The policy must spin the box in place to the target
orientation using its fingers, keeping it within a drift radius and on the
ground. Cube symmetry is respected: yaw error is computed modulo
2*pi/`yaw_symmetry` (default 4 — a cube looks identical under 90-degree
turns), so the shortest equivalent rotation counts.

Success: |yaw error| < `yaw_tolerance` with positional drift <
`position_drift_tolerance`, sustained `align_duration_threshold` seconds.
Failures: `box_pushed_away` (drift > `max_drift`), `box_lifted`
(box center more than `lift_tolerance` above its rest height).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dexrobot_isaac_tpu.envs.tasks.api import (
    DexTask,
    TaskReset,
    TaskStep,
    detect_finger_box_contacts,
    symmetric_angle_error,
)
from dexrobot_isaac_tpu.physics.types import SimParams


def _box_yaw(quat: jnp.ndarray) -> jnp.ndarray:
    """Yaw (Z euler) from an xyzw quaternion batch (N, 4) -> (N,)."""
    x, y, z, w = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


class BoxReorientationTask(DexTask):
    name = "BoxReorientation"

    def __init__(self, task_cfg: Dict[str, Any]):
        super().__init__(task_cfg)
        c = task_cfg
        box = c.get("box", {})
        self.box_size = float(box.get("size", 0.05))
        self.box_mass = float(box.get("mass", 0.1))
        self.box_friction = float(box.get("friction", 1.0))
        self.box_xy_range = float(
            box.get("initial_position", {}).get("xy_range", 0.02)
        )
        self.box_z = float(box.get("initial_position", {}).get("z", 0.027))

        self.yaw_symmetry = int(c.get("yaw_symmetry", 4))
        self.yaw_tolerance = float(c.get("yaw_tolerance", 0.15))
        self.min_initial_error = float(c.get("min_initial_error", 0.4))
        self.align_duration_threshold = float(
            c.get("align_duration_threshold", 1.0)
        )
        self.position_drift_tolerance = float(
            c.get("position_drift_tolerance", 0.05)
        )
        self.max_drift = float(c.get("max_drift", 0.15))
        self.lift_tolerance = float(c.get("lift_tolerance", 0.05))
        self.contact_binary_threshold = float(
            c.get("contact_binary_threshold", 0.1)
        )

        rc = c.get("reward_calculation", {})
        self.orientation_decay = float(rc.get("orientation_decay", 3.0))
        self.proximity_decay = float(rc.get("proximity_decay", 10.0))
        self.drift_decay = float(rc.get("drift_decay", 20.0))

        self.hand_translation_range = float(
            c.get("hand_translation_range", 0.05)
        )
        self.hand_rotation_range = float(c.get("hand_rotation_range", 0.2))
        self.finger_range = float(
            c.get("finger_randomization", {}).get("other_finger_range", 0.3)
        )

        # symmetric yaw period: a cube (symmetry 4) repeats every 90 deg
        self._period = 2.0 * math.pi / max(1, self.yaw_symmetry)

    # ------------------------------------------------------------------
    def configure_scene(self, params: SimParams) -> SimParams:
        import dataclasses

        return dataclasses.replace(
            params,
            has_box=True,
            box_size=self.box_size,
            box_mass=self.box_mass,
            box_friction=self.box_friction,
        )

    def init_task_states(self, num_envs: int) -> Dict[str, jnp.ndarray]:
        n = num_envs
        return {
            "target_yaw": jnp.zeros(n, dtype=jnp.float32),
            "initial_box_pos": jnp.zeros((n, 3), dtype=jnp.float32),
            "prev_yaw_error": jnp.zeros(n, dtype=jnp.float32),
            "aligned_duration_steps": jnp.zeros(n, dtype=jnp.int32),
        }

    # ------------------------------------------------------------------
    def _yaw_error(self, yaw: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Signed shortest error under the task's rotational symmetry."""
        return symmetric_angle_error(yaw, target, self._period)

    def compute_step(
        self, obs_dict, task_states, physics, kin, body_contact_force,
        box_contact_force, control_dt,
    ) -> TaskStep:
        n = physics.q.shape[0]
        f32 = jnp.float32
        ts = dict(task_states)
        box_pos = physics.box_pos
        box_vel = physics.box_linvel
        box_angvel = physics.box_angvel

        yaw = _box_yaw(physics.box_quat)
        err = self._yaw_error(yaw, ts["target_yaw"])
        abs_err = jnp.abs(err)
        drift = jnp.linalg.norm(
            (box_pos - ts["initial_box_pos"])[:, :2], axis=-1
        )

        # ---------- task observations ----------
        obs: Dict[str, jnp.ndarray] = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = physics.box_quat
        obs["object_vel"] = box_vel
        obs["object_angvel"] = box_angvel
        obs["object_yaw_sincos"] = jnp.stack(
            [jnp.sin(yaw), jnp.cos(yaw)], axis=-1
        )
        obs["target_yaw_sincos"] = jnp.stack(
            [jnp.sin(ts["target_yaw"]), jnp.cos(ts["target_yaw"])], axis=-1
        )
        obs["yaw_error"] = err[:, None]
        obs["box_drift"] = drift[:, None]

        pads = obs_dict["fingerpad_poses_world"].reshape(n, 5, 7)[:, :, :3]
        d_f2o = jnp.linalg.norm(pads - box_pos[:, None, :], axis=-1)
        obs["finger_to_object_distances"] = d_f2o

        fb_contact = detect_finger_box_contacts(
            obs_dict, box_contact_force, box_pos, self.box_size,
            self.contact_binary_threshold,
        )
        obs["fingers_on_box"] = fb_contact.astype(f32)

        # ---------- alignment tracking ----------
        aligned = (abs_err < self.yaw_tolerance) & (
            drift < self.position_drift_tolerance
        )
        steps = jnp.where(aligned, ts["aligned_duration_steps"] + 1, 0)
        ts["aligned_duration_steps"] = steps
        obs["aligned_duration"] = (steps.astype(f32) * control_dt)[:, None]

        # ---------- criteria ----------
        threshold_steps = int(
            round(self.align_duration_threshold / control_dt)
        )
        successes = {"reorient_success": steps >= threshold_steps}
        failures = {
            "box_pushed_away": drift > self.max_drift,
            "box_lifted": box_pos[:, 2] > self.box_z + self.lift_tolerance,
        }

        # ---------- rewards ----------
        r: Dict[str, jnp.ndarray] = {}
        r["orientation_tracking"] = jnp.exp(-self.orientation_decay * abs_err)
        # dense improvement signal: previous |error| minus current |error|
        r["orientation_delta"] = jnp.abs(ts["prev_yaw_error"]) - abs_err
        r["fingerpad_proximity"] = jnp.exp(
            -self.proximity_decay * d_f2o.min(axis=1)
        )
        r["position_stability"] = jnp.exp(-self.drift_decay * drift)
        r["finger_contact"] = fb_contact.any(axis=1).astype(f32)
        r["alignment_hold"] = aligned.astype(f32)
        ts["prev_yaw_error"] = err

        return TaskStep(
            task_obs=obs,
            task_states=ts,
            success_criteria=successes,
            failure_criteria=failures,
            reward_terms=r,
        )

    # ------------------------------------------------------------------
    def lane_step(self, ctx):
        """Lane-vector `compute_step` for the fused env-step kernel
        (envs/fused_step.py): mirrors `compute_step` above term for term;
        tests/test_fused_step.py asserts the two paths agree."""
        from types import SimpleNamespace

        f32 = jnp.float32
        obs_d, ts, dt = ctx.obs, ctx.ts, ctx.control_dt
        box_pos, box_vel = ctx.box_pos, ctx.box_linvel
        bq = ctx.box_quat

        def sub(a, b):
            return tuple(x - y for x, y in zip(a, b))

        def norm(v):
            return jnp.sqrt(sum(x * x for x in v))

        def lane_yaw(q4):
            x, y, z, w = q4
            return jnp.arctan2(
                2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)
            )

        def sym_err(e):
            return e - self._period * jnp.round(e / self._period)

        yaw = lane_yaw(bq)
        target = ts["target_yaw"][0]
        err = sym_err(yaw - target)
        abs_err = jnp.abs(err)
        init_pos = ts["initial_box_pos"]
        dx = box_pos[0] - init_pos[0]
        dy = box_pos[1] - init_pos[1]
        drift = jnp.sqrt(dx * dx + dy * dy)

        obs = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = bq
        obs["object_vel"] = box_vel
        obs["object_angvel"] = ctx.box_angvel
        obs["object_yaw_sincos"] = (jnp.sin(yaw), jnp.cos(yaw))
        obs["target_yaw_sincos"] = (jnp.sin(target), jnp.cos(target))
        obs["yaw_error"] = (err,)
        obs["box_drift"] = (drift,)

        pads = [
            obs_d["fingerpad_poses_world"][7 * i:7 * i + 3] for i in range(5)
        ]
        d_f2o = tuple(norm(sub(p, box_pos)) for p in pads)
        obs["finger_to_object_distances"] = d_f2o

        box_has = norm(ctx.box_contact_force) > self.contact_binary_threshold
        prox_thr = math.sqrt(3.0) * self.box_size / 2.0 * 1.2
        fb = [
            (obs_d["contact_binary"][i] > 0.5) & box_has
            & (d_f2o[i] < prox_thr)
            for i in range(5)
        ]
        obs["fingers_on_box"] = tuple(b.astype(f32) for b in fb)

        aligned = (abs_err < self.yaw_tolerance) & (
            drift < self.position_drift_tolerance
        )
        steps = jnp.where(aligned, ts["aligned_duration_steps"][0] + 1, 0)
        obs["aligned_duration"] = (steps.astype(f32) * dt,)

        threshold_steps = int(round(self.align_duration_threshold / dt))
        successes = {"reorient_success": steps >= threshold_steps}
        failures = {
            "box_pushed_away": drift > self.max_drift,
            "box_lifted": box_pos[2] > self.box_z + self.lift_tolerance,
        }

        r = {}
        r["orientation_tracking"] = jnp.exp(-self.orientation_decay * abs_err)
        r["orientation_delta"] = jnp.abs(ts["prev_yaw_error"][0]) - abs_err
        dmin = d_f2o[0]
        for d in d_f2o[1:]:
            dmin = jnp.minimum(dmin, d)
        r["fingerpad_proximity"] = jnp.exp(-self.proximity_decay * dmin)
        r["position_stability"] = jnp.exp(-self.drift_decay * drift)
        any_fb = fb[0]
        for b in fb[1:]:
            any_fb = any_fb | b
        r["finger_contact"] = any_fb.astype(f32)
        r["alignment_hold"] = aligned.astype(f32)

        ts_new = {
            "target_yaw": (target,),
            "initial_box_pos": init_pos,
            "prev_yaw_error": (err,),
            "aligned_duration_steps": (steps,),
        }
        reset_ts = {k: ctx.reset_ts[k] for k in ts_new}
        return SimpleNamespace(
            task_obs=obs, ts_new=ts_new, success=successes,
            failure=failures, rewards=r, reset_ts=reset_ts,
        )

    # ------------------------------------------------------------------
    def reset_task(
        self, key, num_envs, default_dof_pos, difficulty=None
    ) -> TaskReset:
        # difficulty accepted for API uniformity; this task has no reset
        # curriculum (its randomization ranges are already small)
        n = num_envs
        k_box, k_yaw, k_tgt, k_sign, k_trans, k_rot, k_fing = jax.random.split(
            key, 7
        )

        xy = (jax.random.uniform(k_box, (n, 2)) * 2 - 1) * self.box_xy_range
        box_pos = jnp.concatenate(
            [xy, jnp.full((n, 1), self.box_z, dtype=jnp.float32)], axis=-1
        )
        yaw = (jax.random.uniform(k_yaw, (n,)) * 2 - 1) * math.pi
        box_quat = jnp.stack(
            [jnp.zeros(n), jnp.zeros(n), jnp.sin(yaw / 2), jnp.cos(yaw / 2)],
            axis=-1,
        )

        # target = initial yaw + a symmetric-range offset bounded away from
        # zero so every episode requires an actual rotation
        half = self._period / 2.0
        mag = self.min_initial_error + jax.random.uniform(k_tgt, (n,)) * (
            half - self.min_initial_error
        )
        sign = jnp.where(jax.random.uniform(k_sign, (n,)) < 0.5, -1.0, 1.0)
        target = yaw + sign * mag

        dof = jnp.tile(default_dof_pos[None], (n, 1))
        trans = (
            (jax.random.uniform(k_trans, (n, 3)) * 2 - 1)
            * self.hand_translation_range
        )
        rot = (
            (jax.random.uniform(k_rot, (n, 3)) * 2 - 1)
            * self.hand_rotation_range
        )
        dof = dof.at[:, 0:3].set(trans).at[:, 3:6].set(rot)
        fingers = jax.random.uniform(k_fing, (n, 20)) * self.finger_range
        dof = dof.at[:, 6:26].set(fingers)

        ts = self.init_task_states(n)
        ts["target_yaw"] = target
        ts["initial_box_pos"] = box_pos
        # start the delta-reward baseline at the true initial error
        err0 = yaw - target
        ts["prev_yaw_error"] = err0 - self._period * jnp.round(
            err0 / self._period
        )
        return TaskReset(
            dof_pos=dof, box_pos=box_pos, box_quat=box_quat, task_states=ts
        )
