"""InHandReorientation: reorient a pinched box in mid-air to a target yaw.

A fourth task beyond the reference's BaseTask/BlindGrasping pair (SURVEY
§2.8), built purely through the task plugin API (envs/tasks/api.py) like
BoxReorientation — but OFF the ground: episodes start with the box already
pinch-grasped between the thumb and the index+middle fingertips, hanging at
the hand spawn height. The policy must rotate the box to a per-episode
target yaw (cube-symmetric) without dropping it. This exercises the contact
model's static-friction grasp under motion — the capability the
pinch-hang-and-lift physics regression guards (tests/test_physics.py).

Reset geometry is solved at build time with numpy FK (no device work, remote
-tunnel safe): finger flexion is bisected until the thumb-to-fingers gap
matches the box size with a small controlled penetration per side, and the
box is placed on the pinch axis midpoint with a face toward each tip
(same construction as tools/scratch_hang.py).

Success: |cube-symmetric yaw error| < `yaw_tolerance` while the box stays
near its hang height, sustained `align_duration_threshold` seconds.
Failures: `box_dropped` (fell below the hang height band), `box_escaped`
(left the hand's neighborhood).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.constants import DOF_INDEX, NUM_DOFS
from dexrobot_isaac_tpu.envs.tasks.api import (
    DexTask,
    TaskReset,
    TaskStep,
    curriculum_scale,
    detect_finger_box_contacts,
    symmetric_angle_error,
)
from dexrobot_isaac_tpu.envs.tasks.box_reorientation import _box_yaw
from dexrobot_isaac_tpu.physics.types import SimParams


def _solve_pinch(model, box_size: float, penetration: float):
    """Numpy build-time solve: grip q, box center offset (base at origin),
    and box quaternion such that the box sits pinched between the thumb tip
    and the index+middle tips with `penetration` per side."""
    from dexrobot_isaac_tpu.physics.engine import _np_fk_pose

    # tip sphere per finger = farthest sphere on the distal link
    tips = []
    for f in (1, 2, 3):
        b = model.body_index(f"r_f_link{f}_4")
        idxs = np.nonzero(np.asarray(model.sphere_body) == b)[0]
        tips.append(int(idxs[np.argmax(np.linalg.norm(model.sphere_pos[idxs], axis=1))]))
    t_th, t_ix, t_md = tips
    r = np.asarray(model.sphere_radius)
    need = box_size + r[t_th] + 0.5 * (r[t_ix] + r[t_md]) - 2.0 * penetration

    def gap(flex: float):
        q = np.zeros(NUM_DOFS)
        q[DOF_INDEX["r_f_joint1_1"]] = math.pi / 3
        for j in ("1_2", "1_3", "1_4"):
            q[DOF_INDEX[f"r_f_joint{j}"]] = 0.5 * flex
        for f in (2, 3):
            for j in (2, 3, 4):
                q[DOF_INDEX[f"r_f_joint{f}_{j}"]] = flex
        pos, rot = _np_fk_pose(model, q)
        sb = np.asarray(model.sphere_body)
        sp = pos[sb] + np.einsum("bij,bj->bi", rot[sb], model.sphere_pos)
        thumb = sp[t_th]
        fingers = 0.5 * (sp[t_ix] + sp[t_md])
        return float(np.linalg.norm(fingers - thumb)), q, thumb, fingers

    # gap(flex) is U-shaped (tips swing past each other at high flexion):
    # grid-scan for the minimizing flexion, then bisect the DESCENDING branch
    # [0.4, argmin] where gap is monotone decreasing
    grid = np.arange(0.4, 1.6001, 0.025)
    gaps = np.array([gap(x)[0] for x in grid])
    i_min = int(np.argmin(gaps))
    if gaps[i_min] > need:
        # closest approach doesn't quite reach the requested penetration;
        # accept a slightly shallower pinch within tolerance
        g, q, thumb, fingers = gap(float(grid[i_min]))
    else:
        lo, hi = 0.4, float(grid[i_min])
        for _ in range(40):
            mid = 0.5 * (lo + hi)
            if gap(mid)[0] > need:
                lo = mid
            else:
                hi = mid
        g, q, thumb, fingers = gap(0.5 * (lo + hi))
    if abs(g - need) > 0.004:
        raise ValueError(
            f"pinch solve failed: gap {g*1000:.1f}mm vs need {need*1000:.1f}mm "
            f"(box_size={box_size})"
        )
    d = fingers - thumb
    d_hat = d / np.linalg.norm(d)
    center = 0.5 * (thumb + fingers)
    # quaternion rotating +x onto the pinch axis: a box face meets each tip
    ex = np.array([1.0, 0.0, 0.0])
    axis = np.cross(ex, d_hat)
    s = np.linalg.norm(axis)
    c = float(np.dot(ex, d_hat))
    if s < 1e-8:
        bq = np.array([0.0, 0.0, 0.0, 1.0])
    else:
        axis = axis / s
        th = math.atan2(s, c)
        bq = np.concatenate([axis * math.sin(th / 2.0), [math.cos(th / 2.0)]])
    return (
        q.astype(np.float32),
        center.astype(np.float32),
        bq.astype(np.float32),
    )


class InHandReorientationTask(DexTask):
    name = "InHandReorientation"

    def __init__(self, task_cfg: Dict[str, Any]):
        super().__init__(task_cfg)
        c = task_cfg
        box = c.get("box", {})
        self.box_size = float(box.get("size", 0.05))
        self.box_mass = float(box.get("mass", 0.1))
        self.box_friction = float(box.get("friction", 1.0))

        self.hand_spawn = np.asarray(
            c.get("hand_spawn", [0.0, 0.0, 0.25]), dtype=np.float32
        )
        self.penetration = float(c.get("grip_penetration", 0.0015))

        self.yaw_symmetry = int(c.get("yaw_symmetry", 4))
        self.yaw_tolerance = float(c.get("yaw_tolerance", 0.15))
        self.min_initial_error = float(c.get("min_initial_error", 0.3))
        self.align_duration_threshold = float(
            c.get("align_duration_threshold", 1.0)
        )
        self.drop_band = float(c.get("drop_band", 0.1))       # below hang z
        self.escape_distance = float(c.get("escape_distance", 0.35))
        self.contact_binary_threshold = float(
            c.get("contact_binary_threshold", 0.1)
        )

        rc = c.get("reward_calculation", {})
        self.orientation_decay = float(rc.get("orientation_decay", 3.0))
        self.height_decay = float(rc.get("height_decay", 20.0))

        cur = c.get("curriculum", {}) or {}
        self.curriculum_enabled = bool(cur.get("enabled", False))
        self.curriculum_min_fraction = float(cur.get("min_range_fraction", 0.3))

        self._period = 2.0 * math.pi / max(1, self.yaw_symmetry)

        # build-time pinch geometry (numpy FK; base at origin)
        from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model

        model = build_hand_model()
        grip_q, center_off, box_quat0 = _solve_pinch(
            model, self.box_size, self.penetration
        )
        self._grip_q = grip_q                        # (26,) numpy
        self._box_center0 = self.hand_spawn + center_off
        self._box_quat0 = box_quat0
        self._hang_z = float(self._box_center0[2])

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
            "prev_yaw_error": jnp.zeros(n, dtype=jnp.float32),
            "aligned_duration_steps": jnp.zeros(n, dtype=jnp.int32),
        }

    def _yaw_error(self, yaw, target):
        return symmetric_angle_error(yaw, target, self._period)

    # ------------------------------------------------------------------
    def compute_step(
        self, obs_dict, task_states, physics, kin, body_contact_force,
        box_contact_force, control_dt,
    ) -> TaskStep:
        n = physics.q.shape[0]
        f32 = jnp.float32
        ts = dict(task_states)
        box_pos = physics.box_pos

        yaw = _box_yaw(physics.box_quat)
        err = self._yaw_error(yaw, ts["target_yaw"])
        abs_err = jnp.abs(err)

        hand_pos = obs_dict["hand_pose"][:, :3]
        hand_dist = jnp.linalg.norm(box_pos - hand_pos, axis=-1)
        height_err = jnp.abs(box_pos[:, 2] - self._hang_z)

        obs: Dict[str, jnp.ndarray] = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = physics.box_quat
        obs["object_vel"] = physics.box_linvel
        obs["object_angvel"] = physics.box_angvel
        obs["object_yaw_sincos"] = jnp.stack(
            [jnp.sin(yaw), jnp.cos(yaw)], axis=-1
        )
        obs["target_yaw_sincos"] = jnp.stack(
            [jnp.sin(ts["target_yaw"]), jnp.cos(ts["target_yaw"])], axis=-1
        )
        obs["yaw_error"] = err[:, None]
        obs["object_rel_hand"] = box_pos - hand_pos

        pads = obs_dict["fingerpad_poses_world"].reshape(n, 5, 7)[:, :, :3]
        d_f2o = jnp.linalg.norm(pads - box_pos[:, None, :], axis=-1)
        obs["finger_to_object_distances"] = d_f2o
        fb = detect_finger_box_contacts(
            obs_dict, box_contact_force, box_pos, self.box_size,
            self.contact_binary_threshold,
        )
        grasped = fb[:, 0] & fb[:, 1:].any(axis=1)   # thumb + any other
        obs["fingers_on_box"] = fb.astype(f32)
        obs["grasp_state"] = grasped.astype(f32)[:, None]

        aligned = (abs_err < self.yaw_tolerance) & (
            height_err < self.drop_band
        )
        steps = jnp.where(aligned, ts["aligned_duration_steps"] + 1, 0)
        ts["aligned_duration_steps"] = steps
        obs["aligned_duration"] = (steps.astype(f32) * control_dt)[:, None]

        threshold_steps = int(round(self.align_duration_threshold / control_dt))
        successes = {"reorient_success": steps >= threshold_steps}
        failures = {
            "box_dropped": box_pos[:, 2] < self._hang_z - self.drop_band,
            "box_escaped": hand_dist > self.escape_distance,
        }

        r: Dict[str, jnp.ndarray] = {}
        r["orientation_tracking"] = jnp.exp(-self.orientation_decay * abs_err)
        r["orientation_delta"] = jnp.abs(ts["prev_yaw_error"]) - abs_err
        r["grasp_maintenance"] = grasped.astype(f32)
        r["height_keep"] = jnp.exp(-self.height_decay * height_err)
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
        box_pos = ctx.box_pos
        bq = ctx.box_quat

        def sub(a, b):
            return tuple(x - y for x, y in zip(a, b))

        def norm(v):
            return jnp.sqrt(sum(x * x for x in v))

        x, y, z, w = bq
        yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
        target = ts["target_yaw"][0]
        e = yaw - target
        err = e - self._period * jnp.round(e / self._period)
        abs_err = jnp.abs(err)

        hand_pos = obs_d["hand_pose"][:3]
        hand_dist = norm(sub(box_pos, hand_pos))
        height_err = jnp.abs(box_pos[2] - self._hang_z)

        obs = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = bq
        obs["object_vel"] = ctx.box_linvel
        obs["object_angvel"] = ctx.box_angvel
        obs["object_yaw_sincos"] = (jnp.sin(yaw), jnp.cos(yaw))
        obs["target_yaw_sincos"] = (jnp.sin(target), jnp.cos(target))
        obs["yaw_error"] = (err,)
        obs["object_rel_hand"] = sub(box_pos, hand_pos)

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
        grasped = fb[0] & (fb[1] | fb[2] | fb[3] | fb[4])
        obs["fingers_on_box"] = tuple(b.astype(f32) for b in fb)
        obs["grasp_state"] = (grasped.astype(f32),)

        aligned = (abs_err < self.yaw_tolerance) & (
            height_err < self.drop_band
        )
        steps = jnp.where(aligned, ts["aligned_duration_steps"][0] + 1, 0)
        obs["aligned_duration"] = (steps.astype(f32) * dt,)

        threshold_steps = int(round(self.align_duration_threshold / dt))
        successes = {"reorient_success": steps >= threshold_steps}
        failures = {
            "box_dropped": box_pos[2] < self._hang_z - self.drop_band,
            "box_escaped": hand_dist > self.escape_distance,
        }

        r = {}
        r["orientation_tracking"] = jnp.exp(-self.orientation_decay * abs_err)
        r["orientation_delta"] = jnp.abs(ts["prev_yaw_error"][0]) - abs_err
        r["grasp_maintenance"] = grasped.astype(f32)
        r["height_keep"] = jnp.exp(-self.height_decay * height_err)
        r["alignment_hold"] = aligned.astype(f32)

        ts_new = {
            "target_yaw": (target,),
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
        n = num_envs
        k_tgt, k_sign = jax.random.split(key, 2)

        dof = jnp.tile(
            jnp.asarray(self._grip_q, dtype=jnp.float32)[None], (n, 1)
        )
        box_pos = jnp.tile(
            jnp.asarray(self._box_center0, dtype=jnp.float32)[None], (n, 1)
        )
        box_quat = jnp.tile(
            jnp.asarray(self._box_quat0, dtype=jnp.float32)[None], (n, 1)
        )

        # target rotation magnitude, optionally curriculum-scaled
        half = self._period / 2.0
        cscale = curriculum_scale(
            difficulty, self.curriculum_min_fraction, self.curriculum_enabled
        )
        mag = (
            self.min_initial_error
            + jax.random.uniform(k_tgt, (n,)) * (half - self.min_initial_error)
        ) * cscale
        sign = jnp.where(jax.random.uniform(k_sign, (n,)) < 0.5, -1.0, 1.0)
        yaw0 = _box_yaw(box_quat)
        target = yaw0 + sign * mag

        ts = self.init_task_states(n)
        ts["target_yaw"] = target
        err0 = yaw0 - target
        ts["prev_yaw_error"] = err0 - self._period * jnp.round(
            err0 / self._period
        )
        return TaskReset(
            dof_pos=dof, box_pos=box_pos, box_quat=box_quat, task_states=ts
        )
