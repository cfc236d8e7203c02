"""BoxPushing: target-conditioned non-prehensile pushing of the box.

A fifth task beyond the reference's BaseTask/BlindGrasping pair (SURVEY
§2.8), built purely through the task plugin API (envs/tasks/api.py) like
BoxReorientation/InHandReorientation — scene configuration, task temporal
state, privileged observations, shaped rewards, and success/failure criteria
all come from the plugin, with no env changes (the extension contract the
reference defines in dexhand_env/tasks/task_interface.py:14-405).

Task: the box rests on the ground in front of the hand; a target XY position
is sampled per episode at a random direction and distance. The policy must
push (not grasp-and-carry) the box to the target and keep it there: success
requires the box center within `position_tolerance` of the target, moving
slower than `rest_speed_tolerance`, sustained for `hold_duration_threshold`
seconds. Lifting the box off the ground is a failure (`box_lifted`), which is
what forces a pushing strategy; driving it further from the target than it
started plus `max_overshoot` is the `box_lost` failure.

Reset curriculum: with `curriculum.enabled`, the sampled target distance
scales with the runtime difficulty scalar (tasks/api.py curriculum_scale),
so early training pushes short distances.

`lane_step` provides the fused-kernel twin of `compute_step` (the whole
control step runs as ONE Pallas kernel on TPU; parity-tested in
tests/test_fused_step.py). Sampled reset task-states (target_xy and the
derived distances) reach the kernel through the reset-row plan
(envs/fused_step.py ctx.reset_ts).
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
    curriculum_scale,
    detect_finger_box_contacts,
)
from dexrobot_isaac_tpu.physics.types import SimParams


class BoxPushingTask(DexTask):
    name = "BoxPushing"

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

        tgt = c.get("target_distance", {})
        self.target_dist_min = float(tgt.get("min", 0.05))
        self.target_dist_max = float(tgt.get("max", 0.12))
        self.position_tolerance = float(c.get("position_tolerance", 0.02))
        self.rest_speed_tolerance = float(c.get("rest_speed_tolerance", 0.1))
        self.hold_duration_threshold = float(
            c.get("hold_duration_threshold", 0.5)
        )
        self.max_overshoot = float(c.get("max_overshoot", 0.1))
        self.lift_tolerance = float(c.get("lift_tolerance", 0.05))
        self.contact_binary_threshold = float(
            c.get("contact_binary_threshold", 0.1)
        )

        rc = c.get("reward_calculation", {})
        self.distance_decay = float(rc.get("distance_decay", 15.0))
        self.proximity_decay = float(rc.get("proximity_decay", 10.0))

        self.hand_translation_range = float(
            c.get("hand_translation_range", 0.05)
        )
        self.hand_rotation_range = float(c.get("hand_rotation_range", 0.2))
        self.finger_range = float(
            c.get("finger_randomization", {}).get("other_finger_range", 0.3)
        )

        cur = c.get("curriculum", {})
        self.curriculum_enabled = bool(cur.get("enabled", False))
        self.curriculum_min_fraction = float(cur.get("min_fraction", 0.4))

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
            "target_xy": jnp.zeros((n, 2), dtype=jnp.float32),
            "initial_dist": jnp.zeros(n, dtype=jnp.float32),
            "prev_dist": jnp.zeros(n, dtype=jnp.float32),
            "hold_duration_steps": jnp.zeros(n, dtype=jnp.int32),
        }

    # ------------------------------------------------------------------
    def compute_step(
        self, obs_dict, task_states, physics, kin, body_contact_force,
        box_contact_force, control_dt,
    ) -> TaskStep:
        n = physics.q.shape[0]
        f32 = jnp.float32
        ts = dict(task_states)
        box_pos = physics.box_pos
        box_vel = physics.box_linvel

        to_target = ts["target_xy"] - box_pos[:, :2]        # (N, 2)
        dist = jnp.linalg.norm(to_target, axis=-1)
        speed = jnp.linalg.norm(box_vel, axis=-1)

        # ---------- task observations ----------
        obs: Dict[str, jnp.ndarray] = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = physics.box_quat
        obs["object_vel"] = box_vel
        obs["target_xy"] = ts["target_xy"]
        obs["to_target"] = to_target
        obs["dist_to_target"] = dist[:, None]

        pads = obs_dict["fingerpad_poses_world"].reshape(n, 5, 7)[:, :, :3]
        d_f2o = jnp.linalg.norm(pads - box_pos[:, None, :], axis=-1)
        obs["finger_to_object_distances"] = d_f2o

        fb_contact = detect_finger_box_contacts(
            obs_dict, box_contact_force, box_pos, self.box_size,
            self.contact_binary_threshold,
        )
        obs["fingers_on_box"] = fb_contact.astype(f32)

        # ---------- hold tracking ----------
        at_target = (dist < self.position_tolerance) & (
            speed < self.rest_speed_tolerance
        )
        steps = jnp.where(at_target, ts["hold_duration_steps"] + 1, 0)
        ts["hold_duration_steps"] = steps
        obs["hold_duration"] = (steps.astype(f32) * control_dt)[:, None]

        # ---------- criteria ----------
        threshold_steps = int(
            round(self.hold_duration_threshold / control_dt)
        )
        successes = {"push_success": steps >= threshold_steps}
        failures = {
            "box_lost": dist > ts["initial_dist"] + self.max_overshoot,
            "box_lifted": box_pos[:, 2] > self.box_z + self.lift_tolerance,
        }

        # ---------- rewards ----------
        r: Dict[str, jnp.ndarray] = {}
        r["distance_tracking"] = jnp.exp(-self.distance_decay * dist)
        # dense improvement signal: previous distance minus current distance
        r["distance_delta"] = ts["prev_dist"] - dist
        r["fingerpad_proximity"] = jnp.exp(
            -self.proximity_decay * d_f2o.min(axis=1)
        )
        r["finger_contact"] = fb_contact.any(axis=1).astype(f32)
        r["target_hold"] = at_target.astype(f32)
        ts["prev_dist"] = dist

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
        obs_d, ts, dt, zero = ctx.obs, ctx.ts, ctx.control_dt, ctx.zero
        box_pos, box_vel = ctx.box_pos, ctx.box_linvel

        def sub(a, b):
            return tuple(x - y for x, y in zip(a, b))

        def norm(v):
            return jnp.sqrt(sum(x * x for x in v))

        tgt = ts["target_xy"]
        to_t = (tgt[0] - box_pos[0], tgt[1] - box_pos[1])
        dist = jnp.sqrt(to_t[0] * to_t[0] + to_t[1] * to_t[1])
        speed = norm(box_vel)

        obs = {}
        obs["object_pos"] = box_pos
        obs["object_quat"] = ctx.box_quat
        obs["object_vel"] = box_vel
        obs["target_xy"] = tgt
        obs["to_target"] = to_t
        obs["dist_to_target"] = (dist,)

        pads = [
            obs_d["fingerpad_poses_world"][7 * i:7 * i + 3] for i in range(5)
        ]
        d_f2o = tuple(norm(sub(p, box_pos)) for p in pads)
        obs["finger_to_object_distances"] = d_f2o

        # heuristic finger-box contact (tasks/api.py
        # detect_finger_box_contacts, lane form as in blind_grasping)
        box_has = norm(ctx.box_contact_force) > self.contact_binary_threshold
        prox_thr = math.sqrt(3.0) * self.box_size / 2.0 * 1.2
        fb = [
            (obs_d["contact_binary"][i] > 0.5) & box_has
            & (d_f2o[i] < prox_thr)
            for i in range(5)
        ]
        obs["fingers_on_box"] = tuple(b.astype(f32) for b in fb)

        at_target = (dist < self.position_tolerance) & (
            speed < self.rest_speed_tolerance
        )
        steps = jnp.where(at_target, ts["hold_duration_steps"][0] + 1, 0)
        obs["hold_duration"] = (steps.astype(f32) * dt,)

        threshold_steps = int(round(self.hold_duration_threshold / dt))
        successes = {"push_success": steps >= threshold_steps}
        failures = {
            "box_lost": dist > ts["initial_dist"][0] + self.max_overshoot,
            "box_lifted": box_pos[2] > self.box_z + self.lift_tolerance,
        }

        r = {}
        r["distance_tracking"] = jnp.exp(-self.distance_decay * dist)
        r["distance_delta"] = ts["prev_dist"][0] - dist
        dmin = d_f2o[0]
        for d in d_f2o[1:]:
            dmin = jnp.minimum(dmin, d)
        r["fingerpad_proximity"] = jnp.exp(-self.proximity_decay * dmin)
        any_fb = fb[0]
        for b in fb[1:]:
            any_fb = any_fb | b
        r["finger_contact"] = any_fb.astype(f32)
        r["target_hold"] = at_target.astype(f32)

        ts_new = {
            "target_xy": tgt,
            "initial_dist": ts["initial_dist"],
            "prev_dist": (dist,),
            "hold_duration_steps": (steps,),
        }
        # all four task states are provided by reset_task, so the sampled
        # reset rows carry them verbatim
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
        k_box, k_yaw, k_dir, k_dist, k_trans, k_rot, k_fing = jax.random.split(
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

        # target: random direction, distance scaled by curriculum difficulty
        scale = curriculum_scale(
            difficulty, self.curriculum_min_fraction, self.curriculum_enabled
        )
        theta = jax.random.uniform(k_dir, (n,)) * 2.0 * math.pi
        mag = (
            self.target_dist_min
            + jax.random.uniform(k_dist, (n,))
            * (self.target_dist_max - self.target_dist_min)
        ) * scale
        target_xy = xy + jnp.stack(
            [mag * jnp.cos(theta), mag * jnp.sin(theta)], axis=-1
        )

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
        ts["target_xy"] = target_xy
        dist0 = jnp.linalg.norm(target_xy - xy, axis=-1)
        ts["initial_dist"] = dist0
        # start the delta-reward baseline at the true initial distance
        ts["prev_dist"] = dist0
        return TaskReset(
            dof_pos=dof, box_pos=box_pos, box_quat=box_quat, task_states=ts
        )
