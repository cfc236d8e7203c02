"""Fused env-step Pallas kernel: the ENTIRE control step in one kernel.

The functional step (envs/dexhand.py step_fn) mirrors the reference hot loop
(dexhand_base.py:893-942 + step_processor.py:37-131): action pipeline ->
physics -> observations -> task -> termination -> rewards -> masked
auto-reset. Compiled as plain XLA that pipeline lowers to ~140 device
kernels; at 4096 envs the post-physics remainder is ~360us of kernel-launch
overhead against a ~95us physics kernel (BASELINE.md step-time bisection).

This module folds the whole step into ONE Pallas kernel over a packed,
transposed state layout:

- `FusedEnvState` holds the environment state as two row-major packs,
  `rows_f (Rf, N) f32` and `rows_i (Ri, N) i32` (env index on lanes — the
  same layout the physics kernel uses), plus the RNG key and the scalar
  curriculum difficulty / consecutive-success leaves.
- The kernel runs: action rule + filters + coupling (envs/action.py
  semantics), `physics_steps_per_control x substeps` integrator substeps and
  the final FK (physics/pallas_step.py `build_lane_sim` — the identical lane
  math the physics-only kernel compiles, so physics parity carries over),
  the default observation set (envs/observations.py), the task's lane hook
  (`DexTask.lane_step`), termination (envs/termination.py), rewards
  (envs/rewards.py), and the done-masked auto-reset merge.
- Only reset-value sampling (task.reset_task — jax.random, kept in XLA so
  the random stream matches the reference-parity step exactly), DR
  resampling, and the scalar consecutive-successes reduction stay outside.

The XLA step (envs/dexhand.py) remains the readable reference
implementation; `tests/test_fused_step.py` asserts the lane post-physics
math against it directly (the lane functions are plain jnp over (N,) arrays,
so they trace outside pallas), and the full kernel is parity-tested in
interpret mode / on TPU alongside the physics kernel.

Supported configurations (checked at build; unsupported -> build_fused_step
raises FusedUnsupported and callers fall back to the XLA step): default
pre-action rule, builtin action rules/filters only, and tasks providing a
`lane_step` implementation (BaseTask trivially; BlindGrasping in
envs/tasks/blind_grasping.py).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from types import SimpleNamespace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.constants import (
    ACTIVE_FINGER_DOF_INDICES,
    NUM_BASE_DOFS,
    NUM_DOFS,
)
from dexrobot_isaac_tpu.envs.types import EnvState
from dexrobot_isaac_tpu.physics.pallas_step import (
    _lane,
    _qmul,
    _qrot,
    _qrot_inv,
    build_lane_sim,
)
from dexrobot_isaac_tpu.physics.types import DRSample, PhysicsState

# Envs per kernel grid block. The fused kernel carries ~980 state+obs rows
# through VMEM (vs ~770 for the physics-only kernel); the measured TPU sweep
# (runs_logs/sweep_fused_block.py, v5e): block 1024 = 3.89M env-steps/s vs
# 2.56M at 512 (XLA step interleaved: 3.68M); 2048 exceeds the 16M VMEM
# scoped limit. Override for sweeps.
FUSED_BLOCK = int(os.environ.get("DEXHAND_FUSED_BLOCK", "1024"))

_SQRT_HALF = 0.7071067811865476
# the model's built-in Ry(90 deg) (observations.py _BUILTIN_ROT)
_BUILTIN_INV = (0.0, -_SQRT_HALF, 0.0, _SQRT_HALF)  # conjugate, xyzw

_DR_FIELDS = ("kp_scale", "kd_scale", "box_mass_scale", "friction_scale")


class FusedUnsupported(RuntimeError):
    """This env configuration has no fused-kernel implementation."""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedEnvState:
    """EnvState re-packed for the fused kernel: env index on lanes.

    rows_f/rows_i are the kernel's read+write carry. rows_c holds the
    "cold" leaves the kernel only ever WRITES (full_dof_targets,
    body_contact_force — both recomputed from scratch every step and read
    only by host-side consumers like the viewer/unpack): keeping them out
    of the input pack removes ~104 rows/env of VMEM input staging per
    block, which is what bounded the feasible block size (BASELINE.md:
    the fused kernel's win was VMEM-residency-limited)."""

    rows_f: jnp.ndarray                 # (Rf, N) float32, read+write
    rows_i: jnp.ndarray                 # (Ri, N) int32, read+write
    rows_c: jnp.ndarray                 # (Rc, N) float32, write-only
    consecutive_successes: jnp.ndarray  # () int32
    rng: jax.Array
    difficulty: jnp.ndarray             # () float32


# ----------------------------------------------------------------------
# layout: EnvState <-> (rows_f, rows_i)
# ----------------------------------------------------------------------
class FusedLayout:
    """Static row layout derived from an EnvState shape template. Leaves are
    flattened C-order to (N, k) and stacked as k rows; float32 leaves go to
    the f32 pack, int32/bool leaves to the i32 pack. `active_rule_targets`
    is not stored: the fused path requires the default pre-action rule
    (rules.py:78-95 identity), under which it always equals
    `active_prev_targets` (see envs/dexhand.py merge).

    Two further row eliminations (VMEM residency is the fused kernel's
    binding constraint):
    - `prev_dof_pos` is not stored at all: the step invariant
      prev_dof_pos == q holds for every reachable state (both the reset
      path dexhand.py:477 and the merge dexhand.py:377-381 assign the same
      values), so the kernel reads the pre-physics q rows for the
      finite-difference velocities and unpack reconstructs the leaf from q.
    - write-only leaves (`full_dof_targets`, `body_contact_force` — the
      kernel recomputes both from scratch and never reads the carried
      values) live in a separate COLD pack that is a kernel output but not
      a kernel input."""

    _F_DIRECT = [
        "active_prev_targets", "prev_actions",
        "prev_contact_binary",
        "prev_finger_dof_vel", "prev_hand_vel", "prev_hand_ang_vel",
    ]
    _F_COLD = ["full_dof_targets", "body_contact_force"]
    _I_DIRECT = ["episode_step_count", "contact_duration_steps", "prev_contacts"]
    _PHYS = ["q", "qd", "box_pos", "box_quat", "box_linvel", "box_angvel"]
    _PHYS_BOX2 = ["box2_pos", "box2_quat", "box2_linvel", "box2_angvel"]

    def __init__(self, template: EnvState):
        self.shapes: Dict[str, tuple] = {}
        self.dtypes: Dict[str, object] = {}
        f_names, i_names, c_names = [], [], []
        # multi-object scene (SimParams.has_box2): the second free cube's 13
        # state lanes join the pack; the lane sim carries them natively
        # (physics/pallas_step.py n_box_lanes=26)
        self.has_box2 = template.physics.box2_pos is not None
        self.phys_names = list(self._PHYS) + (
            list(self._PHYS_BOX2) if self.has_box2 else []
        )

        def add(name, leaf, cold=False):
            shape, dtype = leaf.shape, leaf.dtype
            self.shapes[name] = tuple(shape)
            self.dtypes[name] = dtype
            if cold:
                c_names.append(name)
            else:
                (f_names if dtype == jnp.float32 else i_names).append(name)

        for n in self.phys_names:
            add(n, getattr(template.physics, n))
        for n in self._F_DIRECT:
            add(n, getattr(template, n))
        for n in self._F_COLD:
            add(n, getattr(template, n), cold=True)
        for n in self._I_DIRECT:
            add(n, getattr(template, n))
        for k in _DR_FIELDS:
            add(f"dr.{k}", getattr(template.dr, k))
        for k in sorted(template.success_flags):
            add(f"sf.{k}", template.success_flags[k])
        for k in sorted(template.failure_flags):
            add(f"ff.{k}", template.failure_flags[k])
        for k in sorted(template.task_states):
            add(f"ts.{k}", template.task_states[k])
        # prev_dof_pos is reconstructed from q; record shape/dtype only
        self.shapes["prev_dof_pos"] = self.shapes["q"]
        self.dtypes["prev_dof_pos"] = self.dtypes["q"]

        def build_offsets(names):
            offs, total = {}, 0
            for n in names:
                size = int(np.prod(self.shapes[n][1:])) if len(
                    self.shapes[n]
                ) > 1 else 1
                offs[n] = (total, size)
                total += size
            return offs, total

        self.f_names, self.i_names, self.c_names = f_names, i_names, c_names
        self.offs_f, self.rows_f = build_offsets(f_names)
        self.offs_i, self.rows_i = build_offsets(i_names)
        self.offs_c, self.rows_c = build_offsets(c_names)

    # -- host/XLA-side converters (used at API boundaries only) ----------
    def _leaf(self, state: EnvState, name: str):
        if name in self.phys_names:
            return getattr(state.physics, name)
        if name.startswith("dr."):
            return getattr(state.dr, name[3:])
        if name.startswith("sf."):
            return state.success_flags[name[3:]]
        if name.startswith("ff."):
            return state.failure_flags[name[3:]]
        if name.startswith("ts."):
            return state.task_states[name[3:]]
        return getattr(state, name)

    def pack(self, state: EnvState) -> FusedEnvState:
        n = state.physics.q.shape[0]

        def rows(names, dtype):
            parts = [
                self._leaf(state, nm).reshape(n, -1).astype(dtype)
                for nm in names
            ]
            return jnp.concatenate(parts, axis=1).T

        return FusedEnvState(
            rows_f=rows(self.f_names, jnp.float32),
            rows_i=rows(self.i_names, jnp.int32),
            rows_c=rows(self.c_names, jnp.float32),
            consecutive_successes=state.consecutive_successes,
            rng=state.rng,
            difficulty=state.difficulty,
        )

    def unpack(self, fs: FusedEnvState) -> EnvState:
        n = fs.rows_f.shape[1]
        vals: Dict[str, jnp.ndarray] = {}
        for names, offs, rows in (
            (self.f_names, self.offs_f, fs.rows_f),
            (self.i_names, self.offs_i, fs.rows_i),
            (self.c_names, self.offs_c, fs.rows_c),
        ):
            for nm in names:
                o, k = offs[nm]
                shape = self.shapes[nm]
                v = rows[o:o + k].T.reshape((n,) + shape[1:])
                vals[nm] = v.astype(self.dtypes[nm])
        # step invariant (see class docstring): prev_dof_pos == q always
        vals["prev_dof_pos"] = vals["q"]
        return EnvState(
            physics=PhysicsState(**{p: vals[p] for p in self.phys_names}),
            full_dof_targets=vals["full_dof_targets"],
            active_prev_targets=vals["active_prev_targets"],
            # default pre-action rule: identical to active_prev_targets
            active_rule_targets=vals["active_prev_targets"],
            prev_actions=vals["prev_actions"],
            prev_dof_pos=vals["prev_dof_pos"],
            contact_duration_steps=vals["contact_duration_steps"],
            prev_contact_binary=vals["prev_contact_binary"],
            episode_step_count=vals["episode_step_count"],
            body_contact_force=vals["body_contact_force"],
            prev_finger_dof_vel=vals["prev_finger_dof_vel"],
            prev_hand_vel=vals["prev_hand_vel"],
            prev_hand_ang_vel=vals["prev_hand_ang_vel"],
            prev_contacts=vals["prev_contacts"],
            success_flags={
                k[3:]: vals[k] for k in self.i_names if k.startswith("sf.")
            },
            failure_flags={
                k[3:]: vals[k] for k in self.i_names if k.startswith("ff.")
            },
            consecutive_successes=fs.consecutive_successes,
            task_states={
                k[3:]: vals[k]
                for k in self.f_names + self.i_names if k.startswith("ts.")
            },
            dr=DRSample(**{k: vals[f"dr.{k}"] for k in _DR_FIELDS}),
            rng=fs.rng,
            difficulty=fs.difficulty,
        )


# ----------------------------------------------------------------------
# lane math library (plain jnp over (B,) lane arrays; used inside the
# kernel AND directly testable outside pallas)
# ----------------------------------------------------------------------
def _norm(lanes):
    return jnp.sqrt(sum(x * x for x in lanes))


def _qconj(q):
    return (-q[0], -q[1], -q[2], q[3])


def lane_default_obs(
    c, q, dvel, acts, t_active, full, hand_pos, hand_quat, hand_lin, hand_ang,
    site_pos, site_quat, cf_flat, prev_cb, dur_i, epi_old,
):
    """Default observation dict in lane form (observations.py
    compute_default_observations / observation_encoder.py:576-758).

    `c` is a SimpleNamespace of static config (see build_fused_step).
    Returns (obs, new_dur_i32, binary, mags)."""
    f32 = jnp.float32
    obs = {}
    act_idx = list(ACTIVE_FINGER_DOF_INDICES)
    obs["base_dof_pos"] = q[:NUM_BASE_DOFS]
    obs["base_dof_vel"] = dvel[:NUM_BASE_DOFS]
    obs["active_finger_dof_pos"] = tuple(q[i] for i in act_idx)
    obs["active_finger_dof_vel"] = tuple(dvel[i] for i in act_idx)
    obs["all_finger_dof_pos"] = q[NUM_BASE_DOFS:]
    obs["all_finger_dof_vel"] = dvel[NUM_BASE_DOFS:]

    obs["hand_pose"] = hand_pos + hand_quat
    obs["hand_pose_arr_aligned"] = hand_pos + _qmul(hand_quat, _BUILTIN_INV)

    cf = []
    for b in c.contact_body_indices:
        cf.extend((cf_flat[3 * b], cf_flat[3 * b + 1], cf_flat[3 * b + 2]))
    obs["contact_forces"] = tuple(cf)
    mags = tuple(
        _norm(cf[3 * i:3 * i + 3]) for i in range(len(c.contact_body_indices))
    )
    obs["contact_force_magnitude"] = mags
    binary = tuple(
        (m > c.contact_binary_threshold).astype(f32) for m in mags
    )
    obs["contact_binary"] = binary

    # duration tracking (observation_encoder.py:323-361)
    new_dur = []
    for i in range(len(binary)):
        started = (binary[i] > 0.5) & (prev_cb[i] < 0.5)
        active = binary[i] > 0.5
        nd = jnp.where(
            started,
            jnp.ones_like(dur_i[i]),
            jnp.where(active, dur_i[i] + 1, 0),
        )
        new_dur.append(nd)
    new_dur = tuple(new_dur)
    obs["contact_duration"] = tuple(
        d.astype(f32) * c.control_dt for d in new_dur
    )

    obs["prev_actions"] = acts
    obs["active_prev_targets"] = t_active
    obs["base_dof_target"] = full[:NUM_BASE_DOFS]
    obs["active_finger_dof_target"] = tuple(full[i] for i in act_idx)
    obs["all_finger_dof_target"] = full[NUM_BASE_DOFS:]

    def poses_world(site_indices):
        lanes = []
        for s in site_indices:
            lanes.extend(site_pos[s])
            lanes.extend(site_quat[s])
        return tuple(lanes)

    def poses_hand(site_indices):
        lanes = []
        hq_c = _qconj(hand_quat)
        for s in site_indices:
            d = tuple(p - h for p, h in zip(site_pos[s], hand_pos))
            lanes.extend(_qrot_inv(hand_quat, d))
            lanes.extend(_qmul(hq_c, site_quat[s]))
        return tuple(lanes)

    obs["fingertip_poses_world"] = poses_world(c.fingertip_site_indices)
    obs["fingertip_poses_hand"] = poses_hand(c.fingertip_site_indices)
    obs["fingerpad_poses_world"] = poses_world(c.fingerpad_site_indices)
    obs["fingerpad_poses_hand"] = poses_hand(c.fingerpad_site_indices)

    obs["episode_time"] = (epi_old.astype(f32) * c.control_dt,)
    return obs, new_dur, binary, mags


def lane_common_rewards(
    c, obs, dvel, hand_vel, hand_ang_vel, mags,
    prev_fvel, prev_hvel, prev_havel, prev_contacts_i,
):
    """The 10 common terms + tracking (rewards.py / reward_calculator.py:
    66-221). Terms are computed lazily — only requested below via nonzero
    weights — but tracking always updates. Returns (terms_fn, tracking)."""
    f32 = jnp.float32
    finger_vel = dvel[NUM_BASE_DOFS:]
    contacts = tuple(m > 0.1 for m in mags)
    tracking = {
        "prev_finger_dof_vel": finger_vel,
        "prev_hand_vel": hand_vel,
        "prev_hand_ang_vel": hand_ang_vel,
        "prev_contacts": contacts,
    }

    def term(name):
        if name == "alive":
            return jnp.ones_like(dvel[0])
        if name == "height_safety":
            tipz = [
                obs["fingertip_poses_world"][7 * i + 2] for i in range(5)
            ]
            min_tip = tipz[0]
            for z in tipz[1:]:
                min_tip = jnp.minimum(min_tip, z)
            return jnp.clip(1.0 - jnp.exp(-(min_tip - 0.02) * 20.0), 0.0, 1.0)
        if name == "finger_velocity":
            return jnp.exp(-0.1 * _norm(finger_vel))
        if name == "hand_velocity":
            return jnp.exp(-0.2 * _norm(hand_vel))
        if name == "hand_angular_velocity":
            return jnp.exp(-0.2 * _norm(hand_ang_vel))
        if name == "joint_limit":
            over_sum = jnp.zeros_like(dvel[0])
            fpos = obs["all_finger_dof_pos"]
            for i in range(20):
                lo = float(c.finger_lower[i])
                rng = float(c.finger_upper[i] - c.finger_lower[i])
                if rng > 0:
                    nrm = 2.0 * (fpos[i] - lo) / rng - 1.0
                    over_sum = over_sum + jnp.clip(jnp.abs(nrm) - 0.8, 0.0, 1.0)
            return 1.0 - over_sum / 20.0
        if name == "finger_acceleration":
            d = tuple(a - b for a, b in zip(finger_vel, prev_fvel))
            return jnp.exp(-2.0 * _norm(d))
        if name == "hand_acceleration":
            d = tuple(a - b for a, b in zip(hand_vel, prev_hvel))
            return jnp.exp(-0.5 * _norm(d))
        if name == "hand_angular_acceleration":
            d = tuple(a - b for a, b in zip(hand_ang_vel, prev_havel))
            return jnp.exp(-0.5 * _norm(d))
        if name == "contact_stability":
            changes = jnp.zeros_like(dvel[0])
            for cur, prev in zip(contacts, prev_contacts_i):
                changes = changes + (cur ^ (prev != 0)).astype(f32)
            return jnp.exp(-changes)
        raise KeyError(name)

    return term, tracking


def lane_termination(c, new_count, success_crit, failure_crit, sflags, fflags):
    """Mutually-exclusive masks, one-time rewards, per-reason flags
    (termination.py evaluate_termination / termination_manager.py:120-321).
    Criteria dicts hold bool lanes; flags hold int32 lanes (0/1)."""
    f32 = jnp.float32
    active_s = {
        k: v for k, v in success_crit.items()
        if not c.active_success or k in c.active_success
    }
    active_f = {
        k: v for k, v in failure_crit.items()
        if not c.active_failure or k in c.active_failure
    }

    ep_succ = jnp.zeros_like(new_count, dtype=bool)
    new_sflags = {}
    for name in sorted(active_s):
        crit = active_s[name]
        new = (~ep_succ) & crit
        new_sflags[name] = (new | (sflags[name] != 0)).astype(jnp.int32)
        ep_succ = ep_succ | crit
    ep_fail = jnp.zeros_like(new_count, dtype=bool)
    new_fflags = {}
    for name in sorted(active_f):
        crit = active_f[name]
        new = (~ep_fail) & crit
        new_fflags[name] = (new | (fflags[name] != 0)).astype(jnp.int32)
        ep_fail = ep_fail | crit

    timeout = new_count >= c.max_episode_length - 1
    should_reset = ep_succ | ep_fail | timeout
    succ_t = ep_succ & should_reset
    fail_t = ep_fail & ~ep_succ & should_reset
    tout_t = timeout & ~ep_succ & ~ep_fail & should_reset

    term_reward = (
        succ_t.astype(f32) * c.success_reward
        - fail_t.astype(f32) * c.failure_penalty
        - tout_t.astype(f32) * c.timeout_penalty
    )
    term_components = {
        "termination_success": succ_t.astype(f32),
        "termination_success_weighted": succ_t.astype(f32) * c.success_reward,
        "termination_failure_penalty": fail_t.astype(f32),
        "termination_failure_penalty_weighted": -fail_t.astype(f32)
        * c.failure_penalty,
        "termination_timeout_penalty": tout_t.astype(f32),
        "termination_timeout_penalty_weighted": -tout_t.astype(f32)
        * c.timeout_penalty,
    }
    return (
        should_reset, succ_t, fail_t, tout_t, term_reward, term_components,
        new_sflags, new_fflags,
    )


# ----------------------------------------------------------------------
# fused step builder
# ----------------------------------------------------------------------
def _check_supported(comps):
    from dexrobot_isaac_tpu.envs.tasks.api import DexTask

    task, pl = comps.task, comps.pipeline
    if task.pre_action_rule is not None:
        raise FusedUnsupported("custom pre-action rule")
    if pl.custom_action_rule is not None or pl.custom_filters:
        raise FusedUnsupported("custom action rule/filters")
    for f in pl.post_action_filters:
        if f not in ("velocity_clamp", "position_clamp"):
            raise FusedUnsupported(f"unknown post-action filter {f}")
    overrides_compute = (
        type(task).compute_step is not DexTask.compute_step
    )
    overrides_lane = type(task).lane_step is not DexTask.lane_step
    if overrides_compute and not overrides_lane:
        raise FusedUnsupported(
            f"task {task.name} overrides compute_step without a lane_step "
            "implementation"
        )


class _OutRows:
    """Write-shim standing in for a pallas output Ref when the kernel body is
    traced as plain XLA (backend="xla"): collects `ref[row, :] = lane`
    assignments and stacks them. Every row must be written exactly once —
    `stack` raises on gaps, which doubles as a layout-coverage check."""

    def __init__(self, nrows: int):
        self.rows = [None] * nrows

    def __setitem__(self, idx, val):
        r = idx[0] if isinstance(idx, tuple) else idx
        if self.rows[r] is not None:
            raise ValueError(f"output row {r} written twice")
        self.rows[r] = val

    def stack(self, dtype):
        missing = [i for i, r in enumerate(self.rows) if r is None]
        if missing:
            raise ValueError(f"output rows never written: {missing}")
        return jnp.stack([v.astype(dtype) for v in self.rows])


def build_fused_step(env, block: Optional[int] = None, interpret: bool = False,
                     backend: str = "pallas"):
    """Build the fused step for a DexHandEnv. Returns a SimpleNamespace with
    `step_fn(FusedEnvState, actions)`, `pack`/`unpack`, `reset(key)`,
    `comp_names` (reward-component packing order, matches the XLA path's
    sorted extras keys), and the layout. Raises FusedUnsupported for
    configurations without a lane implementation.

    backend="pallas" compiles the kernel with pallas_call (the TPU path;
    interpret=True runs it under the pallas interpreter — far too slow for
    this kernel size except on tiny probes). backend="xla" traces the SAME
    kernel body on plain arrays via _OutRows write-shims (no pallas; XLA-CPU
    compile of the lane physics takes tens of minutes — debugging only).
    backend="hybrid" is the CPU parity path tests/test_fused_step.py runs
    against envs/dexhand.py step_fn: the shim with physics delegated to the
    env's own _control_step, so it compiles fast and isolates the
    post-physics lane math."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    comps = env.comps
    _check_supported(comps)

    # --- templates from the XLA reference path (shapes only, no compute) ---
    state_t, _obs_t = jax.eval_shape(env.reset_fn, jax.random.key(0))
    acts_t = jax.ShapeDtypeStruct(
        (comps.num_envs, comps.num_actions), jnp.float32
    )
    _, _, _, _, extras_t = jax.eval_shape(env.step_fn, state_t, acts_t)
    comp_names = tuple(sorted(extras_t["reward_components"]))

    layout = FusedLayout(state_t)
    L = layout
    sim = build_lane_sim(comps.engine, comps.physics_steps_per_control)

    # reset task-state row plan: tasks whose reset_task SAMPLES task-state
    # values (e.g. BoxPushing's target_xy) get those rows appended to the
    # reset operand so lane_step can consume them via ctx.reset_ts; purely
    # derived reset states (BlindGrasping's initial_box_pos) may instead be
    # recomputed from ctx.reset_box_pos/quat inside lane_step
    reset_ts_t = jax.eval_shape(
        lambda k, d: comps.task.reset_task(
            k, comps.num_envs, env._default_dof, difficulty=d
        ).task_states or {},
        jax.random.key(0), jnp.zeros((), jnp.float32),
    )
    rts_keys = sorted(reset_ts_t)
    rts_sizes = {
        k: max(1, int(np.prod(reset_ts_t[k].shape[1:])))
        for k in rts_keys
    }
    rts_rows = int(sum(rts_sizes.values()))
    has_box2 = L.has_box2
    # reset operand rows: dof(26) + box pose(7) [+ box2 pose(7)] + sampled
    # task states
    box2_rst = 7 if has_box2 else 0
    rst_rows = NUM_DOFS + 7 + box2_rst + rts_rows

    pipe = comps.pipeline
    ocfg = comps.obs_cfg
    rcfg = comps.reward_cfg
    tcfg = comps.term_cfg
    task = comps.task
    A = int(pipe.num_actions)
    nc = int(ocfg.num_contact_bodies)
    hand_b = int(ocfg.hand_body_index)
    control_dt = float(comps.control_dt)
    act_idx = list(range(NUM_BASE_DOFS)) + list(ACTIVE_FINGER_DOF_INDICES)
    lo_c = np.asarray(pipe.active_lower, np.float32)
    hi_c = np.asarray(pipe.active_upper, np.float32)
    md_c = np.asarray(pipe.max_deltas, np.float32)
    csrc = [int(x) for x in pipe.coupling_src]
    cscale = np.asarray(pipe.coupling_scale, np.float32)
    weights = dict(rcfg.weights)

    obs_c = SimpleNamespace(
        contact_body_indices=[int(x) for x in ocfg.contact_body_indices],
        contact_binary_threshold=float(ocfg.contact_binary_threshold),
        control_dt=control_dt,
        fingertip_site_indices=[int(x) for x in ocfg.fingertip_site_indices],
        fingerpad_site_indices=[int(x) for x in ocfg.fingerpad_site_indices],
        finger_lower=np.asarray(rcfg.finger_lower_limits, np.float32),
        finger_upper=np.asarray(rcfg.finger_upper_limits, np.float32),
    )
    term_c = SimpleNamespace(
        active_success=tuple(tcfg.active_success_criteria),
        active_failure=tuple(tcfg.active_failure_criteria),
        max_episode_length=int(tcfg.max_episode_length),
        success_reward=float(tcfg.success_reward),
        failure_penalty=float(tcfg.failure_penalty),
        timeout_penalty=float(tcfg.timeout_penalty),
    )

    # obs row plan: policy keys then critic keys; dims validated vs the env
    obs_keys = list(ocfg.policy_observation_keys) + list(
        ocfg.critic_observation_keys
    )
    obs_dim = env.num_obs + env.num_states

    needed_sites = sorted(
        set(obs_c.fingertip_site_indices) | set(obs_c.fingerpad_site_indices)
    )
    sflag_names = sorted(
        k[3:] for k in L.i_names if k.startswith("sf.")
    )
    fflag_names = sorted(
        k[3:] for k in L.i_names if k.startswith("ff.")
    )
    ts_names = sorted(
        k[3:] for k in L.f_names + L.i_names if k.startswith("ts.")
    )

    # ------------------------------------------------------------------
    def lane_physics(q0, qd0, box0, full, spawn, drv, zero):
        """Physics + final FK in lane form — the production path, the SAME
        lane sim the physics-only kernel compiles (build_lane_sim)."""
        cf0 = tuple(zero for _ in range(sim.nb * 3))
        bf0 = tuple(zero for _ in range(sim.n_boxf_lanes))

        def body(_, carry):
            q_, qd_, box_, _cf, _bf = carry
            return sim.substep(q_, qd_, box_, full, spawn, drv)

        q, qd, box, cf, bf = jax.lax.fori_loop(
            0, sim.total_substeps, body, (q0, qd0, box0, cf0, bf0)
        )
        pos, quat, lin, ang, _axw, _orig = sim.fk_lane(q, qd, spawn, zero)
        site_pos, site_quat = {}, {}
        mat = lambda v: tuple(_lane(x, zero) for x in v)
        for s in needed_sites:
            b = sim.site_b[s]
            sp_l = tuple(float(sim.sitep_c[s][k]) for k in range(3))
            sq_l = tuple(float(sim.siteq_c[s][k]) for k in range(4))
            site_pos[s] = mat(
                tuple(a + d for a, d in zip(pos[b], _qrot(quat[b], sp_l)))
            )
            site_quat[s] = mat(_qmul(quat[b], sq_l))
        return SimpleNamespace(
            q=q, qd=qd, box=box, cf=cf, bf=bf,
            hand_pos=mat(pos[hand_b]), hand_quat=mat(quat[hand_b]),
            hand_lin=mat(lin[hand_b]), hand_ang=mat(ang[hand_b]),
            site_pos=site_pos, site_quat=site_quat,
        )

    def hybrid_physics(q0, qd0, box0, full, spawn, drv, zero):
        """Physics via the env's own `_control_step` (the XLA reference
        path) on re-stacked (B, ...) arrays, re-laned for the post-physics
        lane math. Only usable under the _OutRows shim (backend="hybrid") —
        pallas refs can't host an inner pallas_call. This isolates the NEW
        fused-kernel code (obs/task/termination/rewards/reset-merge lanes)
        for CPU parity tests: physics inputs are bitwise identical to
        envs/dexhand.py step_fn, so any output difference is post-physics."""
        stk = lambda lanes: jnp.stack(lanes, axis=1)
        phys_in = PhysicsState(
            q=stk(q0), qd=stk(qd0),
            box_pos=stk(box0[0:3]), box_quat=stk(box0[3:7]),
            box_linvel=stk(box0[7:10]), box_angvel=stk(box0[10:13]),
            **(
                {
                    "box2_pos": stk(box0[13:16]),
                    "box2_quat": stk(box0[16:20]),
                    "box2_linvel": stk(box0[20:23]),
                    "box2_angvel": stk(box0[23:26]),
                }
                if has_box2 else {}
            ),
        )
        dr = DRSample(
            kp_scale=drv[0], kd_scale=drv[1],
            box_mass_scale=drv[2], friction_scale=drv[3],
        )
        phys, info, kin = env._control_step(phys_in, stk(full), stk(spawn), dr)
        lanes = lambda a: tuple(a[:, i] for i in range(a.shape[1]))
        box = (
            lanes(phys.box_pos) + lanes(phys.box_quat)
            + lanes(phys.box_linvel) + lanes(phys.box_angvel)
        )
        if has_box2:
            box = box + (
                lanes(phys.box2_pos) + lanes(phys.box2_quat)
                + lanes(phys.box2_linvel) + lanes(phys.box2_angvel)
            )
        n_loc = phys.q.shape[0]
        cf = lanes(info.body_contact_force.reshape(n_loc, -1))
        site_pos = {s: lanes(kin.site_pos[:, s]) for s in needed_sites}
        site_quat = {s: lanes(kin.site_quat[:, s]) for s in needed_sites}
        bf = lanes(info.box_contact_force)
        if has_box2:
            bf = bf + lanes(info.box2_contact_force)
        return SimpleNamespace(
            q=lanes(phys.q), qd=lanes(phys.qd), box=box, cf=cf,
            bf=bf,
            hand_pos=lanes(kin.body_pos[:, hand_b]),
            hand_quat=lanes(kin.body_quat[:, hand_b]),
            hand_lin=lanes(kin.body_linvel[:, hand_b]),
            hand_ang=lanes(kin.body_angvel[:, hand_b]),
            site_pos=site_pos, site_quat=site_quat,
        )

    def make_kernel(phys_impl):
        import functools

        return functools.partial(kernel_body, phys_impl)

    def kernel_body(phys_impl, f_ref, i_ref, act_ref, rst_ref, drn_ref,
                    spw_ref, fo_ref, io_ref, co_ref, obs_ref, rew_ref,
                    msk_ref, cmp_ref):
        def gf(name):
            o, k = L.offs_f[name]
            return tuple(f_ref[o + j, :] for j in range(k))

        def gi(name):
            o, k = L.offs_i[name]
            return tuple(i_ref[o + j, :] for j in range(k))

        def pf(name, lanes):
            o, k = L.offs_f[name]
            assert len(lanes) == k, (name, len(lanes), k)
            for j in range(k):
                fo_ref[o + j, :] = lanes[j]

        def pc(name, lanes):
            o, k = L.offs_c[name]
            assert len(lanes) == k, (name, len(lanes), k)
            for j in range(k):
                co_ref[o + j, :] = lanes[j]

        def pi(name, lanes):
            o, k = L.offs_i[name]
            assert len(lanes) == k, (name, len(lanes), k)
            for j in range(k):
                io_ref[o + j, :] = lanes[j].astype(jnp.int32)

        acts = tuple(act_ref[j, :] for j in range(A))
        zero = jnp.zeros_like(acts[0])
        prev = gf("active_prev_targets")

        # --- action pipeline (envs/action.py process_actions) ---
        t = list(prev)  # default rule output = active_rule = prev
        ofs = 0
        if pipe.policy_controls_base:
            for i in range(6):
                if pipe.control_mode == "position":
                    t[i] = (acts[i] + 1.0) * 0.5 * float(
                        hi_c[i] - lo_c[i]
                    ) + float(lo_c[i])
                else:
                    t[i] = prev[i] + acts[i] * float(md_c[i])
            ofs = 6
        if pipe.policy_controls_fingers:
            for i in range(12):
                j = 6 + i
                if pipe.control_mode == "position":
                    t[j] = (acts[ofs + i] + 1.0) * 0.5 * float(
                        hi_c[j] - lo_c[j]
                    ) + float(lo_c[j])
                else:
                    t[j] = prev[j] + acts[ofs + i] * float(md_c[j])
        if pipe.control_mode == "position_delta":
            # the delta rule clamps ALL 18 to limits (default_rules.py:68-114)
            t = [
                jnp.clip(t[i], float(lo_c[i]), float(hi_c[i]))
                for i in range(18)
            ]
        for fname in pipe.post_action_filters:
            if fname == "velocity_clamp":
                t = [
                    prev[i] + jnp.clip(
                        t[i] - prev[i], -float(md_c[i]), float(md_c[i])
                    )
                    for i in range(18)
                ]
            else:  # position_clamp
                t = [
                    jnp.clip(t[i], float(lo_c[i]), float(hi_c[i]))
                    for i in range(18)
                ]
        t = tuple(t)
        full = tuple(
            t[csrc[j]] * float(cscale[j]) if cscale[j] != 0.0 else zero
            for j in range(NUM_DOFS)
        )

        # --- physics + final FK (lane sim on the pallas/xla backends; the
        # env's own _control_step on the hybrid parity backend) ---
        q0, qd0 = gf("q"), gf("qd")
        box0 = gf("box_pos") + gf("box_quat") + gf("box_linvel") + gf("box_angvel")
        if has_box2:
            box0 = box0 + (
                gf("box2_pos") + gf("box2_quat")
                + gf("box2_linvel") + gf("box2_angvel")
            )
        spawn = tuple(spw_ref[j, :] for j in range(3))
        drv = (
            gf("dr.kp_scale")[0], gf("dr.kd_scale")[0],
            gf("dr.box_mass_scale")[0], gf("dr.friction_scale")[0],
        )
        ph = phys_impl(q0, qd0, box0, full, spawn, drv, zero)
        q, qd, box, cf, bf = ph.q, ph.qd, ph.box, ph.cf, ph.bf
        site_pos, site_quat = ph.site_pos, ph.site_quat

        # --- default observations ---
        # prev_dof_pos == pre-physics q (layout invariant; rows not stored)
        prev_dof = q0
        dvel = tuple((q[i] - prev_dof[i]) / control_dt for i in range(NUM_DOFS))
        epi_old = gi("episode_step_count")[0]
        obs, new_dur, binary, mags = lane_default_obs(
            obs_c, q, dvel, acts, t, full,
            ph.hand_pos, ph.hand_quat, ph.hand_lin, ph.hand_ang,
            site_pos, site_quat, cf, gf("prev_contact_binary"),
            gi("contact_duration_steps"), epi_old,
        )

        # --- task lane step ---
        rst_dof = tuple(rst_ref[j, :] for j in range(NUM_DOFS))
        if proj_clear is not None:
            # spawn-validity projection of the reset rows (see build-time
            # note at proj_clear): lift ARTz so the lowest fingertip
            # clears the ground by `clearance`
            mz = sim.min_site_z(rst_dof, proj_spawn, zero, proj_tips)
            lift = jnp.maximum(0.0, proj_clear - mz)
            rst_dof = rst_dof[:2] + (rst_dof[2] + lift,) + rst_dof[3:]
        rst_bpos = tuple(rst_ref[NUM_DOFS + j, :] for j in range(3))
        rst_bquat = tuple(rst_ref[NUM_DOFS + 3 + j, :] for j in range(4))
        ofs_r = NUM_DOFS + 7
        rst_b2pos = rst_b2quat = None
        if has_box2:
            rst_b2pos = tuple(rst_ref[ofs_r + j, :] for j in range(3))
            rst_b2quat = tuple(rst_ref[ofs_r + 3 + j, :] for j in range(4))
            ofs_r += 7
        reset_ts = {}
        for k in rts_keys:
            reset_ts[k] = tuple(
                rst_ref[ofs_r + j, :] for j in range(rts_sizes[k])
            )
            ofs_r += rts_sizes[k]
        ctx = SimpleNamespace(
            obs=obs,
            ts={k: gf(f"ts.{k}") if f"ts.{k}" in L.offs_f else gi(f"ts.{k}")
                for k in ts_names},
            box_pos=box[0:3], box_quat=box[3:7],
            box_linvel=box[7:10], box_angvel=box[10:13],
            box_contact_force=bf[0:3],
            q=q, qd=qd, dvel=dvel,
            control_dt=control_dt, zero=zero,
            reset_box_pos=rst_bpos, reset_box_quat=rst_bquat,
            reset_ts=reset_ts,
        )
        if has_box2:
            # second free cube: state lanes 13:26, net contact force lanes
            # 3:6 of the boxf output (pallas_step.py boxf_out)
            ctx.box2_pos = box[13:16]
            ctx.box2_quat = box[16:20]
            ctx.box2_linvel = box[20:23]
            ctx.box2_angvel = box[23:26]
            ctx.box2_contact_force = bf[3:6]
            ctx.reset_box2_pos = rst_b2pos
            ctx.reset_box2_quat = rst_b2quat
        lt = task.lane_step(ctx)
        obs.update(lt.task_obs)

        new_count = epi_old + 1

        # --- termination ---
        failure_crit = dict(lt.failure)
        # a task-provided hitting_ground overrides the builtin (same
        # precedence as the XLA path's {**builtin, **task} merge in
        # envs/dexhand.py — e.g. BoxStacking's bridge-annealed variant)
        if tcfg.has_height_safety and "hitting_ground" not in failure_crit:
            hand_z = ph.hand_pos[2]
            tipz = [obs["fingertip_poses_world"][7 * i + 2] for i in range(5)]
            min_tip = tipz[0]
            for z in tipz[1:]:
                min_tip = jnp.minimum(min_tip, z)
            failure_crit["hitting_ground"] = (
                (hand_z < tcfg.handbase_threshold)
                | (min_tip < tcfg.fingertip_threshold)
            )
        sflags = {k: gi(f"sf.{k}")[0] for k in sflag_names}
        fflags = {k: gi(f"ff.{k}")[0] for k in fflag_names}
        (
            done, succ_t, fail_t, tout_t, term_reward, term_comps,
            new_sflags, new_fflags,
        ) = lane_termination(
            term_c, new_count, dict(lt.success), failure_crit, sflags, fflags
        )

        # --- rewards ---
        term_fn, tracking = lane_common_rewards(
            obs_c, obs, dvel, ph.hand_lin, ph.hand_ang, mags,
            gf("prev_finger_dof_vel"), gf("prev_hand_vel"),
            gf("prev_hand_ang_vel"), gi("prev_contacts"),
        )
        all_names = sorted(
            set(lt.rewards) | {
                "alive", "height_safety", "finger_velocity", "hand_velocity",
                "hand_angular_velocity", "joint_limit", "finger_acceleration",
                "hand_acceleration", "hand_angular_acceleration",
                "contact_stability",
            }
        )
        total = zero
        components = {}
        for name in all_names:
            w = weights.get(name, 0.0)
            if w == 0.0:
                continue
            raw = lt.rewards[name] if name in lt.rewards else term_fn(name)
            weighted = raw * w
            total = total + weighted
            components[name] = raw
            components[f"{name}_weighted"] = weighted
        components["total"] = total
        components.update(term_comps)
        rew = total + term_reward

        # --- obs rows (terminal obs: computed pre-merge) ---
        row = 0
        for key in obs_keys:
            lanes = obs[key]
            for lane in lanes:
                obs_ref[row, :] = lane
                row += 1
        assert row == obs_dim, (row, obs_dim)

        rew_ref[0, :] = rew
        msk_ref[0, :] = done.astype(jnp.int32)
        msk_ref[1, :] = succ_t.astype(jnp.int32)
        msk_ref[2, :] = fail_t.astype(jnp.int32)
        msk_ref[3, :] = tout_t.astype(jnp.int32)
        for j, name in enumerate(comp_names):
            cmp_ref[j, :] = components[name]

        # --- masked auto-reset merge (envs/dexhand.py step_fn) ---
        def sel(reset_lane, live_lane):
            return jnp.where(done, reset_lane, live_lane)

        def sel_t(reset_lanes, live_lanes):
            return tuple(sel(a, b) for a, b in zip(reset_lanes, live_lanes))

        zt = lambda k: (zero,) * k
        rst_active = tuple(rst_dof[i] for i in act_idx)
        pf("q", sel_t(rst_dof, q))
        pf("qd", sel_t(zt(NUM_DOFS), qd))
        pf("box_pos", sel_t(rst_bpos, box[0:3]))
        pf("box_quat", sel_t(rst_bquat, box[3:7]))
        pf("box_linvel", sel_t(zt(3), box[7:10]))
        pf("box_angvel", sel_t(zt(3), box[10:13]))
        if has_box2:
            pf("box2_pos", sel_t(rst_b2pos, box[13:16]))
            pf("box2_quat", sel_t(rst_b2quat, box[16:20]))
            pf("box2_linvel", sel_t(zt(3), box[20:23]))
            pf("box2_angvel", sel_t(zt(3), box[23:26]))
        pc("full_dof_targets", sel_t(rst_dof, full))
        pf("active_prev_targets", sel_t(rst_active, t))
        pf("prev_actions", sel_t(zt(A), acts))
        pf("prev_contact_binary", sel_t(zt(nc), binary))
        pc("body_contact_force", sel_t(zt(sim.nb * 3), cf))
        pf("prev_finger_dof_vel", sel_t(zt(20), tracking["prev_finger_dof_vel"]))
        pf("prev_hand_vel", sel_t(zt(3), tracking["prev_hand_vel"]))
        pf("prev_hand_ang_vel", sel_t(zt(3), tracking["prev_hand_ang_vel"]))
        drn = tuple(drn_ref[j, :] for j in range(4))
        for j, k in enumerate(_DR_FIELDS):
            pf(f"dr.{k}", (sel(drn[j], gf(f"dr.{k}")[0]),))

        izero = jnp.zeros_like(new_count)
        pi("episode_step_count", (sel(izero, new_count),))
        pi("contact_duration_steps",
           tuple(sel(izero, d) for d in new_dur))
        pi("prev_contacts",
           tuple(sel(izero, ct.astype(jnp.int32))
                 for ct in tracking["prev_contacts"]))
        for k in sflag_names:
            pi(f"sf.{k}", (sel(izero, new_sflags[k]),))
        for k in fflag_names:
            pi(f"ff.{k}", (sel(izero, new_fflags[k]),))
        for k in ts_names:
            name = f"ts.{k}"
            new_lanes = lt.ts_new[k]
            reset_lanes = lt.reset_ts[k]
            if name in L.offs_f:
                pf(name, sel_t(reset_lanes, new_lanes))
            else:
                pi(name, tuple(
                    sel(r.astype(jnp.int32), nl.astype(jnp.int32))
                    for r, nl in zip(reset_lanes, new_lanes)
                ))

    # ------------------------------------------------------------------
    n = comps.num_envs
    blk = block if block is not None else FUSED_BLOCK
    # local batch under shard_map may be smaller than num_envs; the pallas
    # call re-derives grid from the runtime shape instead
    n_comp = len(comp_names)

    def make_call_shim(phys_impl):
        kern = make_kernel(phys_impl)

        def call(rows_f, rows_i, act_T, rst_T, drn_T, spw_T):
            fo = _OutRows(L.rows_f)
            io = _OutRows(L.rows_i)
            co = _OutRows(L.rows_c)
            obs_o = _OutRows(obs_dim)
            rew_o = _OutRows(1)
            msk_o = _OutRows(4)
            cmp_o = _OutRows(n_comp)
            kern(rows_f, rows_i, act_T, rst_T, drn_T, spw_T,
                 fo, io, co, obs_o, rew_o, msk_o, cmp_o)
            return (
                fo.stack(jnp.float32), io.stack(jnp.int32),
                co.stack(jnp.float32),
                obs_o.stack(jnp.float32), rew_o.stack(jnp.float32),
                msk_o.stack(jnp.int32), cmp_o.stack(jnp.float32),
            )

        return call

    def call_kernel_pallas(rows_f, rows_i, act_T, rst_T, drn_T, spw_T):
        kernel = make_kernel(lane_physics)
        nloc = rows_f.shape[1]
        b = blk if nloc % blk == 0 else nloc
        grid = nloc // b
        spec = lambda d: pl.BlockSpec(
            (d, b), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        # blocks beyond 1024 lanes exceed Mosaic's default 16 MiB scoped
        # VMEM limit (block 2048 needs ~20 MiB; v5e has 128 MiB physical).
        # Raise the limit only for large blocks so the production block
        # 1024 keeps the compiler's default scheduling.
        params = {}
        if b > 1024:
            try:
                vmem_mb = int(os.environ.get("DEXHAND_VMEM_LIMIT_MB", "64"))
            except ValueError:
                warnings.warn(
                    "DEXHAND_VMEM_LIMIT_MB is not an integer "
                    f"({os.environ['DEXHAND_VMEM_LIMIT_MB']!r}); "
                    "using the 64 MiB default"
                )
                vmem_mb = 64
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024
            )
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            interpret=interpret,
            **params,
            in_specs=[
                spec(L.rows_f), spec(L.rows_i), spec(A),
                spec(rst_rows), spec(4), spec(3),
            ],
            out_specs=[
                spec(L.rows_f), spec(L.rows_i), spec(L.rows_c),
                spec(obs_dim), spec(1), spec(4), spec(n_comp),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((L.rows_f, nloc), jnp.float32),
                jax.ShapeDtypeStruct((L.rows_i, nloc), jnp.int32),
                jax.ShapeDtypeStruct((L.rows_c, nloc), jnp.float32),
                jax.ShapeDtypeStruct((obs_dim, nloc), jnp.float32),
                jax.ShapeDtypeStruct((1, nloc), jnp.float32),
                jax.ShapeDtypeStruct((4, nloc), jnp.int32),
                jax.ShapeDtypeStruct((n_comp, nloc), jnp.float32),
            ],
            input_output_aliases={0: 0, 1: 1},
        )(rows_f, rows_i, act_T, rst_T, drn_T, spw_T)

    if backend == "xla":
        call_kernel = make_call_shim(lane_physics)
    elif backend == "hybrid":
        call_kernel = make_call_shim(hybrid_physics)
    elif backend == "pallas":
        call_kernel = call_kernel_pallas
    else:
        raise ValueError(f"unknown fused backend {backend!r}")

    spawn_const = np.asarray(comps.spawn_pos, np.float32)
    # spawn-validity projection moves INTO the kernel on the fused path:
    # the wrapper samples reset rows with project=False and the kernel
    # lane-projects them with sim.min_site_z — the same function the
    # factory's XLA closure traces, so both paths produce identical rows
    # while the fused path saves the per-step XLA FK (~5% of step flops)
    _t = comps.task
    proj_clear = (
        float(_t.spawn_projection_clearance)
        if getattr(_t, "spawn_projection", False)
        and getattr(_t, "_min_tip_z_fn", None) is not None
        else None
    )
    proj_tips = np.asarray(comps.obs_cfg.fingertip_site_indices)
    proj_spawn = tuple(float(x) for x in comps.spawn_pos)

    def step_fn(state: FusedEnvState, actions: jnp.ndarray):
        nloc = actions.shape[0]
        key, reset_key, dr_key = jax.random.split(state.rng, 3)
        if env.axis_name is not None:
            shard = jax.lax.axis_index(env.axis_name)
            reset_key = jax.random.fold_in(reset_key, shard)
            dr_key = jax.random.fold_in(dr_key, shard)
        if np.isfinite(comps.clip_actions):
            actions = jnp.clip(actions, -comps.clip_actions, comps.clip_actions)

        reset_vals = comps.task.reset_task(
            reset_key, nloc, env._default_dof, difficulty=state.difficulty,
            **({"project": False} if proj_clear is not None else {}),
        )
        rb = (
            reset_vals.box_pos if reset_vals.box_pos is not None
            else jnp.zeros((nloc, 3), jnp.float32)
        )
        rq = (
            reset_vals.box_quat if reset_vals.box_quat is not None
            else jnp.zeros((nloc, 4), jnp.float32).at[:, 3].set(1.0)
        )
        rst_parts = [reset_vals.dof_pos, rb, rq]
        if has_box2:
            # validated non-None at env construction (envs/dexhand.py
            # has_box2 reset contract)
            rst_parts += [reset_vals.box2_pos, reset_vals.box2_quat]
        for k in rts_keys:
            rst_parts.append(
                reset_vals.task_states[k].reshape(nloc, -1).astype(
                    jnp.float32
                )
            )
        rst_T = jnp.concatenate(rst_parts, axis=1).T
        if comps.dr_ranges:
            drs = DRSample.sample(dr_key, nloc, comps.dr_ranges)
            drn_T = jnp.stack(
                [getattr(drs, k) for k in _DR_FIELDS], axis=0
            ).astype(jnp.float32)
        else:
            drn_T = jnp.ones((4, nloc), jnp.float32)
        spw_T = jnp.broadcast_to(spawn_const[:, None], (3, nloc))

        rows_f, rows_i, rows_c, obs_T, rew_T, msk_T, cmp_T = call_kernel(
            state.rows_f, state.rows_i, actions.T, rst_T, drn_T, spw_T
        )
        obs = obs_T.T
        if np.isfinite(comps.clip_observations):
            obs = jnp.clip(obs, -comps.clip_observations, comps.clip_observations)
        rew = rew_T[0]
        done = msk_T[0] != 0
        succ = msk_T[1] != 0
        fail = msk_T[2] != 0
        tout = msk_T[3] != 0

        any_success = succ.any()
        if env.axis_name is not None:
            any_success = jax.lax.pmax(
                any_success.astype(jnp.int32), env.axis_name
            ) > 0
        consecutive = jnp.where(
            any_success,
            jnp.minimum(
                state.consecutive_successes + 1,
                tcfg.max_consecutive_successes,
            ),
            0,
        )

        new_state = FusedEnvState(
            rows_f=rows_f,
            rows_i=rows_i,
            rows_c=rows_c,
            consecutive_successes=consecutive,
            rng=key,
            difficulty=state.difficulty,
        )
        extras = {
            "success": succ,
            "failure": fail,
            "timeout": tout,
            "reward_components_packed": cmp_T.T,
        }
        if "ts.spawn_difficulty" in L.offs_f:
            # eval-matched curriculum gating twin (envs/dexhand.py
            # step_fn): the PRE-step packed row is the ending episode's
            # spawn difficulty (constant through an episode)
            off, _k = L.offs_f["ts.spawn_difficulty"]
            strict = state.rows_f[off] >= state.difficulty - 1e-4
            extras["success_strict"] = succ & strict
            extras["done_strict"] = done & strict
        return new_state, obs, rew, done, extras

    def reset(key: jax.Array):
        state, obs = env.reset_fn(key)
        return layout.pack(state), obs

    # closures are not bound methods: expose the env for callers that need
    # to toggle env.axis_name around traces (parallel/distributed.py)
    step_fn._env = env

    return SimpleNamespace(
        step_fn=step_fn,
        pack=layout.pack,
        unpack=layout.unpack,
        reset=reset,
        comp_names=comp_names,
        layout=layout,
        obs_dim=obs_dim,
        block=blk,
    )
