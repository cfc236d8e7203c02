"""Measure the velocity-product (Coriolis/centrifugal) dynamics omission.

The reference's L0 is PhysX's full articulated solver, which includes
velocity-product terms (/root/reference/docs/reference-physics-implementation.md:27-29
documents the solver; physics_manager.py:73-119 drives it). Our engine omits
them by default; SimParams.coriolis=True adds the RNEA bias wrench
v x* (I_o v) on the jnp path (physics/engine.py _substep).

Two measurements, both on a contact-free aerial sweep (ground contact and
joint-limit clipping make long-horizon trajectory deltas chaotic and
meaningless — verified: a zero-target settle diverges by only ~1e-8 rad):

  1. INSTANTANEOUS: along the baseline (coriolis-off) trajectory, step the
     same state through both dynamics and compare one physics step of qd —
     the direct magnitude of the omitted term, no chaotic accumulation.
     Also reports the generalized bias torque |Q_bias| against the
     gravity+contact generalized force |Q| on the same states.
  2. TRAJECTORY: closed-loop q/fingertip divergence over the sweep (PD
     tracking is contractive, so this stays finite without contact).

The sweep drives all DOF targets sinusoidally at the task-commanded
velocity limits (BaseTask.yaml: fingers 1.0 rad/s, base linear 0.5 m/s,
base angular 1.5 rad/s) and at 3x, starting from the target pose (no
initial snap), hand base high enough that nothing touches the ground.

Run (CPU is fine; the term is jnp-path-only):
    JAX_PLATFORMS=cpu python tools/measure_coriolis.py [seconds]
"""

import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.constants import NUM_BASE_DOFS, NUM_DOFS
    from dexrobot_isaac_tpu.physics.engine import HandPhysics
    from dexrobot_isaac_tpu.physics.types import (
        SimParams,
        make_initial_physics_state,
    )

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    params = SimParams(has_box=False)
    eng_off = HandPhysics(params=params)
    eng_on = HandPhysics(
        model=eng_off.model, params=dataclasses.replace(params, coriolis=True)
    )

    lower = np.asarray(eng_off._lower)
    upper = np.asarray(eng_off._upper)
    span_lo, span_hi = lower.copy(), upper.copy()
    # base DOFs are unlimited in the MJCF: bounded aerial sweep (base z
    # only upward so the fingers never reach the ground from spawn 0.6 m)
    span_lo[0:2], span_hi[0:2] = -0.15, 0.15
    span_lo[2], span_hi[2] = 0.0, 0.2
    span_lo[3:6], span_hi[3:6] = -0.8, 0.8
    mid = 0.5 * (span_lo + span_hi)
    amp = 0.5 * (span_hi - span_lo) * 0.98

    # commanded velocity limits per DOF (BaseTask.yaml:24-26)
    vmax = np.empty(NUM_DOFS, np.float32)
    vmax[:3] = 0.5
    vmax[3:NUM_BASE_DOFS] = 1.5
    vmax[NUM_BASE_DOFS:] = 1.0

    dt = params.dt
    n_steps = int(round(seconds / dt))
    spawn = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)

    def targets_at(t, scale):
        # sinusoid with peak target speed = scale * commanded max velocity
        w = vmax * scale / np.maximum(amp, 1e-6)
        return (mid + amp * np.sin(w * t - np.pi / 2)).astype(np.float32)

    step_off = jax.jit(lambda s, tgt: eng_off.step_single(s, tgt, spawn)[0])
    step_on = jax.jit(lambda s, tgt: eng_on.step_single(s, tgt, spawn)[0])

    def bias_torque(state):
        kin = eng_on.fk(state.q, state.qd, spawn)
        S = eng_on._motion_subspace(kin)
        i_o = eng_on._spatial_inertia_o(kin)
        omega = kin.body_angvel
        v_o = kin.body_linvel - jnp.cross(omega, kin.body_pos)
        v6 = jnp.concatenate([omega, v_o], axis=-1)
        h = jnp.einsum("bij,bj->bi", i_o, v6)
        p_bias = jnp.concatenate(
            [jnp.cross(omega, h[:, :3]) + jnp.cross(v_o, h[:, 3:]),
             jnp.cross(omega, h[:, 3:])], axis=-1,
        )
        return jnp.sum(S * (eng_on._anc_body @ p_bias), axis=-1)

    bias_jit = jax.jit(bias_torque)

    print(f"# {n_steps} physics steps x {params.substeps} substeps, "
          f"dt={dt}s ({seconds}s simulated), aerial sweep (no contact)")
    for scale, label in [(1.0, "commanded-limit"), (3.0, "3x stress")]:
        q0 = jnp.asarray(targets_at(0.0, scale))
        base = make_initial_physics_state(1)
        base = jax.tree.map(lambda x: x[0], base)
        base = dataclasses.replace(base, q=q0)
        s_off = s_on = base
        dqd_inst, bias_mag, dq_traj, dtip_traj, qd_seen = [], [], [], [], []
        for k in range(n_steps):
            tgt = jnp.asarray(targets_at((k + 1) * dt, scale))
            # instantaneous: both dynamics from the SAME baseline state
            probe_on = step_on(s_off, tgt)
            s_off = step_off(s_off, tgt)
            s_on = step_on(s_on, tgt)
            if (k + 1) % 5 == 0:
                dqd_inst.append(np.abs(
                    np.asarray(probe_on.qd - s_off.qd)).max())
                bias_mag.append(np.abs(np.asarray(bias_jit(s_off))).max())
                qd_seen.append(np.abs(np.asarray(s_off.qd)).max())
                dq_traj.append(np.abs(np.asarray(s_on.q - s_off.q)).max())
                k_off = eng_off.fk(s_off.q, s_off.qd, spawn)
                k_on = eng_on.fk(s_on.q, s_on.qd, spawn)
                dtip_traj.append(np.linalg.norm(
                    np.asarray(k_on.site_pos - k_off.site_pos),
                    axis=-1).max())
        arr = np.asarray
        print(f"[{label}] {scale}x commanded velocity limits "
              f"(peak |qd| seen {max(qd_seen):.2f} rad/s):")
        print(f"  instantaneous per-step |dqd|: max {arr(dqd_inst).max():.2e}"
              f" rad/s, p50 {np.percentile(arr(dqd_inst), 50):.2e}")
        print(f"  bias torque |Q_bias|: max {arr(bias_mag).max():.2e} N*m")
        print(f"  closed-loop traj: max |dq| {arr(dq_traj).max():.2e} rad, "
              f"max tip delta {arr(dtip_traj).max() * 1000:.4f} mm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
