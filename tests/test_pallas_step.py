"""Parity of the fused Pallas control-step kernel vs the jnp reference engine.

Two backends of the SAME kernel trace (physics/pallas_step.py):

- "xla" (default CI, always on): the identical kernel body — physics lanes,
  fori_loop substeps, FK fold, row packing — traced as plain XLA ops via
  write-shims. The suite can no longer go green while the kernel's lane
  math diverges from the engine. (Interpret mode is NOT used: interpreting
  the ~18k-op kernel takes >10 min at N=8.)
- "pallas" (DEXHAND_TPU_TESTS=1): the real pl.pallas_call — Mosaic on TPU
  hardware, interpreter elsewhere. Covers Mosaic codegen itself; the
  checked-in golden trajectory (tests/test_golden_trajectory.py) pins the
  recorded TPU behavior in default CI as well.

On real TPU hardware run:
  DEXHAND_TPU_TESTS=1 JAX_PLATFORMS=axon python -m pytest tests/test_pallas_step.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.constants import NUM_DOFS
from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.pallas_step import build_control_step
from dexrobot_isaac_tpu.physics.types import (
    DRSample,
    PhysicsState,
    SimParams,
    make_initial_physics_state,
)

N = 8

_BACKENDS = ["xla"]
if os.environ.get("DEXHAND_TPU_TESTS") == "1":
    _BACKENDS.append("pallas")


@pytest.fixture(scope="module")
def phys():
    return HandPhysics(
        params=SimParams(dt=0.01, substeps=2, has_box=True)
    )


@pytest.fixture(scope="module", params=_BACKENDS)
def ctrl(phys, request):
    if request.param == "xla":
        return build_control_step(
            phys, n_physics_steps=1, block=N, backend="xla"
        )
    # real Mosaic kernel on TPU; interpret-mode emulation elsewhere
    interpret = jax.default_backend() != "tpu"
    block = 1024 if not interpret else N
    return build_control_step(phys, n_physics_steps=1, block=block,
                              interpret=interpret)


def run_both(phys, ctrl, state, targets, spawn):
    dr = DRSample.nominal(N)
    ref_state, ref_info = phys.step(state, targets, spawn, dr)
    parts = [state.box_pos, state.box_quat, state.box_linvel, state.box_angvel]
    if phys.params.has_box2:
        parts += [state.box2_pos, state.box2_quat,
                  state.box2_linvel, state.box2_angvel]
    box_in = jnp.concatenate(parts, axis=1)
    dr4 = jnp.stack(
        [dr.kp_scale, dr.kd_scale, dr.box_mass_scale, dr.friction_scale], axis=1
    )
    out = ctrl(state.q, state.qd, targets, spawn, box_in, dr4)
    return ref_state, ref_info, out


def assert_kin_parity(phys, q, qd, spawn, kin):
    """The kernel's in-kernel final FK must match vmapped engine FK.

    Compares against engine FK on the KERNEL's own final (q, qd) — not the
    reference engine's — so this isolates the FK implementation from the
    dynamics drift already budgeted for by the q/qd tolerances above.
    """
    ref_kin = jax.vmap(phys.fk)(jnp.asarray(q), jnp.asarray(qd), spawn)
    for field in ("body_pos", "body_quat", "body_linvel", "body_angvel",
                  "dof_axis_w", "dof_origin_w", "site_pos", "site_quat"):
        np.testing.assert_allclose(
            np.asarray(getattr(kin, field)),
            np.asarray(getattr(ref_kin, field)),
            atol=5e-3, err_msg=field,
        )


@pytest.fixture(scope="module")
def phys2():
    return HandPhysics(
        params=SimParams(
            dt=0.01, substeps=2, has_box=True,
            has_box2=True, box2_size=0.08, box2_mass=0.5,
        )
    )


@pytest.fixture(scope="module", params=_BACKENDS)
def ctrl2(phys2, request):
    if request.param == "xla":
        return build_control_step(
            phys2, n_physics_steps=1, block=N, backend="xla"
        )
    interpret = jax.default_backend() != "tpu"
    block = 1024 if not interpret else N
    return build_control_step(phys2, n_physics_steps=1, block=block,
                              interpret=interpret)


class TestPallasParityBox2:
    """Two-free-cube lane sim vs the jnp engine (the multi-object path that
    used to fall back to XLA: engine hand/ground/cube-cube contacts,
    engine.py _contacts has_box2 block + _box_box)."""

    def _stacked_state(self, push=True):
        # pick cube stacked on the platform cube, slightly interpenetrating
        # so cube-cube, box2-ground, AND sphere contacts are all active.
        # DELIBERATELY asymmetric (xy offset + yaw + a push): a perfectly
        # centered stack has zero net torque, so the tiny orientation drift
        # is pure float-reduction noise and differs CPU-vs-TPU — the parity
        # comparison needs the real signal to dominate.
        xy = [0.128, 0.006] if push else [0.12, 0.0]
        state = make_initial_physics_state(
            N, box_pos=jnp.tile(jnp.array([xy + [0.1035]]), (N, 1))
        )
        import dataclasses

        yaw = 0.2
        bq = jnp.tile(
            jnp.array(
                [[0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]], jnp.float32
            ),
            (N, 1),
        )
        zeros3 = jnp.zeros((N, 3), jnp.float32)
        quat = jnp.zeros((N, 4), jnp.float32).at[:, 3].set(1.0)
        push_v = [0.05, -0.02, 0.0] if push else [0.0, 0.0, 0.0]
        return dataclasses.replace(
            state,
            box_quat=bq,
            box_linvel=jnp.tile(jnp.array([push_v], jnp.float32), (N, 1)),
            box2_pos=jnp.tile(
                jnp.array([[0.12, 0.0, 0.0395]], jnp.float32), (N, 1)
            ),
            box2_quat=quat,
            box2_linvel=zeros3,
            box2_angvel=zeros3,
        )

    def test_two_cube_parity(self, phys2, ctrl2):
        state = self._stacked_state()
        spawn = jnp.tile(
            jnp.array([[0.0, 0.0, 0.075]], dtype=jnp.float32), (N, 1)
        )
        targets = jnp.zeros((N, NUM_DOFS)).at[:, 2].set(-0.02)
        ref_state, ref_info, (q, qd, box, cf, bf, kin) = run_both(
            phys2, ctrl2, state, targets, spawn
        )
        # One-step agreement in a deliberately overlapped state is only
        # meaningful under ONE codegen (CPU: kernel body and engine trace
        # through the same XLA pipeline). Mosaic-vs-XLA on hardware sees
        # the impulse-bound min() branches switch on f32 noise in the
        # ~5e-4 contact depths, making single-step transient forces
        # chaotic; hardware parity is checked on the SETTLED state instead
        # (test_two_cube_settles) plus the recorded golden trajectory.
        if jax.default_backend() != "cpu":
            pytest.skip("one-step transients are codegen-chaotic; hardware "
                        "parity = settled-state + golden-trajectory checks")
        quat_atol = 1e-3
        vel_atol = 5e-2
        f_tol = 0.1
        np.testing.assert_allclose(np.asarray(q), np.asarray(ref_state.q),
                                   atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(box[:, :3]), np.asarray(ref_state.box_pos), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(box[:, 13:16]), np.asarray(ref_state.box2_pos),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(box[:, 16:20]), np.asarray(ref_state.box2_quat),
            atol=quat_atol,
        )
        np.testing.assert_allclose(
            np.asarray(box[:, 20:23]), np.asarray(ref_state.box2_linvel),
            atol=vel_atol, rtol=5e-2,
        )
        np.testing.assert_allclose(
            np.asarray(bf[:, :3]), np.asarray(ref_info.box_contact_force),
            atol=f_tol, rtol=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(bf[:, 3:6]), np.asarray(ref_info.box2_contact_force),
            atol=f_tol, rtol=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(cf), np.asarray(ref_info.body_contact_force),
            atol=f_tol, rtol=0.1,
        )
        assert_kin_parity(phys2, q, qd, spawn, kin)

    def test_two_cube_settles(self, phys2, ctrl2):
        """20 steps: the stack must settle near its analytic rest heights
        (cube-cube support holds against gravity), not explode — and the
        settled kernel state must match the engine's settled state (the
        hardware Mosaic-vs-XLA parity check: transients attenuate, so the
        codegen-chaotic one-step noise washes out)."""
        state = self._stacked_state(push=False)
        spawn = jnp.tile(
            jnp.array([[0.0, 0.0, 0.4]], dtype=jnp.float32), (N, 1)
        )
        targets = jnp.zeros((N, NUM_DOFS))
        parts = [state.box_pos, state.box_quat, state.box_linvel,
                 state.box_angvel, state.box2_pos, state.box2_quat,
                 state.box2_linvel, state.box2_angvel]
        box = jnp.concatenate(parts, axis=1)
        q, qd = state.q, state.qd
        dr4 = jnp.ones((N, 4), jnp.float32)
        for _ in range(20):
            q, qd, box, cf, bf, kin = ctrl2(q, qd, targets, spawn, box, dr4)
        box = np.asarray(box)
        # platform rests on the ground, pick cube rests on the platform
        np.testing.assert_allclose(box[:, 2], 0.1042, atol=5e-3)
        np.testing.assert_allclose(box[:, 15], 0.0394, atol=5e-3)
        assert np.abs(box[:, 20:26]).max() < 0.05  # settled, not exploding
        # settled-state parity vs the engine over the same 20 steps
        eng_state = self._stacked_state(push=False)
        step = jax.jit(phys2.step)
        for _ in range(20):
            eng_state, _ = step(eng_state, targets, spawn)
        np.testing.assert_allclose(
            box[:, 0:3], np.asarray(eng_state.box_pos), atol=3e-3
        )
        np.testing.assert_allclose(
            box[:, 13:16], np.asarray(eng_state.box2_pos), atol=3e-3
        )
        np.testing.assert_allclose(
            box[:, 16:20], np.asarray(eng_state.box2_quat), atol=2e-2
        )


class TestPallasParity:
    def test_free_dynamics_parity(self, phys, ctrl):
        rng = np.random.default_rng(0)
        q0 = np.zeros((N, 26), np.float32)
        q0[:, 6:] = rng.uniform(0.0, 0.5, (N, 20))
        state = make_initial_physics_state(
            N, box_pos=jnp.tile(jnp.array([[5.0, 0.0, 0.5]]), (N, 1))
        )
        state = PhysicsState(
            q=jnp.asarray(q0), qd=state.qd, box_pos=state.box_pos,
            box_quat=state.box_quat, box_linvel=state.box_linvel,
            box_angvel=state.box_angvel,
        )
        spawn = jnp.tile(jnp.array([[0.0, 0.0, 0.5]], dtype=jnp.float32), (N, 1))
        targets = jnp.asarray(
            np.clip(q0 + 0.1, 0, 1.3).astype(np.float32)
        )
        ref_state, _, (q, qd, box, cf, bf, kin) = run_both(
            phys, ctrl, state, targets, spawn
        )
        # tolerances reflect Mosaic-vs-XLA f32 op-ordering amplified by the
        # stiff implicit solve: 1e-3 rad is < 0.06 deg of joint angle
        np.testing.assert_allclose(np.asarray(q), np.asarray(ref_state.q),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(qd), np.asarray(ref_state.qd),
                                   atol=5e-2, rtol=5e-2)
        # ballistic box identical
        np.testing.assert_allclose(
            np.asarray(box[:, :3]), np.asarray(ref_state.box_pos), atol=1e-6
        )
        assert_kin_parity(phys, q, qd, spawn, kin)

    def test_contact_parity(self, phys, ctrl):
        # box resting on the ground directly under descending fingers
        state = make_initial_physics_state(
            N, box_pos=jnp.tile(jnp.array([[0.12, 0.0, 0.027]]), (N, 1))
        )
        spawn = jnp.tile(jnp.array([[0.0, 0.0, 0.075]], dtype=jnp.float32), (N, 1))
        targets = jnp.zeros((N, NUM_DOFS)).at[:, 2].set(-0.02)
        ref_state, ref_info, (q, qd, box, cf, bf, kin) = run_both(
            phys, ctrl, state, targets, spawn
        )
        np.testing.assert_allclose(np.asarray(q), np.asarray(ref_state.q),
                                   atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(box[:, :3]), np.asarray(ref_state.box_pos), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(bf), np.asarray(ref_info.box_contact_force),
            atol=0.1, rtol=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(cf), np.asarray(ref_info.body_contact_force),
            atol=0.1, rtol=0.1,
        )
        assert_kin_parity(phys, q, qd, spawn, kin)
