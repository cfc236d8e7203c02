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
    box13 = jnp.concatenate(
        [state.box_pos, state.box_quat, state.box_linvel, state.box_angvel],
        axis=1,
    )
    dr4 = jnp.stack(
        [dr.kp_scale, dr.kd_scale, dr.box_mass_scale, dr.friction_scale], axis=1
    )
    out = ctrl(state.q, state.qd, targets, spawn, box13, dr4)
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
