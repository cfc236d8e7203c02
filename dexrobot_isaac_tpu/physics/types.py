"""Physics state pytrees and simulation parameters.

The state schema mirrors what the reference framework reads out of Isaac Gym's
global tensors (reference: dexhand_env/components/physics/tensor_manager.py:
dof_state (N, D, 2), rigid_body_states (N, B, 13), actor_root_state (N, A, 13),
contact forces (N, B, 3)), re-cut as a functional pytree: the simulator is a
pure function `(model, state, dof_targets) -> state`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhysicsState:
    """Dynamic state of one batch of lockstep worlds (leading dim = num_envs).

    ``box_*`` fields always exist to keep a single pytree structure across
    tasks; scenes without a free object simply never read or step them.
    """

    q: jnp.ndarray            # (N, 26) joint positions
    qd: jnp.ndarray           # (N, 26) joint velocities
    box_pos: jnp.ndarray      # (N, 3)
    box_quat: jnp.ndarray     # (N, 4) xyzw
    box_linvel: jnp.ndarray   # (N, 3)
    box_angvel: jnp.ndarray   # (N, 3)
    # optional SECOND free body (SimParams.has_box2); None in single-object
    # scenes so the pytree stays minimal and the single-box compiled paths
    # (incl. the fused Pallas kernels) are untouched
    box2_pos: Optional[jnp.ndarray] = None     # (N, 3)
    box2_quat: Optional[jnp.ndarray] = None    # (N, 4) xyzw
    box2_linvel: Optional[jnp.ndarray] = None  # (N, 3)
    box2_angvel: Optional[jnp.ndarray] = None  # (N, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinematicsOut:
    """Forward-kinematics products consumed by contacts, obs, and rewards."""

    body_pos: jnp.ndarray     # (N, B, 3) body frame origins, world
    body_quat: jnp.ndarray    # (N, B, 4)
    body_linvel: jnp.ndarray  # (N, B, 3) velocity of body frame origin
    body_angvel: jnp.ndarray  # (N, B, 3)
    dof_axis_w: jnp.ndarray   # (N, B, 3) world joint axis per DOF
    dof_origin_w: jnp.ndarray  # (N, B, 3) world joint anchor per DOF
    site_pos: jnp.ndarray     # (N, S, 3)
    site_quat: jnp.ndarray    # (N, S, 4)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DRSample:
    """Per-env domain-randomization scales (leading dim = num_envs when
    batched; scalars per world inside vmap). All multiplicative on the static
    model/scene values; 1.0 = nominal. The reference has no DR -- this is the
    scale-out training feature from BASELINE.json config #5."""

    kp_scale: jnp.ndarray
    kd_scale: jnp.ndarray
    box_mass_scale: jnp.ndarray
    friction_scale: jnp.ndarray

    @staticmethod
    def nominal(num_envs: int) -> "DRSample":
        one = jnp.ones((num_envs,), dtype=jnp.float32)
        return DRSample(one, one, one, one)

    @staticmethod
    def sample(key, num_envs: int, ranges: dict) -> "DRSample":
        """Uniform log-space-free sampling in [lo, hi] per field; fields not
        present in `ranges` stay at 1.0."""
        import jax as _jax

        keys = _jax.random.split(key, 4)
        out = {}
        for i, name in enumerate(
            ["kp_scale", "kd_scale", "box_mass_scale", "friction_scale"]
        ):
            lo, hi = ranges.get(name, (1.0, 1.0))
            out[name] = _jax.random.uniform(
                keys[i], (num_envs,), minval=lo, maxval=hi
            )
        return DRSample(**out)


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static simulation parameters (analog of the reference's `sim` config
    block, cfg/config.yaml:21-40, re-expressed for a penalty-based solver)."""

    dt: float = 0.005                 # physics step (s)
    substeps: int = 4                 # integration substeps per physics step
    gravity: float = -9.81
    # penalty contact model
    contact_stiffness: float = 8000.0   # N/m
    contact_damping: float = 60.0       # N/(m/s)
    friction_stiffness: float = 400.0   # N/(m/s) viscous cap before Coulomb
    contact_beta: float = 0.2           # penetration correction per substep
    # cap on the separation velocity contacts may impart, exactly PhysX's
    # max_depenetration_velocity (reference cfg/config.yaml:33 = 0.2)
    max_depenetration_velocity: float = 0.2
    # finger-finger self-collision (sphere-sphere narrowphase over a
    # build-time-pruned pair list). The reference enables intra-hand
    # collision by creating the hand actor with collision filter 0
    # (hand_initializer.py:386-388), so PhysX resolves finger crossings;
    # default on for parity.
    self_collision: bool = True
    # box (free object) scene; None-like defaults used when has_box=False
    has_box: bool = False
    box_size: float = 0.05
    box_mass: float = 0.1
    box_friction: float = 1.0
    # optional second free box (multi-object scenes, e.g. stacking). The
    # reference supports arbitrary per-env task actors through Isaac Gym
    # (task_interface.py create_task_objects); here multi-object scenes add
    # cubes to the analytic contact set. Requires has_box. Runs on the XLA
    # engine path (the fused single-box Pallas kernels decline this config).
    has_box2: bool = False
    box2_size: float = 0.08
    box2_mass: float = 0.5
    box2_friction: float = 1.0
    hand_friction: float = 1.0
    ground_friction: float = 1.0
    # velocity-product (Coriolis/centrifugal) dynamics terms. The
    # reference's PhysX articulated solver includes these
    # (/root/reference/docs/reference-physics-implementation.md:27-29);
    # this engine omits them by default — measured negligible at the
    # commanded velocity limits (tools/measure_coriolis.py; PHYSICS
    # paragraph in BASELINE.md). Enable to add the RNEA bias wrench
    # v x* (I v) on the jnp engine path (the fused Pallas kernels
    # decline this config and fall back to the XLA path).
    coriolis: bool = False


def make_initial_physics_state(
    num_envs: int,
    num_dofs: int = 26,
    box_pos: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> PhysicsState:
    zeros3 = jnp.zeros((num_envs, 3), dtype=dtype)
    quat = jnp.zeros((num_envs, 4), dtype=dtype).at[:, 3].set(1.0)
    return PhysicsState(
        q=jnp.zeros((num_envs, num_dofs), dtype=dtype),
        qd=jnp.zeros((num_envs, num_dofs), dtype=dtype),
        box_pos=zeros3 if box_pos is None else jnp.asarray(box_pos, dtype=dtype),
        box_quat=quat,
        box_linvel=zeros3,
        box_angvel=zeros3,
    )
