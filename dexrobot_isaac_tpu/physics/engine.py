"""Batched articulated rigid-body simulator for the DexHand scenes.

TPU-native replacement for the reference's L0 layer (Isaac Gym / PhysX,
accessed via `gym.simulate` + tensor API; reference:
dexhand_env/components/physics/physics_manager.py:73-119). Instead of an
external C++/CUDA binary mutated through handles, the simulator here is a pure
function

    step(state, dof_targets) -> (state, StepInfo)

compiled by XLA: forward kinematics over the 26-DOF reduced-coordinate tree,
a CRBA joint-space mass matrix, implicitly-integrated PD actuation (stable at
the reference's stiffness 10000 base / 20 finger gains), penalty-based
contacts (hand collision spheres vs ground plane and a free box, box corners
vs ground), and semi-implicit Euler integration with substeps. Everything is
written single-world and batched with `vmap`, so thousands of lockstep envs
compile to large fused batched ops (the reference's "all envs step together"
invariant, docs/control-dt-timing-diagram.md:33-51, maps 1:1 onto SPMD).

Design deviations from PhysX (deliberate, documented):
- contacts are compliant (penalty) rather than LCP-solved; stiffness/damping
  live in `SimParams` and play the role of PhysX's solver-iteration presets
  (cfg/physics/{default,fast,accurate}.yaml).
- velocity-product (Coriolis) bias terms are omitted; at the hand's commanded
  velocity limits (<=1.5 rad/s, cfg/task/BaseTask.yaml:47-50) they are
  negligible against the PD stiffness terms. Gravity is exact.
- joint limits are enforced by projection (clamp + outward-velocity zeroing),
  matching Isaac's `limited="true"` hard-stop semantics
  (docs/DESIGN_DECISIONS.md:75-100).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.models.dexhand021 import (
    HandModel,
    PRISMATIC,
    build_hand_model,
)
from dexrobot_isaac_tpu.ops import quat as qm
from dexrobot_isaac_tpu.ops.linalg import spd_solve_one
from dexrobot_isaac_tpu.physics.types import (
    DRSample,
    KinematicsOut,
    PhysicsState,
    SimParams,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepInfo:
    """Per-physics-step diagnostics (leading dim = num_envs)."""

    body_contact_force: jnp.ndarray  # (N, B, 3) net contact force per hand body
    box_contact_force: jnp.ndarray   # (N, 3) net contact force on the box
    # net contact force on the optional second box (SimParams.has_box2);
    # None in single-object scenes so the pytree/scan carry stays unchanged
    box2_contact_force: jnp.ndarray | None = None


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return m.reshape(m.shape[:-1] + (3, 3))


# ----------------------------------------------------------------------
# build-time apparent contact inertia (pure numpy: runs in __init__ and
# must not touch any jax backend -- see the tunnel note below)
# ----------------------------------------------------------------------
def _np_quat_to_rotmat(qv: np.ndarray) -> np.ndarray:
    x, y, z, w = qv
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _np_axis_angle_rotmat(axis: np.ndarray, th: float) -> np.ndarray:
    a = axis / (np.linalg.norm(axis) + 1e-12)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def compute_sphere_apparent_mass(model: HandModel) -> np.ndarray:
    """Per-collision-sphere apparent (operational-space) mass, numpy.

    The impulse clamp in the contact model bounds each contact force by the
    impulse that stops the approach velocity in one substep. Using the bare
    link mass there (~12 g fingertips) caps fingertip forces at ~0.2 N --
    less than a 0.1 kg object's weight -- so objects sink through and slide
    out of any grasp. The mechanically correct bound is the apparent mass at
    the contact point through the articulated chain, 1/max-eig(J M^-1 J^T),
    which the joint armature (0.002 kg m^2 at ~2 cm lever arms) pushes to
    kilograms. Evaluated at a spread of postures; per-sphere minimum is used
    (conservative = stable). Pure numpy so construction never touches a jax
    backend (remote-TPU tunnel safety).
    """
    B = model.num_bodies
    poses = [np.zeros(26)]
    flexed = np.zeros(26)
    flexed[6] = 1.0          # thumb rotation
    for f in range(5):
        flexed[6 + 4 * f + 1: 6 + 4 * f + 4] = 0.8
    poses.append(flexed)
    curled = np.zeros(26)
    curled[6] = 1.8
    for f in range(5):
        curled[6 + 4 * f + 1: 6 + 4 * f + 4] = 1.25
    poses.append(curled)

    anc = np.zeros((B, B))
    for b in range(B):
        j = b
        while j >= 0:
            anc[j, b] = 1.0
            j = int(model.parent[j])

    m_app = np.full(len(model.sphere_body), np.inf)
    for q in poses:
        pos = np.zeros((B, 3))
        rot = np.zeros((B, 3, 3))
        axis_w = np.zeros((B, 3))
        origin_w = np.zeros((B, 3))
        for i in range(B):
            pidx = int(model.parent[i])
            if pidx < 0:
                pp, Rp = np.zeros(3), np.eye(3)
            else:
                pp, Rp = pos[pidx], rot[pidx]
            o = pp + Rp @ model.attach_pos[i]
            Rj = Rp @ _np_quat_to_rotmat(model.attach_quat[i])
            a_w = Rj @ model.axis[i]
            if model.joint_type[i] == PRISMATIC:
                bp, Rb = o + a_w * q[i], Rj
            else:
                bp = o
                Rb = Rj @ _np_axis_angle_rotmat(model.axis[i], q[i])
            Rb = Rb @ _np_quat_to_rotmat(model.post_quat[i])
            pos[i], rot[i] = bp, Rb
            axis_w[i], origin_w[i] = a_w, o

        # CRBA about world origin (numpy mirror of HandPhysics.mass_matrix)
        prism = model.joint_type == PRISMATIC
        S = np.zeros((B, 6))
        S[:, :3] = np.where(prism[:, None], 0.0, axis_w)
        S[:, 3:] = np.where(
            prism[:, None], axis_w, np.cross(origin_w, axis_w)
        )
        com_w = pos + np.einsum("bij,bj->bi", rot, model.com)
        i_c = np.einsum("bij,bjk,blk->bil", rot, model.inertia, rot)
        i_o = np.zeros((B, 6, 6))
        for i in range(B):
            cx = np.array([
                [0, -com_w[i, 2], com_w[i, 1]],
                [com_w[i, 2], 0, -com_w[i, 0]],
                [-com_w[i, 1], com_w[i, 0], 0],
            ])
            mm = model.mass[i]
            i_o[i, :3, :3] = i_c[i] - mm * cx @ cx
            i_o[i, :3, 3:] = mm * cx
            i_o[i, 3:, :3] = -mm * cx
            i_o[i, 3:, 3:] = mm * np.eye(3)
        ic = i_o.copy()
        for i in reversed(range(B)):
            pidx = int(model.parent[i])
            if pidx >= 0:
                ic[pidx] += ic[i]
        f = np.einsum("bij,bj->bi", ic, S)
        raw = S @ f.T
        am = raw * anc
        M = am + am.T - np.diag(np.diag(raw)) + np.diag(model.armature)

        sb = np.asarray(model.sphere_body)
        sp = pos[sb] + np.einsum("bij,bj->bi", rot[sb], model.sphere_pos)
        Minv = np.linalg.inv(M)
        for c in range(len(sb)):
            J = np.zeros((3, B))
            for j in range(B):
                if not anc[j, sb[c]]:
                    continue
                if prism[j]:
                    J[:, j] = axis_w[j]
                else:
                    J[:, j] = np.cross(axis_w[j], sp[c] - origin_w[j])
            W = J @ Minv @ J.T
            lam = float(np.linalg.eigvalsh(W)[-1])
            m_app[c] = min(m_app[c], 1.0 / max(lam, 1e-9))
    return np.maximum(m_app, np.maximum(model.mass[model.sphere_body], 0.01))


def _np_fk_pose(model: HandModel, q: np.ndarray):
    """Position-only numpy FK (base at origin): (body_pos (B,3), body_rot (B,3,3))."""
    B = model.num_bodies
    pos = np.zeros((B, 3))
    rot = np.zeros((B, 3, 3))
    for i in range(B):
        pidx = int(model.parent[i])
        if pidx < 0:
            pp, Rp = np.zeros(3), np.eye(3)
        else:
            pp, Rp = pos[pidx], rot[pidx]
        o = pp + Rp @ model.attach_pos[i]
        Rj = Rp @ _np_quat_to_rotmat(model.attach_quat[i])
        if model.joint_type[i] == PRISMATIC:
            bp, Rb = o + (Rj @ model.axis[i]) * q[i], Rj
        else:
            bp = o
            Rb = Rj @ _np_axis_angle_rotmat(model.axis[i], q[i])
        pos[i] = bp
        rot[i] = Rb @ _np_quat_to_rotmat(model.post_quat[i])
    return pos, rot


def sphere_finger_ids(model: HandModel) -> np.ndarray:
    """Finger index (0..4) per collision sphere; -1 for palm/arm spheres.
    A sphere's finger is the child-of-palm subtree its body lives in, derived
    from the tree (finger roots are the children of `right_hand_base`)."""
    palm = 5  # right_hand_base (constants.py body ordering)
    fid_body = -np.ones(model.num_bodies, dtype=np.int64)
    roots: list = []
    for b in range(model.num_bodies):
        j = b
        while j >= 0 and int(model.parent[j]) != palm:
            j = int(model.parent[j])
        if j >= 0:
            if j not in roots:
                roots.append(j)
            fid_body[b] = roots.index(j)
    return fid_body[np.asarray(model.sphere_body)]


def compute_self_collision_pairs(
    model: HandModel, margin: float = 0.004
) -> np.ndarray:
    """Static broadphase at model-build time: the (P, 2) sphere pairs that can
    geometrically collide, found by probing joint-limit extremes with numpy FK.

    TPU-native design: a runtime broadphase is useless under lockstep SPMD
    (every lane would still pay for every pair), so all pruning happens here,
    once, on host. Candidates are cross-finger pairs on adjacent fingers plus
    thumb-vs-any (non-adjacent parallel fingers are blocked by the finger
    between them); a candidate survives if some probe pose over the two
    fingers' abduction x flexion extremes brings it within `margin` of
    touching. The surviving list is baked into both the jnp engine and the
    Pallas kernel as static gather indices.
    """
    fid = sphere_finger_ids(model)
    sb = np.asarray(model.sphere_body)
    r = np.asarray(model.sphere_radius)
    nf = int(fid.max()) + 1
    # joints of finger f: bodies 6+4f .. 6+4f+3 (joint index == body index)
    fingers = [list(range(6 + 4 * f, 6 + 4 * f + 4)) for f in range(nf)]

    def finger_probe_qs(f: int):
        """Representative joint vectors for finger f: abduction/rotation
        (joint 0) at limits x flexion (joints 1-3) at graded closures.
        Palm (f == -1) has no joints: a single empty config."""
        if f < 0:
            return [np.zeros(0)]
        j0 = fingers[f][0]
        lo, hi = model.lower_limit[j0], model.upper_limit[j0]
        out = []
        for abd in (lo, 0.5 * (lo + hi), hi):
            for flex in (0.0, 0.35, 0.6, 0.8, 1.0):
                qf = np.zeros(4)
                qf[0] = abd
                for k, j in enumerate(fingers[f][1:]):
                    qf[k + 1] = (
                        model.lower_limit[j]
                        + flex * (model.upper_limit[j] - model.lower_limit[j])
                    )
                out.append(qf)
        return out

    probes = {f: finger_probe_qs(f) for f in list(range(nf)) + [-1]}
    # candidate group pairs: every pair of distinct fingers plus each finger
    # vs the palm (fingers curl into the palm at full flexion). Geometric
    # impossibilities (e.g. thumb vs other fingers in this model) are removed
    # by the probe below, not by hand-picked adjacency rules.
    cand = [(fa, fb) for fa in range(nf) for fb in range(fa + 1, nf)]
    cand += [(f, -1) for f in range(nf)]
    pairs = []
    for fa, fb in cand:
        ia = np.nonzero(fid == fa)[0]
        ib = np.nonzero(fid == fb)[0]
        best = np.full((len(ia), len(ib)), np.inf)
        for qa in probes[fa]:
            for qb in probes[fb]:
                q = np.zeros(model.num_bodies)
                q[fingers[fa]] = qa
                if fb >= 0:
                    q[fingers[fb]] = qb
                pos, rot = _np_fk_pose(model, q)
                sp = pos[sb] + np.einsum(
                    "bij,bj->bi", rot[sb], model.sphere_pos
                )
                d = np.linalg.norm(
                    sp[ia][:, None, :] - sp[ib][None, :, :], axis=-1
                )
                best = np.minimum(best, d - (r[ia][:, None] + r[ib][None, :]))
        for ai, bi in zip(*np.nonzero(best < margin)):
            pairs.append((int(ia[ai]), int(ib[bi])))
    return np.asarray(sorted(pairs), dtype=np.int64).reshape(-1, 2)


class HandPhysics:
    """Precomputes static model arrays and exposes pure jax step functions.

    Construct once per (model, params) pair; the instance is closed over at
    trace time (never passed as a traced argument).
    """

    def __init__(self, model: HandModel | None = None, params: SimParams | None = None):
        self.model = model or build_hand_model()
        self.params = params or SimParams()
        m = self.model
        B = m.num_bodies

        # ancestor-or-self masks: anc[j, b] = 1 iff joint j is on the path
        # from the world to body b (joint j's motion moves body b).
        anc = np.zeros((B, B), dtype=np.float32)
        for b in range(B):
            j = b
            while j >= 0:
                anc[j, b] = 1.0
                j = int(m.parent[j])
        # NOTE: all static model arrays are kept as NUMPY so that tracing
        # embeds them as host constants -- closing over device arrays forces
        # device->host fetches during MLIR lowering, which can deadlock over
        # the remote-TPU tunnel this image uses
        self._anc_body = anc                                   # (B, B)
        self._anc_sphere = anc[:, m.sphere_body]               # (B, S)

        self._is_prismatic = m.joint_type == PRISMATIC  # numpy bool per body
        self._has_post = [
            not np.allclose(m.post_quat[i], [0, 0, 0, 1]) for i in range(B)
        ]
        f32 = lambda x: np.asarray(x, dtype=np.float32)
        self._axis = f32(m.axis)
        self._attach_pos = f32(m.attach_pos)
        self._attach_quat = f32(m.attach_quat)
        self._post_quat = f32(m.post_quat)
        self._mass = f32(m.mass)
        self._com = f32(m.com)
        self._inertia = f32(m.inertia)
        self._lower = f32(m.lower_limit)
        self._upper = f32(m.upper_limit)
        self._kp = f32(m.stiffness)
        self._kd = f32(m.damping)
        self._armature = f32(m.armature)
        self._sphere_body = np.asarray(m.sphere_body)
        self._sphere_pos = f32(m.sphere_pos)
        self._sphere_radius = f32(m.sphere_radius)
        # effective mass per collision sphere for the impulse clamp: the
        # apparent mass at the contact point through the articulated chain
        # (armature-dominated, ~kg) -- NOT the bare link mass, which would
        # cap fingertip forces below a 0.1 kg object's weight
        self._sphere_meff = f32(compute_sphere_apparent_mass(m))
        # finger-finger self-collision: statically pruned sphere pairs
        # (reference enables intra-hand collision via actor filter 0,
        # hand_initializer.py:386-388)
        if self.params.self_collision:
            sc = compute_self_collision_pairs(m)
        else:
            sc = np.zeros((0, 2), dtype=np.int64)
        self._sc_i = sc[:, 0]
        self._sc_j = sc[:, 1]
        self._sc_rsum = f32(
            self._sphere_radius[self._sc_i] + self._sphere_radius[self._sc_j]
        )
        # reduced mass of the two articulated contact points
        self._sc_meff = f32(
            1.0 / (
                1.0 / self._sphere_meff[self._sc_i]
                + 1.0 / self._sphere_meff[self._sc_j]
            )
        ) if len(sc) else f32(np.zeros(0))
        self._site_body = np.asarray(m.site_body)
        self._site_pos = f32(m.site_pos)
        self._site_quat = f32(m.site_quat)
        p = self.params
        if p.has_box:
            # solid cube inertia is isotropic: I = m s^2 / 6 * eye(3)
            self._box_inertia = p.box_mass * p.box_size**2 / 6.0
        if p.has_box2:
            if not p.has_box:
                raise ValueError("SimParams.has_box2 requires has_box")
            self._box2_inertia = p.box2_mass * p.box2_size**2 / 6.0
        self.substep_dt = p.dt / p.substeps

    # ------------------------------------------------------------------
    # forward kinematics (single world; vmap for batches)
    # ------------------------------------------------------------------
    def fk(self, q: jnp.ndarray, qd: jnp.ndarray, spawn_pos: jnp.ndarray) -> KinematicsOut:
        """FK with velocity propagation. q, qd: (26,); spawn_pos: (3,)."""
        m = self.model
        B = m.num_bodies
        pos, quat, lin, ang = [], [], [], []
        axis_w_l, origin_w_l = [], []
        qid = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=q.dtype)
        for i in range(B):
            p = int(m.parent[i])
            if p < 0:
                pp, pq = spawn_pos, qid
                pv = pw = jnp.zeros(3, dtype=q.dtype)
            else:
                pp, pq, pv, pw = pos[p], quat[p], lin[p], ang[p]
            o = pp + qm.quat_rotate(pq, self._attach_pos[i])
            jq = qm.quat_mul(pq, self._attach_quat[i])
            a_w = qm.quat_rotate(jq, self._axis[i])
            v_o = pv + jnp.cross(pw, o - pp)
            if self._is_prismatic[i]:
                bp = o + a_w * q[i]
                bq = jq
                bv = v_o + jnp.cross(pw, bp - o) + a_w * qd[i]
                bw = pw
            else:
                bp = o
                bq = qm.quat_mul(jq, qm.quat_from_axis_angle(self._axis[i], q[i]))
                bv = v_o
                bw = pw + a_w * qd[i]
            if self._has_post[i]:
                bq = qm.quat_mul(bq, self._post_quat[i])
            pos.append(bp), quat.append(bq), lin.append(bv), ang.append(bw)
            axis_w_l.append(a_w), origin_w_l.append(o)

        body_pos = jnp.stack(pos)
        body_quat = jnp.stack(quat)
        sb = self._site_body
        site_pos = body_pos[sb] + qm.quat_rotate(body_quat[sb], self._site_pos)
        site_quat = qm.quat_mul(body_quat[sb], self._site_quat)
        return KinematicsOut(
            body_pos=body_pos,
            body_quat=body_quat,
            body_linvel=jnp.stack(lin),
            body_angvel=jnp.stack(ang),
            dof_axis_w=jnp.stack(axis_w_l),
            dof_origin_w=jnp.stack(origin_w_l),
            site_pos=site_pos,
            site_quat=site_quat,
        )

    def _motion_subspace(self, kin: KinematicsOut) -> jnp.ndarray:
        """World Plücker motion subspace per DOF: S = (omega, v_origin). (B, 6)."""
        a, o = kin.dof_axis_w, kin.dof_origin_w
        prism = jnp.asarray(self._is_prismatic)[:, None]
        s_ang = jnp.where(prism, 0.0, a)
        s_lin = jnp.where(prism, a, jnp.cross(o, a))
        return jnp.concatenate([s_ang, s_lin], axis=-1)

    def _spatial_inertia_o(self, kin: KinematicsOut) -> jnp.ndarray:
        """Per-body spatial inertia (B, 6, 6) about the world origin."""
        R = qm.quat_to_rotmat(kin.body_quat)            # (B,3,3)
        com_w = kin.body_pos + jnp.einsum("bij,bj->bi", R, self._com)
        i_c = jnp.einsum("bij,bjk,blk->bil", R, self._inertia, R)
        cx = _skew(com_w)                                # (B,3,3)
        mass = self._mass[:, None, None]
        top_l = i_c - mass * jnp.einsum("bij,bjk->bik", cx, cx)
        top_r = mass * cx
        bot_l = -mass * cx
        bot_r = mass * jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
        return jnp.concatenate(
            [
                jnp.concatenate([top_l, top_r], axis=-1),
                jnp.concatenate([bot_l, bot_r], axis=-1),
            ],
            axis=-2,
        )                                                # (B,6,6)

    def mass_matrix(
        self,
        kin: KinematicsOut,
        S: jnp.ndarray,
        i_o: "jnp.ndarray | None" = None,
    ) -> jnp.ndarray:
        """Composite-rigid-body mass matrix (26, 26) in world coordinates.

        `i_o` lets callers that already built the per-body spatial inertias
        (the Coriolis bias path) pass them in instead of recomputing.
        """
        m = self.model
        if i_o is None:
            i_o = self._spatial_inertia_o(kin)
        # composite subtree inertias (reverse topological accumulation)
        ic = [i_o[i] for i in range(m.num_bodies)]
        for i in reversed(range(m.num_bodies)):
            p = int(m.parent[i])
            if p >= 0:
                ic[p] = ic[p] + ic[i]
        ic = jnp.stack(ic)                               # (B,6,6)
        f = jnp.einsum("bij,bj->bi", ic, S)              # (B,6)
        raw = S @ f.T                                    # (B,B)
        A = self._anc_body                               # anc-or-self mask
        am = raw * A
        return am + am.T - jnp.diag(jnp.diag(raw))

    # ------------------------------------------------------------------
    # contacts
    # ------------------------------------------------------------------
    def _penalty_force(self, depth, normal, rel_vel, mu, m_eff, m_t=None):
        """Compliant contact force on the first body; depth>0 means contact.

        The spring-damper force is clamped by the impulse that would stop the
        approach velocity and correct a `contact_beta` fraction of the
        penetration within one substep (a one-shot sequential-impulse bound).
        This keeps arbitrarily stiff contacts unconditionally stable under
        explicit integration -- the role PhysX's solver iterations play in the
        reference's physics presets (cfg/physics/default.yaml:7-9).

        `rel_vel` must be the PREDICTED relative velocity of the coming
        substep (current value plus the unconstrained-force increment, e.g.
        the other body's gravity kick). Computing the impulse bound against
        the predicted velocity is what lets the clamp express STATIC contact:
        at rest the friction impulse exactly cancels the gravity increment
        instead of lagging it, so a grasped object hangs instead of creeping
        through the fingers. `m_t` optionally overrides the effective mass
        for the tangential (friction) bound, whose lever arm differs from the
        normal's.
        """
        p = self.params
        h = self.substep_dt
        # divisions by the substep dt are strength-reduced to muls by
        # inv_h, MIRRORING physics/pallas_step.py contact_force — the two
        # implementations must stay in numerical lockstep (parity test)
        inv_h = 1.0 / h
        if m_t is None:
            m_t = m_eff
        active = (depth > 0.0).astype(normal.dtype)
        vn = jnp.sum(rel_vel * normal, axis=-1)
        fn_spring = p.contact_stiffness * depth - p.contact_damping * vn
        correction = jnp.minimum(
            (p.contact_beta * inv_h) * depth, p.max_depenetration_velocity
        )
        fn_impulse = m_eff * inv_h * (-vn + correction)
        fn_mag = jnp.clip(jnp.minimum(fn_spring, fn_impulse), 0.0, None) * active
        vt = rel_vel - vn[..., None] * normal
        vt_norm = jnp.linalg.norm(vt, axis=-1)
        ft_mag = jnp.minimum(
            jnp.minimum(p.friction_stiffness * vt_norm, mu * fn_mag),
            m_t * inv_h * vt_norm,
        )
        ft = -vt / (vt_norm[..., None] + 1e-6) * ft_mag[..., None]
        return fn_mag[..., None] * normal + ft

    def _sphere_box(
        self, sp, sv, box_pos, box_quat, box_linvel, box_angvel,
        half, box_mass, box_inertia, mu, g_kick,
    ):
        """Hand collision spheres vs one free cube (op-for-op the math the
        fused Pallas kernel reproduces for the primary box). Returns
        (force on spheres (S,3), force on box (3,), torque on box (3,))."""
        r = self._sphere_radius
        Rb = qm.quat_to_rotmat(box_quat)
        # sphere centers in box frame
        local = (sp - box_pos) @ Rb          # == Rb^T @ (sp - c)
        closest = jnp.clip(local, -half, half)
        d = local - closest
        dist = jnp.linalg.norm(d, axis=-1)
        outside = dist > 1e-9
        n_out = d / (dist[:, None] + 1e-9)
        # sphere center inside the box: push out through nearest face
        face_gap = half - jnp.abs(local)              # (S,3) >= 0 inside
        min_ax = jnp.argmin(face_gap, axis=-1)
        sign = jnp.sign(
            jnp.take_along_axis(local, min_ax[:, None], axis=-1)[:, 0]
        )
        n_in = jax.nn.one_hot(min_ax, 3, dtype=sp.dtype) * jnp.where(
            sign == 0.0, 1.0, sign
        )[:, None]
        depth_out = r - dist
        depth_in = r + jnp.take_along_axis(face_gap, min_ax[:, None], axis=-1)[:, 0]
        n_local = jnp.where(outside[:, None], n_out, n_in)
        depth_b = jnp.where(outside, depth_out, depth_in)
        n_world = n_local @ Rb.T
        surf_local = jnp.where(outside[:, None], closest, local)
        # contact lever arm directly in world frame (p_c = box_pos + r_c
        # was only ever used relative to box_pos; mirrored in the kernel)
        r_c = surf_local @ Rb.T
        v_boxpt = box_linvel + jnp.cross(box_angvel, r_c)
        rel = sv - v_boxpt
        # predicted relative velocity: the box gains gravity's velocity
        # increment this substep; folding it in lets the impulse bound
        # express static support/friction (see _penalty_force docstring)
        rel_pred = rel - g_kick
        # contact effective mass including the box's rotational response
        # (the sequential-impulse "normal mass"); without the |r x n|^2/I
        # term a light box picks up unbounded spin from offset impacts.
        # The box's linear inverse mass is shared across the contacts
        # active this substep (same role as the /4 for ground corners):
        # otherwise n simultaneous contacts deliver n times the stopping
        # impulse and the box rattles out of a multi-finger grasp.
        share = jnp.maximum(
            jnp.sum((depth_b > 0.0).astype(sp.dtype)), 1.0
        )
        inv_box_mass = 1.0 / box_mass
        inv_box_inertia = 1.0 / box_inertia
        share_bm = share * inv_box_mass
        ang_n = jnp.sum(jnp.cross(r_c, n_world) ** 2, axis=-1) * inv_box_inertia
        m_red_n = 1.0 / (
            1.0 / self._sphere_meff + share_bm + ang_n
        )
        # friction's lever arm is along the (predicted) slip tangent
        vn_p = jnp.sum(rel_pred * n_world, axis=-1)
        vt_p = rel_pred - vn_p[:, None] * n_world
        t_hat = vt_p / (
            jnp.linalg.norm(vt_p, axis=-1, keepdims=True) + 1e-9
        )
        ang_t = jnp.sum(jnp.cross(r_c, t_hat) ** 2, axis=-1) * inv_box_inertia
        m_red_t = 1.0 / (
            1.0 / self._sphere_meff + share_bm + ang_t
        )
        f_box = self._penalty_force(
            depth_b, n_world, rel_pred, mu, m_red_n, m_red_t
        )
        react = -f_box
        return (
            f_box,
            jnp.sum(react, axis=0),
            jnp.sum(jnp.cross(r_c, react), axis=0),
        )

    _CORNER_SIGNS = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=np.float32,
    )

    def _box_ground(
        self, box_pos, box_quat, box_linvel, box_angvel,
        half, box_mass, box_inertia, mu, g_kick,
    ):
        """One free cube's corners vs the ground plane. Returns
        (force on box (3,), torque on box (3,))."""
        Rb = qm.quat_to_rotmat(box_quat)
        corners_l = jnp.asarray(self._CORNER_SIGNS, dtype=box_pos.dtype) * half
        corners_w = box_pos + corners_l @ Rb.T
        vc = box_linvel + jnp.cross(box_angvel, corners_w - box_pos)
        n_up8 = jnp.zeros_like(corners_w).at[:, 2].set(1.0)
        r_c8 = corners_w - box_pos
        ang8 = jnp.sum(jnp.cross(r_c8, n_up8) ** 2, axis=-1) * (1.0 / box_inertia)
        # linear part /4: a resting box loads ~4 corners simultaneously.
        # Corner velocity is gravity-predicted for the same static-support
        # reason as in _sphere_box (box is the FIRST body here, so the kick
        # adds).
        m_corner = 1.0 / (4.0 * (1.0 / box_mass) + ang8)
        vc_pred = vc + g_kick
        f_c = self._penalty_force(
            -corners_w[:, 2], n_up8, vc_pred, mu, m_corner
        )
        return (
            jnp.sum(f_c, axis=0),
            jnp.sum(jnp.cross(corners_w - box_pos, f_c), axis=0),
        )

    def _corners_vs_box(
        self,
        pos_a, quat_a, lin_a, ang_a, half_a, mass_a, inertia_a,
        pos_b, quat_b, lin_b, ang_b, half_b, mass_b, inertia_b,
        mu,
    ):
        """Corners of free cube A vs free cube B (vertex narrowphase).

        A corner of A penetrating B generates a penalty contact pushing A
        out along B's nearest face normal. Returns (force on A, torque on A,
        force on B, torque on B). Edge-edge contact is not modeled — the
        same class of approximation as the hand's collision-sphere
        decomposition; face-face stacking manifests as 4 corner contacts,
        which is the configuration multi-object tasks exercise.
        """
        RA = qm.quat_to_rotmat(quat_a)
        RB = qm.quat_to_rotmat(quat_b)
        corners_w = pos_a + (
            jnp.asarray(self._CORNER_SIGNS, dtype=pos_a.dtype) * half_a
        ) @ RA.T                                            # (8,3)
        local = (corners_w - pos_b) @ RB                    # B-frame
        face_gap = half_b - jnp.abs(local)                  # (8,3); >0 inside
        depth = jnp.min(face_gap, axis=-1)                  # >0 iff inside B
        min_ax = jnp.argmin(face_gap, axis=-1)
        sign = jnp.sign(
            jnp.take_along_axis(local, min_ax[:, None], axis=-1)[:, 0]
        )
        n_local = jax.nn.one_hot(min_ax, 3, dtype=pos_a.dtype) * jnp.where(
            sign == 0.0, 1.0, sign
        )[:, None]
        n_world = n_local @ RB.T                            # out of B, toward A
        r_a = corners_w - pos_a
        r_b = corners_w - pos_b
        v_a = lin_a + jnp.cross(ang_a, r_a)
        v_b = lin_b + jnp.cross(ang_b, r_b)
        # both bodies receive the same gravity kick, so the predicted
        # relative velocity equals the current one (static support between
        # the boxes comes from the spring term at equilibrium penetration)
        rel = v_a - v_b
        share = jnp.maximum(
            jnp.sum((depth > 0.0).astype(pos_a.dtype)), 1.0
        )
        ang_na = jnp.sum(jnp.cross(r_a, n_world) ** 2, axis=-1) / inertia_a
        ang_nb = jnp.sum(jnp.cross(r_b, n_world) ** 2, axis=-1) / inertia_b
        m_red = 1.0 / (
            share / mass_a + ang_na + share / mass_b + ang_nb
        )
        f = self._penalty_force(depth, n_world, rel, mu, m_red)  # on A
        return (
            jnp.sum(f, axis=0),
            jnp.sum(jnp.cross(r_a, f), axis=0),
            -jnp.sum(f, axis=0),
            jnp.sum(jnp.cross(r_b, -f), axis=0),
        )

    def _box_box(self, a, b, half_a, mass_a, inertia_a, half_b, mass_b,
                 inertia_b, mu):
        """Symmetric cube-cube contact: corners of each box against the
        other. `a`/`b` are (pos, quat, linvel, angvel) tuples. Returns
        (force_a, torque_a, force_b, torque_b)."""
        fa1, ta1, fb1, tb1 = self._corners_vs_box(
            *a, half_a, mass_a, inertia_a, *b, half_b, mass_b, inertia_b, mu
        )
        fb2, tb2, fa2, ta2 = self._corners_vs_box(
            *b, half_b, mass_b, inertia_b, *a, half_a, mass_a, inertia_a, mu
        )
        return fa1 + fa2, ta1 + ta2, fb1 + fb2, tb1 + tb2

    def _contacts(self, kin: KinematicsOut, state: PhysicsState, dr: DRSample):
        """All contact forces for one world.

        Returns (sphere_force (S,3), sphere_point (S,3),
                 box_force (3,), box_torque (3,),
                 box2_force (3,) | None, box2_torque (3,) | None).
        """
        p = self.params
        sb = self._sphere_body
        sp = kin.body_pos[sb] + qm.quat_rotate(kin.body_quat[sb], self._sphere_pos)
        sv = kin.body_linvel[sb] + jnp.cross(
            kin.body_angvel[sb], sp - kin.body_pos[sb]
        )
        r = self._sphere_radius

        # --- hand spheres vs ground plane (z = 0) ---
        mu_hg = 0.5 * (p.hand_friction + p.ground_friction) * dr.friction_scale
        depth = r - sp[:, 2]
        n_up = jnp.zeros_like(sp).at[:, 2].set(1.0)
        f_plane = self._penalty_force(depth, n_up, sv, mu_hg, self._sphere_meff)

        sphere_force = f_plane

        # --- finger-finger self-collision (statically pruned pairs) ---
        # Resolves crossings at the joint torques reachable through the
        # coupled action pipeline (the spread coupling fans fingers OUT, so
        # commanded crossings are moderate-force dynamic events). Limitation
        # vs the reference's PhysX constraint solver: a sustained full-kp
        # drive straight into the palm equilibrates at partial sphere overlap
        # because the impulse bound (max_depenetration_velocity, matching
        # PhysX cfg) caps the static normal force penalty contacts can hold.
        if len(self._sc_i):
            si, sj = self._sc_i, self._sc_j
            d_sc = sp[si] - sp[sj]
            dist_sc = jnp.linalg.norm(d_sc, axis=-1)
            n_sc = d_sc / (dist_sc[:, None] + 1e-9)     # points toward sphere i
            rel_sc = sv[si] - sv[sj]
            mu_hh = p.hand_friction * dr.friction_scale
            f_sc = self._penalty_force(
                self._sc_rsum - dist_sc, n_sc, rel_sc, mu_hh, self._sc_meff
            )
            n_sph = sp.shape[0]
            sphere_force = (
                sphere_force
                + jax.ops.segment_sum(f_sc, si, n_sph)
                - jax.ops.segment_sum(f_sc, sj, n_sph)
            )

        box_force = jnp.zeros(3, dtype=sp.dtype)
        box_torque = jnp.zeros(3, dtype=sp.dtype)
        box2_force = None
        box2_torque = None

        if p.has_box:
            g_kick = jnp.array(
                [0.0, 0.0, p.gravity * self.substep_dt], dtype=sp.dtype
            )
            box_mass = p.box_mass * dr.box_mass_scale
            box_inertia = self._box_inertia * dr.box_mass_scale
            mu_hb = 0.5 * (p.hand_friction + p.box_friction) * dr.friction_scale
            f_box, bf, bt = self._sphere_box(
                sp, sv, state.box_pos, state.box_quat,
                state.box_linvel, state.box_angvel,
                p.box_size / 2.0, box_mass, box_inertia, mu_hb, g_kick,
            )
            sphere_force = sphere_force + f_box
            box_force = box_force + bf
            box_torque = box_torque + bt

            # --- box corners vs ground plane ---
            mu_bg = 0.5 * (p.box_friction + p.ground_friction) * dr.friction_scale
            bf, bt = self._box_ground(
                state.box_pos, state.box_quat,
                state.box_linvel, state.box_angvel,
                p.box_size / 2.0, box_mass, box_inertia, mu_bg, g_kick,
            )
            box_force = box_force + bf
            box_torque = box_torque + bt

        if p.has_box2:
            # second free cube: hand contact, ground contact, and cube-cube
            # contact against the primary box. DR mass scaling is shared
            # with the primary box (one scale per env).
            box2_mass = p.box2_mass * dr.box_mass_scale
            box2_inertia = self._box2_inertia * dr.box_mass_scale
            mu_hb2 = 0.5 * (p.hand_friction + p.box2_friction) * dr.friction_scale
            f_b2, b2f, b2t = self._sphere_box(
                sp, sv, state.box2_pos, state.box2_quat,
                state.box2_linvel, state.box2_angvel,
                p.box2_size / 2.0, box2_mass, box2_inertia, mu_hb2, g_kick,
            )
            sphere_force = sphere_force + f_b2
            box2_force = b2f
            box2_torque = b2t

            mu_b2g = 0.5 * (p.box2_friction + p.ground_friction) * dr.friction_scale
            bf, bt = self._box_ground(
                state.box2_pos, state.box2_quat,
                state.box2_linvel, state.box2_angvel,
                p.box2_size / 2.0, box2_mass, box2_inertia, mu_b2g, g_kick,
            )
            box2_force = box2_force + bf
            box2_torque = box2_torque + bt

            mu_bb = 0.5 * (p.box_friction + p.box2_friction) * dr.friction_scale
            fa, ta, fb, tb = self._box_box(
                (state.box_pos, state.box_quat,
                 state.box_linvel, state.box_angvel),
                (state.box2_pos, state.box2_quat,
                 state.box2_linvel, state.box2_angvel),
                p.box_size / 2.0, box_mass, box_inertia,
                p.box2_size / 2.0, box2_mass, box2_inertia,
                mu_bb,
            )
            box_force = box_force + fa
            box_torque = box_torque + ta
            box2_force = box2_force + fb
            box2_torque = box2_torque + tb

        return sphere_force, sp, box_force, box_torque, box2_force, box2_torque

    # ------------------------------------------------------------------
    # substep / step
    # ------------------------------------------------------------------
    def _substep(self, state: PhysicsState, dof_targets, spawn_pos, dr: DRSample):
        p = self.params
        hdt = self.substep_dt
        kin = self.fk(state.q, state.qd, spawn_pos)
        S = self._motion_subspace(kin)

        sphere_force, sphere_pt, box_f, box_t, box2_f, box2_t = self._contacts(
            kin, state, dr
        )

        # spatial forces about world origin, accumulated per hand body
        n_contact = jnp.cross(sphere_pt, sphere_force)            # (S,3)
        body_w = jnp.concatenate(
            [
                jax.ops.segment_sum(n_contact, self._sphere_body, self.model.num_bodies),
                jax.ops.segment_sum(sphere_force, self._sphere_body, self.model.num_bodies),
            ],
            axis=-1,
        )                                                          # (B,6)
        # gravity at each body com
        R = qm.quat_to_rotmat(kin.body_quat)
        com_w = kin.body_pos + jnp.einsum("bij,bj->bi", R, self._com)
        f_g = jnp.zeros_like(com_w).at[:, 2].set(self._mass * p.gravity)
        body_w = body_w + jnp.concatenate([jnp.cross(com_w, f_g), f_g], axis=-1)

        subtree_w = self._anc_body @ body_w                        # (B,6)
        Q = jnp.sum(S * subtree_w, axis=-1)                        # (26,)

        i_o = None
        if p.coriolis:
            # RNEA velocity-product bias (Featherstone, world-origin
            # Plücker coordinates): per-body bias wrench
            # p_bias = v x* (I_o v) with v = (omega, v_at_origin) and I_o
            # the body spatial inertia about the world origin (the same
            # per-body blocks CRBA composites). Generalized bias
            # C(q,qd) qd = S^T (subtree sum of p_bias); enters the RHS
            # with a minus sign (M qdd + C qd = tau). The reference's
            # PhysX solver includes these terms; default-off here
            # (SimParams.coriolis) with the omission measured by
            # tools/measure_coriolis.py.
            i_o = self._spatial_inertia_o(kin)                 # (B,6,6)
            omega = kin.body_angvel
            v_o = kin.body_linvel - jnp.cross(omega, kin.body_pos)
            v6 = jnp.concatenate([omega, v_o], axis=-1)        # (B,6)
            h = jnp.einsum("bij,bj->bi", i_o, v6)              # (B,6)
            p_bias = jnp.concatenate(
                [
                    jnp.cross(omega, h[:, :3])
                    + jnp.cross(v_o, h[:, 3:]),
                    jnp.cross(omega, h[:, 3:]),
                ],
                axis=-1,
            )
            Q = Q - jnp.sum(S * (self._anc_body @ p_bias), axis=-1)

        kp = self._kp * dr.kp_scale
        kd = self._kd * dr.kd_scale
        M = self.mass_matrix(kin, S, i_o=i_o) + jnp.diag(self._armature)
        A = M + jnp.diag(hdt * kd + hdt * hdt * kp)
        rhs = M @ state.qd + hdt * (kp * (dof_targets - state.q) + Q)
        qd_new = spd_solve_one(A, rhs)
        q_new = state.q + hdt * qd_new

        # hard joint limits: project + zero outward velocity
        low_hit = q_new < self._lower
        high_hit = q_new > self._upper
        q_new = jnp.clip(q_new, self._lower, self._upper)
        qd_new = jnp.where(low_hit & (qd_new < 0), 0.0, qd_new)
        qd_new = jnp.where(high_hit & (qd_new > 0), 0.0, qd_new)

        def integrate_box(pos0, quat0, lin0, ang0, f, t, mass, inertia):
            lin = lin0 + hdt * (
                f * (1.0 / mass)
                + jnp.array([0.0, 0.0, p.gravity], dtype=f.dtype)
            )
            ang = ang0 + hdt * (1.0 / inertia) * t  # isotropic cube inertia
            # PhysX-style velocity caps (PhysX defaults maxAngularVelocity ~64)
            lin_n = jnp.linalg.norm(lin)
            lin = lin * jnp.minimum(1.0, 10.0 / (lin_n + 1e-9))
            ang_n = jnp.linalg.norm(ang)
            ang = ang * jnp.minimum(1.0, 64.0 / (ang_n + 1e-9))
            pos = pos0 + hdt * lin
            quat = qm.quat_integrate(quat0, ang, hdt)
            return pos, quat, lin, ang

        if p.has_box:
            box_mass = p.box_mass * dr.box_mass_scale
            pos, quat, lin, ang = integrate_box(
                state.box_pos, state.box_quat, state.box_linvel,
                state.box_angvel, box_f, box_t, box_mass,
                self._box_inertia * dr.box_mass_scale,
            )
            new_state = PhysicsState(q_new, qd_new, pos, quat, lin, ang)
            if p.has_box2:
                pos2, quat2, lin2, ang2 = integrate_box(
                    state.box2_pos, state.box2_quat, state.box2_linvel,
                    state.box2_angvel, box2_f, box2_t,
                    p.box2_mass * dr.box_mass_scale,
                    self._box2_inertia * dr.box_mass_scale,
                )
                new_state = dataclasses.replace(
                    new_state, box2_pos=pos2, box2_quat=quat2,
                    box2_linvel=lin2, box2_angvel=ang2,
                )
        else:
            new_state = dataclasses.replace(state, q=q_new, qd=qd_new)

        body_cf = jax.ops.segment_sum(
            sphere_force, self._sphere_body, self.model.num_bodies
        )
        return new_state, StepInfo(
            body_contact_force=body_cf,
            box_contact_force=box_f,
            box2_contact_force=box2_f,
        )

    def step_single(
        self,
        state: PhysicsState,
        dof_targets: jnp.ndarray,
        spawn_pos: jnp.ndarray,
        dr: DRSample | None = None,
    ) -> Tuple[PhysicsState, StepInfo]:
        """One physics step (= `substeps` integrator substeps) for one world.

        Mirrors PhysicsManager.step_physics (physics_manager.py:73-119): the
        contact forces reported are those of the final substep, matching
        PhysX's CC_LAST_SUBSTEP contact collection (cfg/config.yaml:36).
        """

        if dr is None:
            one = jnp.ones((), dtype=state.q.dtype)
            dr = DRSample(one, one, one, one)

        def body(carry, _):
            s, _info = carry
            s, info = self._substep(s, dof_targets, spawn_pos, dr)
            return (s, info), None

        zero_info = StepInfo(
            body_contact_force=jnp.zeros((self.model.num_bodies, 3), dtype=state.q.dtype),
            box_contact_force=jnp.zeros(3, dtype=state.q.dtype),
            box2_contact_force=(
                jnp.zeros(3, dtype=state.q.dtype)
                if self.params.has_box2 else None
            ),
        )
        (state, info), _ = jax.lax.scan(
            body, (state, zero_info), None, length=self.params.substeps
        )
        return state, info

    @partial(jax.jit, static_argnums=0)
    def step(
        self,
        state: PhysicsState,
        dof_targets: jnp.ndarray,
        spawn_pos: jnp.ndarray,
        dr: DRSample | None = None,
    ):
        """Batched physics step. All args have leading num_envs dim."""
        if dr is None:
            dr = DRSample.nominal(state.q.shape[0])
        return jax.vmap(self.step_single)(state, dof_targets, spawn_pos, dr)

    @partial(jax.jit, static_argnums=0)
    def kinematics(self, state: PhysicsState, spawn_pos: jnp.ndarray) -> KinematicsOut:
        """Batched FK only (for observation/reset paths)."""
        return jax.vmap(self.fk)(state.q, state.qd, spawn_pos)

    def make_control_step(self, n_physics_steps: int, use_pallas: bool | None = None):
        """Build fn(state, targets, spawn, dr) -> (state, StepInfo, KinematicsOut)
        covering `n_physics_steps` physics steps (x substeps each) per call.
        The returned kinematics is the FK of the FINAL state — what the
        observation path consumes — so callers never re-run FK per step.

        On TPU the whole control step runs as ONE fused Pallas kernel with
        envs on lanes (physics/pallas_step.py), including the final FK;
        elsewhere it is a lax.scan over the vmapped jnp step (the reference
        implementation the kernel is tested against) followed by vmapped FK.
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if self.params.coriolis:
            # velocity-product terms are jnp-engine-only (SimParams.coriolis
            # docstring): the fused kernels don't carry the bias wrench
            use_pallas = False

        if use_pallas:
            from dexrobot_isaac_tpu.physics.pallas_step import build_control_step

            ctrl = build_control_step(self, n_physics_steps)
            has_box2 = self.params.has_box2

            def fn(state: PhysicsState, targets, spawn, dr: DRSample):
                box_parts = [state.box_pos, state.box_quat, state.box_linvel,
                             state.box_angvel]
                if has_box2:
                    # second free cube: 13 more lanes appended
                    # (pallas_step.py build_lane_sim n_box_lanes)
                    box_parts += [state.box2_pos, state.box2_quat,
                                  state.box2_linvel, state.box2_angvel]
                box_in = jnp.concatenate(box_parts, axis=1)
                dr4 = jnp.stack(
                    [dr.kp_scale, dr.kd_scale, dr.box_mass_scale,
                     dr.friction_scale], axis=1,
                ).astype(state.q.dtype)
                q, qd, box, cf, bf, kin = ctrl(
                    state.q, state.qd, targets, spawn, box_in, dr4
                )
                new_state = PhysicsState(
                    q=q, qd=qd, box_pos=box[:, :3], box_quat=box[:, 3:7],
                    box_linvel=box[:, 7:10], box_angvel=box[:, 10:13],
                    box2_pos=box[:, 13:16] if has_box2 else None,
                    box2_quat=box[:, 16:20] if has_box2 else None,
                    box2_linvel=box[:, 20:23] if has_box2 else None,
                    box2_angvel=box[:, 23:26] if has_box2 else None,
                )
                return new_state, StepInfo(
                    body_contact_force=cf,
                    box_contact_force=bf[:, :3],
                    box2_contact_force=bf[:, 3:6] if has_box2 else None,
                ), kin

            return fn

        step_batch = jax.vmap(self.step_single, in_axes=(0, 0, 0, 0))

        def fn(state: PhysicsState, targets, spawn, dr: DRSample):
            def body(carry, _):
                ph, _info = carry
                ph, inf = step_batch(ph, targets, spawn, dr)
                return (ph, inf), None

            n = state.q.shape[0]
            zero_info = StepInfo(
                body_contact_force=jnp.zeros(
                    (n, self.model.num_bodies, 3), dtype=state.q.dtype
                ),
                box_contact_force=jnp.zeros((n, 3), dtype=state.q.dtype),
                box2_contact_force=(
                    jnp.zeros((n, 3), dtype=state.q.dtype)
                    if self.params.has_box2 else None
                ),
            )
            (state, info), _ = jax.lax.scan(
                body, (state, zero_info), None, length=n_physics_steps
            )
            kin = jax.vmap(self.fk)(state.q, state.qd, spawn)
            return state, info, kin

        return fn
