"""Fused Pallas TPU kernel for the full physics control step.

The XLA-level engine (`physics/engine.py`) expresses the simulator as
single-world math batched by `vmap`; that leaves thousands of tiny (N, 3/4)
ops whose lanes are mostly padding -- measured ~0.7% of VPU peak. This kernel
turns the layout sideways: ONE kernel computes the entire control step
(`physics_steps_per_control x substeps` integrator substeps) for a block of
envs, with every physical scalar held as a lane-vector over envs. All model
constants (tree topology, attach frames, inertias, collision spheres, PD
gains) are baked into the unrolled kernel at trace time.

Per substep the kernel computes, exactly mirroring HandPhysics._substep:
  FK + velocity propagation over the 26-body tree
  collision-sphere positions/velocities
  penalty contacts (sphere-plane, sphere-sphere self-collision over the
    build-time-pruned pair list, sphere-box, box corners-plane) with the
    sequential-impulse effective-mass clamp and depenetration cap
  gravity + contact spatial forces -> subtree sums -> generalized forces
  CRBA composite spatial inertias (10-parameter symmetric form) -> mass matrix
    on ancestor pairs (exact sparsity, zero ops elsewhere)
  implicit-PD system assembly + dense unrolled Cholesky solve
  semi-implicit integration, joint-limit projection, box integration with
    velocity caps

Numerical parity with the jnp engine is asserted by tests/test_pallas_step.py
(<=1e-3 relative over random states); the jnp path remains the reference
implementation and the fallback off-TPU.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

# Envs per kernel grid block; f32 lane-vecs tile as (8, 128). Overridable
# for block-size sweeps on new TPU generations (tools/bench_kernel.py).
ENV_BLOCK = int(os.environ.get("DEXHAND_ENV_BLOCK", "1024"))


# ----------------------------------------------------------------------
# lane-vector math helpers: values are tuples of (B,) arrays OR Python
# floats. Model constants enter the trace as Python floats; the smart
# scalar ops below fold 0/1 identities and float-float arithmetic at
# TRACE time, so structural zeros (basis-vector joint axes, identity
# attach quats, the (0,0,1) ground normal, diagonal inertias, the
# zero-velocity root) never emit VPU ops. The folds are bitwise-safe:
# a+0, a*1, and dropping a*0 terms from sums leave surviving lane ops
# identical, so kernel<->engine parity (and the TPU golden trajectory)
# is unchanged while the emitted op count drops ~25% (measured via
# jaxpr eqn count; the substep is issue/op-count bound on the VPU).
# ----------------------------------------------------------------------
def _isc(x):
    """Trace-time constant?"""
    return isinstance(x, (int, float))


def _m(a, b):
    """Folding multiply."""
    if _isc(a):
        if _isc(b):
            return a * b
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
    elif _isc(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _p(a, b):
    """Folding add."""
    if _isc(a):
        if _isc(b):
            return a + b
        if a == 0.0:
            return b
    elif _isc(b) and b == 0.0:
        return a
    return a + b


def _d(a, b):
    """Folding subtract."""
    if _isc(b):
        if _isc(a):
            return a - b
        if b == 0.0:
            return a
    elif _isc(a) and a == 0.0:
        return -b
    return a - b


def _sum(*terms):
    """Fold a sum: constants merge, zero terms vanish."""
    const = 0.0
    arrs = []
    for t in terms:
        if _isc(t):
            const += t
        else:
            arrs.append(t)
    if not arrs:
        return const
    acc = arrs[0]
    for a in arrs[1:]:
        acc = acc + a
    if const != 0.0:
        acc = acc + const
    return acc


def _lane(x, zero):
    """Materialize a possibly-folded constant as a lane array (boundary
    op for ref writes and loop carries)."""
    if _isc(x):
        return zero if x == 0.0 else x + zero
    return x


def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        _d(_sum(_m(aw, bx), _m(ax, bw), _m(ay, bz)), _m(az, by)),
        _d(_sum(_m(aw, by), _m(ay, bw), _m(az, bx)), _m(ax, bz)),
        _d(_sum(_m(aw, bz), _m(ax, by), _m(az, bw)), _m(ay, bx)),
        _d(_m(aw, bw), _sum(_m(ax, bx), _m(ay, by), _m(az, bz))),
    )


def _qrot(q, v):
    qx, qy, qz, qw = q
    vx, vy, vz = v
    tx = _m(2.0, _d(_m(qy, vz), _m(qz, vy)))
    ty = _m(2.0, _d(_m(qz, vx), _m(qx, vz)))
    tz = _m(2.0, _d(_m(qx, vy), _m(qy, vx)))
    return (
        _d(_sum(vx, _m(qw, tx), _m(qy, tz)), _m(qz, ty)),
        _d(_sum(vy, _m(qw, ty), _m(qz, tx)), _m(qx, tz)),
        _d(_sum(vz, _m(qw, tz), _m(qx, ty)), _m(qy, tx)),
    )


def _neg(x):
    return -x


def _qrot_inv(q, v):
    qx, qy, qz, qw = q
    return _qrot((_neg(qx), _neg(qy), _neg(qz), qw), v)


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (
        _d(_m(ay, bz), _m(az, by)),
        _d(_m(az, bx), _m(ax, bz)),
        _d(_m(ax, by), _m(ay, bx)),
    )


def _dot(a, b):
    return _sum(*(_m(x, y) for x, y in zip(a, b)))


def _add(a, b):
    return tuple(_p(x, y) for x, y in zip(a, b))


def _sub(a, b):
    return tuple(_d(x, y) for x, y in zip(a, b))


def _scale(a, s):
    return tuple(_m(x, s) for x in a)


def _rotmat_from_quat(q):
    """3x3 rotation entries (row-major tuple of 9 lane-vectors)."""
    qx, qy, qz, qw = q
    xx, yy, zz = _m(qx, qx), _m(qy, qy), _m(qz, qz)
    xy, xz, yz = _m(qx, qy), _m(qx, qz), _m(qy, qz)
    wx, wy, wz = _m(qw, qx), _m(qw, qy), _m(qw, qz)
    return (
        _d(1.0, _m(2.0, _p(yy, zz))),
        _m(2.0, _d(xy, wz)),
        _m(2.0, _p(xz, wy)),
        _m(2.0, _p(xy, wz)),
        _d(1.0, _m(2.0, _p(xx, zz))),
        _m(2.0, _d(yz, wx)),
        _m(2.0, _d(xz, wy)),
        _m(2.0, _p(yz, wx)),
        _d(1.0, _m(2.0, _p(xx, yy))),
    )


def _mat_vec(m9, v):
    return (
        _sum(_m(m9[0], v[0]), _m(m9[1], v[1]), _m(m9[2], v[2])),
        _sum(_m(m9[3], v[0]), _m(m9[4], v[1]), _m(m9[5], v[2])),
        _sum(_m(m9[6], v[0]), _m(m9[7], v[1]), _m(m9[8], v[2])),
    )


def _mat_t_vec(m9, v):
    return (
        _sum(_m(m9[0], v[0]), _m(m9[3], v[1]), _m(m9[6], v[2])),
        _sum(_m(m9[1], v[0]), _m(m9[4], v[1]), _m(m9[7], v[2])),
        _sum(_m(m9[2], v[0]), _m(m9[5], v[1]), _m(m9[8], v[2])),
    )


def build_lane_sim(engine, n_physics_steps: int):
    """Build the lane-vector simulator: `substep` (one integrator substep for
    a block of envs, all values as tuples of (B,) lane arrays) and `fk_lane`
    (FK + velocity propagation of a lane state), plus the static model
    constants both need. Shared by the physics-only control-step kernel
    below and the fused env-step kernel (envs/fused_step.py); the lane math
    is plain jnp over (B,) arrays, so it also traces OUTSIDE pallas for
    CPU-testable parity checks."""
    from types import SimpleNamespace

    m = engine.model
    p = engine.params
    nb = m.num_bodies
    h = float(engine.substep_dt)
    total_substeps = int(n_physics_steps * p.substeps)

    parent = [int(x) for x in m.parent]
    is_prism = [bool(x) for x in (m.joint_type == 0)]
    axis_c = m.axis.astype(np.float32)
    apos_c = m.attach_pos.astype(np.float32)
    aquat_c = m.attach_quat.astype(np.float32)
    post_c = m.post_quat.astype(np.float32)
    has_post = [not np.allclose(m.post_quat[i], [0, 0, 0, 1]) for i in range(nb)]
    mass_c = m.mass.astype(np.float32)
    com_c = m.com.astype(np.float32)
    inertia_c = m.inertia.astype(np.float32)
    lower_c = m.lower_limit.astype(np.float32)
    upper_c = m.upper_limit.astype(np.float32)
    kp_c = m.stiffness.astype(np.float32)
    kd_c = m.damping.astype(np.float32)
    arm_c = m.armature.astype(np.float32)
    sb = [int(x) for x in m.sphere_body]
    spos_c = m.sphere_pos.astype(np.float32)
    srad_c = m.sphere_radius.astype(np.float32)
    # apparent (operational-space) contact masses -- must match the jnp
    # engine's clamp masses exactly for kernel parity
    smeff_c = np.asarray(engine._sphere_meff, dtype=np.float32)
    ns = len(sb)
    # finger-finger self-collision pairs (statically pruned at model build;
    # see engine.compute_self_collision_pairs) -- baked in as unrolled indices
    sc_i = [int(x) for x in engine._sc_i]
    sc_j = [int(x) for x in engine._sc_j]
    sc_rsum_c = np.asarray(engine._sc_rsum, dtype=np.float32)
    sc_meff_c = np.asarray(engine._sc_meff, dtype=np.float32)
    n_sc = len(sc_i)
    site_b = [int(x) for x in m.site_body]
    sitep_c = m.site_pos.astype(np.float32)
    siteq_c = m.site_quat.astype(np.float32)
    nsite = len(site_b)
    # final-state kinematics output rows: per body pos3+quat4+lin3+ang3+
    # axis3+anchor3 (=19), then per site pos3+quat4 (=7)
    kin_rows = nb * 19 + nsite * 7

    # ancestor-or-self pairs (i ancestor of j) for the sparse mass matrix
    anc_chain: List[List[int]] = []  # per body: its ancestors incl. self
    for b in range(nb):
        chain = []
        j = b
        while j >= 0:
            chain.append(j)
            j = parent[j]
        anc_chain.append(sorted(chain))
    anc_pairs = set()
    for b in range(nb):
        for i in anc_chain[b]:
            anc_pairs.add((min(i, b), max(i, b)))
    nonzero = [[False] * nb for _ in range(nb)]
    for (i, j) in anc_pairs:
        nonzero[i][j] = nonzero[j][i] = True
    # strict ancestors (ascending) / descendants per body for the LTL solve
    anc_strict = [[i for i in anc_chain[b] if i != b] for b in range(nb)]
    desc_strict = [
        [i for i in range(nb) if b in anc_chain[i] and i != b]
        for b in range(nb)
    ]
    children = [[] for _ in range(nb)]
    for b in range(nb):
        if parent[b] >= 0:
            children[parent[b]].append(b)

    box_inertia = float(p.box_mass * p.box_size**2 / 6.0) if p.has_box else 1.0
    mu_hg = 0.5 * (p.hand_friction + p.ground_friction)
    mu_hb = 0.5 * (p.hand_friction + p.box_friction)
    mu_bg = 0.5 * (p.box_friction + p.ground_friction)
    half = float(p.box_size / 2.0)
    gz = float(p.gravity)
    # optional second free cube (SimParams.has_box2): its 13 state lanes are
    # appended to the box lane tuple (26 total), mirroring
    # engine._contacts'/_box_box's has_box2 block
    box2_inertia = (
        float(p.box2_mass * p.box2_size**2 / 6.0) if p.has_box2 else 1.0
    )
    mu_hb2 = 0.5 * (p.hand_friction + p.box2_friction) if p.has_box2 else 0.0
    mu_b2g = 0.5 * (p.box2_friction + p.ground_friction) if p.has_box2 else 0.0
    mu_bb = 0.5 * (p.box_friction + p.box2_friction) if p.has_box2 else 0.0
    half2 = float(p.box2_size / 2.0) if p.has_box2 else 0.0
    n_box_lanes = 26 if p.has_box2 else 13
    n_boxf_lanes = 6 if p.has_box2 else 3

    inv_h = 1.0 / h

    def contact_force(depth, n3, rel3, mu, m_eff, m_t=None):
        """Mirrors HandPhysics._penalty_force for one contact, lane math.
        rel3 is the PREDICTED relative velocity (gravity kick folded in by
        the caller); m_t optionally overrides the tangential clamp mass.
        Divisions by the substep dt are strength-reduced to muls by inv_h
        (mirrored in the engine — the two implementations stay in
        numerical lockstep)."""
        if m_t is None:
            m_t = m_eff
        active = (depth > 0.0).astype(depth.dtype)
        vn = _dot(rel3, n3)
        fn_spring = p.contact_stiffness * depth - p.contact_damping * vn
        corr = jnp.minimum(
            (p.contact_beta * inv_h) * depth, p.max_depenetration_velocity
        )
        fn_imp = _m(_m(m_eff, inv_h), -vn + corr)
        fn = jnp.clip(jnp.minimum(fn_spring, fn_imp), 0.0, None) * active
        vt = _sub(rel3, _scale(n3, vn))
        vt_n = jnp.sqrt(_dot(vt, vt) + 1e-12)
        ft = jnp.minimum(
            jnp.minimum(p.friction_stiffness * vt_n, mu * fn),
            _m(_m(m_t, inv_h), vt_n),
        )
        fvec = _add(_scale(n3, fn), _scale(vt, -ft / (vt_n + 1e-6)))
        return fvec

    def fk_lane(q, qd, spawn, zero):
        """FK + velocity propagation in lane math (mirrors HandPhysics.fk).
        Returns per-body pos/quat/lin/ang plus world joint axis + anchor."""
        pos: List = [None] * nb
        quat: List = [None] * nb
        lin: List = [None] * nb
        ang: List = [None] * nb
        axw: List = [None] * nb
        orig: List = [None] * nb
        def _zerov(v):
            return all(_isc(x) and x == 0.0 for x in v)

        for i in range(nb):
            pi = parent[i]
            if pi < 0:
                # root: identity orientation + zero velocity as trace-time
                # constants — the whole prismatic base chain's quat/velocity
                # math folds away through the smart helpers
                pp, pq = spawn, (0.0, 0.0, 0.0, 1.0)
                pv = pw = (0.0, 0.0, 0.0)
            else:
                pp, pq, pv, pw = pos[pi], quat[pi], lin[pi], ang[pi]
            ap = tuple(float(apos_c[i][k]) for k in range(3))
            o = _add(pp, _qrot(pq, ap))
            aq = tuple(float(aquat_c[i][k]) for k in range(4))
            jq = _qmul(pq, aq)
            ax = tuple(float(axis_c[i][k]) for k in range(3))
            a_w = _qrot(jq, ax)
            if _zerov(pw):
                v_o = pv
            else:
                v_o = _add(pv, _cross(pw, _sub(o, pp)))
            if is_prism[i]:
                bp = _add(o, _scale(a_w, q[i]))
                bq = jq
                if _zerov(pw):
                    bv = _add(v_o, _scale(a_w, qd[i]))
                else:
                    bv = _add(
                        _add(v_o, _cross(pw, _sub(bp, o))),
                        _scale(a_w, qd[i]),
                    )
                bw = pw
            else:
                bp = o
                hq = q[i] * 0.5
                sq, cq = jnp.sin(hq), jnp.cos(hq)
                jrot = (_m(ax[0], sq), _m(ax[1], sq), _m(ax[2], sq), cq)
                bq = _qmul(jq, jrot)
                bv = v_o
                bw = _add(pw, _scale(a_w, qd[i]))
            if has_post[i]:
                pq4 = tuple(float(post_c[i][k]) for k in range(4))
                bq = _qmul(bq, pq4)
            pos[i], quat[i], lin[i], ang[i] = bp, bq, bv, bw
            axw[i], orig[i] = a_w, o
        return pos, quat, lin, ang, axw, orig

    def substep(q, qd, box, tgt, spawn, drv):
        kp_s, kd_s, bm_s, fr_s = drv
        # ---------------- FK + velocities ----------------
        zero = jnp.zeros_like(q[0])
        pos, quat, lin, ang, axw, orig = fk_lane(q, qd, spawn, zero)

        # ---------------- contacts ----------------
        # accumulators start as trace-time zeros; the first accumulation
        # into each slot replaces the add with the value itself
        bF = [(0.0, 0.0, 0.0)] * nb   # net force per body
        bN = [(0.0, 0.0, 0.0)] * nb   # moment about origin
        cf = [(0.0, 0.0, 0.0)] * nb   # reported contact force
        box_f = (0.0, 0.0, 0.0)
        box_t = (0.0, 0.0, 0.0)
        # world positions/velocities of all collision spheres (shared by the
        # plane, box, and self-collision passes below)
        sp_all: List = [None] * ns
        sv_all: List = [None] * ns
        for s in range(ns):
            b = sb[s]
            sp_l = tuple(float(spos_c[s][k]) for k in range(3))
            spw = _add(pos[b], _qrot(quat[b], sp_l))
            sp_all[s] = spw
            sv_all[s] = _add(lin[b], _cross(ang[b], _sub(spw, pos[b])))
        if p.has_box:
            bpos = (box[0], box[1], box[2])
            bquat = (box[3], box[4], box[5], box[6])
            blin = (box[7], box[8], box[9])
            bang = (box[10], box[11], box[12])
            box_mass = p.box_mass * bm_s
            box_in = box_inertia * bm_s
            # hoisted reciprocals: one division serves every contact this
            # substep (previously 2 divisions per sphere + 8 per corner;
            # mirrored in engine._sphere_box/_box_ground)
            inv_box_mass = 1.0 / box_mass
            inv_box_in = 1.0 / box_in
            # box orientation as a rotation matrix, hoisted for the geo
            # pass, the force pass, and the corner pass (engine._sphere_box
            # uses the same matrix form; one conversion replaces ~117
            # quaternion rotations per substep)
            Rb = _rotmat_from_quat(bquat)
            # single geometry pass, CACHED for the force loop below (the
            # share count needs all depths before any force is computed;
            # recomputing the transforms per sphere measured ~35% of the
            # whole control step at 4096 envs)
            geo = []
            n_act = 0.0
            for s in range(ns):
                loc = _mat_t_vec(Rb, _sub(sp_all[s], bpos))
                cl = tuple(jnp.clip(x, -half, half) for x in loc)
                d = _sub(loc, cl)
                dist = jnp.sqrt(_dot(d, d) + 1e-18)
                gap = tuple(half - jnp.abs(x) for x in loc)
                gap_min = jnp.minimum(jnp.minimum(gap[0], gap[1]), gap[2])
                r = float(srad_c[s])
                depth_b = jnp.where(dist > 1e-9, r - dist, r + gap_min)
                n_act = _p(n_act, (depth_b > 0.0).astype(depth_b.dtype))
                geo.append((loc, cl, d, dist, gap))
            share = jnp.maximum(n_act, 1.0)
            share_bm = share * inv_box_mass
        for s in range(ns):
            b = sb[s]
            sp, sv = sp_all[s], sv_all[s]
            r = float(srad_c[s])
            m_eff = float(smeff_c[s])
            # sphere vs ground plane
            f = contact_force(r - sp[2], (0.0, 0.0, 1.0), sv,
                              mu_hg * fr_s, m_eff)
            if p.has_box:
                # sphere vs box (geometry cached above)
                loc, cl, d, dist, gap = geo[s]
                outside = dist > 1e-9
                n_out = _scale(d, 1.0 / (dist + 1e-9))
                # nearest face when inside
                m01 = gap[0] < gap[1]
                m2 = (jnp.where(m01, gap[0], gap[1]) < gap[2])
                sel0 = m01 & m2
                sel1 = (~m01) & m2
                sel2 = ~m2
                sgn = lambda x: jnp.where(x >= 0, 1.0, -1.0)
                n_in = (
                    jnp.where(sel0, sgn(loc[0]), 0.0),
                    jnp.where(sel1, sgn(loc[1]), 0.0),
                    jnp.where(sel2, sgn(loc[2]), 0.0),
                )
                depth_in = r + jnp.where(
                    sel0, gap[0], jnp.where(sel1, gap[1], gap[2])
                )
                nl = tuple(jnp.where(outside, a, bvl)
                           for a, bvl in zip(n_out, n_in))
                depth_b = jnp.where(outside, r - dist, depth_in)
                nw = _mat_vec(Rb, nl)
                surf = tuple(jnp.where(outside, a, bvl) for a, bvl in zip(cl, loc))
                r_c = _mat_vec(Rb, surf)
                v_bp = _add(blin, _cross(bang, r_c))
                rel = _sub(sv, v_bp)
                # predicted relative velocity: fold in the box's gravity kick
                # (rel = sphere - box, so the kick subtracts)
                rel_pred = (rel[0], rel[1], rel[2] - gz * h)
                rxn = _cross(r_c, nw)
                ang_n = _m(_dot(rxn, rxn), inv_box_in)
                m_red_n = 1.0 / (1.0 / m_eff + share_bm + ang_n)
                vn_p = _dot(rel_pred, nw)
                vt_p = _sub(rel_pred, _scale(nw, vn_p))
                vt_p_n = jnp.sqrt(_dot(vt_p, vt_p) + 1e-18)
                t_hat = _scale(vt_p, 1.0 / (vt_p_n + 1e-9))
                rxt = _cross(r_c, t_hat)
                ang_tan = _m(_dot(rxt, rxt), inv_box_in)
                m_red_t = 1.0 / (1.0 / m_eff + share_bm + ang_tan)
                fb = contact_force(depth_b, nw, rel_pred, mu_hb * fr_s,
                                   m_red_n, m_red_t)
                f = _add(f, fb)
                react = _scale(fb, -1.0)
                box_f = _add(box_f, react)
                box_t = _add(box_t, _cross(r_c, react))
            cf[b] = _add(cf[b], f)
            bF[b] = _add(bF[b], f)
            bN[b] = _add(bN[b], _cross(sp, f))
        # finger-finger self-collision over the statically pruned pairs
        # (mirrors engine._contacts: +f on sphere i at its center, -f on
        # sphere j at its center; both flow into the reported body forces)
        for k in range(n_sc):
            si, sj = sc_i[k], sc_j[k]
            bi, bj = sb[si], sb[sj]
            d3 = _sub(sp_all[si], sp_all[sj])
            dist = jnp.sqrt(_dot(d3, d3) + 1e-18)
            n3 = _scale(d3, 1.0 / (dist + 1e-9))
            rel = _sub(sv_all[si], sv_all[sj])
            f = contact_force(float(sc_rsum_c[k]) - dist, n3, rel,
                              p.hand_friction * fr_s, float(sc_meff_c[k]))
            cf[bi] = _add(cf[bi], f)
            bF[bi] = _add(bF[bi], f)
            bN[bi] = _add(bN[bi], _cross(sp_all[si], f))
            cf[bj] = _sub(cf[bj], f)
            bF[bj] = _sub(bF[bj], f)
            bN[bj] = _sub(bN[bj], _cross(sp_all[sj], f))
        if p.has_box:
            # box corners vs ground (Rb hoisted above)
            for sx in (-half, half):
                for sy in (-half, half):
                    for sz in (-half, half):
                        cl = (sx, sy, sz)
                        cw = _add(bpos, _mat_vec(Rb, cl))
                        r_c = _sub(cw, bpos)
                        vc = _add(blin, _cross(bang, r_c))
                        n3 = (0.0, 0.0, 1.0)
                        ang8 = _m(
                            _dot(_cross(r_c, n3), _cross(r_c, n3)),
                            inv_box_in,
                        )
                        m_c = 1.0 / (4.0 * inv_box_mass + ang8)
                        # box is the first body here: its gravity kick adds
                        vc_pred = (vc[0], vc[1], vc[2] + gz * h)
                        fc = contact_force(-cw[2], n3, vc_pred, mu_bg * fr_s,
                                           m_c)
                        box_f = _add(box_f, fc)
                        box_t = _add(box_t, _cross(r_c, fc))

        # ---------------- second free cube (has_box2) ----------------
        # mirrors engine._contacts' has_box2 block + _box_box: spheres vs
        # box2, box2 corners vs ground, and the symmetric cube-cube corner
        # narrowphase against the primary box
        box2_f = (0.0, 0.0, 0.0)
        box2_t = (0.0, 0.0, 0.0)
        if p.has_box2:
            b2pos = (box[13], box[14], box[15])
            b2quat = (box[16], box[17], box[18], box[19])
            b2lin = (box[20], box[21], box[22])
            b2ang = (box[23], box[24], box[25])
            box2_mass = p.box2_mass * bm_s
            box2_in = box2_inertia * bm_s
            inv_box2_mass = 1.0 / box2_mass
            inv_box2_in = 1.0 / box2_in
            Rb2 = _rotmat_from_quat(b2quat)

            # --- spheres vs box2 (same math as the primary-box pass) ---
            geo2 = []
            n_act2 = 0.0
            for s in range(ns):
                loc = _mat_t_vec(Rb2, _sub(sp_all[s], b2pos))
                cl = tuple(jnp.clip(x, -half2, half2) for x in loc)
                d = _sub(loc, cl)
                dist = jnp.sqrt(_dot(d, d) + 1e-18)
                gap = tuple(half2 - jnp.abs(x) for x in loc)
                gap_min = jnp.minimum(jnp.minimum(gap[0], gap[1]), gap[2])
                r = float(srad_c[s])
                depth_b = jnp.where(dist > 1e-9, r - dist, r + gap_min)
                n_act2 = _p(n_act2, (depth_b > 0.0).astype(depth_b.dtype))
                geo2.append((loc, cl, d, dist, gap))
            share2 = jnp.maximum(n_act2, 1.0)
            share2_bm = share2 * inv_box2_mass
            for s in range(ns):
                b = sb[s]
                sp, sv = sp_all[s], sv_all[s]
                r = float(srad_c[s])
                m_eff = float(smeff_c[s])
                loc, cl, d, dist, gap = geo2[s]
                outside = dist > 1e-9
                n_out = _scale(d, 1.0 / (dist + 1e-9))
                m01 = gap[0] < gap[1]
                m2 = (jnp.where(m01, gap[0], gap[1]) < gap[2])
                sel0 = m01 & m2
                sel1 = (~m01) & m2
                sel2 = ~m2
                sgn = lambda x: jnp.where(x >= 0, 1.0, -1.0)
                n_in = (
                    jnp.where(sel0, sgn(loc[0]), 0.0),
                    jnp.where(sel1, sgn(loc[1]), 0.0),
                    jnp.where(sel2, sgn(loc[2]), 0.0),
                )
                depth_in = r + jnp.where(
                    sel0, gap[0], jnp.where(sel1, gap[1], gap[2])
                )
                nl = tuple(jnp.where(outside, a, bvl)
                           for a, bvl in zip(n_out, n_in))
                depth_b = jnp.where(outside, r - dist, depth_in)
                nw = _mat_vec(Rb2, nl)
                surf = tuple(jnp.where(outside, a, bvl)
                             for a, bvl in zip(cl, loc))
                r_c = _mat_vec(Rb2, surf)
                v_bp = _add(b2lin, _cross(b2ang, r_c))
                rel = _sub(sv, v_bp)
                rel_pred = (rel[0], rel[1], rel[2] - gz * h)
                rxn = _cross(r_c, nw)
                ang_n = _m(_dot(rxn, rxn), inv_box2_in)
                m_red_n = 1.0 / (1.0 / m_eff + share2_bm + ang_n)
                vn_p = _dot(rel_pred, nw)
                vt_p = _sub(rel_pred, _scale(nw, vn_p))
                vt_p_n = jnp.sqrt(_dot(vt_p, vt_p) + 1e-18)
                t_hat = _scale(vt_p, 1.0 / (vt_p_n + 1e-9))
                rxt = _cross(r_c, t_hat)
                ang_tan = _m(_dot(rxt, rxt), inv_box2_in)
                m_red_t = 1.0 / (1.0 / m_eff + share2_bm + ang_tan)
                fb2 = contact_force(depth_b, nw, rel_pred, mu_hb2 * fr_s,
                                    m_red_n, m_red_t)
                cf[b] = _add(cf[b], fb2)
                bF[b] = _add(bF[b], fb2)
                bN[b] = _add(bN[b], _cross(sp, fb2))
                react = _scale(fb2, -1.0)
                box2_f = _add(box2_f, react)
                box2_t = _add(box2_t, _cross(r_c, react))

            # --- box2 corners vs ground (Rb2 hoisted above) ---
            for sx in (-half2, half2):
                for sy in (-half2, half2):
                    for sz in (-half2, half2):
                        cl = (sx, sy, sz)
                        cw = _add(b2pos, _mat_vec(Rb2, cl))
                        r_c = _sub(cw, b2pos)
                        vc = _add(b2lin, _cross(b2ang, r_c))
                        n3 = (0.0, 0.0, 1.0)
                        ang8 = _m(
                            _dot(_cross(r_c, n3), _cross(r_c, n3)),
                            inv_box2_in,
                        )
                        m_c = 1.0 / (4.0 * inv_box2_mass + ang8)
                        vc_pred = (vc[0], vc[1], vc[2] + gz * h)
                        fc = contact_force(-cw[2], n3, vc_pred,
                                           mu_b2g * fr_s, m_c)
                        box2_f = _add(box2_f, fc)
                        box2_t = _add(box2_t, _cross(r_c, fc))

            # --- cube-cube corner narrowphase (engine._corners_vs_box) ---
            def corners_vs_box(
                pos_a, quat_a, lin_a, ang_a, half_a, mass_a, in_a,
                pos_b, quat_b, lin_b, ang_b, half_b, mass_b, in_b, mu,
            ):
                """Corners of cube A vs cube B. Returns (fA, tA, fB, tB)."""
                RA = _rotmat_from_quat(quat_a)
                RB = _rotmat_from_quat(quat_b)
                corners = []
                for sx in (-half_a, half_a):
                    for sy in (-half_a, half_a):
                        for sz in (-half_a, half_a):
                            cl_a = (sx, sy, sz)
                            cw = _add(pos_a, _mat_vec(RA, cl_a))
                            local = _mat_t_vec(RB, _sub(cw, pos_b))
                            gapv = tuple(half_b - jnp.abs(x) for x in local)
                            depth = jnp.minimum(
                                jnp.minimum(gapv[0], gapv[1]), gapv[2]
                            )
                            corners.append((cw, local, gapv, depth))
                inv_mass_a = 1.0 / mass_a
                inv_in_a = 1.0 / in_a
                inv_mass_b = 1.0 / mass_b
                inv_in_b = 1.0 / in_b
                n_act_bb = 0.0
                for (_, _, _, depth) in corners:
                    n_act_bb = _p(n_act_bb, (depth > 0.0).astype(depth.dtype))
                share_bb = jnp.maximum(n_act_bb, 1.0)
                fA = (0.0, 0.0, 0.0)
                tA = (0.0, 0.0, 0.0)
                fB = (0.0, 0.0, 0.0)
                tB = (0.0, 0.0, 0.0)
                for (cw, local, gapv, depth) in corners:
                    m01 = gapv[0] < gapv[1]
                    m2 = (jnp.where(m01, gapv[0], gapv[1]) < gapv[2])
                    sel0 = m01 & m2
                    sel1 = (~m01) & m2
                    sel2 = ~m2
                    sg = lambda x: jnp.where(x >= 0, 1.0, -1.0)
                    n_local = (
                        jnp.where(sel0, sg(local[0]), 0.0),
                        jnp.where(sel1, sg(local[1]), 0.0),
                        jnp.where(sel2, sg(local[2]), 0.0),
                    )
                    n_world = _mat_vec(RB, n_local)
                    r_a = _sub(cw, pos_a)
                    r_b = _sub(cw, pos_b)
                    v_a = _add(lin_a, _cross(ang_a, r_a))
                    v_b = _add(lin_b, _cross(ang_b, r_b))
                    # both bodies get the same gravity kick: predicted
                    # relative velocity equals the current one
                    rel = _sub(v_a, v_b)
                    rxa = _cross(r_a, n_world)
                    rxb = _cross(r_b, n_world)
                    m_red = 1.0 / (
                        share_bb * inv_mass_a + _m(_dot(rxa, rxa), inv_in_a)
                        + share_bb * inv_mass_b
                        + _m(_dot(rxb, rxb), inv_in_b)
                    )
                    fc = contact_force(depth, n_world, rel, mu, m_red)
                    fA = _add(fA, fc)
                    tA = _add(tA, _cross(r_a, fc))
                    fB = _sub(fB, fc)
                    tB = _sub(tB, _cross(r_b, fc))
                return fA, tA, fB, tB

            mu_bb_s = mu_bb * fr_s
            fa1, ta1, fb1, tb1 = corners_vs_box(
                bpos, bquat, blin, bang, half, box_mass, box_in,
                b2pos, b2quat, b2lin, b2ang, half2, box2_mass, box2_in,
                mu_bb_s,
            )
            fb2_, tb2_, fa2, ta2 = corners_vs_box(
                b2pos, b2quat, b2lin, b2ang, half2, box2_mass, box2_in,
                bpos, bquat, blin, bang, half, box_mass, box_in,
                mu_bb_s,
            )
            box_f = _add(box_f, _add(fa1, fa2))
            box_t = _add(box_t, _add(ta1, ta2))
            box2_f = _add(box2_f, _add(fb1, fb2_))
            box2_t = _add(box2_t, _add(tb1, tb2_))

        # ---------------- gravity + subtree spatial forces ----------------
        # per-body world rotation + COM position, hoisted: both this pass
        # and CRBA below need them (previously each computed its own copy)
        R_all: List = [None] * nb
        cw_all: List = [None] * nb
        for i in range(nb):
            if mass_c[i] == 0.0:
                continue
            R_all[i] = _rotmat_from_quat(quat[i])
            cw_all[i] = _add(
                pos[i],
                _mat_vec(R_all[i], tuple(float(com_c[i][k]) for k in range(3))),
            )
            cw = cw_all[i]
            fgz = float(mass_c[i]) * gz
            fg = (0.0, 0.0, fgz)
            bF[i] = _add(bF[i], fg)
            bN[i] = _add(bN[i], _cross(cw, fg))
        # reverse topological accumulation (children before parents)
        for i in reversed(range(nb)):
            if parent[i] >= 0:
                bF[parent[i]] = _add(bF[parent[i]], bF[i])
                bN[parent[i]] = _add(bN[parent[i]], bN[i])
        # generalized forces Q_j = a.n - a.(o x F) [rev] | a.F [prism]
        Q = [None] * nb
        S_ang = [None] * nb
        S_lin = [None] * nb
        for j in range(nb):
            if is_prism[j]:
                S_ang[j] = (0.0, 0.0, 0.0)
                S_lin[j] = axw[j]
                Q[j] = _dot(axw[j], bF[j])
            else:
                S_ang[j] = axw[j]
                S_lin[j] = _cross(orig[j], axw[j])
                Q[j] = _p(_dot(S_ang[j], bN[j]), _dot(S_lin[j], bF[j]))

        # ---------------- CRBA (10-parameter composite inertias) ----------
        # per body about world origin: T (sym 3x3: 6), k = m*c_w (3), mass
        T = [None] * nb
        K = [None] * nb
        Msum = [None] * nb
        for i in range(nb):
            mi = float(mass_c[i])
            if mi == 0.0:
                # massless body contributes nothing to the composites
                T[i] = (0.0,) * 6
                K[i] = (0.0, 0.0, 0.0)
                Msum[i] = 0.0
                continue
            R = R_all[i]
            cw = cw_all[i]
            # Ic_w = R Ic R^T  (Ic constant 3x3; zero entries — diagonal
            # principal-axis inertias are the common case — fold away)
            Ic = inertia_c[i]
            RI = [None] * 9
            for a in range(3):
                for bcol in range(3):
                    RI[a * 3 + bcol] = _sum(
                        _m(R[a * 3 + 0], float(Ic[0][bcol])),
                        _m(R[a * 3 + 1], float(Ic[1][bcol])),
                        _m(R[a * 3 + 2], float(Ic[2][bcol])),
                    )
            icw = [None] * 6  # xx, xy, xz, yy, yz, zz
            idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            for n_, (a, bcol) in enumerate(idx):
                icw[n_] = _sum(
                    _m(RI[a * 3 + 0], R[bcol * 3 + 0]),
                    _m(RI[a * 3 + 1], R[bcol * 3 + 1]),
                    _m(RI[a * 3 + 2], R[bcol * 3 + 2]),
                )
            # T = Ic_w - m * cx cx ; (cx cx) = c c^T - |c|^2 I
            c2 = _dot(cw, cw)
            Txx = _d(icw[0], _m(mi, _d(_m(cw[0], cw[0]), c2)))
            Txy = _d(icw[1], _m(mi, _m(cw[0], cw[1])))
            Txz = _d(icw[2], _m(mi, _m(cw[0], cw[2])))
            Tyy = _d(icw[3], _m(mi, _d(_m(cw[1], cw[1]), c2)))
            Tyz = _d(icw[4], _m(mi, _m(cw[1], cw[2])))
            Tzz = _d(icw[5], _m(mi, _d(_m(cw[2], cw[2]), c2)))
            T[i] = (Txx, Txy, Txz, Tyy, Tyz, Tzz)
            K[i] = _scale(cw, mi)
            # subtree mass is a trace-time constant of the model
            Msum[i] = mi
        for i in reversed(range(nb)):
            pi = parent[i]
            if pi >= 0:
                T[pi] = _add(T[pi], T[i])
                K[pi] = _add(K[pi], K[i])
                Msum[pi] = Msum[pi] + Msum[i]   # float + float (constant)
        # f_j = Ic_j S_j : ftop = T a + k x v ; fbot = -(k x a) + m v
        ftop = [None] * nb
        fbot = [None] * nb
        for j in range(nb):
            a3, v3 = S_ang[j], S_lin[j]
            t6 = T[j]
            Ta = (
                _sum(_m(t6[0], a3[0]), _m(t6[1], a3[1]), _m(t6[2], a3[2])),
                _sum(_m(t6[1], a3[0]), _m(t6[3], a3[1]), _m(t6[4], a3[2])),
                _sum(_m(t6[2], a3[0]), _m(t6[4], a3[1]), _m(t6[5], a3[2])),
            )
            ftop[j] = _add(Ta, _cross(K[j], v3))
            if all(_isc(x) and x == 0.0 for x in a3):
                # prismatic: -(k x a) vanishes
                fbot[j] = _scale(v3, Msum[j])
            else:
                fbot[j] = _add(
                    _scale(_cross(K[j], a3), -1.0), _scale(v3, Msum[j])
                )
        # mass matrix entries on ancestor pairs: M[i][j] = S_i . f_{max(i,j)}
        # (for i ancestor of j use f_j; symmetric)
        A = [[None] * nb for _ in range(nb)]
        for bdy in range(nb):
            for i in anc_chain[bdy]:
                val = _p(_dot(S_ang[i], ftop[bdy]), _dot(S_lin[i], fbot[bdy]))
                A[i][bdy] = val
                A[bdy][i] = val
        # implicit PD: A = M + diag(arm + h*kd + h^2*kp); rhs = M qd + h(...)
        rhs = [None] * nb
        for i in range(nb):
            acc = 0.0
            for j in range(nb):
                if nonzero[i][j]:
                    acc = _p(acc, A[i][j] * qd[j])
            if float(arm_c[i]) != 0.0:
                acc = _p(acc, float(arm_c[i]) * qd[i])
            kp_i = float(kp_c[i]) * kp_s
            rhs[i] = acc + h * (kp_i * (tgt[i] - q[i]) + Q[i])
            A[i][i] = (
                A[i][i] + float(arm_c[i])
                + h * float(kd_c[i]) * kd_s + h * h * kp_i
            )
        # sparse LTL factorization (Featherstone, RBDA §8.5): processing
        # leaf-to-root gives A = L^T L with ZERO fill-in — L's nonzeros are
        # exactly the ancestor pairs, so every op below is structurally
        # necessary (~2x fewer flops than the fill-in-prone root-first
        # Cholesky this replaces; bodies are topologically ordered,
        # parent[i] < i, so ancestors have smaller indices)
        inv_d = [None] * nb
        for k in reversed(range(nb)):
            d = jax.lax.rsqrt(A[k][k])
            inv_d[k] = d
            A[k][k] = A[k][k] * d  # = sqrt: the diagonal of L
            for j in anc_strict[k]:
                A[k][j] = A[k][j] * d
            for ii, i in enumerate(anc_strict[k]):
                for j in anc_strict[k][: ii + 1]:
                    A[i][j] = A[i][j] - A[k][i] * A[k][j]
        # solve L^T w = rhs (descendants feed ancestors, descending)
        w = [None] * nb
        for j in reversed(range(nb)):
            v = rhs[j]
            for i in desc_strict[j]:
                v = v - A[i][j] * w[i]
            w[j] = v * inv_d[j]
        # solve L qd' = w (ancestors feed descendants, ascending)
        qd_new = [None] * nb
        for k in range(nb):
            v = w[k]
            for j in anc_strict[k]:
                v = v - A[k][j] * qd_new[j]
            qd_new[k] = v * inv_d[k]
        q_new = [None] * nb
        for i in range(nb):
            qn = q[i] + h * qd_new[i]
            lo, up = float(lower_c[i]), float(upper_c[i])
            low_hit = qn < lo
            high_hit = qn > up
            qn = jnp.clip(qn, lo, up)
            v = qd_new[i]
            v = jnp.where(low_hit & (v < 0), 0.0, v)
            v = jnp.where(high_hit & (v > 0), 0.0, v)
            q_new[i], qd_new[i] = qn, v

        # ---------------- box integration ----------------
        if p.has_box:
            lv = (
                blin[0] + h * _m(box_f[0], inv_box_mass),
                blin[1] + h * _m(box_f[1], inv_box_mass),
                blin[2] + h * (_m(box_f[2], inv_box_mass) + gz),
            )
            av = _add(bang, _scale(box_t, h * inv_box_in))
            ln = jnp.sqrt(_dot(lv, lv) + 1e-18)
            lv = _scale(lv, jnp.minimum(1.0, 10.0 / (ln + 1e-9)))
            an = jnp.sqrt(_dot(av, av) + 1e-18)
            av = _scale(av, jnp.minimum(1.0, 64.0 / (an + 1e-9)))
            bp_n = _add(bpos, _scale(lv, h))
            # quat integrate: q' = normalize(q + 0.5 h * omega_quat * q)
            oq = (av[0], av[1], av[2], zero)
            dq = _qmul(oq, bquat)
            qn4 = tuple(bq_ + 0.5 * h * dq_ for bq_, dq_ in zip(bquat, dq))
            norm = jnp.sqrt(_dot(qn4, qn4) + 1e-18)
            qn4 = _scale(qn4, 1.0 / norm)
            box_new = (bp_n[0], bp_n[1], bp_n[2], qn4[0], qn4[1], qn4[2], qn4[3],
                       lv[0], lv[1], lv[2], av[0], av[1], av[2])
        else:
            box_new = box
        if p.has_box2:
            lv2 = (
                b2lin[0] + h * _m(box2_f[0], inv_box2_mass),
                b2lin[1] + h * _m(box2_f[1], inv_box2_mass),
                b2lin[2] + h * (_m(box2_f[2], inv_box2_mass) + gz),
            )
            av2 = _add(b2ang, _scale(box2_t, h * inv_box2_in))
            ln2 = jnp.sqrt(_dot(lv2, lv2) + 1e-18)
            lv2 = _scale(lv2, jnp.minimum(1.0, 10.0 / (ln2 + 1e-9)))
            an2 = jnp.sqrt(_dot(av2, av2) + 1e-18)
            av2 = _scale(av2, jnp.minimum(1.0, 64.0 / (an2 + 1e-9)))
            bp2_n = _add(b2pos, _scale(lv2, h))
            oq2 = (av2[0], av2[1], av2[2], zero)
            dq2 = _qmul(oq2, b2quat)
            qn4b = tuple(
                bq_ + 0.5 * h * dq_ for bq_, dq_ in zip(b2quat, dq2)
            )
            norm2 = jnp.sqrt(_dot(qn4b, qn4b) + 1e-18)
            qn4b = _scale(qn4b, 1.0 / norm2)
            box_new = box_new + (
                bp2_n[0], bp2_n[1], bp2_n[2],
                qn4b[0], qn4b[1], qn4b[2], qn4b[3],
                lv2[0], lv2[1], lv2[2], av2[0], av2[1], av2[2],
            )
            boxf_out = box_f + box2_f
        else:
            boxf_out = box_f
        cf_flat = []
        for i in range(nb):
            cf_flat.extend(cf[i])
        # materialize folded trace-time constants (bodies with no contact
        # spheres keep cf == 0.0) as lane arrays: the fori_loop carry and
        # the output refs need a consistent array pytree
        cf_flat = [_lane(x, zero) for x in cf_flat]
        box_new = tuple(_lane(x, zero) for x in box_new)
        boxf_out = tuple(_lane(x, zero) for x in boxf_out)
        return tuple(q_new), tuple(qd_new), box_new, tuple(cf_flat), boxf_out

    def min_site_z(q, spawn, zero, site_ids):
        """Lowest world z over the given sites at pose q with zero
        velocity — positions-only lane FK (the velocity math folds away
        through the constant-zero qd). Shared by spawn-validity
        projection on BOTH paths (factory XLA closure and the fused
        kernel's reset-row projection) so the two stay op-for-op
        identical."""
        pos, quat, _, _, _, _ = fk_lane(q, (0.0,) * nb, spawn, zero)
        mz = None
        for sid in site_ids:
            b = site_b[int(sid)]
            sp_l = tuple(float(sitep_c[int(sid)][k]) for k in range(3))
            tz = _p(pos[b][2], _qrot(quat[b], sp_l)[2])
            mz = tz if mz is None else jnp.minimum(mz, tz)
        return mz

    return SimpleNamespace(
        substep=substep,
        fk_lane=fk_lane,
        min_site_z=min_site_z,
        nb=nb,
        nsite=nsite,
        site_b=site_b,
        sitep_c=sitep_c,
        siteq_c=siteq_c,
        kin_rows=kin_rows,
        total_substeps=total_substeps,
        n_box_lanes=n_box_lanes,
        n_boxf_lanes=n_boxf_lanes,
    )


class _RowShim:
    """Write-shim standing in for a pallas output ref: collects `ref[i, :] =
    row` assignments so the kernel body can run as PLAIN XLA ops (the body
    is pure jnp over lane rows). Lets default CI trace the exact kernel —
    physics lanes, FK fold, row packing — without the Mosaic compiler or
    the (minutes-slow) interpreter; only Mosaic codegen itself remains
    TPU-gated (covered by the checked-in golden trajectory)."""

    def __init__(self, nrows: int):
        self.rows = [None] * nrows

    def __setitem__(self, idx, val):
        i, sl = idx
        assert sl == slice(None)
        self.rows[i] = val

    def stack(self):
        assert all(r is not None for r in self.rows)
        return jnp.stack(self.rows, axis=0)


def build_control_step(engine, n_physics_steps: int, block: int = ENV_BLOCK,
                       interpret: bool = False, backend: str = "pallas"):
    """Returns fn(q, qd, targets, spawn, box13, dr4) -> (q', qd', box13',
    cf (N, B_bodies, 3), boxf (N, 3), kin: KinematicsOut) running
    n_physics_steps * substeps substeps in one kernel call, then one final
    FK pass for the observation path. All I/O arrays are env-major (N, ...).

    backend="xla" traces the identical kernel body as plain XLA ops via
    write-shims (no pallas_call) — the default-CI parity path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sim = build_lane_sim(engine, n_physics_steps)
    substep, fk_lane = sim.substep, sim.fk_lane
    nb, nsite, site_b = sim.nb, sim.nsite, sim.site_b
    sitep_c, siteq_c = sim.sitep_c, sim.siteq_c
    kin_rows, total_substeps = sim.kin_rows, sim.total_substeps
    nbox, nbf = sim.n_box_lanes, sim.n_boxf_lanes

    def kernel(q_ref, qd_ref, tgt_ref, spawn_ref, box_ref, dr_ref,
               qo_ref, qdo_ref, boxo_ref, cfo_ref, boxfo_ref, kino_ref):
        tgt = tuple(tgt_ref[i, :] for i in range(nb))
        q0 = tuple(q_ref[i, :] for i in range(nb))
        qd0 = tuple(qd_ref[i, :] for i in range(nb))
        box0 = tuple(box_ref[i, :] for i in range(nbox))
        spawn = tuple(spawn_ref[i, :] for i in range(3))
        drv = tuple(dr_ref[i, :] for i in range(4))
        zero = jnp.zeros_like(q0[0])
        cf0 = tuple(zero for _ in range(nb * 3))
        bf0 = tuple(zero for _ in range(nbf))

        def body(_, carry):
            q, qd, box, _cf, _bf = carry
            return substep(q, qd, box, tgt, spawn, drv)

        if backend == "xla":
            # Python loop instead of fori_loop: even an eager fori_loop
            # compiles its body as one XLA program (minutes for the lane
            # body on CPU); the unrolled eager path reuses tiny cached
            # per-op kernels instead
            carry = (q0, qd0, box0, cf0, bf0)
            for _ in range(total_substeps):
                carry = body(0, carry)
            q, qd, box, cf, bf = carry
        else:
            q, qd, box, cf, bf = jax.lax.fori_loop(
                0, total_substeps, body, (q0, qd0, box0, cf0, bf0)
            )
        for i in range(nb):
            qo_ref[i, :] = q[i]
            qdo_ref[i, :] = qd[i]
        for i in range(nbox):
            boxo_ref[i, :] = box[i]
        for i in range(nb * 3):
            cfo_ref[i, :] = cf[i]
        for i in range(nbf):
            boxfo_ref[i, :] = bf[i]
        # final-state FK folded into the kernel: one extra FK pass (~a
        # fraction of one substep) replaces the separate vmapped XLA FK the
        # env used to run for observations after every control step
        pos, quat, lin, ang, axw, orig = fk_lane(q, qd, spawn, zero)
        rows: List = []
        for group in (pos, quat, lin, ang, axw, orig):
            for i in range(nb):
                rows.extend(group[i])
        for s in range(nsite):
            b = site_b[s]
            sp_l = tuple(float(sitep_c[s][k]) for k in range(3))
            rows.extend(_add(pos[b], _qrot(quat[b], sp_l)))
        for s in range(nsite):
            b = site_b[s]
            sq_l = tuple(float(siteq_c[s][k]) for k in range(4))
            rows.extend(_qmul(quat[b], sq_l))
        for i, v in enumerate(rows):
            # folded constants (base-chain axes/velocities) materialize here
            kino_ref[i, :] = _lane(v, zero)

    def control_step(q, qd, targets, spawn, box13, dr4):
        """All env-major: q/qd/targets (N, 26), spawn (N, 3), box13 (N, 13),
        dr4 (N, 4). Returns (q', qd', box13', cf (N, nb, 3), boxf (N, 3),
        kin: KinematicsOut of the final state)."""
        from dexrobot_isaac_tpu.physics.types import KinematicsOut

        N = q.shape[0]
        pad = (-N) % block
        def prep(x):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
                )
            return jnp.transpose(x, (1, 0))
        qt, qdt, tt = prep(q), prep(qd), prep(targets)
        st, bt, drt = prep(spawn), prep(box13), prep(dr4)
        npad = N + pad
        if backend == "xla":
            shims = [_RowShim(d) for d in (nb, nb, nbox, nb * 3, nbf, kin_rows)]
            kernel(qt, qdt, tt, st, bt, drt, *shims)
            out = [s.stack() for s in shims]
        else:
            grid = npad // block
            spec = lambda d: pl.BlockSpec((d, block), lambda i: (0, i),
                                          memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kernel,
                grid=(grid,),
                interpret=interpret,
                in_specs=[spec(nb), spec(nb), spec(nb), spec(3),
                          spec(nbox), spec(4)],
                out_specs=[spec(nb), spec(nb), spec(nbox), spec(nb * 3),
                           spec(nbf), spec(kin_rows)],
                out_shape=[
                    jax.ShapeDtypeStruct((nb, npad), q.dtype),
                    jax.ShapeDtypeStruct((nb, npad), q.dtype),
                    jax.ShapeDtypeStruct((nbox, npad), q.dtype),
                    jax.ShapeDtypeStruct((nb * 3, npad), q.dtype),
                    jax.ShapeDtypeStruct((nbf, npad), q.dtype),
                    jax.ShapeDtypeStruct((kin_rows, npad), q.dtype),
                ],
            )(qt, qdt, tt, st, bt, drt)
        unprep = lambda x: jnp.transpose(x, (1, 0))[:N]
        qo, qdo, boxo, cfo, bfo, kt = (unprep(o) for o in out)
        # unpack the kinematics rows (layout documented at kin_rows above)
        dims = [3, 4, 3, 3, 3, 3]
        ofs = np.concatenate([[0], np.cumsum([nb * d for d in dims])])
        body = [
            kt[:, int(o0):int(o1)].reshape(N, nb, d)
            for o0, o1, d in zip(ofs[:-1], ofs[1:], dims)
        ]
        s0 = int(ofs[-1])
        kin = KinematicsOut(
            body_pos=body[0], body_quat=body[1], body_linvel=body[2],
            body_angvel=body[3], dof_axis_w=body[4], dof_origin_w=body[5],
            site_pos=kt[:, s0:s0 + nsite * 3].reshape(N, nsite, 3),
            site_quat=kt[:, s0 + nsite * 3:].reshape(N, nsite, 4),
        )
        return qo, qdo, boxo, cfo.reshape(N, nb, 3), bfo, kin

    if backend == "xla":
        # NOT jitted: compiling the ~18k-op lane body as ONE XLA program
        # takes many minutes on CPU; eager execution reuses tiny cached
        # per-op kernels and finishes in seconds at test sizes. (The body
        # still runs under jit when embedded in a jitted caller.)
        return control_step
    return jax.jit(control_step)
