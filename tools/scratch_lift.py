"""Scratch: scripted grasp-and-lift probe for the compliant contact model.

Places the box under the hand, closes a thumb-vs-fingers pinch, raises the
base, and prints box height vs hand height — the physical capability the
BlindGrasping success criterion needs (box z > 0.2 m while grasped).

Run CPU-only: JAX_PLATFORMS=cpu python tools/scratch_lift.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dexrobot_isaac_tpu.constants import DOF_INDEX, NUM_DOFS
from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model
from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.types import (
    PhysicsState,
    SimParams,
    make_initial_physics_state,
)

BOX_SIZE = 0.05
BOX_POS0 = np.array([0.045, 0.0, 0.027])

model = build_hand_model()
phys = HandPhysics(
    params=SimParams(dt=0.01, substeps=4, has_box=True, box_size=BOX_SIZE,
                     box_mass=0.1)
)
step = jax.jit(phys.step)

SPAWN = jnp.array([[0.0, 0.0, 0.10]], dtype=jnp.float32)

state = make_initial_physics_state(
    1, box_pos=jnp.asarray(BOX_POS0, dtype=jnp.float32)[None]
)

# probe FK at candidate pregrasp pose
q = np.zeros(NUM_DOFS, dtype=np.float32)
q[DOF_INDEX["r_f_joint1_1"]] = np.pi / 2  # thumb opposition


def show_sites(qv, label):
    st = PhysicsState(
        q=jnp.asarray(qv, dtype=jnp.float32)[None],
        qd=jnp.zeros((1, NUM_DOFS)),
        box_pos=state.box_pos, box_quat=state.box_quat,
        box_linvel=state.box_linvel, box_angvel=state.box_angvel,
    )
    kin = phys.kinematics(st, SPAWN)
    print(f"--- {label}")
    for name in ["r_f_link1_tip", "r_f_link2_tip", "r_f_link3_tip",
                 "r_f_link4_tip", "r_f_link5_tip"]:
        p = np.asarray(kin.site_pos[0, model.site_index(name)])
        print(f"  {name}: {np.round(p, 3)}")
    print(f"  box: {BOX_POS0}")


show_sites(q, "pregrasp q=0 + thumb opp")

curl = q.copy()
for f in [2, 3, 4, 5]:
    for j in [2, 3, 4]:
        curl[DOF_INDEX[f"r_f_joint{f}_{j}"]] = 1.0
curl[DOF_INDEX["r_f_joint1_2"]] = 0.6
curl[DOF_INDEX["r_f_joint1_3"]] = 0.6
curl[DOF_INDEX["r_f_joint1_4"]] = 0.6
show_sites(curl, "curled")

# ----------------------------------------------------------------------
# scripted grasp-and-lift
# ----------------------------------------------------------------------
pre = q.copy()          # open hand, thumb opposed
grip = curl.copy()
for f in [2, 3, 4, 5]:
    for j in [2, 3, 4]:
        grip[DOF_INDEX[f"r_f_joint{f}_{j}"]] = 1.3   # squeeze past contact
grip[DOF_INDEX["r_f_joint1_2"]] = 1.2
grip[DOF_INDEX["r_f_joint1_3"]] = 1.2
grip[DOF_INDEX["r_f_joint1_4"]] = 1.2

LIFT = 0.25

def contact_probe(state):
    """Count sphere-box contacts and report depth stats + box tilt."""
    kin = phys.kinematics(state, SPAWN)
    sb = phys._sphere_body
    sp = np.asarray(kin.body_pos[0, sb]) + np.asarray(
        jax.vmap(lambda qv, v: qv)(kin.body_quat[0, sb], kin.body_quat[0, sb])
    )[:, :3] * 0  # placeholder, rotate below
    import dexrobot_isaac_tpu.ops.quat as qm
    sp = np.asarray(
        kin.body_pos[0, sb]
        + qm.quat_rotate(kin.body_quat[0, sb], phys._sphere_pos)
    )
    bq = np.asarray(state.box_quat[0])
    bp = np.asarray(state.box_pos[0])
    half = BOX_SIZE / 2
    loc = np.asarray(qm.quat_rotate_inverse(
        jnp.asarray(np.tile(bq, (len(sb), 1))), jnp.asarray(sp - bp)))
    cl = np.clip(loc, -half, half)
    d = loc - cl
    dist = np.linalg.norm(d, axis=-1)
    gap_min = (half - np.abs(loc)).min(axis=-1)
    r = np.asarray(phys._sphere_radius)
    depth = np.where(dist > 1e-9, r - dist, r + gap_min)
    act = depth > 0
    tilt = 2 * np.degrees(np.arccos(np.clip(abs(bq[3]), -1, 1)))
    print(f"      contacts={int(act.sum())} depths={np.round(depth[act]*1000,2)}mm "
          f"tilt={tilt:.0f}deg")



def run_phase(state, targets_np, steps, label, lift_ramp=0.0):
    t = jnp.asarray(targets_np, dtype=jnp.float32)[None]
    for i in range(steps):
        if lift_ramp:
            frac = min(1.0, (i + 1) / steps)
            t2 = t.at[0, DOF_INDEX["ARTz"]].set(lift_ramp * frac)
        else:
            t2 = t
        state, info = step(state, t2, SPAWN)
        if i % 25 == 0:
            fz = float(info.box_contact_force[0, 2])
            print(f"    {label} i={i} box_z={float(state.box_pos[0,2]):.3f} "
                  f"ARTz_q={float(state.q[0, DOF_INDEX['ARTz']]):.3f} "
                  f"box_fz={fz:+.2f}")
            contact_probe(state)
    bz = float(state.box_pos[0, 2])
    hz = float(state.q[0, DOF_INDEX["ARTz"]])
    bxy = np.asarray(state.box_pos[0, :2])
    print(f"{label}: box_z={bz:.3f} box_xy={np.round(bxy,3)} ARTz={hz:.3f}")
    return state


state = run_phase(state, pre, 50, "settle (open)")
state = run_phase(state, grip, 80, "squeeze")
grip2 = grip
state = run_phase(state, grip2, 300, "lift", lift_ramp=LIFT)
hold_t = grip2.copy(); hold_t[DOF_INDEX["ARTz"]] = LIFT
state = run_phase(state, hold_t, 100, "hold")
bz = float(state.box_pos[0, 2])
print("LIFT SUCCESS" if bz > 0.2 else "LIFT FAILED", f"(box_z={bz:.3f})")
