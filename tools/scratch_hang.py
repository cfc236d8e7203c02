"""Scratch: clean pinch-hang probe.

Initializes the box already pinched between the thumb-tip sphere and the
index+middle tip spheres (aligned with the pinch axis, ~1.5 mm penetration
per side), hanging in mid-air, then lifts. Isolates static-friction hold
capability from grasp-acquisition kinematics.

Run: JAX_PLATFORMS=cpu PYTHONPATH=$PYTHONPATH:/root/repo python tools/scratch_hang.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import dexrobot_isaac_tpu.ops.quat as qm
from dexrobot_isaac_tpu.constants import DOF_INDEX, NUM_DOFS
from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model
from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.types import (
    PhysicsState,
    SimParams,
    make_initial_physics_state,
)

BOX_SIZE = 0.05
PEN = 0.0015  # target penetration per side

model = build_hand_model()
phys = HandPhysics(
    params=SimParams(dt=0.01, substeps=4, has_box=True, box_size=BOX_SIZE,
                     box_mass=0.1)
)
step = jax.jit(phys.step)
SPAWN = jnp.array([[0.0, 0.0, 0.25]], dtype=jnp.float32)

grip = np.zeros(NUM_DOFS, dtype=np.float32)
grip[DOF_INDEX["r_f_joint1_1"]] = np.pi / 3
for f in [2, 3]:
    for j in [2, 3, 4]:
        grip[DOF_INDEX[f"r_f_joint{f}_{j}"]] = 1.2
grip[DOF_INDEX["r_f_joint1_2"]] = 0.6
grip[DOF_INDEX["r_f_joint1_3"]] = 0.6
grip[DOF_INDEX["r_f_joint1_4"]] = 0.6

st0 = PhysicsState(
    q=jnp.asarray(grip)[None], qd=jnp.zeros((1, NUM_DOFS)),
    box_pos=jnp.zeros((1, 3)), box_quat=jnp.array([[0.0, 0, 0, 1]]),
    box_linvel=jnp.zeros((1, 3)), box_angvel=jnp.zeros((1, 3)),
)
kin = phys.kinematics(st0, SPAWN)
sb = phys._sphere_body
sp = np.asarray(
    kin.body_pos[0, sb] + qm.quat_rotate(kin.body_quat[0, sb],
                                         jnp.asarray(phys._sphere_pos))
)
r = np.asarray(phys._sphere_radius)
thumb = sp[4]
fingers = 0.5 * (sp[10] + sp[16])
d = fingers - thumb
gap = np.linalg.norm(d)
d_hat = d / gap
need = BOX_SIZE + r[4] + 0.5 * (r[10] + r[16]) - 2 * PEN
print(f"thumb={np.round(thumb,3)} fingers={np.round(fingers,3)} "
      f"gap={gap*1000:.1f}mm need={need*1000:.1f}mm")
if abs(gap - need) > 0.004:
    print("!! tune curl: gap mismatch", (gap - need) * 1000, "mm")

center = 0.5 * (thumb + fingers)
# quaternion rotating +x onto the (3D) pinch axis so a box face meets each tip
ex = np.array([1.0, 0.0, 0.0])
axis = np.cross(ex, d_hat)
s = np.linalg.norm(axis)
c = float(np.dot(ex, d_hat))
if s < 1e-8:
    bq = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)
else:
    axis = axis / s
    th = np.arctan2(s, c)
    bq = np.concatenate([axis * np.sin(th / 2), [np.cos(th / 2)]]).astype(
        np.float32)

state = PhysicsState(
    q=st0.q, qd=st0.qd,
    box_pos=jnp.asarray(center, dtype=jnp.float32)[None],
    box_quat=jnp.asarray(bq)[None],
    box_linvel=jnp.zeros((1, 3)), box_angvel=jnp.zeros((1, 3)),
)

targets = jnp.asarray(grip)[None]
z0 = float(state.box_pos[0, 2])
print(f"box starts at z={z0:.3f} (hanging, ground at 0)")

LIFT = 0.15
for phase, steps_n, ramp in [("settle", 100, 0.0), ("lift", 150, LIFT),
                             ("hold", 100, -1.0)]:
    for i in range(steps_n):
        if ramp > 0:
            frac = min(1.0, (i + 1) / steps_n)
            t2 = targets.at[0, DOF_INDEX["ARTz"]].set(ramp * frac)
        elif ramp < 0:
            t2 = targets.at[0, DOF_INDEX["ARTz"]].set(LIFT)
        else:
            t2 = targets
        state, info = step(state, t2, SPAWN)
        if i % 25 == 0:
            print(f"  {phase} i={i} box_z={float(state.box_pos[0,2]):.4f} "
                  f"ARTz={float(state.q[0, DOF_INDEX['ARTz']]):.3f} "
                  f"fz={float(info.box_contact_force[0,2]):+.2f}")
bz = float(state.box_pos[0, 2])
drop = z0 + LIFT - bz
print(f"final box_z={bz:.4f} expected~{z0+LIFT:.4f} shortfall={drop*1000:.1f}mm")
print("HANG+LIFT SUCCESS" if drop < 0.02 else "HANG/LIFT FAILED")
