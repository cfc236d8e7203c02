"""MJCF (MuJoCo XML) loader: parse a hand model file into a HandModel.

The reference loads `dexhand021_right_simplified_floating.xml` from the
`dexrobot_mujoco` submodule through Isaac Gym's asset pipeline
(components/initialization/hand_initializer.py:209-257). That submodule is
empty in the reference checkout, so `models/dexhand021.py` reconstructs the
model from documentation; this module provides the loader so the real MJCF
can replace the reconstruction when available.

Supported subset (what the DexHand MJCF uses, per
docs/reference-physics-implementation.md):
- nested <body> tree with pos/quat/euler
- <joint> type hinge/slide, axis, range, damping, armature, limited
- <geom> sphere + capsule + box (capsules/boxes are approximated by
  collision spheres along their axis, matching the engine's sphere-based
  narrow phase)
- <site> frames (fingertips/pads)
- <inertial> mass/pos/diaginertia; bodies without inertial get geom-derived
  point masses
- <default> joint/geom attribute inheritance (single level)
- <position> actuators: kp -> joint stiffness
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from dexrobot_isaac_tpu.models.dexhand021 import (
    HandModel,
    PRISMATIC,
    REVOLUTE,
    _quat_from_mat,
)


def _parse_vec(text: Optional[str], default=None) -> Optional[np.ndarray]:
    if text is None:
        return None if default is None else np.asarray(default, dtype=np.float64)
    return np.asarray([float(x) for x in text.split()], dtype=np.float64)


def _euler_to_quat(euler: np.ndarray) -> np.ndarray:
    """MJCF default eulerseq xyz (extrinsic) -> xyzw quaternion."""
    cx, sx = np.cos(euler[0] / 2), np.sin(euler[0] / 2)
    cy, sy = np.cos(euler[1] / 2), np.sin(euler[1] / 2)
    cz, sz = np.cos(euler[2] / 2), np.sin(euler[2] / 2)
    # R = Rz * Ry * Rx for extrinsic xyz
    return np.array([
        sx * cy * cz - cx * sy * sz,
        cx * sy * cz + sx * cy * sz,
        cx * cy * sz - sx * sy * cz,
        cx * cy * cz + sx * sy * sz,
    ])


def _body_quat(elem: ET.Element) -> np.ndarray:
    q = _parse_vec(elem.get("quat"))
    if q is not None:
        # MJCF quats are wxyz; convert to xyzw
        return np.array([q[1], q[2], q[3], q[0]])
    e = _parse_vec(elem.get("euler"))
    if e is not None:
        return _euler_to_quat(e)
    return np.array([0.0, 0.0, 0.0, 1.0])


class _Defaults:
    def __init__(self, root: ET.Element):
        self.joint: Dict[str, str] = {}
        self.geom: Dict[str, str] = {}
        d = root.find("default")
        if d is not None:
            j = d.find("joint")
            if j is not None:
                self.joint = dict(j.attrib)
            g = d.find("geom")
            if g is not None:
                self.geom = dict(g.attrib)

    def joint_get(self, elem: ET.Element, key: str, default: str) -> str:
        return elem.get(key, self.joint.get(key, default))

    def geom_get(self, elem: ET.Element, key: str, default: str) -> str:
        return elem.get(key, self.geom.get(key, default))


def load_mjcf(path: str) -> HandModel:
    """Parse an MJCF file into a HandModel (one 1-DOF joint per body)."""
    tree = ET.parse(path)
    root = tree.getroot()
    defaults = _Defaults(root)

    # actuator kp per joint name
    kp_map: Dict[str, float] = {}
    act = root.find("actuator")
    if act is not None:
        for pos in act.findall("position"):
            kp_map[pos.get("joint", "")] = float(pos.get("kp", "0"))

    body_names: List[str] = []
    parent: List[int] = []
    joint_type: List[int] = []
    axis: List[np.ndarray] = []
    attach_pos: List[np.ndarray] = []
    attach_quat: List[np.ndarray] = []
    post_quat: List[np.ndarray] = []
    mass: List[float] = []
    com: List[np.ndarray] = []
    inertia: List[np.ndarray] = []
    lower: List[float] = []
    upper: List[float] = []
    stiffness: List[float] = []
    damping: List[float] = []
    armature: List[float] = []
    sites: List[Tuple[str, int, np.ndarray, np.ndarray]] = []
    spheres: List[Tuple[int, np.ndarray, float]] = []

    def walk(elem: ET.Element, parent_idx: int, pending_pos, pending_quat):
        """Recurse the body tree. Bodies with multiple joints expand into a
        chain of single-joint bodies (the engine's reduced-coordinate form)."""
        for body in elem.findall("body"):
            b_pos = _parse_vec(body.get("pos"), [0, 0, 0])
            b_quat = _body_quat(body)
            joints = body.findall("joint")
            name = body.get("name", f"body{len(body_names)}")

            cur_parent = parent_idx
            cur_pos = pending_pos + b_pos if cur_parent == parent_idx else b_pos
            cur_quat = _quat_mul_np(pending_quat, b_quat)

            if not joints:
                # fixed body: fold its frame into children via pending offset
                walk(body, cur_parent, cur_pos, cur_quat)
                continue

            for j_i, joint in enumerate(joints):
                idx = len(body_names)
                is_last = j_i == len(joints) - 1
                body_names.append(name if is_last else f"{name}_j{j_i}")
                parent.append(cur_parent)
                jt = defaults.joint_get(joint, "type", "hinge")
                joint_type.append(PRISMATIC if jt == "slide" else REVOLUTE)
                ax = _parse_vec(joint.get("axis"), [0, 0, 1])
                axis.append(ax / np.linalg.norm(ax))
                attach_pos.append(cur_pos if j_i == 0 else np.zeros(3))
                attach_quat.append(
                    cur_quat if j_i == 0 else np.array([0, 0, 0, 1.0])
                )
                post_quat.append(np.array([0, 0, 0, 1.0]))
                rng = _parse_vec(joint.get("range"), [0, 0])
                limited = defaults.joint_get(joint, "limited", "false") == "true"
                lower.append(float(rng[0]) if limited else -np.pi)
                upper.append(float(rng[1]) if limited else np.pi)
                jname = joint.get("name", "")
                stiffness.append(kp_map.get(jname, 0.0))
                damping.append(float(defaults.joint_get(joint, "damping", "0")))
                armature.append(float(defaults.joint_get(joint, "armature", "0.001")))
                mass.append(0.0)
                com.append(np.zeros(3))
                inertia.append(np.zeros((3, 3)))
                cur_parent = idx
                cur_pos = np.zeros(3)
                cur_quat = np.array([0, 0, 0, 1.0])

            bi = cur_parent  # the body carrying geometry = last joint body
            inert = body.find("inertial")
            geom_mass = 0.0
            for geom in body.findall("geom"):
                gtype = defaults.geom_get(geom, "type", "sphere")
                gpos = _parse_vec(geom.get("pos"), [0, 0, 0])
                size = _parse_vec(geom.get("size"), [0.005])
                if gtype == "sphere":
                    spheres.append((bi, gpos, float(size[0])))
                elif gtype == "capsule":
                    fromto = _parse_vec(geom.get("fromto"))
                    r = float(size[0])
                    if fromto is not None:
                        a, b = fromto[:3], fromto[3:]
                    else:
                        half = size[1] if len(size) > 1 else r
                        a = gpos - np.array([0, 0, half])
                        b = gpos + np.array([0, 0, half])
                    for t in (0.0, 0.5, 1.0):
                        spheres.append((bi, a + t * (b - a), r))
                elif gtype == "box":
                    r = float(min(size))
                    spheres.append((bi, gpos, r))
                gm = geom.get("mass")
                if gm is not None:
                    geom_mass += float(gm)
            if inert is not None:
                mass[bi] = float(inert.get("mass", "0"))
                com[bi] = _parse_vec(inert.get("pos"), [0, 0, 0])
                full = _parse_vec(inert.get("fullinertia"))
                if full is not None:
                    # MJCF order: ixx iyy izz ixy ixz iyz
                    ixx, iyy, izz, ixy, ixz, iyz = full
                    inertia[bi] = np.array([
                        [ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]
                    ])
                else:
                    diag = _parse_vec(inert.get("diaginertia"), [1e-6] * 3)
                    ine = np.diag(diag)
                    # principal-axes orientation: rotate into the body frame
                    iq = inert.get("quat")
                    if iq is not None:
                        R = _quat_to_mat_np(_body_quat(inert))
                        ine = R @ ine @ R.T
                    inertia[bi] = ine
            elif geom_mass > 0:
                mass[bi] = geom_mass
                inertia[bi] = np.eye(3) * max(geom_mass * 1e-4, 1e-7)

            for site in body.findall("site"):
                sites.append((
                    site.get("name", f"site{len(sites)}"),
                    bi,
                    _parse_vec(site.get("pos"), [0, 0, 0]),
                    _body_quat(site),
                ))

            walk(body, cur_parent, np.zeros(3), np.array([0, 0, 0, 1.0]))

    worldbody = root.find("worldbody")
    if worldbody is None:
        raise ValueError(f"MJCF has no <worldbody>: {path}")
    walk(worldbody, -1, np.zeros(3), np.array([0, 0, 0, 1.0]))

    if not body_names:
        raise ValueError(f"MJCF has no articulated bodies: {path}")

    return HandModel(
        body_names=body_names,
        parent=np.asarray(parent, dtype=np.int32),
        joint_type=np.asarray(joint_type, dtype=np.int32),
        axis=np.stack(axis),
        attach_pos=np.stack(attach_pos),
        attach_quat=np.stack(attach_quat),
        post_quat=np.stack(post_quat),
        mass=np.asarray(mass),
        com=np.stack(com),
        inertia=np.stack(inertia),
        lower_limit=np.asarray(lower),
        upper_limit=np.asarray(upper),
        stiffness=np.asarray(stiffness),
        damping=np.asarray(damping),
        armature=np.asarray(armature),
        site_names=[s[0] for s in sites],
        site_body=np.asarray([s[1] for s in sites], dtype=np.int32),
        site_pos=(np.stack([s[2] for s in sites]) if sites else np.zeros((0, 3))),
        site_quat=(np.stack([s[3] for s in sites]) if sites else np.zeros((0, 4))),
        sphere_body=np.asarray([s[0] for s in spheres], dtype=np.int32),
        sphere_pos=(np.stack([s[1] for s in spheres]) if spheres
                    else np.zeros((0, 3))),
        sphere_radius=np.asarray([s[2] for s in spheres]),
    )


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix from an xyzw quaternion (numpy, load time only)."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _quat_mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])
