#!/usr/bin/env python
"""Generate the upstream-format MJCF test fixture from the vendored model.

The vendored `assets/dexhand021_right_simplified_floating.xml` is written in
flat generated form (every attribute inline, radians, no assets). Upstream
`dexrobot_mujoco` hand files — the ones the reference feeds through Isaac
Gym's asset pipeline (hand_initializer.py:209-257) — use the full MJCF
feature set instead: <compiler angle="degree" autolimits meshdir>, an
<asset> block of link meshes, nested <default class=...> hierarchies with
per-class joint/geom attributes, body `childclass`, and visual geoms
(class "visual": contype=0 conaffinity=0, mesh or primitive) separate from
collision geoms. This script rewrites the vendored model into exactly that
shape with IDENTICAL physics semantics, so tests/test_mjcf_model.py can
assert the loader digests an upstream-shaped file equivalently
(tests/fixtures/dexhand021_upstream_format.xml).

Run: python tools/gen_upstream_fixture.py
"""

import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(
    REPO, "dexrobot_isaac_tpu", "assets",
    "dexhand021_right_simplified_floating.xml",
)
DST = os.path.join(
    REPO, "tests", "fixtures", "dexhand021_upstream_format.xml"
)


def main() -> int:
    tree = ET.parse(SRC)
    root = tree.getroot()

    # compiler: degree mode + autolimits + meshdir (upstream convention)
    comp = root.find("compiler")
    comp.set("angle", "degree")
    comp.set("autolimits", "true")
    comp.set("meshdir", "meshes")

    # asset block with mesh declarations referenced by the visual geoms
    asset = ET.Element("asset")
    for mesh in ("palm", "finger_link"):
        ET.SubElement(asset, "mesh", name=mesh, file=f"{mesh}.stl")
    root.insert(1, asset)

    # default-class hierarchy carrying the joint/geom attributes the flat
    # file repeats inline
    default = ET.Element("default")
    d_base = ET.SubElement(default, "default", {"class": "base_joint"})
    ET.SubElement(
        d_base, "joint",
        damping="20", armature="0.050000000000000003", limited="true",
    )
    d_fing = ET.SubElement(default, "default", {"class": "finger_joint"})
    ET.SubElement(d_fing, "joint", damping="1", armature="0.002")
    d_vis = ET.SubElement(default, "default", {"class": "visual"})
    ET.SubElement(
        d_vis, "geom", contype="0", conaffinity="0", group="2"
    )
    d_col = ET.SubElement(default, "default", {"class": "collision"})
    ET.SubElement(d_col, "geom", group="3", type="sphere")
    root.insert(1, default)

    for body in root.iter("body"):
        name = body.get("name", "")
        # base bodies keep explicit classes; finger roots set childclass so
        # descendants inherit (exercises childclass propagation)
        if name.endswith("_1") and name.startswith("r_f_link"):
            body.set("childclass", "finger_joint")
        for joint in body.findall("joint"):
            jn = joint.get("name", "")
            if jn.startswith("AR"):
                joint.set("class", "base_joint")
            for k in ("damping", "armature", "limited"):
                if k in joint.attrib:
                    del joint.attrib[k]
            if jn.startswith("r_f_joint1_1") or not jn.startswith("AR"):
                # finger joints rely on childclass + autolimits
                pass
            if joint.get("type", "hinge") != "slide":
                rng = [float(x) for x in joint.get("range").split()]
                joint.set(
                    "range",
                    " ".join(repr(float(np.rad2deg(v))) for v in rng),
                )
        for geom in body.findall("geom"):
            geom.set("class", "collision")
            if "type" in geom.attrib and geom.get("type") == "sphere":
                del geom.attrib["type"]  # from the collision class default

    # the palm: quat -> euler degrees (exercises degree conversion) and a
    # visual mesh + a visual primitive alongside the collision spheres
    for body in root.iter("body"):
        if body.get("name") == "right_hand_base":
            del body.attrib["quat"]
            body.set("euler", "0 90 0")
            ET.SubElement(
                body, "geom", {"class": "visual", "type": "mesh",
                               "mesh": "palm"},
            )
            ET.SubElement(
                body, "geom", {"class": "visual", "type": "box",
                               "pos": "0.012 0.005 0.045",
                               "size": "0.015 0.045 0.045"},
            )
        if body.get("name", "").startswith("r_f_link"):
            f, j = body.get("name")[8:].split("_")
            ET.SubElement(
                body, "geom", {"class": "visual", "type": "mesh",
                               "mesh": "finger_link"},
            )

    os.makedirs(os.path.dirname(DST), exist_ok=True)
    ET.indent(tree)
    tree.write(DST, xml_declaration=True)
    print(f"wrote {DST}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
