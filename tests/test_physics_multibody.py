"""Multi-body (two free cubes) physics: box-box contact + integration.

Validates the second-free-body extension of the engine (SimParams.has_box2,
physics/engine.py _corners_vs_box): stacked cubes rest without
interpenetration, a dropped cube lands and settles on the platform cube, a
side impact transfers momentum, and single-box scenes are structurally
untouched (box2 leaves stay None).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.physics.engine import HandPhysics
from dexrobot_isaac_tpu.physics.types import PhysicsState, SimParams


S1 = 0.05   # upper / free cube
S2 = 0.08   # lower / platform cube


@pytest.fixture(scope="module")
def engine():
    return HandPhysics(
        params=SimParams(
            has_box=True, box_size=S1, box_mass=0.1,
            has_box2=True, box2_size=S2, box2_mass=0.5,
        )
    )


def _state(engine, box_pos, box2_pos, box_linvel=(0, 0, 0)):
    n = 1
    f32 = jnp.float32
    quat = jnp.zeros((n, 4), dtype=f32).at[:, 3].set(1.0)
    zeros3 = jnp.zeros((n, 3), dtype=f32)
    return PhysicsState(
        q=jnp.zeros((n, 26), dtype=f32),
        qd=jnp.zeros((n, 26), dtype=f32),
        box_pos=jnp.asarray([box_pos], dtype=f32),
        box_quat=quat,
        box_linvel=jnp.asarray([box_linvel], dtype=f32),
        box_angvel=zeros3,
        box2_pos=jnp.asarray([box2_pos], dtype=f32),
        box2_quat=quat,
        box2_linvel=zeros3,
        box2_angvel=zeros3,
    )


def _run(engine, state, n_steps):
    targets = jnp.zeros((1, 26), dtype=jnp.float32)
    # hand far above the scene so only box-box/ground contacts act
    spawn = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    step = jax.jit(lambda s: engine.step(s, targets, spawn)[0])
    for _ in range(n_steps):
        state = step(state)
    return state


def test_stacked_cubes_rest(engine):
    # cube 1 resting exactly on cube 2's top face
    state = _state(
        engine, box_pos=[0.3, 0.0, S2 + S1 / 2], box2_pos=[0.3, 0.0, S2 / 2]
    )
    out = _run(engine, state, 100)   # 100 steps x 4 substeps @ 5 ms = 0.5 s
    # upper cube stays on top (small penalty penetration allowed)
    assert float(out.box_pos[0, 2]) == pytest.approx(S2 + S1 / 2, abs=0.004)
    assert float(out.box2_pos[0, 2]) == pytest.approx(S2 / 2, abs=0.004)
    # no lateral drift, everything at rest
    np.testing.assert_allclose(out.box_pos[0, :2], [0.3, 0.0], atol=2e-3)
    assert float(jnp.linalg.norm(out.box_linvel)) < 0.05
    assert float(jnp.linalg.norm(out.box2_linvel)) < 0.05


def test_dropped_cube_lands_on_platform(engine):
    state = _state(
        engine, box_pos=[0.3, 0.0, 0.2], box2_pos=[0.3, 0.0, S2 / 2]
    )
    out = _run(engine, state, 300)   # 1.5 s: fall + settle
    # settled ON the platform, not inside it or on the ground
    z = float(out.box_pos[0, 2])
    assert z > S2 + S1 / 2 - 0.01, f"sank into platform: z={z}"
    assert z < S2 + S1 / 2 + 0.01, f"did not settle: z={z}"
    assert float(jnp.linalg.norm(out.box_linvel)) < 0.05


def test_side_impact_blocks_cube(engine):
    # cube slides fast into the resting platform cube from close range
    # (ground friction alone would carry it past the platform's face:
    # stop distance v^2/2(mu g) = 0.115 m > the 0.035 m gap)
    state = _state(
        engine,
        box_pos=[0.2, 0.0, S1 / 2],
        box2_pos=[0.3, 0.0, S2 / 2],
        box_linvel=[1.5, 0.0, 0.0],
    )
    out = _run(engine, state, 100)
    # the cube did NOT tunnel through or ride over the platform
    assert float(out.box_pos[0, 0]) < 0.3 - (S1 + S2) / 2 + 0.01
    assert float(out.box_pos[0, 2]) < S2
    # impact dissipated the slide: cube is (nearly) stopped
    assert abs(float(out.box_linvel[0, 0])) < 0.2
    # platform stayed upright and roughly in place (heavy + high friction)
    assert float(out.box2_pos[0, 2]) == pytest.approx(S2 / 2, abs=0.005)
    assert abs(float(out.box2_pos[0, 0]) - 0.3) < 0.05


def test_box2_contact_force_reported(engine):
    # interpenetrating start: forces must be nonzero and opposite in z
    state = _state(
        engine,
        box_pos=[0.3, 0.0, S2 + S1 / 2 - 0.01],
        box2_pos=[0.3, 0.0, S2 / 2],
    )
    targets = jnp.zeros((1, 26), dtype=jnp.float32)
    spawn = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    _, info = engine.step(state, targets, spawn)
    assert info.box2_contact_force is not None
    assert info.box2_contact_force.shape == (1, 3)
    # upper cube pushed up, platform pushed down by the box-box contact
    # (platform also carries its ground reaction, so check the hand-free
    # upper cube's force sign)
    assert float(info.box_contact_force[0, 2]) > 0.0


def test_single_box_scene_untouched():
    eng = HandPhysics(params=SimParams(has_box=True, box_size=S1, box_mass=0.1))
    n = 1
    f32 = jnp.float32
    state = PhysicsState(
        q=jnp.zeros((n, 26), dtype=f32),
        qd=jnp.zeros((n, 26), dtype=f32),
        box_pos=jnp.asarray([[0.3, 0.0, S1 / 2]], dtype=f32),
        box_quat=jnp.zeros((n, 4), dtype=f32).at[:, 3].set(1.0),
        box_linvel=jnp.zeros((n, 3), dtype=f32),
        box_angvel=jnp.zeros((n, 3), dtype=f32),
    )
    targets = jnp.zeros((n, 26), dtype=f32)
    spawn = jnp.asarray([[0.0, 0.0, 1.0]], dtype=f32)
    out, info = eng.step(state, targets, spawn)
    assert out.box2_pos is None
    assert info.box2_contact_force is None
    assert float(out.box_pos[0, 2]) == pytest.approx(S1 / 2, abs=1e-3)


def test_has_box2_requires_has_box():
    with pytest.raises(ValueError):
        HandPhysics(params=SimParams(has_box=False, has_box2=True))
