"""The vendored DexHand021 MJCF loaded through the real loader must be
equivalent to the doc-reconstructed canonical model, and the engine must run
on the LOADED model.

The upstream dexrobot_mujoco submodule is empty in the reference checkout
and this environment has no network (SURVEY §2.10), so the vendored XML is
generated from the documented spec (tools/gen_dexhand_mjcf.py) in native
MJCF parameterization (body quat = attach*post, joint axis in the post
frame) — loading it exercises the full mjcf.py path on the real 26-DOF
topology: nested chains, ranges, damping/armature, oriented inertials,
geoms->collision spheres, sites, position actuators.

Reference parity target: hand_initializer.py:209-257 loads the same file
through Isaac Gym's asset pipeline.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model
from dexrobot_isaac_tpu.models.mjcf import load_mjcf

XML = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dexrobot_isaac_tpu", "assets",
    "dexhand021_right_simplified_floating.xml",
)


@pytest.fixture(scope="module")
def models():
    return build_hand_model(), load_mjcf(XML)


def _sorted_spheres(m):
    order = np.lexsort((
        m.sphere_pos[:, 2], m.sphere_pos[:, 1], m.sphere_pos[:, 0],
        m.sphere_body,
    ))
    return m.sphere_body[order], m.sphere_pos[order], m.sphere_radius[order]


class TestLoadedModelEquivalence:
    def test_topology_and_joint_order(self, models):
        ref, got = models
        assert got.body_names == ref.body_names
        assert got.site_names == ref.site_names
        np.testing.assert_array_equal(got.parent, ref.parent)
        np.testing.assert_array_equal(got.joint_type, ref.joint_type)

    def test_limits_gains_inertials(self, models):
        ref, got = models
        for f in ("lower_limit", "upper_limit", "stiffness", "damping",
                  "armature", "mass"):
            np.testing.assert_allclose(
                getattr(got, f), getattr(ref, f), atol=1e-12, err_msg=f
            )
        np.testing.assert_allclose(got.com, ref.com, atol=1e-12)
        # oriented inertia tensors round-trip through the MJCF
        # principal-axes (quat + diaginertia) form
        np.testing.assert_allclose(got.inertia, ref.inertia, atol=1e-12)

    def test_collision_spheres_derived_from_geoms(self, models):
        ref, got = models
        rb, rp, rr = _sorted_spheres(ref)
        gb, gp, gr = _sorted_spheres(got)
        np.testing.assert_array_equal(gb, rb)
        np.testing.assert_allclose(gp, rp, atol=1e-12)
        np.testing.assert_allclose(gr, rr, atol=1e-12)

    def test_fk_equivalence(self, models):
        """Different kinematic parameterization (post_quat folded into body
        quats), identical world frames."""
        from dexrobot_isaac_tpu.physics.engine import HandPhysics

        ref, got = models
        e_ref, e_got = HandPhysics(model=ref), HandPhysics(model=got)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.uniform(-0.3, 0.8, (4, 26)).astype(np.float32))
        qd = jnp.asarray(0.1 * rng.normal(size=(4, 26)).astype(np.float32))
        sp = jnp.tile(jnp.array([[0.0, 0.0, 0.3]], jnp.float32), (4, 1))
        k1 = jax.vmap(e_ref.fk)(q, qd, sp)
        k2 = jax.vmap(e_got.fk)(q, qd, sp)
        np.testing.assert_allclose(
            np.asarray(k2.body_pos), np.asarray(k1.body_pos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(k2.body_linvel), np.asarray(k1.body_linvel), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(k2.site_pos), np.asarray(k1.site_pos), atol=1e-5
        )
        dots = np.abs(np.einsum(
            "bij,bij->bi",
            np.asarray(k1.body_quat), np.asarray(k2.body_quat),
        ))
        assert (dots > 1 - 1e-6).all(), "body orientations diverged"

    def test_engine_steps_on_loaded_model(self, models):
        """Physics battery on the LOADED model: PD tracking + trajectory
        parity against the reconstruction engine."""
        from dexrobot_isaac_tpu.physics.engine import HandPhysics
        from dexrobot_isaac_tpu.physics.types import (
            SimParams,
            make_initial_physics_state,
        )

        ref, got = models
        params = SimParams(dt=0.01, substeps=2, has_box=True)
        e_ref = HandPhysics(model=ref, params=params)
        e_got = HandPhysics(model=got, params=params)
        n = 4
        state_r = make_initial_physics_state(
            n, box_pos=jnp.tile(jnp.array([[0.12, 0.0, 0.025]]), (n, 1))
        )
        state_g = state_r
        spawn = jnp.tile(jnp.array([[0.0, 0.0, 0.2]], jnp.float32), (n, 1))
        targets = jnp.zeros((n, 26)).at[:, 7].set(0.5).at[:, 2].set(-0.05)
        step_r = jax.jit(e_ref.step)
        step_g = jax.jit(e_got.step)
        for _ in range(10):
            state_r, info_r = step_r(state_r, targets, spawn)
            state_g, info_g = step_g(state_g, targets, spawn)
        np.testing.assert_allclose(
            np.asarray(state_g.q), np.asarray(state_r.q), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(state_g.box_pos), np.asarray(state_r.box_pos),
            atol=1e-4,
        )
        # PD actually tracked the commanded joint
        assert float(state_g.q[0, 7]) > 0.2


class TestEnvOnLoadedModel:
    def test_env_handasset_config(self):
        """env.handAsset loads the scene through the MJCF loader end-to-end
        (reference asset-path plumbing, hand_initializer.py:209-257)."""
        from dexrobot_isaac_tpu.factory import make_env
        from dexrobot_isaac_tpu.utils.config import load_config

        cfg = load_config([
            "task=BaseTask", "numEnvs=2", "env.episodeLength=8",
            "sim.substeps=1", "sim.physics_steps_per_control=2",
            f"env.handAsset={XML}",
        ])
        env = make_env(cfg, seed=0)
        state, obs = env._reset_jit(jax.random.key(0))
        step = jax.jit(env.step_fn)
        state, obs, rew, done, _ = step(
            state, jnp.zeros((2, env.num_actions))
        )
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(np.asarray(rew)).all()


UPSTREAM_XML = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "dexhand021_upstream_format.xml",
)


class TestUpstreamFormatFixture:
    """The loader must digest an UPSTREAM-shaped file — degree-mode
    compiler with autolimits, <asset> meshes, nested <default class=...>
    hierarchies, body childclass, visual-vs-collision geom classes — the
    MJCF features the reference hands to Isaac Gym's asset pipeline
    (hand_initializer.py:209-257). The fixture is generated from the
    vendored flat model with identical physics semantics
    (tools/gen_upstream_fixture.py), so equivalence is exact up to the
    degree<->radian round-trip on joint ranges."""

    @pytest.fixture(scope="class")
    def upstream(self):
        return build_hand_model(), load_mjcf(UPSTREAM_XML)

    def test_topology(self, upstream):
        ref, got = upstream
        assert got.body_names == ref.body_names
        assert got.site_names == ref.site_names
        np.testing.assert_array_equal(got.parent, ref.parent)
        np.testing.assert_array_equal(got.joint_type, ref.joint_type)

    def test_class_resolved_attributes(self, upstream):
        """damping/armature/limits come from default classes + childclass
        + autolimits, not inline attributes."""
        ref, got = upstream
        np.testing.assert_allclose(got.damping, ref.damping, atol=1e-12)
        np.testing.assert_allclose(got.armature, ref.armature, atol=1e-12)
        # hinge ranges round-trip through degrees
        np.testing.assert_allclose(
            got.lower_limit, ref.lower_limit, atol=1e-9
        )
        np.testing.assert_allclose(
            got.upper_limit, ref.upper_limit, atol=1e-9
        )
        np.testing.assert_allclose(got.mass, ref.mass, atol=1e-12)

    def test_collision_excludes_visual_geoms(self, upstream):
        """Visual-class geoms (mesh + primitives, contype=0) must NOT
        produce collision spheres; primitives land in visual_geoms."""
        ref, got = upstream
        rb, rp, rr = _sorted_spheres(ref)
        gb, gp, gr = _sorted_spheres(got)
        np.testing.assert_array_equal(gb, rb)
        np.testing.assert_allclose(gp, rp, atol=1e-12)
        np.testing.assert_allclose(gr, rr, atol=1e-12)
        kinds = [g[0] for g in got.visual_geoms]
        assert "box" in kinds  # the palm's visual primitive

    def test_fk_equivalence_upstream(self, upstream):
        """World frames match the doc-reconstructed model (euler-degree
        palm orientation, childclass chains)."""
        from dexrobot_isaac_tpu.physics.engine import HandPhysics

        ref, got = upstream
        e_ref, e_got = HandPhysics(model=ref), HandPhysics(model=got)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.uniform(-0.3, 0.8, (4, 26)).astype(np.float32))
        qd = jnp.asarray(0.1 * rng.normal(size=(4, 26)).astype(np.float32))
        sp = jnp.tile(jnp.array([[0.0, 0.0, 0.3]], jnp.float32), (4, 1))
        k1 = jax.vmap(e_ref.fk)(q, qd, sp)
        k2 = jax.vmap(e_got.fk)(q, qd, sp)
        np.testing.assert_allclose(
            np.asarray(k2.body_pos), np.asarray(k1.body_pos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(k2.site_pos), np.asarray(k1.site_pos), atol=1e-5
        )
