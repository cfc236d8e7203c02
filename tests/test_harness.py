"""The verification harness must CATCH coupling corruption, not just pass.

Reference-strength check (VERDICT: the reference harness verifies each
action drives its *mapped* DOFs through the coupling, incl. the 2.0
pinky-spread scale and pinned r_f_joint3_1; examples/dexhand_test.py:
1159-1409). Each test here deliberately corrupts the coupling table,
rebuilds the pipeline, and asserts the harness verifier reports it.
"""

import dataclasses
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dexrobot_isaac_tpu.envs import action as action_mod
from dexrobot_isaac_tpu.models.dexhand021 import build_hand_model
from examples.dexhand_test import (
    verify_action_mapping,
    verify_custom_rule_modes,
)


@pytest.fixture(scope="module")
def model():
    return build_hand_model()


@pytest.fixture(scope="module")
def pipeline(model):
    return action_mod.build_action_pipeline(
        model=model, control_mode="position", control_dt=0.02
    )


def _sabotaged_pipeline(model, monkeypatch, mutate):
    from dexrobot_isaac_tpu import constants

    bad = {k: list(v) for k, v in constants.FINGER_COUPLING_MAP.items()}
    mutate(bad)
    monkeypatch.setattr(action_mod, "FINGER_COUPLING_MAP", bad)
    return action_mod.build_action_pipeline(
        model=model, control_mode="position", control_dt=0.02
    )


class TestHarnessVerification:
    def test_clean_pipeline_passes_both_modes(self, pipeline):
        for mode in ("position", "position_delta"):
            pl = dataclasses.replace(pipeline, control_mode=mode)
            assert verify_action_mapping(pl, 18, True, True) == []

    def test_custom_rule_both_modes(self, pipeline):
        assert verify_custom_rule_modes(pipeline, 18) == []

    def test_transposed_coupling_caught(self, model, monkeypatch):
        """Index-MCP and middle-MCP rows swapped: actions drive the WRONG
        fingers — must surface as cross-talk + missing-response failures."""

        def mutate(bad):
            bad[4], bad[6] = bad[6], bad[4]

        pl = _sabotaged_pipeline(model, monkeypatch, mutate)
        fails = verify_action_mapping(pl, 18, True, True)
        assert any("cross-talk" in f for f in fails)
        assert any("did not respond" in f for f in fails)

    def test_flattened_pinky_scale_caught(self, model, monkeypatch):
        """The 2.0 scale on r_f_joint5_1 flattened to 1.0: the exact
        coupling-ratio check must flag it."""

        def mutate(bad):
            bad[3] = [(j, 1.0) for j, _s in bad[3]]

        pl = _sabotaged_pipeline(model, monkeypatch, mutate)
        fails = verify_action_mapping(pl, 18, True, True)
        assert any(
            "scale mismatch" in f and "r_f_joint5_1" in f for f in fails
        )

    def test_unpinned_joint31_caught(self, model, monkeypatch):
        """r_f_joint3_1 wired under a control instead of pinned at 0."""

        def mutate(bad):
            bad[6] = bad[6] + [("r_f_joint3_1", 1.0)]

        pl = _sabotaged_pipeline(model, monkeypatch, mutate)
        fails = verify_action_mapping(pl, 18, True, True)
        assert any("r_f_joint3_1" in f for f in fails)
