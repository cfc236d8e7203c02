"""Config system tests: composition, group swaps, _delete_, aliases."""

import pytest

from dexrobot_isaac_tpu.utils.config import (
    deep_merge,
    get_by_path,
    load_config,
    parse_value,
)


class TestComposition:
    def test_default_config_loads(self):
        cfg = load_config()
        assert cfg["task"]["name"] == "BaseTask"
        assert cfg["sim"]["dt"] == 0.005
        assert cfg["env"]["numEnvs"] == 1024
        # BaseTask declares position_delta control
        assert cfg["task"]["controlMode"] == "position_delta"

    def test_task_group_swap(self):
        cfg = load_config(["task=BlindGrasping"])
        assert cfg["task"]["name"] == "BlindGrasping"
        assert cfg["sim"]["dt"] == 0.01
        assert cfg["env"]["episodeLength"] == 500
        # _delete_ semantics: BaseTask-only weights fully replaced
        assert cfg["task"]["reward_weights"]["alive"] == 0.0
        assert cfg["task"]["reward_weights"]["s3_object_height"] == 10.0
        assert "_delete_" not in cfg["task"]["reward_weights"]

    def test_alias_override(self):
        cfg = load_config(["numEnvs=8"])
        assert cfg["env"]["numEnvs"] == 8

    def test_dotted_override(self):
        cfg = load_config(["sim.dt=0.002", "task.controlMode=position"])
        assert cfg["sim"]["dt"] == 0.002
        assert cfg["task"]["controlMode"] == "position"

    def test_typed_values(self):
        assert parse_value("true") is True
        assert parse_value("0.01") == 0.01
        assert parse_value("null") is None
        assert parse_value("[1,2]") == [1, 2]

    def test_validation_fails_fast(self):
        with pytest.raises(ValueError):
            load_config(["env.numEnvs=0"])

    def test_physics_preset_swap(self):
        cfg = load_config(["physics=fast"])
        assert cfg["sim"]["substeps"] == 2


class TestDeepMerge:
    def test_nested_merge(self):
        out = deep_merge({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}})
        assert out == {"a": {"x": 1, "y": 3}}

    def test_delete_replaces(self):
        out = deep_merge(
            {"w": {"old": 1.0}}, {"w": {"_delete_": True, "new": 2.0}}
        )
        assert out["w"] == {"new": 2.0}

    def test_get_by_path(self):
        assert get_by_path({"a": {"b": {"c": 5}}}, "a.b.c") == 5
        assert get_by_path({}, "a.b", "d") == "d"
