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


class TestConfigHygiene:
    """Deprecated/unknown-key rejection + CLI help (reference
    vec_task.py:66-71, cli_utils.py:170-307)."""

    def test_unknown_top_level_key_rejected(self):
        with pytest.raises(ValueError, match="Unknown top-level"):
            load_config(["tarin.seed=1"])  # typo'd override must not no-op

    def test_deprecated_key_rejected(self):
        with pytest.raises(ValueError, match="deprecated"):
            load_config(["sim.use_gpu_pipeline=true"])
        with pytest.raises(ValueError, match="Unknown top-level"):
            load_config(["sim_device=cuda:0"])

    def test_help_text_lists_aliases(self):
        from dexrobot_isaac_tpu.utils.config import ALIASES, usage_text

        text = usage_text()
        for alias in ALIASES:
            assert alias in text

    def test_train_cli_help(self):
        import train as train_mod

        assert train_mod.main(["--help"]) == 0

    def test_nonzero_restitution_rejected(self):
        from dexrobot_isaac_tpu.factory import make_env

        cfg = load_config(
            ["task=BlindGrasping", "numEnvs=2", "task.box.restitution=0.5"]
        )
        with pytest.raises(NotImplementedError, match="restitution"):
            make_env(cfg)

    def test_zero_restitution_accepted(self):
        # the shipped parity value must remain loadable
        cfg = load_config(["task=BlindGrasping", "numEnvs=2"])
        assert cfg["task"]["box"]["restitution"] == 0.0
