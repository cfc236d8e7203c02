"""Lightweight Hydra-style configuration system.

The reference uses Hydra + OmegaConf with a 4-section schema (sim/env/task/
train), defaults-list inheritance, `_delete_` override semantics, and a CLI
alias preprocessor (SURVEY §5.6; reference dexhand_env/cfg/config.yaml,
utils/cli_utils.py:37-298, config_utils.py:14-37). Neither hydra nor omegaconf
is available in this image, so this module implements the subset the
framework needs on plain PyYAML:

- YAML files with a top-level `defaults:` list (paths relative to the config
  dir, composed depth-first, `_self_` position respected)
- deep-merging with `_delete_: true` meaning "replace this subtree, don't
  merge" (reference cfg/task/BlindGrasping.yaml:129)
- dotted CLI overrides `a.b.c=value` with YAML-typed values
- `task=Name` / `train=Name` group swaps (hydra config-group selection)
- CLI aliases mapping short names onto full paths
  (reference ALIASES, cli_utils.py:41-52)
- fail-fast validation of required keys (reference config_utils.py:14-37)
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml

_DEFAULT_CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cfg"
)

# CLI alias expansion (parity: cli_utils.py:41-52)
ALIASES = {
    "numEnvs": "env.numEnvs",
    "device": "device",
    "seed": "train.seed",
    "test": "train.test",
    "checkpoint": "train.checkpoint",
    "maxIterations": "train.maxIterations",
    "testGamesNum": "train.testGamesNum",
    "reloadInterval": "train.reloadInterval",
    "headless": "env.headless",
    "viewer": "env.viewer",
    "videoRecord": "env.videoRecord",
    "videoStream": "env.videoStream",
    "controlMode": "task.controlMode",
    "episodeLength": "env.episodeLength",
    "experimentName": "train.logging.experimentName",
    "logLevel": "train.logging.logLevel",
}

# config groups selectable from the CLI like hydra's `task=BlindGrasping`
_GROUPS = ("task", "train", "physics", "base", "experiments")


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Merge override into base (copy). `_delete_: true` replaces subtrees."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k == "_delete_":
            continue
        if isinstance(v, dict) and v.get("_delete_", False):
            vv = {kk: val for kk, val in v.items() if kk != "_delete_"}
            out[k] = copy.deepcopy(vv)
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _compose_file(rel_path: str, config_dir: str) -> Dict:
    """Load one config file, recursively composing its defaults list."""
    path = os.path.join(config_dir, rel_path + ".yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(f"Config file not found: {path}")
    raw = _load_yaml(path)
    defaults: List[str] = raw.pop("defaults", [])
    own = raw

    merged: Dict = {}
    self_done = False
    base_dir = os.path.dirname(rel_path)
    for entry in defaults:
        if entry == "_self_":
            merged = deep_merge(merged, own)
            self_done = True
            continue
        # entries may be 'physics/default' (absolute in config dir) or
        # 'BaseTask' (relative to the current file's group directory)
        if "/" in entry or not base_dir:
            sub = entry.lstrip("/")
        else:
            sub = os.path.join(base_dir, entry)
        merged = deep_merge(merged, _compose_file(sub, config_dir))
    if not self_done:
        merged = deep_merge(merged, own)
    return merged


def set_by_path(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    cur = cfg
    for k in keys[:-1]:
        if k not in cur or not isinstance(cur[k], dict):
            cur[k] = {}
        cur = cur[k]
    cur[keys[-1]] = value


def get_by_path(cfg: Dict, dotted: str, default: Any = None) -> Any:
    cur = cfg
    for k in dotted.split("."):
        if not isinstance(cur, dict) or k not in cur:
            return default
        cur = cur[k]
    return cur


def parse_value(text: str) -> Any:
    """YAML-typed scalar parsing for CLI values."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_config(
    overrides: Sequence[str] = (),
    config_name: str = "config",
    config_dir: Optional[str] = None,
) -> Dict:
    """Compose the root config + apply CLI overrides.

    Overrides are `key=value` strings: group selections (`task=BlindGrasping`),
    aliases (`numEnvs=2048`), or dotted paths (`sim.dt=0.01`).
    """
    config_dir = config_dir or _DEFAULT_CONFIG_DIR
    cfg = _compose_file(config_name, config_dir)

    # group selections first (they bring whole subtrees)
    dotted_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value: {ov!r}")
        key, _, val = ov.partition("=")
        key = key.strip()
        if key in _GROUPS:
            cfg = deep_merge(cfg, _compose_file(f"{key}/{val.strip()}", config_dir))
        else:
            dotted_overrides.append((key, val))

    for key, val in dotted_overrides:
        key = ALIASES.get(key, key)
        set_by_path(cfg, key, parse_value(val))

    validate_config(cfg)
    return cfg


# the 4-section schema (+ device); an unknown top-level key is a typo'd
# override (e.g. `tarin.seed=1`) that would otherwise silently no-op
_TOP_LEVEL_KEYS = {"device", "sim", "env", "task", "train"}

# deprecated keys rejected with migration hints (reference vec_task.py:66-71
# rejects sim.use_gpu_pipeline the same way)
_DEPRECATED = {
    "sim.use_gpu_pipeline": (
        "deprecated: the pipeline is determined by `device` "
        "(device=tpu | cpu); remove the key"
    ),
    "sim_device": "deprecated: use `device=tpu|cpu`",
    "rl_device": "deprecated: single-process learner runs on `device`",
    "graphics_device_id": "deprecated: rendering is host-side (graphics/)",
}


def validate_config(cfg: Dict) -> None:
    """Fail-fast on structurally broken configs (config_utils.py:14-37) and
    reject deprecated/unknown keys (vec_task.py:66-71)."""
    unknown = sorted(set(cfg) - _TOP_LEVEL_KEYS)
    if unknown:
        raise ValueError(
            f"Unknown top-level config keys {unknown} "
            f"(expected {sorted(_TOP_LEVEL_KEYS)}; typo'd override?)"
        )
    for key, msg in _DEPRECATED.items():
        if get_by_path(cfg, key) is not None:
            raise ValueError(f"Config key '{key}' {msg}")
    required = ["sim.dt", "env.numEnvs", "task.name"]
    missing = [k for k in required if get_by_path(cfg, k) is None]
    if missing:
        raise ValueError(f"Config missing required keys: {missing}")
    if get_by_path(cfg, "sim.dt") <= 0:
        raise ValueError("sim.dt must be positive")
    if get_by_path(cfg, "env.numEnvs") < 1:
        raise ValueError("env.numEnvs must be >= 1")


def usage_text() -> str:
    """CLI help (parity: reference show_cli_help, cli_utils.py:170-307)."""
    lines = [
        "dexrobot_isaac_tpu training CLI — `python train.py key=value ...`",
        "",
        "Config groups (compose whole subtrees):",
        "  task=BaseTask|BlindGrasping|BoxPushing|BoxReorientation|"
        "BoxStacking|InHandReorientation",
        "  train=<cfg/train/*>   physics=default|fast|accurate",
        "  base=<cfg/base/*>     experiments=<cfg/experiments/*>",
        "",
        "Aliases:",
    ]
    for alias, path in ALIASES.items():
        lines.append(f"  {alias:16} -> {path}")
    lines += [
        "",
        "Any other key is a dotted config path: sim.dt=0.01 "
        "train.params.config.horizon_length=32",
        "",
        "Smart checkpoint resolution:",
        "  checkpoint=latest        # latest training run",
        "  checkpoint=latest_test   # latest test run",
        "  checkpoint=<partial-run-name> | <path/to.ckpt>",
        "",
        "Examples:",
        "  python train.py task=BlindGrasping numEnvs=8192",
        "  python train.py test=true checkpoint=latest testGamesNum=100",
        "  python train.py task=BaseTask device=cpu numEnvs=4 "
        "maxIterations=10",
    ]
    return "\n".join(lines)


def save_config(cfg: Dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
