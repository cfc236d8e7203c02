"""Checkpoint save/load + hot-reload monitoring.

Parity with the reference's checkpoint handling: rl_games `.pth` files under
`runs*/<run>/nn/` (SURVEY §5.4), smart `latest` resolution
(cli_utils.py:94-168, implemented in utils/experiment.py), and the hot-reload
monitor that re-loads new weights into a live player during indefinite test
mode (rl_games_patches.py:21-181). Serialization is flax msgpack instead of
torch pickle.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Callable, Dict, Optional

import flax.serialization
import jax

from dexrobot_isaac_tpu.rl.ppo import PPOState
from dexrobot_isaac_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _rms_dict(rms) -> Dict[str, Any]:
    return {"mean": rms.mean, "var": rms.var, "count": rms.count}


def save_checkpoint(path: str, ppo_state: PPOState, meta: Optional[Dict] = None) -> None:
    payload = {
        "params": ppo_state.params,
        "obs_rms": _rms_dict(ppo_state.obs_rms),
        "value_rms": _rms_dict(ppo_state.value_rms),
        "lr": ppo_state.lr,
        "epoch": ppo_state.epoch,
        "meta": meta or {},
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    os.replace(tmp, path)  # atomic so hot-reload never sees partial files


def load_checkpoint(path: str, ppo_state: PPOState) -> PPOState:
    """Load weights/stats into an existing PPOState (optimizer state kept)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "params": ppo_state.params,
        "obs_rms": _rms_dict(ppo_state.obs_rms),
        "value_rms": _rms_dict(ppo_state.value_rms),
        "lr": ppo_state.lr,
        "epoch": ppo_state.epoch,
        "meta": {},
    }
    payload = flax.serialization.from_bytes(template, data)
    import dataclasses

    from dexrobot_isaac_tpu.rl.running_stats import RunningMeanStd

    return dataclasses.replace(
        ppo_state,
        params=payload["params"],
        obs_rms=RunningMeanStd(**payload["obs_rms"]),
        value_rms=RunningMeanStd(**payload["value_rms"]),
        lr=jax.numpy.asarray(payload["lr"]),
        epoch=jax.numpy.asarray(payload["epoch"]),
    )


def load_checkpoint_meta(path: str) -> Dict[str, Any]:
    """Read only the metadata dict of a checkpoint (iteration, reward,
    curriculum difficulty, ...). Used on resume so host-side controller
    state — e.g. the reset-curriculum difficulty — continues where the
    saved run left off instead of restarting at initial_difficulty."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return dict(payload.get("meta", {}) or {})


class HotReloadMonitor:
    """Background thread polling a checkpoint file's mtime; invokes a callback
    with the new path when it changes (parity: HotReloadManager,
    rl_games_patches.py:21-181)."""

    def __init__(
        self,
        checkpoint_path: str,
        on_reload: Callable[[str], None],
        interval_seconds: float = 30.0,
    ):
        self.path = checkpoint_path
        self.on_reload = on_reload
        self.interval = interval_seconds
        self._stop = threading.Event()
        self._last_mtime = self._mtime()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _mtime(self) -> float:
        try:
            return os.stat(self.path).st_mtime
        except OSError:
            return -1.0

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            m = self._mtime()
            if m > self._last_mtime:
                self._last_mtime = m
                logger.info(f"Hot-reload: new checkpoint detected at {self.path}")
                try:
                    self.on_reload(self.path)
                except Exception as e:  # keep monitoring; reload is best-effort
                    logger.warning(f"Hot-reload failed: {e}")

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
