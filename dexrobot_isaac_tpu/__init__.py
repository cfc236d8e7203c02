"""dexrobot_isaac_tpu: TPU-native dexterous-hand RL environment framework.

Public API:

    from dexrobot_isaac_tpu import load_config, make_env

    env = make_env(load_config(["task=BlindGrasping", "numEnvs=4096"]))
    obs = env.reset()
    obs, reward, done, extras = env.step(actions)
"""

from dexrobot_isaac_tpu.factory import TASK_REGISTRY, make_env, register_task
from dexrobot_isaac_tpu.utils.config import load_config

__version__ = "0.1.0"

__all__ = [
    "TASK_REGISTRY",
    "load_config",
    "make_env",
    "register_task",
    "__version__",
]
