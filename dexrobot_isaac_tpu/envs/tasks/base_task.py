"""BaseTask: the no-op smoke/dev task.

Parity: dexhand_env/tasks/base_task.py:17-157 -- empty reward terms, empty
criteria, no task objects, default reset to the configured initial DOF pose.
"""

from dexrobot_isaac_tpu.envs.tasks.api import DexTask


class BaseTask(DexTask):
    name = "BaseTask"
