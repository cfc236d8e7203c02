"""Record the golden fused-step trajectory from the REAL TPU Mosaic kernel.

Run on TPU hardware (the default axon backend):

    python tools/record_golden.py

Writes tests/golden/fused_blind_grasping.npz consumed by
tests/test_golden_trajectory.py (see tests/golden_scenario.py for the
scenario and the re-record policy).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import numpy as np

    from tests import golden_scenario as gs

    backend = jax.default_backend()
    if backend != "tpu":
        print(f"WARNING: recording on backend={backend!r}, not TPU — the "
              "golden file is only meaningful when recorded from Mosaic")
    env, actions = gs.make_env_and_actions()
    out = gs.run_fused(env, actions, backend="pallas")
    path = os.path.join(REPO, "tests", gs.GOLDEN)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, backend=backend, steps=gs.STEPS, seed=gs.SEED, **out
    )
    print(f"golden recorded: {path}")
    for k, v in out.items():
        print(f"  {k}: {v.shape} {v.dtype} |mean|={np.abs(v).mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
