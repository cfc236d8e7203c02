"""Fused-kernel roofline: what resource actually bounds env throughput?

Accounts the fused control-step kernel (envs/fused_step.py) against each of
the TPU v5e's hard limits and states which one binds:

  1. HBM bandwidth  — bytes in/out of the kernel per env-step (the packed
     row carries + every kernel output), from jax.eval_shape on the real
     step function. Peak: 819 GB/s (v5e).
  2. VPU compute    — semantic FLOPs/env-step (tools/count_flops.py: XLA
     cost analysis of the parity-locked jnp step). Peak: 8x128 lanes x
     4 ALUs x 2 (FMA) x 0.94 GHz = 7.7e12 f32 FLOP/s.
  3. Serial latency — the kernel's grid blocks run SEQUENTIALLY on the
     single v5e TensorCore, and inside a block the substep loop is a
     sequential dependency chain (FK parent chain -> CRBA -> Cholesky ->
     contacts -> integrate). The cycle budget per substep per block is
     computed from the measured step time.

Run (CPU; uses a measured TPU env-steps/s figure, default from
BENCH_r03.json): JAX_PLATFORMS=cpu python tools/roofline.py
    [num_envs] [env_steps_per_s] [block]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

HBM_PEAK = 819e9          # v5e HBM bandwidth, bytes/s
VPU_PEAK = 7.7e12         # v5e f32 VPU FLOP/s (see bench.py MFU note)
CLOCK = 0.94e9            # v5e TensorCore clock


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.utils.config import load_config

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    if len(sys.argv) > 2:
        steps_per_s = float(sys.argv[2])
    else:
        with open(os.path.join(REPO, "BENCH_r03.json")) as f:
            steps_per_s = float(json.load(f)["value"])
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    cfg = load_config(["task=BlindGrasping", f"numEnvs={n}", "device=cpu"])
    env = make_env(cfg, seed=0)
    fused = env.make_fused(block=block, backend="xla")  # trace-only use
    state, _ = env._reset_jit(jax.random.key(0))
    fs = fused.pack(state)
    actions = jnp.zeros((n, env.num_actions), jnp.float32)

    def nbytes(tree):
        return sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves(tree)
        )

    out_shapes = jax.eval_shape(fused.step_fn, fs, actions)
    bytes_in = nbytes(fs) + nbytes(actions)
    bytes_out = nbytes(out_shapes)
    per_env_step = (bytes_in + bytes_out) / n
    rf, ri, rc = (fs.rows_f.shape[0], fs.rows_i.shape[0],
                  fs.rows_c.shape[0])

    # semantic FLOPs per env-step (XLA cost analysis of the jnp step)
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "count_flops.py"),
         "BlindGrasping", "8"],
        capture_output=True, text=True, timeout=580, check=True,
    )
    flops = float(json.loads(
        out.stdout.strip().splitlines()[-1])["flops_per_env_step"])

    achieved_bw = per_env_step * steps_per_s
    achieved_fl = flops * steps_per_s
    ctrl_s = n / steps_per_s                  # wall time per control step
    nblocks = (n + block - 1) // block
    n_sub = env.comps.engine.params.substeps \
        * env.comps.physics_steps_per_control
    cyc_block = ctrl_s / nblocks * CLOCK
    print(f"fused kernel rows: f32 {rf} + i32 {ri} in/out, cold {rc} "
          f"out-only; obs/extras outputs included in bytes below")
    print(f"bytes/env-step: {per_env_step:,.0f} "
          f"(in {bytes_in / n:,.0f} + out {bytes_out / n:,.0f})")
    print(f"measured: {steps_per_s:,.0f} env-steps/s at {n} envs, "
          f"block {block} ({nblocks} sequential grid blocks)")
    print(f"  HBM:  {achieved_bw / 1e9:7.1f} GB/s   "
          f"= {100 * achieved_bw / HBM_PEAK:5.2f}% of 819 GB/s peak")
    print(f"  VPU:  {achieved_fl / 1e12:7.2f} TFLOP/s "
          f"= {100 * achieved_fl / VPU_PEAK:5.2f}% of 7.7 TFLOP/s peak")
    print(f"  time: {ctrl_s * 1e6:,.0f} us/control-step -> "
          f"{cyc_block:,.0f} cycles/block -> "
          f"{cyc_block / n_sub:,.0f} cycles/substep/block "
          f"({n_sub} sequential substeps)")
    lanes_per_block = block
    vregs = lanes_per_block // 1024  # (8,128) f32 tile = 1024 lanes
    flops_sub = flops / n_sub
    # VPU issue cost if perfectly vectorized: each lane-op covers 1024
    # envs per vreg-op; 4 ALUs issue per cycle
    min_cyc = flops_sub * lanes_per_block / 2 / (4 * 8 * 128)
    print(f"  substep semantic FLOPs/env: {flops_sub:,.0f}; perfect-VPU "
          f"lower bound {min_cyc:,.0f} cycles/substep/block "
          f"({vregs} vreg(s)/row-op) -> latency/issue overhead "
          f"{cyc_block / n_sub / max(min_cyc, 1):,.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
