#!/usr/bin/env python
"""Headline benchmark: BlindGrasping env throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (per BASELINE.json): env-steps/s/chip at 4096 envs on BlindGrasping —
each env-step is one full control step (action pipeline -> 4 physics steps x
substeps -> observations/rewards/termination -> masked auto-reset), the same
unit the reference's PhysX pipeline steps at.

Two production step paths are timed and the best wins (both are
parity-tested against each other, tests/test_fused_step.py):
  - "xla": the functional step (envs/dexhand.py) — physics in one Pallas
    kernel, post-physics as ~140 XLA kernels;
  - "fused": the whole control step as ONE Pallas kernel
    (envs/fused_step.py), the default training path on TPU.
DEXHAND_BENCH_PATH=xla|fused|best (default best) restricts the choice.

The reference publishes no numbers (BASELINE.md): its only quantitative claim
is "thousands of parallel hands at 60+ FPS on a single GPU"
(docs/DESIGN_DECISIONS.md:166). We take 4096 envs x 60 steps/s = 245,760
env-steps/s as the documented single-accelerator proxy baseline and report
vs_baseline against it.
"""

import json
import os
import sys
import time


def main() -> int:
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import jax
    import jax.numpy as jnp

    from dexrobot_isaac_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from dexrobot_isaac_tpu.factory import make_env
    from dexrobot_isaac_tpu.utils.config import load_config

    cfg = load_config([
        "task=BlindGrasping",
        f"numEnvs={num_envs}",
    ])
    env = make_env(cfg)

    state, obs = env._reset_jit(jax.random.key(0))

    key = jax.random.key(1)
    actions = jax.random.uniform(
        key, (num_envs, env.num_actions), minval=-1.0, maxval=1.0
    )

    # Time scan-chunks of env steps (one dispatch per CHUNK steps -- the
    # shape of real consumption: PPO rollouts scan horizon_length steps in
    # one program), and take the best of several windows: the remote-TPU
    # chip behind the axon tunnel is load-shared and identical windows can
    # differ 3x. Steps chain through the carried state, so a window can
    # never under-count device work.
    CHUNK = 16

    def make_chunked(step_fn):
        def run_chunk(state):
            def body(s, _):
                s, o, r, d, _e = step_fn(s, actions)
                return s, None
            state, _ = jax.lax.scan(body, state, None, length=CHUNK)
            return state
        return jax.jit(run_chunk, donate_argnums=0)

    # path name -> (chunked runner, carried state, sync leaf)
    runners = {"xla": [make_chunked(env.step_fn), state, lambda s: s.physics.q]}
    path = os.environ.get("DEXHAND_BENCH_PATH", "best")
    if path in ("best", "fused") and jax.default_backend() == "tpu":
        try:
            fused = env.make_fused()
            fs, _ = fused.reset(jax.random.key(0))
            runners["fused"] = [
                make_chunked(fused.step_fn), fs, lambda s: s.rows_f
            ]
        except Exception as e:  # FusedUnsupported or compile failure
            print(f"fused path unavailable: {e}", file=sys.stderr)
    if path == "fused" and "fused" in runners:
        del runners["xla"]

    probe_step = jax.jit(env.step_fn)

    def sync(leaf):
        # host-fetch one element as the window barrier: over the axon
        # tunnel jax.block_until_ready has been observed returning BEFORE
        # device completion (round 4: a 0.2 ms "PPO update" and an 8.1B
        # env-steps/s artifact in the anatomy sweeps, both corrected by a
        # fetch). A value fetch cannot resolve early.
        return float(jnp.asarray(leaf).ravel()[0])

    # warmup: compile every program
    for r in runners.values():
        r[1] = r[0](r[1])
        sync(r[2](r[1]))

    REPS = 5
    n_chunks = max(1, steps // CHUNK)
    steps = n_chunks * CHUNK
    all_dt = {name: [] for name in runners}
    # interleave paths within each rep so load swings hit both equally
    for _ in range(REPS):
        for name, r in runners.items():
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                r[1] = r[0](r[1])
            sync(r[2](r[1]))
            all_dt[name].append(time.perf_counter() - t0)
    best_dt = {name: min(dts) for name, dts in all_dt.items()}
    med_dt = {name: sorted(dts)[len(dts) // 2] for name, dts in all_dt.items()}

    # finiteness probe on the reference step (outside the timed windows).
    # NOTE: `state` was donated to the first chunked call — probe from a
    # live carried state (or a fresh reset when only the fused path ran).
    if "xla" in runners:
        probe_state = runners["xla"][1]
    else:
        probe_state, _ = env._reset_jit(jax.random.key(0))
    state, obs, rew, done, _ = probe_step(probe_state, actions)
    if not bool(jnp.isfinite(obs).all() & jnp.isfinite(rew).all()):
        raise RuntimeError("benchmark produced non-finite observations/rewards")

    per_path = {n: num_envs * steps / dt for n, dt in best_dt.items()}
    winner = min(best_dt, key=best_dt.get)
    env_steps_per_s = per_path[winner]
    median_steps_per_s = num_envs * steps / med_dt[winner]
    baseline = 245760.0  # 4096 envs x 60 FPS, docs/DESIGN_DECISIONS.md:166
    if len(per_path) > 1:
        print(
            "paths: " + " ".join(f"{n}={v:,.0f}" for n, v in per_path.items()),
            file=sys.stderr,
        )

    # MFU: semantic FLOPs/env-step counted by XLA cost analysis of the
    # CPU-compiled reference step (tools/count_flops.py; the fused TPU
    # kernel is parity-locked to it, so this is the algorithmic FLOP count,
    # conservative — XLA's analysis omits transcendentals). Peaks: TPU v5e
    # chip = 197e12 bf16 FLOP/s (MXU, the standard MFU denominator); the
    # VPU peak is 8x128 lanes x 4 ALUs x 2 (FMA) x ~0.94 GHz = 7.7e12 f32
    # FLOP/s — this workload is f32 lane math, so vpu_mfu is the roofline
    # that actually binds (and it doesn't: the kernel is VMEM-residency- and
    # dependency-bound, not FLOP-bound; see BASELINE.md).
    mfu_fields = {}
    try:
        import subprocess

        out = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tools", "count_flops.py",
            ), "BlindGrasping", "8"],
            capture_output=True, text=True, timeout=580, check=True,
        )
        flops_env_step = float(
            json.loads(out.stdout.strip().splitlines()[-1])[
                "flops_per_env_step"
            ]
        )
        achieved = env_steps_per_s * flops_env_step
        mfu_fields = {
            "flops_per_env_step": round(flops_env_step, 1),
            "achieved_flops_per_s": round(achieved, 1),
            "mfu": round(achieved / 197e12, 6),
            "vpu_mfu": round(achieved / 7.7e12, 6),
        }
    except Exception as e:
        print(f"mfu unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"env-steps/s/chip (BlindGrasping, {num_envs} envs, {winner})",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / baseline, 3),
        "median_of_5": round(median_steps_per_s, 1),
        **mfu_fields,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
