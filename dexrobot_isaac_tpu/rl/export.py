"""Deployment export: checkpoint -> standalone policy artifacts.

The reference has no deployment path at all (policies stay rl_games `.pth`
files); this module is a capability beyond it (ROADMAP "checkpoint export").
Two formats, both derived purely from a saved checkpoint (no env or config
needed — the network structure is recovered from the parameter tree and the
observation width from the running statistics):

- **npz**: actor weights + observation normalization in one `.npz`, consumed
  by `NumpyPolicy` — pure-numpy inference for robot-side controllers with no
  jax/flax/torch dependency. The file is self-describing (`layer_sizes`,
  `num_obs`, `norm_clip`).
- **torchscript**: the same actor scripted as a TorchScript module, loadable
  from C++ via libtorch for integration into native control stacks.

Inference math exactly mirrors evaluation (`PPOLearner.act_deterministic`,
rl/ppo.py): clip((obs - mean) / sqrt(var + 1e-5), +-5) -> MLP(ELU) -> mu ->
clip(mu, +-1). For asymmetric actor-critic checkpoints only the actor trunk
is exported; the privileged critic never ships.

CLI: python -m dexrobot_isaac_tpu.rl.export <ckpt> [--format npz|torchscript]
     [--out PATH]
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np

NORM_EPS = 1e-5
NORM_CLIP = 5.0


# ----------------------------------------------------------------------
# checkpoint -> actor weight list
# ----------------------------------------------------------------------
def _load_raw_checkpoint(path: str) -> Dict:
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def extract_actor(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Actor-only weights + normalization from a checkpoint file.

    Returns a flat dict: layer_{i}_w/b (flax layout: (in, out)), mu_w/b,
    obs_mean, obs_std, plus scalars num_obs and norm_clip.
    """
    payload = _load_raw_checkpoint(ckpt_path)
    params = payload["params"]["params"]
    obs_rms = payload["obs_rms"]

    def wb(p) -> Tuple[np.ndarray, np.ndarray]:
        return np.asarray(p["kernel"], np.float32), np.asarray(p["bias"], np.float32)

    names = set(params)
    layers: List[Tuple[np.ndarray, np.ndarray]] = []
    if any(n.startswith("actor_") for n in names):
        # asymmetric network (rl/networks.py): explicit actor_i / mu names
        idx = sorted(
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"actor_(\d+)", n))
        )
        for i in idx:
            layers.append(wb(params[f"actor_{i}"]))
        mu_w, mu_b = wb(params["mu"])
    else:
        # symmetric shared trunk: flax auto-names Dense_0..Dense_{k+1} in
        # creation order — trunk layers, then mu, then value
        idx = sorted(
            int(m.group(1))
            for n in names
            if (m := re.fullmatch(r"Dense_(\d+)", n))
        )
        if len(idx) < 3:
            raise ValueError(
                f"unrecognized network parameters: {sorted(names)}"
            )
        for i in idx[:-2]:
            layers.append(wb(params[f"Dense_{i}"]))
        mu_w, mu_b = wb(params[f"Dense_{idx[-2]}"])

    num_obs = int(layers[0][0].shape[0])
    mean = np.asarray(obs_rms["mean"], np.float32)[:num_obs]
    std = np.sqrt(np.asarray(obs_rms["var"], np.float32)[:num_obs] + NORM_EPS)

    out: Dict[str, np.ndarray] = {
        "num_obs": np.asarray(num_obs, np.int64),
        "num_layers": np.asarray(len(layers), np.int64),
        "norm_clip": np.asarray(NORM_CLIP, np.float32),
        "obs_mean": mean,
        "obs_std": std,
        "mu_w": mu_w,
        "mu_b": mu_b,
    }
    for i, (w, b) in enumerate(layers):
        out[f"layer_{i}_w"] = w
        out[f"layer_{i}_b"] = b
    return out


# ----------------------------------------------------------------------
# numpy deployment runtime
# ----------------------------------------------------------------------
class NumpyPolicy:
    """Pure-numpy deterministic policy (no jax/flax/torch at inference)."""

    def __init__(self, weights: Dict[str, np.ndarray]):
        n = int(weights["num_layers"])
        self.layers = [
            (weights[f"layer_{i}_w"], weights[f"layer_{i}_b"])
            for i in range(n)
        ]
        self.mu_w = weights["mu_w"]
        self.mu_b = weights["mu_b"]
        self.obs_mean = weights["obs_mean"]
        self.obs_std = weights["obs_std"]
        self.norm_clip = float(weights["norm_clip"])
        self.num_obs = int(weights["num_obs"])

    @classmethod
    def load(cls, path: str) -> "NumpyPolicy":
        return cls(dict(np.load(path)))

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        """obs (..., >=num_obs) -> action (..., num_actions) in [-1, 1]."""
        x = np.asarray(obs, np.float32)[..., : self.num_obs]
        x = (x - self.obs_mean) / self.obs_std
        x = np.clip(x, -self.norm_clip, self.norm_clip)
        for w, b in self.layers:
            x = x @ w + b
            # ELU, numerically safe for large negatives
            x = np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))
        mu = x @ self.mu_w + self.mu_b
        return np.clip(mu, -1.0, 1.0)


def export_npz(ckpt_path: str, out_path: str) -> str:
    np.savez(out_path, **extract_actor(ckpt_path))
    return out_path


def export_flat_binary(ckpt_path: str, out_path: str) -> str:
    """Flat little-endian binary for the C++ runtime (native/policy_runtime):

    magic 'DXP1' | i32 num_layers | i32 num_obs | i32 num_actions |
    f32 norm_clip | f32 obs_mean[num_obs] | f32 obs_std[num_obs] |
    per layer (trunk..., then mu): i32 in | i32 out | f32 W[in*out]
    (row-major, flax (in, out) layout) | f32 b[out]
    """
    import struct

    w = extract_actor(ckpt_path)
    n = int(w["num_layers"])
    num_obs = int(w["num_obs"])
    num_actions = int(w["mu_w"].shape[1])
    with open(out_path, "wb") as f:
        f.write(b"DXP1")
        f.write(struct.pack("<iii f", n + 1, num_obs, num_actions,
                            float(w["norm_clip"])))
        f.write(w["obs_mean"].astype("<f4").tobytes())
        f.write(w["obs_std"].astype("<f4").tobytes())
        mats = [(w[f"layer_{i}_w"], w[f"layer_{i}_b"]) for i in range(n)]
        mats.append((w["mu_w"], w["mu_b"]))
        for W, b in mats:
            f.write(struct.pack("<ii", W.shape[0], W.shape[1]))
            f.write(np.ascontiguousarray(W, "<f4").tobytes())
            f.write(b.astype("<f4").tobytes())
    return out_path


# ----------------------------------------------------------------------
# torchscript deployment
# ----------------------------------------------------------------------
def export_torchscript(ckpt_path: str, out_path: str) -> str:
    """Script the actor as a TorchScript module (libtorch-loadable)."""
    import torch
    import torch.nn as nn

    w = extract_actor(ckpt_path)
    n = int(w["num_layers"])

    class Actor(nn.Module):
        def __init__(self):
            super().__init__()
            mods: List[nn.Module] = []
            for i in range(n):
                k = w[f"layer_{i}_w"]
                lin = nn.Linear(k.shape[0], k.shape[1])
                # flax kernels are (in, out); torch weights are (out, in)
                lin.weight.data = torch.from_numpy(np.ascontiguousarray(k.T))
                lin.bias.data = torch.from_numpy(w[f"layer_{i}_b"].copy())
                mods += [lin, nn.ELU()]
            mu = nn.Linear(w["mu_w"].shape[0], w["mu_w"].shape[1])
            mu.weight.data = torch.from_numpy(np.ascontiguousarray(w["mu_w"].T))
            mu.bias.data = torch.from_numpy(w["mu_b"].copy())
            mods.append(mu)
            self.net = nn.Sequential(*mods)
            self.register_buffer("obs_mean", torch.from_numpy(w["obs_mean"].copy()))
            self.register_buffer("obs_std", torch.from_numpy(w["obs_std"].copy()))
            self.norm_clip = float(w["norm_clip"])
            self.num_obs = int(w["num_obs"])

        def forward(self, obs: "torch.Tensor") -> "torch.Tensor":
            x = obs[..., : self.num_obs]
            x = (x - self.obs_mean) / self.obs_std
            x = torch.clamp(x, -self.norm_clip, self.norm_clip)
            return torch.clamp(self.net(x), -1.0, 1.0)

    module = torch.jit.script(Actor().eval())
    module.save(out_path)
    return out_path


# ----------------------------------------------------------------------
# CLI
# ----------------------------------------------------------------------
def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a training checkpoint for deployment"
    )
    ap.add_argument("checkpoint", help="path to a .ckpt file")
    ap.add_argument(
        "--format", choices=["npz", "torchscript", "bin"], default="npz"
    )
    ap.add_argument("--out", default=None, help="output path")
    args = ap.parse_args(argv)

    ext = {"npz": ".npz", "torchscript": ".pt", "bin": ".bin"}[args.format]
    out = args.out or os.path.splitext(args.checkpoint)[0] + ext
    if args.format == "npz":
        export_npz(args.checkpoint, out)
    elif args.format == "bin":
        export_flat_binary(args.checkpoint, out)
    else:
        export_torchscript(args.checkpoint, out)
    print(f"Exported {args.format} policy: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
