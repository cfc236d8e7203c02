"""Batched small-SPD linear solves, Pallas-accelerated on TPU.

The implicit-PD dynamics solve `(M + h*Kd + h^2*Kp) v' = rhs` is a batched
26x26 SPD system -- the hot op of the whole simulator (60% of step time when
lowered through LAPACK-style batched Cholesky, which tiles terribly on TPU:
each small factorization serializes on the vector units).

The Pallas kernel turns the problem sideways: the ENV dimension rides the
TPU lanes while the 26x26 factorization is fully unrolled as scalar-indexed
vector ops. Data is laid out (n, n, N) so A[i, j] is a lane-vector over a
block of envs; one grid step factors `block` envs simultaneously with
~n^3/6 fused multiply-adds, all in VMEM.

Falls back to `jax.scipy.linalg.solve` off-TPU (CPU tests, interpreters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cholesky_solve_kernel(a_ref, b_ref, x_ref, n: int):
    """Unrolled Cholesky + fwd/back substitution.

    a_ref: (n, n, B) SPD matrices, env block on lanes.
    b_ref: (n, B) right-hand sides.
    x_ref: (n, B) solutions.
    """
    # factorize: L lower-triangular, kept as registers (lists of lane vectors)
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = a_ref[j, j, :]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jax.lax.rsqrt(s)
        inv_d[j] = d
        L[j][j] = s * d  # sqrt(s)
        for i in range(j + 1, n):
            v = a_ref[i, j, :]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * d
    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        v = b_ref[i, :]
        for k in range(i):
            v = v - L[i][k] * y[k]
        y[i] = v * inv_d[i]
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        v = y[i]
        for k in range(i + 1, n):
            v = v - L[k][i] * x[k]
        x[i] = v * inv_d[i]
    for i in range(n):
        x_ref[i, :] = x[i]


@functools.partial(jax.jit, static_argnames=("block",))
def spd_solve(A: jnp.ndarray, b: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Solve batched SPD systems A x = b.

    A: (N, n, n), b: (N, n) -> x: (N, n). Uses the Pallas lane-vectorized
    kernel on TPU; jax.scipy elsewhere.
    """
    if jax.default_backend() != "tpu":
        return jax.scipy.linalg.solve(A, b[..., None], assume_a="pos")[..., 0]
    return _spd_solve_pallas(A, b, block)


@jax.custom_batching.custom_vmap
def spd_solve_one(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Single SPD solve (n, n) x (n,) with a custom vmap rule that routes the
    whole batch into the Pallas kernel. This lets the simulator stay written
    single-world under `vmap` while the hot solve lowers to one batched
    lane-vectorized kernel instead of N LAPACK factorizations."""
    return jax.scipy.linalg.solve(A, b[:, None], assume_a="pos")[:, 0]


@spd_solve_one.def_vmap
def _spd_solve_one_vmap(axis_size, in_batched, A, b):
    a_batched, b_batched = in_batched
    if not a_batched:
        A = jnp.broadcast_to(A, (axis_size,) + A.shape)
    if not b_batched:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    return spd_solve(A, b), True


def _spd_solve_pallas(A: jnp.ndarray, b: jnp.ndarray, block: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, n, _ = A.shape
    # pad env count to a block multiple (identity systems in the padding)
    pad = (-N) % block
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), dtype=b.dtype)], axis=0)
    npad = N + pad

    a_t = jnp.transpose(A, (1, 2, 0))   # (n, n, Npad) — envs on lanes
    b_t = jnp.transpose(b, (1, 0))      # (n, Npad)

    x_t = pl.pallas_call(
        functools.partial(_cholesky_solve_kernel, n=n),
        grid=(npad // block,),
        in_specs=[
            pl.BlockSpec((n, n, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, npad), A.dtype),
    )(a_t, b_t)

    x = jnp.transpose(x_t, (1, 0))
    return x[:N] if pad else x
