"""Pallas df64 pair kernel vs the f64 jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.ops import nbody
from ephemeris_explorer_tpu.ops.pallas_nbody import (
    HAVE_PALLAS,
    pairwise_accel,
    pairwise_accel_ensemble,
    split_f64,
)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_accel_matches_f64():
    rng = np.random.default_rng(3)
    n = 256
    pos = rng.normal(size=(n, 3)) * 1e8
    mu = rng.uniform(1e3, 1e11, size=n)

    ref = np.asarray(nbody.pairwise_accel(jnp.asarray(pos), jnp.asarray(mu)))
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))
    out = np.asarray(
        pairwise_accel(jnp.asarray(pos), mu_hi, mu_lo, interpret=True,
                       tile_rows=64, tile_cols=128)
    )
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) / scale < 1e-12


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_ensemble_kernel_matches_per_member():
    """The fused (E, N/TR) grid gives the same result as the per-member
    kernel for every ensemble member."""
    rng = np.random.default_rng(5)
    e, n = 3, 64
    pos = rng.normal(size=(e, n, 3)) * 1e8
    mu = rng.uniform(1e3, 1e11, size=n)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))

    out = np.asarray(
        pairwise_accel_ensemble(
            jnp.asarray(pos), mu_hi, mu_lo, interpret=True,
            tile_rows=32, tile_cols=64,
        )
    )
    for k in range(e):
        ref = np.asarray(
            pairwise_accel(jnp.asarray(pos[k]), mu_hi, mu_lo, interpret=True,
                           tile_rows=32, tile_cols=64)
        )
        np.testing.assert_array_equal(out[k], ref)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_three_limb_close_pair_accuracy():
    """Error-free differencing: close-pair force beats the two-limb kernel."""
    from fractions import Fraction

    import jax

    from ephemeris_explorer_tpu.ops import expansion as ex
    from ephemeris_explorer_tpu.ops.pallas_nbody import pairwise_accel_limbs

    # a Mars+Phobos-like close pair far from the origin, padded to 8 bodies
    n = 8
    pos = np.zeros((n, 3))
    pos[:, 0] = np.linspace(1e8, 4e8, n)
    pos[1] = pos[0] + np.array([9377.0, 1234.5678901, 0.0])  # "Phobos"
    mu = np.full(n, 1e3)
    mu[0] = 4.28e4

    # positions carry MORE than f64 precision (expansion state): a third
    # limb holds a sub-f64 offset the 2-limb kernel cannot represent
    jpos = jnp.asarray(pos)
    limbs = list(ex.from_f64(jpos))
    delta = np.zeros((n, 3))
    delta[1, 1] = 3.1415e-9  # ~3 micrometre offset on "Phobos"
    limbs[2] = jnp.asarray(np.asarray(limbs[2], dtype=np.float64) + delta,
                           jnp.float32)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))
    out3 = np.asarray(
        pairwise_accel_limbs(*[np.asarray(l) for l in limbs[:3]], mu_hi, mu_lo,
                             interpret=True, tile_rows=8, tile_cols=8)
    )

    # exact rational reference for the close-pair row, from the LIMBS
    def limb_pos(i):
        return [
            sum(Fraction(float(np.asarray(l, dtype=np.float64)[i][k])) for l in limbs[:3])
            for k in range(3)
        ]

    def exact_accel(i):
        acc = [Fraction(0)] * 3
        pi = limb_pos(i)
        for j in range(n):
            if j == i:
                continue
            pj = limb_pos(j)
            d = [a - b for a, b in zip(pj, pi)]
            r2 = sum(x * x for x in d)
            inv_r3 = Fraction(float(float(r2) ** -1.5))  # f64 rounding fine here
            for k in range(3):
                acc[k] += Fraction(float(mu[j])) * d[k] * inv_r3
        return np.array([float(a) for a in acc])

    truth = exact_accel(1)
    rel3 = np.max(np.abs(out3[1] - truth)) / np.max(np.abs(truth))
    assert rel3 < 1e-11, rel3

    # the 2-limb kernel cannot see the third-limb offset at all
    out2 = np.asarray(
        pairwise_accel(jpos, mu_hi, mu_lo, interpret=True, tile_rows=8, tile_cols=8)
    )
    rel2 = np.max(np.abs(out2[1] - truth)) / np.max(np.abs(truth))
    assert rel3 < rel2
