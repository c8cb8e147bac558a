"""Pallas df64 pair kernel vs the f64 jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.ops import nbody
from ephemeris_explorer_tpu.ops.pallas_nbody import (
    HAVE_PALLAS,
    pairwise_accel,
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
