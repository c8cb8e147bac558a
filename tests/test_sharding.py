"""Sharded kernels on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.integrators import get
from ephemeris_explorer_tpu.ops import nbody
from ephemeris_explorer_tpu.parallel import sharding as sh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_rowsharded_accel_matches():
    mesh = sh.make_mesh(data=1, model=8)
    rng = np.random.default_rng(0)
    n = 64
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 1e6)
    mu = jnp.asarray(rng.uniform(1e3, 1e5, n))
    p = jax.device_put(pos, jax.NamedSharding(mesh, jax.P("model", None)))
    m = jax.device_put(mu, jax.NamedSharding(mesh, jax.P("model")))
    out = sh.pairwise_accel_rowsharded(mesh, p, m)
    ref = nbody.pairwise_accel(pos, mu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_sharded_ensemble_step_matches_unsharded():
    mesh = sh.make_mesh(data=2, model=4)
    tab = get("QuinlanTremaine12")
    rng = np.random.default_rng(1)
    e, n = 4, 32
    pos = rng.normal(size=(e, n, 3)) * 1e6
    vel = rng.normal(size=(e, n, 3))
    mu = rng.uniform(1e3, 1e5, n)
    h = 600.0

    carry = sh.init_ensemble_carry(mesh, tab, mu, 0.0, pos, vel, h)
    step = sh.make_sharded_ensemble_step(mesh, tab, mu, h)
    out = step(carry)

    # unsharded reference
    from ephemeris_explorer_tpu.integrators.multistep import elm2_init, elm2_step

    mu_j = jnp.asarray(mu)
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)
    ref = jax.vmap(
        lambda p, v: elm2_step(tab, accel, h, elm2_init(tab, accel, 0.0, p, v, h))
    )(jnp.asarray(pos), jnp.asarray(vel))
    np.testing.assert_allclose(np.asarray(out.ys[0]), np.asarray(ref.ys[0]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.dy), np.asarray(ref.dy), rtol=1e-10)
