"""Integrator core validation.

Mirrors the reference's validation strategy: doc-test style exp-decay checks
(integration/src/lib.rs:32-93) and Kepler-orbit work-precision checks
(integration/examples/plot_work_precision.rs).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.integrators import adaptive, fixed, get, multistep
from ephemeris_explorer_tpu.ops import nbody


def test_rk4_exp_decay():
    """y' = -y from 1.0 over [0, 10]; reference doc-test uses h=0.01."""
    tab = get("RK4")
    f = lambda t, y: -y
    t, y = jnp.asarray(0.0), jnp.asarray(1.0)
    h = 0.01

    def body(carry, _):
        t, y = carry
        t, y, _ = fixed.erk_step(tab, f, t, y, h)
        return (t, y), None

    (t, y), _ = jax.lax.scan(body, (t, y), None, length=1000)
    assert abs(float(t) - 10.0) < 1e-9
    assert abs(float(y) - math.exp(-10.0)) < 1e-10


def test_dp54_adaptive_exp_decay():
    tab = get("DormandPrince54")
    f = lambda t, y: -y
    params = adaptive.AdaptiveParams(h_init=0.1, tol_pos=1e-10, tol_vel=1e-10, n_max=100000)

    def norm(_y, e):
        return jnp.max(jnp.abs(e)) / 1e-10

    st = adaptive.init_state(tab, f, 0.0, jnp.asarray(1.0), params)
    bound = 10.0
    step = jax.jit(lambda s: adaptive.advance(tab, f, params, norm, s, bound))
    for _ in range(100000):
        st, h, status = step(st)
        if int(status) != adaptive.OK:
            assert int(status) == adaptive.BOUND_REACHED
            break
    assert abs(float(st.t) - 10.0) < 1e-9
    assert abs(float(st.y) - math.exp(-10.0)) < 1e-8


MU_EARTH = 398600.4355070226  # km^3/s^2


def _circular_two_body():
    """Massless-satellite-style circular orbit expressed as a 2-body problem."""
    r = 7000.0  # km
    # Give both bodies mass so the pairwise kernel is exercised; mu2 tiny.
    mu = np.array([MU_EARTH, 1e-12])
    v = math.sqrt(MU_EARTH / r)
    pos = np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    vel = np.array([[0.0, 0.0, 0.0], [0.0, v, 0.0]])
    period = 2 * math.pi * math.sqrt(r**3 / MU_EARTH)
    return pos, vel, mu, r, period


@pytest.mark.parametrize("name", ["BlanesMoan6B", "BlanesMoan14A", "McLachlanO4", "Ruth"])
def test_srkn_kepler_energy(name):
    tab = get(name)
    pos, vel, mu, r, period = _circular_two_body()
    mu_j = jnp.asarray(mu)
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)
    h = period / 500
    y, dy = jnp.asarray(pos), jnp.asarray(vel)
    e0 = float(nbody.energy(y, dy, mu_j))

    def body(carry, _):
        t, y, dy, ddy = carry
        t, y, dy, ddy = fixed.srkn_step(tab, accel, t, y, dy, h, ddy if tab.fsal else None)
        return (t, y, dy, ddy), None

    ddy0 = accel(0.0, y)
    (t, y, dy, _), _ = jax.lax.scan(body, (jnp.asarray(0.0), y, dy, ddy0), None, length=500)
    e1 = float(nbody.energy(y, dy, mu_j))
    # symplectic methods conserve energy to truncation error
    assert abs((e1 - e0) / e0) < 1e-8
    # one full period: back to the start
    err = float(jnp.linalg.norm(y[1] - jnp.asarray(pos)[1]))
    assert err < 5e-3 * r


def test_qt12_circular_orbit_accuracy():
    """QT12 on a circular orbit: machine-precision-level radius stability."""
    tab = get("QuinlanTremaine12")
    pos, vel, mu, r, period = _circular_two_body()
    mu_j = jnp.asarray(mu)
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)
    h = period / 300.0

    carry = multistep.elm2_init(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)

    def body(c, _):
        c = multistep.elm2_step(tab, accel, h, c)
        return c, None

    n = 3 * 300 - tab.order  # three periods total including startup
    carry, _ = jax.lax.scan(body, carry, None, length=n)
    assert abs(float(carry.t) - 3 * 300 * h) < 1e-6
    rel = jnp.asarray(carry.ys[0][1] - carry.ys[0][0])
    radius = float(jnp.linalg.norm(rel))
    assert abs(radius - r) / r < 1e-10
    # velocity from Cowell reconstruction: magnitude matches circular speed
    vrel = float(jnp.linalg.norm(carry.dy[1] - carry.dy[0]))
    assert abs(vrel - math.sqrt(MU_EARTH / r)) / vrel < 1e-9


def test_qt12_matches_high_accuracy_truth():
    """QT12 position vs a tight-tolerance DP87 run on an eccentric orbit."""
    tab = get("QuinlanTremaine12")
    pos, vel, mu, r, period = _circular_two_body()
    vel[1, 1] *= 1.1  # eccentric
    mu_j = jnp.asarray(mu)
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)
    h = period / 2000.0
    steps = 2000

    carry = multistep.elm2_init(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)

    def body(c, _):
        return multistep.elm2_step(tab, accel, h, c), None

    carry, _ = jax.lax.scan(body, carry, None, length=steps - tab.order)

    # truth: adaptive DP87 at 1e-13
    tab_t = get("DormandPrince87")
    f = lambda t, y: (y[1], nbody.pairwise_accel(y[0], mu_j))
    params = adaptive.AdaptiveParams(h_init=10.0, tol_pos=1e-10, tol_vel=1e-13, n_max=10**6)
    norm = adaptive.abs_tol_norm(1e-10, 1e-13)
    st = adaptive.init_state(tab_t, f, 0.0, (jnp.asarray(pos), jnp.asarray(vel)), params)
    bound = steps * h
    step = jax.jit(lambda s: adaptive.advance(tab_t, f, params, norm, s, bound))
    while True:
        st, hh, status = step(st)
        if int(status) != adaptive.OK:
            break
    truth = st.y[0]
    err = float(jnp.max(jnp.linalg.norm(carry.ys[0] - truth, axis=-1)))
    assert err < 1e-6 * r, err


@pytest.mark.parametrize("name", ["AdamsBashforth2", "AdamsBashforth4", "AdamsBashforth6"])
def test_elm1_adams_bashforth(name):
    """First-order multistep on y' = -y: converges at the expected order."""
    tab = get(name)
    f = lambda t, y: -y

    def run(steps):
        h = 10.0 / steps
        carry = multistep.elm1_init(tab, f, 0.0, jnp.asarray(1.0), h)

        def body(c, _):
            return multistep.elm1_step(tab, f, h, c), None

        carry, _ = jax.lax.scan(body, carry, None, length=steps - tab.order)
        return abs(float(carry.ys[0]) - math.exp(-10.0))

    e1, e2 = run(400), run(800)
    assert e1 < 1e-4
    # halving h reduces error by ~2^order
    assert e1 / max(e2, 1e-16) > 2 ** (tab.order - 1)


def test_elm2_lazy_velocity_equivalence():
    """with_velocity=False + elm2_velocity at the boundary reproduces the
    eager carry bitwise, for both the f64 and the expansion state."""
    tab = get("QuinlanTremaine12")
    pos, vel, mu, r, period = _circular_two_body()
    mu_j = jnp.asarray(mu)
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)
    h = period / 300.0
    n = 50

    # plain f64 state
    c0 = multistep.elm2_init(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    eager, _ = jax.lax.scan(
        lambda c, _: (multistep.elm2_step(tab, accel, h, c), None), c0, None, length=n
    )
    lazy, _ = jax.lax.scan(
        lambda c, _: (
            multistep.elm2_step(tab, accel, h, c, with_velocity=False),
            None,
        ),
        c0, None, length=n,
    )
    lazy = lazy._replace(dy=multistep.elm2_velocity(tab, lazy, h))
    for a, b in zip(jax.tree_util.tree_leaves(eager), jax.tree_util.tree_leaves(lazy)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # expansion state
    q0 = multistep.elm2_init_q(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    eager_q, _ = jax.lax.scan(
        lambda c, _: (multistep.elm2_step_q(tab, accel, h, c), None), q0, None, length=n
    )
    lazy_q, _ = jax.lax.scan(
        lambda c, _: (
            multistep.elm2_step_q(tab, accel, h, c, with_velocity=False),
            None,
        ),
        q0, None, length=n,
    )
    lazy_q = lazy_q._replace(dy=multistep.elm2_velocity_q(tab, lazy_q, h))
    # positions (limb tuple), force ring and t are bitwise identical; dy is
    # the same formula compiled in two places (inside vs outside the scan),
    # where XLA's FMA contraction may differ by an ULP — allow that only
    np.testing.assert_array_equal(np.asarray(eager_q.t), np.asarray(lazy_q.t))
    for a, b in zip(eager_q.ys, lazy_q.ys):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(eager_q.ddys), np.asarray(lazy_q.ddys))
    np.testing.assert_allclose(
        np.asarray(eager_q.dy), np.asarray(lazy_q.dy), rtol=1e-14, atol=1e-18
    )
