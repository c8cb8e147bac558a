"""Self-convergence accuracy gates.

Replicates the reference's ``solar_system_convergence`` methodology
(ephemeris/tests/solar_system_convergence.rs:225-360): integrate the full
solar system for a year with the production fixed-step methods and compare
against the same method at half the step ("truth").  The reference asserts
the largest step achieving <10 m position error: QT12 -> 10 min,
Stormer13 -> 5 min, BlanesMoan14A -> 10 min (for its 33-body Horizons
fixture; here the bundled 32-body scene).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.integrators import fixed, get, multistep
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.ops import nbody

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"
YEAR_S = 365.0 * 86400.0


@pytest.fixture(scope="module")
def system():
    sc = scene.load_scene(SYSTEMS / "full_solar_system_2433282.5")
    return (
        jnp.asarray(sc.state.positions()),
        jnp.asarray(sc.state.velocities()),
        jnp.asarray(sc.state.mus()),
    )


def _integrate_elm2(name, pos, vel, mu, h, span):
    """Compensated (two-float) state, like the reference's Double<T> runs."""
    tab = get(name)
    accel = lambda t, y: nbody.pairwise_accel(y, mu)
    n = int(round(span / h))
    carry = jax.jit(lambda p, v: multistep.elm2_init_c(tab, accel, 0.0, p, v, h))(pos, vel)
    steps = n - tab.order

    @jax.jit
    def run(c):
        def body(cc, _):
            return multistep.elm2_step_c(tab, accel, h, cc), None
        c, _ = jax.lax.scan(body, c, None, length=steps)
        return c

    carry = run(carry)
    return np.asarray(carry.ys.hi[0]) + np.asarray(carry.ys.lo[0])


def _integrate_srkn(name, pos, vel, mu, h, span):
    """Compensated-state symplectic run (reference Double<T> equivalent)."""
    from ephemeris_explorer_tpu.integrators.multistep import _srkn_step_c
    from ephemeris_explorer_tpu.ops import eft

    tab = get(name)
    accel = lambda t, y: nbody.pairwise_accel(y, mu)
    n = int(round(span / h))

    @jax.jit
    def run(p, v):
        y = eft.from_float(p)
        dy = eft.from_float(v)
        ddy0 = accel(0.0, p)

        def body(c, _):
            t, y, dy, ddy = c
            t, y, dy, ddy = _srkn_step_c(tab, accel, t, y, dy, h, ddy if tab.fsal else None)
            return (t, y, dy, ddy), None

        (t, y, dy, _), _ = jax.lax.scan(body, (jnp.float64(0.0), y, dy, ddy0), None, length=n)
        return y.hi + y.lo

    return np.asarray(run(pos, vel))


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,integrate,h_minutes",
    [
        ("QuinlanTremaine12", _integrate_elm2, 10.0),
        ("Stormer13", _integrate_elm2, 5.0),
        ("BlanesMoan14A", _integrate_srkn, 10.0),
    ],
)
def test_convergence_gate(system, name, integrate, h_minutes):
    """At the reference's certified step size, error vs the h/2 run < 10 m."""
    pos, vel, mu = system
    span = YEAR_S
    h = h_minutes * 60.0
    y1 = integrate(name, pos, vel, mu, h, span)
    y2 = integrate(name, pos, vel, mu, h / 2.0, span)
    err_m = float(np.max(np.linalg.norm(y1 - y2, axis=-1))) * 1e3
    assert err_m < 10.0, f"{name} @ {h_minutes} min: {err_m:.3f} m vs h/2"
