"""Perturbation hooks (ops/perturbations.py): physics validation.

The reference is Newtonian-only; these optional terms must (a) leave the
Newtonian path bit-identical when absent, (b) reproduce textbook secular
effects when enabled — the executable-accuracy-claim standard of
tools/accuracy_audit.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ephemeris_explorer_tpu.integrators import get, multistep
from ephemeris_explorer_tpu.ops import nbody, perturbations as perts

C = perts.C_LIGHT_KM_S
MU_SUN = 1.32712440041279419e11  # km^3/s^2 (DE440)


def test_schwarzschild_formula_pointwise():
    """Direct check of the 1PN term against the formula for one body."""
    pos = jnp.asarray([[0.0, 0.0, 0.0], [5.79e7, 0.0, 0.0]])
    vel = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 58.98, 0.0]])
    mu = jnp.asarray([MU_SUN, 22031.86855])
    f = perts.schwarzschild_1pn(central=0)
    acc = np.asarray(f(0.0, pos, vel, mu))
    r = 5.79e7
    v2 = 58.98**2
    coef = MU_SUN / (C**2 * r**3)
    expect = coef * np.array(
        [(4 * MU_SUN / r - v2) * r, 0.0, 0.0]
    )  # r.v = 0 on a circular-ish point
    np.testing.assert_allclose(acc[1], expect, rtol=1e-12)
    np.testing.assert_allclose(acc[0], 0.0)  # central body uncorrected


def test_j2_signs_and_magnitude():
    """J2: extra attraction in the equatorial plane, repulsion along the
    pole; magnitude (3/2) J2 mu R^2 / r^4 at the equator."""
    f = perts.j2_oblateness(0, perts.EARTH_J2, perts.EARTH_RADIUS_KM, (0, 0, 1))
    mu = jnp.asarray([398600.4355, 0.0])
    r = 384400.0
    # equatorial test point
    pos = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    vel = jnp.zeros((2, 3))
    a_eq = np.asarray(f(0.0, pos, vel, mu))[1]
    k = 1.5 * perts.EARTH_J2 * 398600.4355 * perts.EARTH_RADIUS_KM**2 / r**4
    np.testing.assert_allclose(a_eq, [-k, 0.0, 0.0], rtol=1e-12)
    # polar test point: (5 cos^2 - 1) r_hat - 2 cos z_hat = 4 z - 2 z = +2k z
    pos_p = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    a_pol = np.asarray(f(0.0, pos_p, vel, mu))[1]
    np.testing.assert_allclose(a_pol, [0.0, 0.0, 2 * k], rtol=1e-12)


def _lrl_vector(pos, vel, mu):
    """Laplace-Runge-Lenz eccentricity vector (points at perihelion)."""
    h = np.cross(pos, vel)
    e = np.cross(vel, h) / mu - pos / np.linalg.norm(pos)
    return e


def test_mercury_perihelion_precession():
    """Sun+Mercury two-body with the 1PN hook precesses the perihelion at
    6 pi mu / (c^2 a (1 - e^2)) per orbit — Mercury's famous 43"/century
    (the single largest term missing from the reference's model,
    jpl_comparison.rs:110 '< 200 km' Mercury budget)."""
    a = 5.7909e7
    e = 0.20563
    # perihelion state, Sun at origin
    rp = a * (1 - e)
    vp = np.sqrt(MU_SUN * (2 / rp - 1 / a))
    pos0 = np.array([[0.0, 0.0, 0.0], [rp, 0.0, 0.0]])
    vel0 = np.array([[0.0, 0.0, 0.0], [0.0, vp, 0.0]])
    mu = np.array([MU_SUN, 22031.86855])

    spec = (perts.spec_schwarzschild(0),)
    pert = perts.build(spec)
    mu_dev = jnp.asarray(mu)

    def accel(t, y, dy):
        return nbody.pairwise_accel(y, mu_dev) + pert(t, y, dy, mu_dev)

    accel.needs_velocity = True

    tab = get("QuinlanTremaine12")
    h = 3600.0
    years = 4.0
    n = int(years * 365.25 * 86400 / h)
    carry = multistep.elm2_init(tab, accel, 0.0, jnp.asarray(pos0), jnp.asarray(vel0), h)

    @jax.jit
    def run(c):
        def body(cc, _):
            return multistep.elm2_step(tab, accel, h, cc), None

        return jax.lax.scan(body, c, None, length=n - tab.order)[0]

    carry = run(carry)
    pos1 = np.asarray(carry.ys[0])
    vel1 = np.asarray(carry.dy)

    e0 = _lrl_vector(pos0[1], vel0[1], MU_SUN)
    e1 = _lrl_vector(pos1[1] - pos1[0], vel1[1] - vel1[0], MU_SUN)
    cosang = np.dot(e0, e1) / (np.linalg.norm(e0) * np.linalg.norm(e1))
    measured = np.arccos(np.clip(cosang, -1, 1))

    period = 2 * np.pi * np.sqrt(a**3 / MU_SUN)
    n_orbits = years * 365.25 * 86400 / period
    expected = 6 * np.pi * MU_SUN / (C**2 * a * (1 - e**2)) * n_orbits
    # 43"/century = ~1.7" over 4 years; allow 10%
    assert abs(measured - expected) / expected < 0.10, (measured, expected)


def test_newtonian_path_unchanged():
    """Without perturbation specs the generation path is bit-identical to
    before the hook existed (accel stays the two-argument Newtonian RHS)."""
    from ephemeris_explorer_tpu import Duration
    from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
    from ephemeris_explorer_tpu.io.scene import load_scene
    from pathlib import Path

    systems = Path(__file__).resolve().parent.parent / "systems"
    sc = load_scene(systems / "sun_earth_moon_2433282.5")
    span = Duration.from_days(30.0)
    e1 = generate_ephemeris(sc.state, sc.settings, span, precision="f64")
    e2 = generate_ephemeris(sc.state, sc.settings, span, precision="f64", perturbations=())
    for n in e1.names:
        np.testing.assert_array_equal(e1[n].coeffs, e2[n].coeffs)


def test_pn_generation_changes_trajectory():
    """With the 1PN spec the generated ephemeris differs (physics applied)."""
    from ephemeris_explorer_tpu import Duration
    from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
    from ephemeris_explorer_tpu.io.scene import load_scene
    from pathlib import Path

    systems = Path(__file__).resolve().parent.parent / "systems"
    sc = load_scene(systems / "sun_earth_moon_2433282.5")
    span = Duration.from_days(30.0)
    names = [b.name for b in sc.state.bodies]
    spec = (perts.spec_schwarzschild(names.index("Sun")),)
    e1 = generate_ephemeris(sc.state, sc.settings, span, precision="f64")
    e2 = generate_ephemeris(
        sc.state, sc.settings, span, precision="f64", perturbations=spec
    )
    t = sc.state.epoch.as_offset_seconds() + 25 * 86400.0
    d = np.linalg.norm(e1["Earth"].position(t) - e2["Earth"].position(t))
    # 1PN displaces Earth by O(10 km)/month (mean-motion shift)
    assert 1e-3 < d < 100.0, d
