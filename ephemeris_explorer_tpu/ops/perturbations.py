"""Optional perturbation accelerations beyond Newtonian point-mass gravity.

The reference models Newtonian point masses ONLY
(``ephemeris/src/propagators/nbody.rs:16-39``); its published error budget
vs JPL Horizons is <100 km/yr for inner planets and <200 km for Mercury
precisely because of the missing physics (``jpl_comparison.rs:108-114``
comments).  These OPTIONAL hooks (off by default — parity mode stays
Newtonian) let the engine beat that budget on real-data oracles:

* :func:`schwarzschild_1pn` — the dominant general-relativistic correction
  from one central mass (the harmonic-gauge two-body 1PN term, the leading
  piece of the EIH equations JPL's DE integrations use):

      a += mu_c/(c^2 r^3) * [ (4 mu_c / r - v^2) r_vec + 4 (r_vec . v_vec) v_vec ]

  with r_vec/v_vec the position/velocity relative to the central body.
  Secular effects: perihelion precession (43"/cy for Mercury) and an
  O(mu_c/(c^2 a)) mean-motion shift that dominates the reference's
  along-track drift vs JPL (~60 km/yr for Earth, measured with the 76-year
  endpoint oracle in tools/accuracy_audit.py).

* :func:`j2_oblateness` — degree-2 zonal harmonic of an oblate body acting
  on every other body:

      a += -(3/2) J2 mu_b R_b^2 / r^4 * [ (1 - 5 (r_hat.z_hat)^2) r_hat + 2 (r_hat.z_hat) z_hat ]

  with z_hat the body's spin axis (ICRF).

Perturbations are declared as hashable specs (kind, params) so jitted chunk
functions cache across propagator instances; :func:`build` turns a spec
tuple into a single ``pert(t, pos, vel, mu) -> acc`` closure.

Velocity dependence note: the production integrators are Stoermer-type
(y'' = f(t, y)); the 1PN term receives the carry velocity lagged by one
step.  The induced error is O(h * a / v) of a term that is itself ~1e-8 of
the total force — ~1e-12 relative, far below integrator truncation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

C_LIGHT_KM_S = 299792.458

# IAU 2015 nominal values (km / dimensionless)
EARTH_J2 = 1.08262668e-3
EARTH_RADIUS_KM = 6378.1366
SUN_J2 = 2.211e-7
SUN_RADIUS_KM = 695_700.0
# ICRF unit vector of the Earth's mean pole at J2000 (IAU: RA 0.0, Dec 90.0
# in equatorial coords; expressed in the ICRF/ecliptic-free frame used by
# Horizons VECTORS REF_PLANE=FRAME, i.e. the Earth equatorial frame itself)
EARTH_POLE_ICRF = (0.0, 0.0, 1.0)


def spec_schwarzschild(central_index: int) -> tuple:
    return ("schwarzschild_1pn", ("central", int(central_index)))


def spec_j2(
    body_index: int,
    j2: float,
    radius_km: float,
    pole=EARTH_POLE_ICRF,
) -> tuple:
    return (
        "j2",
        ("body", int(body_index)),
        ("j2", float(j2)),
        ("radius", float(radius_km)),
        ("pole", tuple(float(p) for p in pole)),
    )


def schwarzschild_1pn(central: int):
    """1PN correction relative to body `central` for every other body."""

    c2 = C_LIGHT_KM_S**2

    def pert(t, pos, vel, mu):
        rc = pos - pos[central]                      # (N, 3)
        vc = vel - vel[central]
        r2 = jnp.sum(rc * rc, axis=-1)               # (N,)
        n = pos.shape[0]
        own = jnp.arange(n) == central
        r2 = jnp.where(own, 1.0, r2)
        inv_r = 1.0 / jnp.sqrt(r2)
        mu_c = mu[central]
        coef = mu_c / c2 * (inv_r * inv_r * inv_r)   # mu/(c^2 r^3)
        v2 = jnp.sum(vc * vc, axis=-1)
        rv = jnp.sum(rc * vc, axis=-1)
        term = (4.0 * mu_c * inv_r - v2)[:, None] * rc + 4.0 * rv[:, None] * vc
        acc = coef[:, None] * term
        return jnp.where(own[:, None], 0.0, acc)

    return pert


def j2_oblateness(body: int, j2: float, radius_km: float, pole):
    """Degree-2 zonal acceleration of oblate `body` on every other body."""

    z = jnp.asarray(np.asarray(pole, dtype=np.float64))
    z = z / jnp.linalg.norm(z)
    k = 1.5 * j2 * radius_km**2

    def pert(t, pos, vel, mu):
        rc = pos - pos[body]
        r2 = jnp.sum(rc * rc, axis=-1)
        n = pos.shape[0]
        own = jnp.arange(n) == body
        r2 = jnp.where(own, 1.0, r2)
        inv_r = 1.0 / jnp.sqrt(r2)
        r_hat = rc * inv_r[:, None]
        cosz = r_hat @ z                               # (N,)
        coef = k * mu[body] * inv_r**4                 # (3/2) J2 mu R^2 / r^4
        term = (5.0 * cosz**2 - 1.0)[:, None] * r_hat - 2.0 * cosz[:, None] * z[None, :]
        acc = coef[:, None] * term
        return jnp.where(own[:, None], 0.0, acc)

    return pert


def build(specs: tuple):
    """Spec tuple -> single pert(t, pos, vel, mu) closure (None if empty)."""
    if not specs:
        return None
    ps = []
    for spec in specs:
        kind, *params = spec
        kv = dict(params)
        if kind == "schwarzschild_1pn":
            ps.append(schwarzschild_1pn(kv["central"]))
        elif kind == "j2":
            ps.append(j2_oblateness(kv["body"], kv["j2"], kv["radius"], kv["pole"]))
        else:
            raise ValueError(f"unknown perturbation kind {kind!r}")

    def pert(t, pos, vel, mu):
        acc = ps[0](t, pos, vel, mu)
        for p in ps[1:]:
            acc = acc + p(t, pos, vel, mu)
        return acc

    return pert
