"""Fixed-step Runge-Kutta steppers as pure JAX functions.

Rebuilds the reference's fixed integrators (``integration/src/runge_kutta``)
as functional ``step(state) -> state`` transforms suitable for ``lax.scan``:

* :func:`erk_step` - explicit RK for y' = f(t, y) (explicit.rs:73-106)
* :func:`srkn_step` - symplectic kick-drift Nystrom for y'' = f(t, y)
  (symplectic.rs:70-102), FSAL handled by threading the last acceleration
  through the carry instead of a mutable stage cache.

States are pytrees; `y` may be any pytree of arrays (e.g. an (N, 3) position
array, or a (pos, vel) tuple for first-order spacecraft states).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .methods import ERKTableau, SRKNTableau

tree_map = jax.tree_util.tree_map


def _axpy(c, x, y):
    """y + c * x over pytrees (c a scalar)."""
    return tree_map(lambda xi, yi: yi + c * xi, x, y)


def eval_accel(accel, t, y, dy):
    """Evaluate a second-order RHS.

    An ``accel`` marked with ``needs_velocity = True`` also receives the
    current velocity — used for weak velocity-dependent perturbations
    (ops/perturbations.py, e.g. the 1PN term) while the Stoermer-type state
    update itself remains y'' = f(t, y)."""
    if getattr(accel, "needs_velocity", False):
        return accel(t, y, dy)
    return accel(t, y)


def erk_step(tab: ERKTableau, f, t, y, h, k0=None):
    """One explicit RK step.

    f(t, y) -> dy/dt over the pytree y.
    Returns (t_next, y_next, ks) where ks is the list of stage derivatives
    (ks[-1] is a valid FSAL cache for the next step when tab.fsal).
    If ``k0`` is given and the tableau is FSAL, stage 0 reuses it.
    """
    ks = []
    for s in range(tab.stages):
        if s == 0 and tab.fsal and k0 is not None:
            ks.append(k0)
            continue
        yi = y
        for j in range(s):
            if tab.a[s, j] != 0.0:
                yi = _axpy(h * tab.a[s, j], ks[j], yi)
        ti = t + h * tab.c[s]
        ks.append(f(ti, yi))
    y_next = y
    for s in range(tab.stages):
        if tab.b[s] != 0.0:
            y_next = _axpy(h * tab.b[s], ks[s], y_next)
    return t + h, y_next, ks


def erk_error(tab: ERKTableau, ks, h):
    """Embedded error estimate e = h * sum_i (b_i - b*_i) k_i (explicit.rs:124-132)."""
    err = None
    for s in range(tab.stages):
        if tab.e[s] == 0.0:
            continue
        if err is None:
            err = tree_map(lambda k: (h * tab.e[s]) * k, ks[s])
        else:
            err = _axpy(h * tab.e[s], ks[s], err)
    return err


def srkn_step(tab: SRKNTableau, accel, t, y, dy, h, ddy0=None):
    """One symplectic kick-drift step for y'' = accel(t, y).

    Follows symplectic.rs:70-102: per stage s, optionally evaluate
    ddy = accel(t + c_s h, y), then dy += ddy * h * B[s]; y += dy * h * A[s].

    FSAL: when ``tab.fsal`` and ``ddy0`` is provided, stage 0 reuses ``ddy0``
    (which must equal accel(t, y); valid because the last stage of an FSAL
    SRKN tableau has A = 0 so the position is unchanged after its eval).
    Returns (t_next, y_next, dy_next, ddy_last) where ddy_last is the FSAL
    cache for the next step.
    """
    ddy = None
    for s in range(tab.stages):
        if s == 0 and tab.fsal and ddy0 is not None:
            ddy = ddy0
        else:
            ddy = eval_accel(accel, t + h * tab.c[s], y, dy)
        if tab.b[s] != 0.0:
            dy = _axpy(h * tab.b[s], ddy, dy)
        if tab.a[s] != 0.0:
            y = _axpy(h * tab.a[s], dy, y)
    return t + h, y, dy, ddy


def erkn_step(tab, accel, t, y, dy, h, dk0=None):
    """One explicit RK-Nystrom step for y'' = accel(t, y).

    Follows nystrom/explicit.rs:73-121.  Returns (t', y', dy', dks).
    """
    dks = []
    for s in range(tab.stages):
        if s == 0 and tab.fsal and dk0 is not None:
            dks.append(dk0)
            continue
        yi = tree_map(lambda yy, dd: yy + dd * (h * tab.c[s]), y, dy)
        for j in range(s):
            if tab.a[s, j] != 0.0:
                yi = _axpy(h * h * tab.a[s, j], dks[j], yi)
        dks.append(accel(t + h * tab.c[s], yi))
    y_next = tree_map(lambda yy, dd: yy + dd * h, y, dy)
    dy_next = dy
    for s in range(tab.stages):
        if tab.bp[s] != 0.0:
            y_next = _axpy(h * h * tab.bp[s], dks[s], y_next)
        if tab.bv[s] != 0.0:
            dy_next = _axpy(h * tab.bv[s], dks[s], dy_next)
    return t + h, y_next, dy_next, dks


def erkng_step(tab, accel, t, y, dy, h, dk0=None):
    """One generalized Nystrom step for y'' = accel(t, y, y').

    Follows nystrom/explicit_generalized.rs:77-136.
    """
    dks = []
    for s in range(tab.stages):
        if s == 0 and tab.fsal and dk0 is not None:
            dks.append(dk0)
            continue
        yi = tree_map(lambda yy, dd: yy + dd * (h * tab.c[s]), y, dy)
        dyi = dy
        for j in range(s):
            if tab.ap[s, j] != 0.0:
                yi = _axpy(h * h * tab.ap[s, j], dks[j], yi)
            if tab.av[s, j] != 0.0:
                dyi = _axpy(h * tab.av[s, j], dks[j], dyi)
        dks.append(accel(t + h * tab.c[s], yi, dyi))
    y_next = tree_map(lambda yy, dd: yy + dd * h, y, dy)
    dy_next = dy
    for s in range(tab.stages):
        if tab.bp[s] != 0.0:
            y_next = _axpy(h * h * tab.bp[s], dks[s], y_next)
        if tab.bv[s] != 0.0:
            dy_next = _axpy(h * tab.bv[s], dks[s], dy_next)
    return t + h, y_next, dy_next, dks


def nystrom_error(tab, dks, h):
    """(e_y, e_dy) embedded error estimates for ERKN/ERKNG tableaux."""
    e_y = None
    e_dy = None
    for s in range(tab.stages):
        if tab.ep[s] != 0.0:
            e_y = (tree_map(lambda k: (h * h * tab.ep[s]) * k, dks[s])
                   if e_y is None else _axpy(h * h * tab.ep[s], dks[s], e_y))
        if tab.ev[s] != 0.0:
            e_dy = (tree_map(lambda k: (h * tab.ev[s]) * k, dks[s])
                    if e_dy is None else _axpy(h * tab.ev[s], dks[s], e_dy))
    zero = tree_map(jnp.zeros_like, dks[0])
    return (zero if e_y is None else e_y), (zero if e_dy is None else e_dy)
