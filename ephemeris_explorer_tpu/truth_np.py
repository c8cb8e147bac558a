"""Pure-numpy double-double (dd) truth integrator for the accuracy harness.

Why numpy and not jit: XLA:CPU fails to compile the FLAT two-float force
graph in practical time/memory — ``jax.jit(ops.nbody.pairwise_accel_dd)``
at N=32 ran >60 min / >28 GB RSS before being killed (LLVM-side pathology
on the ~200-op EFT chain once the whole pair grid fuses into one kernel;
the same graph wrapped in the startup's ``lax.scan`` bodies compiles in
seconds, which is how ``elm2_init_cf`` still works).  The identical
algorithms in numpy cost ~1 ms/step at N=32, fast enough to run the
10-year dd-force truth in minutes.

Correctness substrate: the error-free transforms used here (Knuth
``two_sum``, Dekker ``split``/``two_prod``) are exact on any strict IEEE-754
binary64 arithmetic with round-to-nearest and no FMA contraction; numpy
ufuncs guarantee both.  Every function mirrors its jnp twin in
``ops/eft.py`` / ``ops/nbody.pairwise_accel_dd`` /
``integrators/multistep.elm2_step_cf`` 1:1 — see those for algorithm
citations.  Reference fixture being out-precisioned: the Double<T>
compensated state of ``solar_system_convergence.rs:12-110`` (dd state,
plain f64 forces); this module is dd through the FORCE as well (~2^-106
end to end), so it can MEASURE the f64-force truth's own rounding
envelope.  Parity with the jnp twins is CI-gated in
``tests/test_truth_np.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class TF(NamedTuple):
    """TwoFloat over numpy f64 arrays: value = hi + lo, |lo| <= ulp(hi)/2."""

    hi: np.ndarray
    lo: np.ndarray


# ----------------------------------------------------------------------------
# Error-free transforms (mirrors ops/eft.py)
# ----------------------------------------------------------------------------

_SPLIT = 134217729.0  # 2^27 + 1 (Dekker splitter for binary64)


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    p = a * b
    a_hi, a_lo = split(np.asarray(a))
    b_hi, b_lo = split(np.asarray(b))
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def two_sqr(a):
    p = a * a
    hi, lo = split(a)
    err = ((hi * hi - p) + 2.0 * (hi * lo)) + lo * lo
    return p, err


# ----------------------------------------------------------------------------
# TwoFloat arithmetic (accurate variants, mirrors ops/eft.py)
# ----------------------------------------------------------------------------

def add(x: TF, y: TF) -> TF:
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    return TF(*quick_two_sum(s, e))


def sub(x: TF, y: TF) -> TF:
    return add(x, TF(-y.hi, -y.lo))


def mul(x: TF, y: TF) -> TF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return TF(*quick_two_sum(p, e))


def mul_float(x: TF, b) -> TF:
    b = np.asarray(b, dtype=np.float64)
    p, e = two_prod(x.hi, b)
    e = e + x.lo * b
    return TF(*quick_two_sum(p, e))


def float_mul(a, b) -> TF:
    return TF(*two_prod(a, b))


def sqr(x: TF) -> TF:
    p, e = two_sqr(x.hi)
    e = e + 2.0 * (x.hi * x.lo)
    return TF(*quick_two_sum(p, e))


def rsqrt(x: TF) -> TF:
    """Two Newton refinements of the f64 seed, as in eft.rsqrt."""
    y0 = 1.0 / np.sqrt(x.hi)
    y0_tf = TF(y0, np.zeros_like(y0))
    xy2 = mul(x, float_mul(y0, y0))
    corr = _add_scalar(mul_float(xy2, -0.5), 1.5)
    y1 = mul(y0_tf, corr)
    xy2 = mul(x, mul(y1, y1))
    corr = _add_scalar(mul_float(xy2, -0.5), 1.5)
    return mul(y1, corr)


def _add_scalar(x: TF, b: float) -> TF:
    s, e = two_sum(x.hi, np.float64(b))
    e = e + x.lo
    return TF(*quick_two_sum(s, e))


def where(cond, x: TF, y: TF) -> TF:
    return TF(np.where(cond, x.hi, y.hi), np.where(cond, x.lo, y.lo))


def from_float(x) -> TF:
    x = np.asarray(x, dtype=np.float64)
    return TF(x, np.zeros_like(x))


# ----------------------------------------------------------------------------
# dd-force pairwise kernel (mirrors ops/nbody.pairwise_accel_dd)
# ----------------------------------------------------------------------------

def pairwise_accel_dd(pos: TF, mu: np.ndarray) -> TF:
    """O(N^2) pairwise acceleration, ~2^-106 throughout.  pos: TF of (N, 3)."""
    n = pos.hi.shape[0]
    dc = []
    for c in range(3):
        pj = TF(pos.hi[None, :, c], pos.lo[None, :, c])
        pi = TF(pos.hi[:, c, None], pos.lo[:, c, None])
        dc.append(sub(pj, pi))  # (N, N) broadcast
    r2 = add(add(sqr(dc[0]), sqr(dc[1])), sqr(dc[2]))
    eye = np.eye(n, dtype=bool)
    one = np.ones_like(r2.hi)
    r2 = where(eye, TF(one, np.zeros_like(one)), r2)
    u = rsqrt(r2)
    u3 = mul(sqr(u), u)
    w = mul_float(u3, mu[None, :])
    zero = np.zeros_like(w.hi)
    w = where(eye, TF(zero, zero), w)

    def tree_sum(x: TF) -> TF:
        m = 1
        while m < x.hi.shape[1]:
            m *= 2
        pad = m - x.hi.shape[1]
        hi = np.pad(x.hi, ((0, 0), (0, pad)))
        lo = np.pad(x.lo, ((0, 0), (0, pad)))
        while hi.shape[1] > 1:
            half = hi.shape[1] // 2
            s = add(TF(hi[:, :half], lo[:, :half]), TF(hi[:, half:], lo[:, half:]))
            hi, lo = s.hi, s.lo
        return TF(hi[:, 0], lo[:, 0])

    comps = [tree_sum(mul(w, c)) for c in dc]
    return TF(
        np.stack([c.hi for c in comps], axis=-1),
        np.stack([c.lo for c in comps], axis=-1),
    )


# ----------------------------------------------------------------------------
# ELM2 dd stepper (mirrors integrators/multistep.elm2_step_cf)
# ----------------------------------------------------------------------------

class CarryDD(NamedTuple):
    t: float
    ys: TF    # (ORDER, N, 3) dd positions, newest first
    ddys: TF  # (ORDER, N, 3) dd accelerations, newest first
    dy: TF    # (N, 3) dd velocity


def from_jax_carry(c) -> CarryDD:
    """Convert a jnp ELM2CarryDD (e.g. from multistep.elm2_init_cf)."""
    a = lambda x: np.asarray(x, dtype=np.float64)  # noqa: E731
    return CarryDD(
        t=float(c.t),
        ys=TF(a(c.ys.hi), a(c.ys.lo)),
        ddys=TF(a(c.ddys.hi), a(c.ddys.lo)),
        dy=TF(a(c.dy.hi), a(c.dy.lo)),
    )


def _wsum(coeffs, stack: TF) -> TF:
    """sum_j coeffs[j] * stack[j] in dd (mirrors multistep._dd_wsum[_tf])."""
    acc = None
    for j in range(len(coeffs)):
        c = float(coeffs[j])
        if c == 0.0:
            continue
        term = mul_float(TF(stack.hi[j], stack.lo[j]), c)
        acc = term if acc is None else add(acc, term)
    return acc


def _srkn_step(tab, mu, t, y: TF, dy: TF, h, ddy0):
    """Symplectic kick-drift startup step (mirrors multistep._srkn_step_cf)."""
    ddy = None
    for s in range(tab.stages):
        if s == 0 and tab.fsal and ddy0 is not None:
            ddy = ddy0
        else:
            ddy = pairwise_accel_dd(y, mu)
        if tab.b[s] != 0.0:
            dy = add(dy, mul_float(ddy, h * float(tab.b[s])))
        if tab.a[s] != 0.0:
            y = add(y, mul_float(dy, h * float(tab.a[s])))
    return t + h, y, dy, ddy


def elm2_init(tab, mu: np.ndarray, t0, y0, dy0, h: float) -> CarryDD:
    """dd-force multistep startup (mirrors multistep.elm2_init_cf).

    Unlike the jnp twin, the startup force ring here is genuinely ~2^-106:
    the XLA:CPU-compiled ring is silently f64-grade (see module docstring).
    """
    from .integrators.methods import get

    starter = get(tab.starter)
    hs = h / tab.substeps
    t = float(t0)
    y = from_float(y0)
    dy = from_float(dy0)
    ddy = pairwise_accel_dd(y, mu) if starter.fsal else None
    ys_h, ys_l, dd_h, dd_l = [], [], [], []
    for _ in range(tab.order):
        for _ in range(tab.substeps):
            t, y, dy, ddy = _srkn_step(
                starter, mu, t, y, dy, hs, ddy if starter.fsal else None
            )
        a = ddy if starter.fsal else pairwise_accel_dd(y, mu)
        ys_h.append(y.hi)
        ys_l.append(y.lo)
        dd_h.append(a.hi)
        dd_l.append(a.lo)
    ys = TF(np.stack(ys_h[::-1]), np.stack(ys_l[::-1]))
    ddys = TF(np.stack(dd_h[::-1]), np.stack(dd_l[::-1]))
    return CarryDD(t=t, ys=ys, ddys=ddys, dy=dy)


def elm2_step(tab, mu: np.ndarray, h: float, carry: CarryDD) -> CarryDD:
    """One QT12/Stormer13 step, dd state + dd force (one force evaluation)."""
    sum1 = _wsum(tab.c_y, carry.ys)
    sum2 = _wsum(tab.c_dy, carry.ddys)
    y_new = add(sum1, mul_float(sum2, h * h / tab.beta_d))
    t_new = carry.t + h

    ddy_new = pairwise_accel_dd(y_new, mu)

    cat = lambda new, ring: np.concatenate(  # noqa: E731
        [new[None], ring[: tab.order - 1]]
    )
    ddys_new = TF(cat(ddy_new.hi, carry.ddys.hi), cat(ddy_new.lo, carry.ddys.lo))
    vel_sum = _wsum(tab.cowell_beta_n, ddys_new)
    y_prev = TF(carry.ys.hi[0], carry.ys.lo[0])
    dy_new = add(
        mul_float(sub(y_new, y_prev), 1.0 / h),
        mul_float(vel_sum, h / tab.cowell_beta_d),
    )
    ys_new = TF(cat(y_new.hi, carry.ys.hi), cat(y_new.lo, carry.ys.lo))
    return CarryDD(t=t_new, ys=ys_new, ddys=ddys_new, dy=dy_new)
