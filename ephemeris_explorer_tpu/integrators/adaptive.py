"""Adaptive (embedded) Runge-Kutta stepping with an I-controller.

Rebuilds the reference's ``AdaptiveRungeKutta`` machinery
(``integration/src/runge_kutta/mod.rs:128-440``) as a jit/vmap-friendly
``lax.while_loop``: each call produces ONE accepted step, retrying with the
controller-shrunk step size until the embedded error estimate passes, exactly
like the store/restore loop at ``mod.rs:413-439``.  The FSAL stage cache is
carried functionally (no restore needed: rejected attempts never commit).

Controller (``mod.rs:225-243``):  m = fac * err^(-1/k);
h_next = min(h * clamp(m, fac_min, fac_max), h_max);  accept iff err <= 1.

The attempt counter ``n`` is cumulative over the integrator's lifetime and
bounded by ``n_max`` (reference default 1e6, load/mod.rs:472-486).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .fixed import erk_error, erk_step, erkn_step, erkng_step, nystrom_error
from .methods import ERKNGTableau, ERKNTableau, ERKTableau

tree_map = jax.tree_util.tree_map

# status codes (mirroring integration/src/lib.rs:312-330 StepError)
OK = 0
BOUND_REACHED = 1
STEP_SIZE_UNDERFLOW = 2
MAX_ITERATIONS = 3
EVAL_FAILED = 4  # non-finite RHS/error (StepError::EvalFailed, problem.rs:114)


@dataclass(frozen=True)
class AdaptiveParams:
    """AdaptiveMethodParams (integration/src/lib.rs:174-233)."""

    h_init: float = 60.0
    h_max: float = 1.7976931348623157e308
    tol_pos: float = 1e-3   # km   (1 m; load/mod.rs:476-480)
    tol_vel: float = 1e-3   # km/s (1 m/s; load/mod.rs:476-480)
    fac_min: float = 0.2
    fac_max: float = 5.0
    fac: float = 0.9
    n_max: int = 1_000_000


class AdaptiveState(NamedTuple):
    """Functional integrator state threaded between accepted steps."""

    t: jax.Array          # current time (f64 seconds)
    y: Any                # state pytree ((pos, vel) for spacecraft)
    next_h: jax.Array     # controller-proposed next step size
    n: jax.Array          # cumulative attempt count (int32)
    cache: Any            # FSAL derivative cache (pytree like f(t, y))


def abs_tol_norm(tol_pos: float, tol_vel: float):
    """AbsTol error norm (dynamics/spacecraft.rs:615-641): state = (pos, vel)."""

    def norm(_y_new, err):
        e_pos, e_vel = err
        m1 = jnp.max(jnp.abs(jnp.asarray(e_pos) / tol_pos))
        m2 = jnp.max(jnp.abs(jnp.asarray(e_vel) / tol_vel))
        return jnp.maximum(m1, m2)

    return norm


def init_state(tab, f, t0, y0, params: AdaptiveParams) -> AdaptiveState:
    """Build the initial adaptive state, priming the FSAL cache with f(t0, y0)."""
    t0 = jnp.asarray(t0, jnp.float64)
    if isinstance(tab, ERKTableau):
        cache = f(t0, y0)
    elif isinstance(tab, ERKNTableau):
        cache = f(t0, y0[0])
    else:
        cache = f(t0, y0[0], y0[1])
    return AdaptiveState(
        t=t0,
        y=y0,
        next_h=jnp.asarray(params.h_init, jnp.float64),
        n=jnp.asarray(0, jnp.int64),
        cache=cache,
    )


def _attempt(tab, f, t, y, h, cache):
    """One trial step; returns (y_new, err_pytree, new_cache)."""
    if isinstance(tab, ERKTableau):
        _, y_new, ks = erk_step(tab, f, t, y, h, k0=cache if tab.fsal else None)
        err = erk_error(tab, ks, h)
        return y_new, err, ks[-1]
    if isinstance(tab, ERKNTableau):
        yy, dy = y
        _, y2, dy2, dks = erkn_step(
            tab, f, t, yy, dy, h, dk0=cache if tab.fsal else None
        )
        e_y, e_dy = nystrom_error(tab, dks, h)
        return (y2, dy2), (e_y, e_dy), dks[-1]
    if isinstance(tab, ERKNGTableau):
        yy, dy = y
        _, y2, dy2, dks = erkng_step(
            tab, f, t, yy, dy, h, dk0=cache if tab.fsal else None
        )
        e_y, e_dy = nystrom_error(tab, dks, h)
        return (y2, dy2), (e_y, e_dy), dks[-1]
    raise TypeError(type(tab))


def advance(
    tab,
    f: Callable,
    params: AdaptiveParams,
    err_norm: Callable,
    state: AdaptiveState,
    bound,
):
    """One ACCEPTED adaptive step bounded by `bound`.

    Returns (new_state, h_used, status).  On a non-OK status the state is
    returned unchanged (except the attempt counter).
    """
    bound = jnp.asarray(bound, jnp.float64)
    k_order = jnp.float64(tab.lower_order)

    pre_bound = state.t >= bound
    pre_underflow = state.t + state.next_h == state.t

    class Loop(NamedTuple):
        next_h: jax.Array
        n: jax.Array
        accepted: jax.Array
        failed: jax.Array
        h_used: jax.Array
        y_new: Any
        cache_new: Any

    def cond(lp: Loop):
        return (~lp.accepted) & (~lp.failed) & (lp.n <= params.n_max)

    def body(lp: Loop):
        h = jnp.minimum(lp.next_h, bound - state.t)
        y_new, err_vec, cache_new = _attempt(tab, f, state.t, state.y, h, state.cache)
        err = err_norm(y_new, err_vec)
        # EvalFailed semantics match the reference (StepError::EvalFailed,
        # integration/src/lib.rs:312-330): abort only when the RHS/state
        # itself is non-finite (e.g. a degenerate TNB burn frame).  An
        # overflowed-but-finite attempt (err == inf with finite y_new)
        # falls through to the fac_min-clamped retry below — m becomes 0,
        # clip() restores fac_min, and the step is retried smaller.  A NaN
        # err would poison next_h, so it also aborts.
        y_finite = jax.tree_util.tree_reduce(
            lambda a, leaf: a & jnp.all(jnp.isfinite(leaf)),
            y_new,
            jnp.asarray(True),
        )
        failed = (~y_finite) | jnp.isnan(err)
        m = params.fac * err ** (-1.0 / k_order)
        nh = h * jnp.clip(m, params.fac_min, params.fac_max)
        nh = jnp.minimum(nh, params.h_max)
        accepted = err <= 1.0
        return Loop(
            next_h=nh,
            n=lp.n + 1,
            accepted=accepted,
            failed=failed,
            h_used=h,
            y_new=y_new,
            cache_new=cache_new,
        )

    # pre-existing bound/underflow conditions skip the loop entirely (the
    # result is discarded via `status` below)
    init = Loop(
        next_h=state.next_h,
        n=state.n,
        accepted=jnp.logical_or(pre_bound, pre_underflow),
        failed=jnp.asarray(False),
        h_used=jnp.asarray(0.0, jnp.float64),
        y_new=state.y,
        cache_new=state.cache,
    )
    lp = jax.lax.while_loop(cond, body, init)

    status = jnp.where(
        pre_bound,
        BOUND_REACHED,
        jnp.where(
            pre_underflow,
            STEP_SIZE_UNDERFLOW,
            jnp.where(
                lp.failed,
                EVAL_FAILED,
                jnp.where(lp.accepted, OK, MAX_ITERATIONS),
            ),
        ),
    )
    ok = status == OK

    def sel(a, b):
        return tree_map(lambda x, yv: jnp.where(ok, x, yv), a, b)

    new_state = AdaptiveState(
        t=jnp.where(ok, state.t + lp.h_used, state.t),
        y=sel(lp.y_new, state.y),
        next_h=jnp.where(ok, lp.next_h, state.next_h),
        n=lp.n,
        cache=sel(lp.cache_new, state.cache),
    )
    return new_state, lp.h_used, status
