"""CI gates for the pure-numpy dd truth integrator (truth_np).

Why these exist: the jnp dd-force path (ops/nbody.pairwise_accel_dd) is
MEASURED to silently degrade to plain-f64 grade when compiled by XLA:CPU
(~1e-15 relative vs an independent float128 oracle) on this jaxlib, and
its flat jit does not compile in practical time at all.  The truth
harness therefore steps in numpy; these tests pin (a) the EFT primitives'
exactness, (b) the force kernel against an independent float128 oracle,
and (c) the ELM2 update arithmetic bitwise against the jnp twin (whose
two_sum-based state chains DO survive compilation — the r2 century table
rests on them).
"""

from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import truth_np as tn
from ephemeris_explorer_tpu.integrators.methods import get
from ephemeris_explorer_tpu.io import scene

REPO = Path(__file__).resolve().parent.parent


def _scene_arrays():
    sc = scene.load_scene(REPO / "systems" / "full_solar_system_2433282.5")
    state = sc.state
    return (
        np.asarray(state.positions(), np.float64),
        np.asarray(state.velocities(), np.float64),
        np.asarray(state.mus(), np.float64),
        float(state.epoch.as_offset_seconds()),
        float(sc.settings.dt.as_seconds()),
    )


def test_eft_primitives_exact():
    rng = np.random.default_rng(7)
    a = rng.uniform(-1e9, 1e9, 256)
    b = rng.uniform(-1e-9, 1e9, 256)
    s, e = tn.two_sum(a, b)
    # error term exact: s + e == a + b in f128
    lhs = s.astype(np.longdouble) + e.astype(np.longdouble)
    rhs = a.astype(np.longdouble) + b.astype(np.longdouble)
    assert (lhs == rhs).all()
    p, e = tn.two_prod(a, b)
    lhs = p.astype(np.longdouble) + e.astype(np.longdouble)
    rhs = a.astype(np.longdouble) * b.astype(np.longdouble)
    # Dekker product error is exact in f64; f128 product rounds to 64-bit
    # mantissa, so allow its own half-ulp
    assert (np.abs(lhs - rhs) <= np.abs(rhs) * 2.0**-64).all()
    hi, lo = tn.split(a)
    assert (hi + lo == a).all()


def test_dd_force_vs_f128_oracle():
    pos, _, mu, _, _ = _scene_arrays()
    f = tn.pairwise_accel_dd(tn.TF(pos, np.zeros_like(pos)), mu)
    pl = pos.astype(np.longdouble)
    mul_ = mu.astype(np.longdouble)
    d = pl[None, :, :] - pl[:, None, :]
    r2 = (d**2).sum(-1)
    np.fill_diagonal(r2, 1.0)
    w = mul_[None, :] * r2**-1.5
    np.fill_diagonal(w, 0.0)
    f128 = (w[:, :, None] * d).sum(1)
    val = f.hi.astype(np.longdouble) + f.lo.astype(np.longdouble)
    scale = np.abs(f128).max(axis=1, keepdims=True)
    rel = float((np.abs(val - f128) / scale).max())
    # the f128 oracle itself rounds at ~2^-64; dd is far below it
    assert rel < 1e-17, rel


def test_elm2_update_bitwise_vs_jnp_twin():
    """y_new of one step matches the eager jnp elm2_step_cf update bitwise.

    y_new depends only on the ring sums (two_sum/two_prod chains), not on
    the new force, so the known-degraded jnp force does not contaminate
    this comparison.
    """
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.integrators import multistep
    from ephemeris_explorer_tpu.ops import eft, nbody

    pos, vel, mu, t0, h = _scene_arrays()
    tab = get("QuinlanTremaine12")
    c = tn.elm2_init(tab, mu, t0, pos, vel, h)
    cj = multistep.ELM2CarryDD(
        t=jnp.asarray(c.t, jnp.float64),
        ys=eft.TwoFloat(jnp.asarray(c.ys.hi), jnp.asarray(c.ys.lo)),
        ddys=eft.TwoFloat(jnp.asarray(c.ddys.hi), jnp.asarray(c.ddys.lo)),
        dy=eft.TwoFloat(jnp.asarray(c.dy.hi), jnp.asarray(c.dy.lo)),
    )
    accel_dd = lambda t, y: nbody.pairwise_accel_dd(y, jnp.asarray(mu))  # noqa: E731
    with jax.disable_jit():
        cj2 = multistep.elm2_step_cf(tab, accel_dd, h, cj)
    cn2 = tn.elm2_step(tab, mu, h, c)
    assert (np.asarray(cj2.ys.hi[0]) == cn2.ys.hi[0]).all()
    assert (np.asarray(cj2.ys.lo[0]) == cn2.ys.lo[0]).all()


def test_startup_matches_convergence_order():
    """One ddf step from the numpy startup stays on the dd trajectory:
    integrating 32 steps forward moves every body smoothly (no startup
    discontinuity above dd scale) — guarded via energy-free sanity: the
    second difference of positions stays ~h^2 * accel."""
    pos, vel, mu, t0, h = _scene_arrays()
    tab = get("QuinlanTremaine12")
    c = tn.elm2_init(tab, mu, t0, pos, vel, h)
    p0 = c.ys.hi[0] + c.ys.lo[0]
    c1 = tn.elm2_step(tab, mu, h, c)
    p1 = c1.ys.hi[0] + c1.ys.lo[0]
    c2 = tn.elm2_step(tab, mu, h, c1)
    p2 = c2.ys.hi[0] + c2.ys.lo[0]
    acc = tn.pairwise_accel_dd(tn.TF(p1, np.zeros_like(p1)), mu)
    second = (p2 - 2 * p1 + p0) / (h * h)
    err = np.abs(second - acc.hi)
    scale = np.abs(acc.hi).max()
    # the central difference has O((h*omega)^2) truncation — ~2e-2 for
    # Phobos at h=600 s — so this only catches gross startup breakage
    assert float(err.max() / scale) < 1e-2
