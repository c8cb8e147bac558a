"""CI gates for the native dd-truth stepper (ddtruth_native / eet_ddtruth.cpp).

The native library's entire value is BITWISE equality with truth_np — the
audit may substitute it for the numpy stepper only if the trajectory bits
are identical (otherwise "truth" would depend on which backend ran it).
These tests pin that contract on real solar-system state: force kernel,
multi-step chunks (ring shift + Cowell velocity + time accumulation),
thread-count invariance, and chunk-splitting associativity (one 12-step
call == 3+4+5).  The load-time self-test inside ddtruth_native.available()
guards mis-built toolchains at runtime; these tests guard the source.
"""

from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import ddtruth_native as ddn
from ephemeris_explorer_tpu import truth_np as tn
from ephemeris_explorer_tpu.integrators.methods import get
from ephemeris_explorer_tpu.io import scene

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    not ddn.available(), reason="native dd-truth library unavailable"
)


def _scene_carry(n_bodies=12, h=600.0):
    sc = scene.load_scene(REPO / "systems" / "full_solar_system_2433282.5")
    state = sc.state
    pos = np.asarray(state.positions(), np.float64)[:n_bodies]
    vel = np.asarray(state.velocities(), np.float64)[:n_bodies]
    mu = np.asarray(state.mus(), np.float64)[:n_bodies]
    tab = get("QuinlanTremaine12")
    carry = tn.elm2_init(tab, mu, 0.0, pos, vel, h)
    return tab, mu, h, carry


def _carry_eq(a: tn.CarryDD, b: tn.CarryDD) -> bool:
    return (
        a.t == b.t
        and np.array_equal(a.ys.hi, b.ys.hi)
        and np.array_equal(a.ys.lo, b.ys.lo)
        and np.array_equal(a.ddys.hi, b.ddys.hi)
        and np.array_equal(a.ddys.lo, b.ddys.lo)
        and np.array_equal(a.dy.hi, b.dy.hi)
        and np.array_equal(a.dy.lo, b.dy.lo)
    )


def test_force_bitwise_vs_numpy():
    """Native dd force == numpy dd force, bit for bit, on real scene state."""
    sc = scene.load_scene(REPO / "systems" / "full_solar_system_2433282.5")
    pos = np.asarray(sc.state.positions(), np.float64)
    mu = np.asarray(sc.state.mus(), np.float64)
    # non-trivial lo limbs: split the positions as the engines do
    rng = np.random.default_rng(3)
    lo = np.abs(pos) * 2.0 ** -55 * rng.uniform(-1, 1, pos.shape)
    p = tn.TF(pos, lo)

    want = tn.pairwise_accel_dd(p, mu)
    n = pos.shape[0]
    acc_hi = np.empty((n, 3))
    acc_lo = np.empty((n, 3))
    lib = ddn._load()
    lib.eet_ddtruth_force(
        n, ddn._dp(np.ascontiguousarray(p.hi)), ddn._dp(np.ascontiguousarray(p.lo)),
        ddn._dp(np.ascontiguousarray(mu)), ddn._dp(acc_hi), ddn._dp(acc_lo), 1,
    )
    assert np.array_equal(acc_hi, want.hi)
    assert np.array_equal(acc_lo, want.lo)


def test_chunk_bitwise_vs_numpy():
    """25 native steps == 25 numpy elm2_step calls (rings, velocity, time)."""
    tab, mu, h, carry = _scene_carry()
    want = carry
    for _ in range(25):
        want = tn.elm2_step(tab, mu, h, want)
    got = ddn.run_chunk(tab, mu, h, carry, 25, n_threads=1)
    assert _carry_eq(got, want)


def test_threads_bitwise_invariant():
    """Row partitioning must not change bits (rows are independent)."""
    tab, mu, h, carry = _scene_carry()
    one = ddn.run_chunk(tab, mu, h, carry, 8, n_threads=1)
    three = ddn.run_chunk(tab, mu, h, carry, 8, n_threads=3)
    assert _carry_eq(one, three)


def test_chunk_split_associative():
    """12 steps in one call == 3 + 4 + 5 (no hidden per-call state)."""
    tab, mu, h, carry = _scene_carry()
    whole = ddn.run_chunk(tab, mu, h, carry, 12)
    c = carry
    for k in (3, 4, 5):
        c = ddn.run_chunk(tab, mu, h, c, k)
    assert _carry_eq(whole, c)


def test_input_carry_not_mutated():
    tab, mu, h, carry = _scene_carry(n_bodies=6)
    ys_hi = carry.ys.hi.copy()
    dd_lo = carry.ddys.lo.copy()
    ddn.run_chunk(tab, mu, h, carry, 4)
    assert np.array_equal(carry.ys.hi, ys_hi)
    assert np.array_equal(carry.ddys.lo, dd_lo)


def test_stormer13_tableau_bitwise():
    """Second tableau (different order/coefficients) through the same path."""
    sc = scene.load_scene(REPO / "systems" / "sun_earth_moon_2433282.5")
    pos = np.asarray(sc.state.positions(), np.float64)
    vel = np.asarray(sc.state.velocities(), np.float64)
    mu = np.asarray(sc.state.mus(), np.float64)
    tab = get("Stormer13")
    h = 450.0
    carry = tn.elm2_init(tab, mu, 0.0, pos, vel, h)
    want = carry
    for _ in range(10):
        want = tn.elm2_step(tab, mu, h, want)
    got = ddn.run_chunk(tab, mu, h, carry, 10)
    assert _carry_eq(got, want)
