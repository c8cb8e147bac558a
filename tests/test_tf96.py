"""Triple-f32 arithmetic + full-precision force tests.

Truth: exact rational arithmetic (fractions) and 200-bit mpmath.  Gates the
~2^-70 working precision of ops/tf96.py and the unbiasedness of
ops/nbody_full3.pairwise_accel_full3 — the force path behind the century
accuracy table (docs/ACCURACY.md).
"""

from fractions import Fraction

import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.ops import tf96

mpmath = pytest.importorskip("mpmath")

TOL = 2.0**-68  # headroom over the ~2^-70 design precision


def _vals(t):
    """tf96 tuple -> list of exact Fractions."""
    arrs = [np.asarray(l) for l in t]
    return [
        sum(Fraction(float(a.reshape(-1)[i])) for a in arrs)
        for i in range(arrs[0].size)
    ]


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(7)
    x = rng.normal(size=128) * 10.0 ** rng.integers(-4, 7, size=128)
    y = rng.normal(size=128) * 10.0 ** rng.integers(-4, 7, size=128)
    return x, y


def _relerr(got_fracs, want_fracs):
    out = 0.0
    for g, w in zip(got_fracs, want_fracs):
        if w != 0:
            out = max(out, abs(float((g - w) / w)))
    return out


def test_from_f64_exact(xy):
    x, _ = xy
    assert all(float(f) == v for f, v in zip(_vals(tf96.from_f64(jnp.asarray(x))), x))


def test_add_mul_sqr(xy):
    x, y = xy
    X, Y = tf96.from_f64(jnp.asarray(x)), tf96.from_f64(jnp.asarray(y))
    fx, fy = _vals(X), _vals(Y)
    assert _relerr(_vals(tf96.add(X, Y)), [a + b for a, b in zip(fx, fy)]) < TOL
    assert _relerr(_vals(tf96.mul(X, Y)), [a * b for a, b in zip(fx, fy)]) < TOL
    assert _relerr(_vals(tf96.sqr(X)), [a * a for a in fx]) < TOL


def test_rsqrt(xy):
    x, _ = xy
    xp = np.abs(x) + 1e-3
    got = _vals(tf96.rsqrt(tf96.from_f64(jnp.asarray(xp))))
    mpmath.mp.prec = 200
    for g, v in zip(got, xp):
        gm = mpmath.mpf(g.numerator) / mpmath.mpf(g.denominator)
        assert abs(gm * mpmath.sqrt(mpmath.mpf(v)) - 1) < TOL


def test_tree_sum_odd_lengths():
    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 5, 8, 13, 32):
        x = rng.normal(size=(4, n))
        t = tf96.tree_sum(tf96.from_f64(jnp.asarray(x)), axis=1)
        np.testing.assert_allclose(
            np.asarray(tf96.to_f64(t)), x.sum(axis=1), rtol=1e-14
        )


def test_pairwise_accel_full3_vs_mpmath():
    """Full-precision force vs 200-bit mpmath on a close-moon-like cluster:
    the f64 output must be correct to ~1 ulp (unbiased), including the
    Phobos-style near-degenerate pair differences."""
    from ephemeris_explorer_tpu.ops import expansion as ex
    from ephemeris_explorer_tpu.ops.nbody_full3 import pairwise_accel_full3

    rng = np.random.default_rng(11)
    n = 8
    pos = rng.normal(size=(n, 3)) * 1.0e8
    pos[1] = pos[0] + rng.normal(size=3) * 1.0e3  # close pair, |d|/|p| ~ 1e-5
    mu = 10.0 ** rng.uniform(3, 11, size=n)

    limbs4 = ex.from_f64(jnp.asarray(pos))
    acc = np.asarray(pairwise_accel_full3(limbs4[0], limbs4[1], limbs4[2], jnp.asarray(mu)))

    mpmath.mp.prec = 200
    want = np.zeros((n, 3))
    for i in range(n):
        a = [mpmath.mpf(0)] * 3
        for j in range(n):
            if i == j:
                continue
            d = [mpmath.mpf(pos[j][c]) - mpmath.mpf(pos[i][c]) for c in range(3)]
            r2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
            w = mpmath.mpf(mu[j]) / (r2 * mpmath.sqrt(r2))
            for c in range(3):
                a[c] += w * d[c]
        want[i] = [float(v) for v in a]

    err = np.abs(acc - want)
    scale = np.linalg.norm(want, axis=-1, keepdims=True)
    assert np.max(err / scale) < 1e-15, np.max(err / scale)
