"""Pallas df64 pair kernel vs the f64 jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu.ops import nbody
from ephemeris_explorer_tpu.ops.pallas_nbody import (
    HAVE_PALLAS,
    pairwise_accel,
    pairwise_accel_ensemble,
    split_f64,
)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_accel_matches_f64():
    rng = np.random.default_rng(3)
    n = 256
    pos = rng.normal(size=(n, 3)) * 1e8
    mu = rng.uniform(1e3, 1e11, size=n)

    ref = np.asarray(nbody.pairwise_accel(jnp.asarray(pos), jnp.asarray(mu)))
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))
    out = np.asarray(
        pairwise_accel(jnp.asarray(pos), mu_hi, mu_lo, interpret=True,
                       tile_rows=64, tile_cols=128)
    )
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) / scale < 1e-12


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_ensemble_kernel_matches_per_member():
    """The fused (E, N/TR) grid gives the same result as the per-member
    kernel for every ensemble member."""
    rng = np.random.default_rng(5)
    e, n = 3, 64
    pos = rng.normal(size=(e, n, 3)) * 1e8
    mu = rng.uniform(1e3, 1e11, size=n)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))

    out = np.asarray(
        pairwise_accel_ensemble(
            jnp.asarray(pos), mu_hi, mu_lo, interpret=True,
            tile_rows=32, tile_cols=64,
        )
    )
    for k in range(e):
        ref = np.asarray(
            pairwise_accel(jnp.asarray(pos[k]), mu_hi, mu_lo, interpret=True,
                           tile_rows=32, tile_cols=64)
        )
        np.testing.assert_array_equal(out[k], ref)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_three_limb_close_pair_accuracy():
    """Error-free differencing: close-pair force beats the two-limb kernel."""
    from fractions import Fraction

    import jax

    from ephemeris_explorer_tpu.ops import expansion as ex
    from ephemeris_explorer_tpu.ops.pallas_nbody import pairwise_accel_limbs

    # a Mars+Phobos-like close pair far from the origin, padded to 8 bodies
    n = 8
    pos = np.zeros((n, 3))
    pos[:, 0] = np.linspace(1e8, 4e8, n)
    pos[1] = pos[0] + np.array([9377.0, 1234.5678901, 0.0])  # "Phobos"
    mu = np.full(n, 1e3)
    mu[0] = 4.28e4

    # positions carry MORE than f64 precision (expansion state): a third
    # limb holds a sub-f64 offset the 2-limb kernel cannot represent
    jpos = jnp.asarray(pos)
    limbs = list(ex.from_f64(jpos))
    delta = np.zeros((n, 3))
    delta[1, 1] = 3.1415e-9  # ~3 micrometre offset on "Phobos"
    limbs[2] = jnp.asarray(np.asarray(limbs[2], dtype=np.float64) + delta,
                           jnp.float32)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))
    out3 = np.asarray(
        pairwise_accel_limbs(*[np.asarray(l) for l in limbs[:3]], mu_hi, mu_lo,
                             interpret=True, tile_rows=8, tile_cols=8)
    )

    # exact rational reference for the close-pair row, from the LIMBS
    def limb_pos(i):
        return [
            sum(Fraction(float(np.asarray(l, dtype=np.float64)[i][k])) for l in limbs[:3])
            for k in range(3)
        ]

    def exact_accel(i):
        acc = [Fraction(0)] * 3
        pi = limb_pos(i)
        for j in range(n):
            if j == i:
                continue
            pj = limb_pos(j)
            d = [a - b for a, b in zip(pj, pi)]
            r2 = sum(x * x for x in d)
            inv_r3 = Fraction(float(float(r2) ** -1.5))  # f64 rounding fine here
            for k in range(3):
                acc[k] += Fraction(float(mu[j])) * d[k] * inv_r3
        return np.array([float(a) for a in acc])

    truth = exact_accel(1)
    rel3 = np.max(np.abs(out3[1] - truth)) / np.max(np.abs(truth))
    assert rel3 < 1e-11, rel3

    # the 2-limb kernel cannot see the third-limb offset at all
    out2 = np.asarray(
        pairwise_accel(jpos, mu_hi, mu_lo, interpret=True, tile_rows=8, tile_cols=8)
    )
    rel2 = np.max(np.abs(out2[1] - truth)) / np.max(np.abs(truth))
    assert rel3 < rel2


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_elm2_update_matches_unfused():
    """elm2_step_qf (Pallas VMEM update + pair-native force ring) tracks
    elm2_step_q: positions agree to the two-float increment precision and
    the converted-back carry round-trips exactly."""
    import jax

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.integrators import multistep
    from ephemeris_explorer_tpu.ops import nbody
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_limbs_pair,
    )

    n = 8
    rng = np.random.default_rng(7)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    vel = rng.normal(size=(n, 3)) * 1.0
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu_j = jnp.asarray(mu)
    mu_hi, mu_lo = split_f64(mu_j.reshape(1, -1))
    h = 600.0
    tab = get("QuinlanTremaine12")

    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)

    def accel_limbs(t, limbs):
        from ephemeris_explorer_tpu.ops.pallas_nbody import combine_f64

        return combine_f64(
            *pairwise_accel_limbs_pair(
                limbs[0], limbs[1], limbs[2], mu_hi, mu_lo,
                interpret=True, tile_rows=8, tile_cols=8,
            )
        )

    def accel_pair(t, limbs):
        return pairwise_accel_limbs_pair(
            limbs[0], limbs[1], limbs[2], mu_hi, mu_lo,
            interpret=True, tile_rows=8, tile_cols=8,
        )

    q = multistep.elm2_init_q(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    qf = multistep.elm2_qf_from_q(q)

    # single step from the same carry: the update kernel commits the same
    # state (to the 4-limb expansion) as the unfused chain
    q1 = multistep.elm2_step_q(
        tab, accel, h, q, accel_limbs=accel_limbs, with_velocity=False
    )
    qf1 = multistep.elm2_step_qf(tab, accel_pair, h, qf, interpret=True)
    y1q = np.asarray(ex_to_f64(q1.ys))
    y1f = np.asarray(ex_to_f64(qf1.ys))
    np.testing.assert_allclose(y1f, y1q, atol=np.abs(y1q).max() * 2.0**-50, rtol=0)

    # multi-step: the increment sum runs in EFT TwoFloat instead of f64, a
    # deep-limb (<2^-45) difference this dense chaotic cluster amplifies -
    # so judge both engines against the double-double truth instead of
    # against each other and require comparable error
    steps = 30
    c = multistep.elm2_init_c(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    for _ in range(steps):
        q = multistep.elm2_step_q(
            tab, accel, h, q, accel_limbs=accel_limbs, with_velocity=False
        )
        qf = multistep.elm2_step_qf(tab, accel_pair, h, qf, interpret=True)
        c = multistep.elm2_step_c(tab, accel, h, c)

    y_q = np.asarray(ex_to_f64(q.ys))
    y_f = np.asarray(ex_to_f64(qf.ys))
    truth = np.asarray(c.ys.hi[0]) + np.asarray(c.ys.lo[0])
    err_q = np.abs(y_q - truth).max()
    err_f = np.abs(y_f - truth).max()
    floor = np.abs(truth).max() * 2.0**-40
    assert err_f <= max(5.0 * err_q, floor), (err_f, err_q, floor)

    # deferred velocity agrees through the converted carry
    v_q = np.asarray(multistep.elm2_velocity_q(tab, q, h))
    v_f = np.asarray(multistep.elm2_velocity_qf(tab, qf, h))
    np.testing.assert_allclose(v_f, v_q, atol=np.abs(v_q).max() * 1e-9, rtol=0)

    # round-trip conversion preserves the ring VALUES exactly (the pair
    # representation re-canonicalises: hi+lo is what is exact, not the split)
    back = multistep.elm2_qf_from_q(multistep.elm2_qf_to_q(qf))
    val = lambda p: np.asarray(p.hi, np.float64) + np.asarray(p.lo, np.float64)
    np.testing.assert_array_equal(val(back.dd), val(qf.dd))


def ex_to_f64(ys):
    from ephemeris_explorer_tpu.ops import expansion as ex

    return ex.to_f64(tuple(l[0] for l in ys))


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_symmetric_kernel_matches_row_sweep():
    """The upper-triangle symmetric kernel reproduces the row-sweep df64
    kernel to the two-float working precision."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel,
        pairwise_accel_sym,
    )

    n = 32
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))

    ref = np.asarray(
        pairwise_accel(jnp.asarray(pos), mu_hi, mu_lo,
                       interpret=True, tile_rows=8, tile_cols=8)
    )
    sym = np.asarray(
        pairwise_accel_sym(jnp.asarray(pos), mu_hi, mu_lo,
                           interpret=True, tile=8)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(sym, ref, atol=scale * 2.0**-44, rtol=0)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_twofloat_state_matches_plain():
    """elm2_step_f (pair state + K=2 VMEM update kernel) holds the same
    error envelope vs the double-double truth as the plain emulated-f64
    carry it replaces."""
    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.integrators import multistep
    from ephemeris_explorer_tpu.ops import nbody
    from ephemeris_explorer_tpu.ops.eft import TwoFloat
    from ephemeris_explorer_tpu.ops.pallas_nbody import pairwise_accel_df64

    n = 8
    rng = np.random.default_rng(11)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    vel = rng.normal(size=(n, 3)) * 1.0
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu_j = jnp.asarray(mu)
    mu_hi, mu_lo = split_f64(mu_j.reshape(1, -1))
    h = 600.0
    tab = get("QuinlanTremaine12")
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)

    def accel_pair(t, y):
        ah, al = pairwise_accel_df64(
            y.hi.T, y.lo.T, mu_hi, mu_lo, interpret=True, tile_rows=8, tile_cols=8
        )
        return TwoFloat(ah, al)

    p0 = multistep.elm2_init(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    f = multistep.elm2_f_from(p0)
    c = multistep.elm2_init_c(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    p = p0

    steps = 30
    for _ in range(steps):
        p = multistep.elm2_step(tab, accel, h, p, with_velocity=False)
        f = multistep.elm2_step_f(tab, accel_pair, h, f, interpret=True)
        c = multistep.elm2_step_c(tab, accel, h, c)

    truth = np.asarray(c.ys.hi[0]) + np.asarray(c.ys.lo[0])
    y_p = np.asarray(p.ys[0])
    y_f = np.asarray(f.ys.hi[0], np.float64) + np.asarray(f.ys.lo[0], np.float64)
    err_p = np.abs(y_p - truth).max()
    err_f = np.abs(y_f - truth).max()
    floor = np.abs(truth).max() * 2.0**-42
    assert err_f <= max(5.0 * err_p, floor), (err_f, err_p, floor)

    # deferred velocity consistent with the plain Cowell reconstruction
    v_p = np.asarray(multistep.elm2_velocity(tab, p, h))
    v_f = np.asarray(multistep.elm2_velocity_f(tab, f, h))
    np.testing.assert_allclose(v_f, v_p, atol=np.abs(v_p).max() * 1e-8, rtol=0)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_gen_scan_kernel_matches_plain():
    """The monolithic generation kernel (n_steps of update+force+emission
    in one Pallas program) holds the same dd-truth error envelope as the
    plain scan, and its emissions equal its own committed states."""
    from ephemeris_explorer_tpu.integrators import get, multistep
    from ephemeris_explorer_tpu.ops import nbody
    from ephemeris_explorer_tpu.ops.eft import TwoFloat
    from ephemeris_explorer_tpu.ops.pallas_gen import elm2_gen_scan

    n = 10  # non-power-of-two: exercises the ghost-body padding
    rng = np.random.default_rng(13)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    vel = rng.normal(size=(n, 3)) * 1.0
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu_j = jnp.asarray(mu)
    mu_hi, mu_lo = split_f64(mu_j.reshape(1, -1))
    h = 600.0
    tab = get("QuinlanTremaine12")
    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)

    c0 = multistep.elm2_init(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    cc = multistep.elm2_init_c(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)

    steps = 8
    ys, c_new = elm2_gen_scan(
        tab, h, c0, TwoFloat(mu_hi, mu_lo), steps, interpret=True
    )
    p = c0
    for _ in range(steps):
        p = multistep.elm2_step(tab, accel, h, p, with_velocity=False)
        cc = multistep.elm2_step_c(tab, accel, h, cc)

    truth = np.asarray(cc.ys.hi[0]) + np.asarray(cc.ys.lo[0])
    err_plain = np.abs(np.asarray(p.ys[0]) - truth).max()
    err_gen = np.abs(np.asarray(c_new.ys[0]) - truth).max()
    floor = np.abs(truth).max() * 2.0**-42
    assert err_gen <= max(5.0 * err_plain, floor), (err_gen, err_plain, floor)

    # the emitted trajectory's last row IS the committed state
    np.testing.assert_array_equal(np.asarray(ys[-1]), np.asarray(c_new.ys[0]))
    # time advanced
    assert abs(float(c_new.t) - (float(c0.t) + steps * h)) < 1e-9
    # ring alignment: the force ring head equals f(ys[0]) to pair precision
    f_ref = np.asarray(accel(0.0, jnp.asarray(c_new.ys[0])))
    np.testing.assert_allclose(
        np.asarray(c_new.ddys[0]), f_ref, rtol=1e-13, atol=np.abs(f_ref).max() * 1e-13
    )


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_f32_fast_mode_error_envelope():
    """The f32 fast-mode kernel tracks the two-float kernel to ~1e-6
    relative — visualization-grade, as documented."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import pairwise_accel_f32

    n = 64
    rng = np.random.default_rng(21)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))

    ref = np.asarray(
        pairwise_accel(jnp.asarray(pos), mu_hi, mu_lo,
                       interpret=True, tile_rows=8, tile_cols=8)
    )
    fast = np.asarray(
        pairwise_accel_f32(
            jnp.asarray(pos, jnp.float64).astype(jnp.float32),
            jnp.asarray(mu, jnp.float64).astype(jnp.float32).reshape(1, n),
            interpret=True, tile_rows=8, tile_cols=8,
        )
    )
    scale = np.abs(ref).max()
    rel = np.abs(fast - ref).max() / scale
    assert rel < 1e-5, rel
    assert rel > 1e-9  # sanity: it IS single precision, not silently df64


def test_packed_fused_steps_bitwise():
    """The sublane-packed fused steps (ELM2CarryFP/QFP: rings stored
    (ORDER, SUB, M/SUB) across steps) are BITWISE identical to the
    unpacked fused steps — packing only changes the layout."""
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.integrators import get, multistep
    from ephemeris_explorer_tpu.ops import nbody
    from ephemeris_explorer_tpu.ops.eft import TwoFloat
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_df64,
        pairwise_accel_limbs_pair,
        split_f64,
    )

    n = 32
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 1e6)
    vel = jnp.asarray(rng.normal(size=(n, 3)))
    mu = jnp.asarray(rng.uniform(1e3, 1e5, n))
    tab = get("QuinlanTremaine12")
    h = 600.0
    steps = 6
    shape = (n, 3)

    mu_hi, mu_lo = split_f64(mu.reshape(1, -1))
    accel = lambda t, y: nbody.pairwise_accel(y, mu)

    # --- two-float (F) engine ---
    def accel_pair(t, y):
        ah, al = pairwise_accel_df64(
            y.hi.T, y.lo.T, mu_hi, mu_lo, tile_rows=8, tile_cols=16,
            interpret=True,
        )
        return TwoFloat(ah, al)

    f = multistep.elm2_f_from(multistep.elm2_init(tab, accel, 0.0, pos, vel, h))
    fp = multistep.elm2_fp_from(f)
    for _ in range(steps):
        f = multistep.elm2_step_f(tab, accel_pair, h, f, interpret=True)
        fp = multistep.elm2_step_fp(
            tab, accel_pair, h, fp, shape, interpret=True
        )
    back = multistep.elm2_fp_to(fp, shape)
    np.testing.assert_array_equal(np.asarray(back.ys.hi), np.asarray(f.ys.hi))
    np.testing.assert_array_equal(np.asarray(back.ys.lo), np.asarray(f.ys.lo))
    np.testing.assert_array_equal(np.asarray(back.dd.hi), np.asarray(f.dd.hi))
    np.testing.assert_array_equal(np.asarray(back.dd.lo), np.asarray(f.dd.lo))
    v_ref = multistep.elm2_velocity_f(tab, f, h)
    v_pak = multistep.elm2_velocity_fp(tab, fp, h, shape)
    np.testing.assert_array_equal(np.asarray(v_pak), np.asarray(v_ref))

    # --- 4-limb expansion (QF) engine ---
    def accel_limbs(t, limbs):
        return pairwise_accel_limbs_pair(
            limbs[0], limbs[1], limbs[2], mu_hi, mu_lo,
            tile_rows=8, tile_cols=16, interpret=True,
        )

    qf = multistep.elm2_qf_from_q(
        multistep.elm2_init_q(tab, accel, 0.0, pos, vel, h)
    )
    qfp = multistep.elm2_qfp_from(qf)
    for _ in range(steps):
        qf = multistep.elm2_step_qf(tab, accel_limbs, h, qf, interpret=True)
        qfp = multistep.elm2_step_qfp(
            tab, accel_limbs, h, qfp, shape, interpret=True
        )
    backq = multistep.elm2_qfp_to(qfp, shape)
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(backq.ys[k]), np.asarray(qf.ys[k])
        )
    np.testing.assert_array_equal(np.asarray(backq.dd.hi), np.asarray(qf.dd.hi))
    v_ref = multistep.elm2_velocity_qf(tab, qf, h)
    v_pak = multistep.elm2_velocity_qfp(tab, qfp, h, shape)
    np.testing.assert_array_equal(np.asarray(v_pak), np.asarray(v_ref))


def test_mixed_mode_error_envelope():
    """The mixed-precision kernel (error-free pair differences + f32 weight
    chain) holds ~1e-6 relative PER-PAIR error even for a very close pair,
    where the plain-f32 kernel's position-rounding cancellation costs
    orders of magnitude more — the documented middle rung of the precision
    ladder."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_f32,
        pairwise_accel_mixed,
    )

    n = 16
    rng = np.random.default_rng(29)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    # a Phobos-Mars-like close pair: separation ~5e-5 of the position
    # scale, deliberately NOT ulp-aligned (an ulp-multiple offset would
    # make the plain-f32 difference accidentally exact)
    pos[1] = pos[0] + np.array([40.1234567, 19.7654321, -9.87654321])
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu[0] = 1.0e7  # heavy primary so the close pair dominates body 1's force

    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))
    ref = np.asarray(
        pairwise_accel(jnp.asarray(pos), mu_hi, mu_lo,
                       interpret=True, tile_rows=8, tile_cols=8)
    )

    ph, plo = split_f64(jnp.asarray(pos), transpose=True)
    mu32 = jnp.asarray(mu, jnp.float64).astype(jnp.float32).reshape(1, n)
    mixed = np.asarray(
        pairwise_accel_mixed(ph, plo, mu32, interpret=True,
                             tile_rows=8, tile_cols=8)
    )
    fast = np.asarray(
        pairwise_accel_f32(
            jnp.asarray(pos, jnp.float64).astype(jnp.float32), mu32,
            interpret=True, tile_rows=8, tile_cols=8,
        )
    )

    # per-body relative error (body 1's force is dominated by the close pair)
    mag = np.linalg.norm(ref, axis=1)
    rel_mixed = np.linalg.norm(mixed - ref, axis=1) / mag
    rel_fast = np.linalg.norm(fast - ref, axis=1) / mag
    assert rel_mixed.max() < 3e-6, rel_mixed.max()
    # the close pair wrecks the plain-f32 kernel but not the mixed kernel
    assert rel_fast[1] > 30 * rel_mixed[1], (rel_fast[1], rel_mixed[1])
    assert rel_mixed[1] < 3e-6, rel_mixed[1]
    assert rel_mixed.max() > 1e-9  # sanity: it IS f32-chain, not df64


def test_rsqrt_df_bias_envelope():
    """The two-float rsqrt must stay UNBIASED to ~2^-53.

    One plain Newton refinement from the f32 seed lands at
    y_true*(1 - 1.5 d^2) — a systematic ~2^-49 undershoot that integrates
    QUADRATICALLY through a second-order multistep (it was the planets'
    km-scale century drift, docs/ACCURACY.md).  _rsqrt_df folds the next
    Taylor term, +(3/8)(s-1)^2, into the correction; this pins both the
    mean (bias) and max error so the fix cannot silently regress.
    """
    import jax

    from ephemeris_explorer_tpu.ops import eft
    from ephemeris_explorer_tpu.ops.pallas_nbody import _rsqrt_df

    rng = np.random.default_rng(0)
    x = np.exp(rng.uniform(np.log(1e-8), np.log(1e8), size=200_000))
    xh, xl = split_f64(jnp.asarray(x))
    y = jax.jit(_rsqrt_df)(eft.TwoFloat(xh, xl))
    yv = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
    truth = 1.0 / np.sqrt(np.asarray(x, np.longdouble))
    rel = (np.asarray(yv, np.longdouble) - truth) / truth
    # measured: bias -2^-53.6, max 2^-46.2 (pre-fix: bias -2^-49.3)
    assert abs(float(rel.mean())) < 2.0**-52, float(rel.mean())
    assert float(np.max(np.abs(rel))) < 2.0**-45, float(np.max(np.abs(rel)))


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_distant_pair_weight_chain():
    """Sun->Pluto-class force terms must keep full two-float precision.

    u^3 = r^-3 spans down to ~5e-30 km^-3 for the most distant physical
    pairs; the dd correction terms of a final (u^2*u)*mu multiply land
    f32-SUBNORMAL and flush on TPU hardware (measured: 1.2e-9 relative on
    the Sun->Pluto term).  The kernels reassociate as (u^2*mu)*u.  Two
    nets here: (1) the kernels on the geometry (catches gross breakage;
    interpret mode keeps subnormals, so the on-device flush itself is
    checked by tools/tpu_smoke.py); (2) an explicit flush-to-zero
    emulation of both associations, pinning WHY the order matters.
    """
    from fractions import Fraction

    from ephemeris_explorer_tpu.ops import eft, expansion as ex
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        _rsqrt_df,
        pairwise_accel_limbs,
    )

    n = 8
    pos = np.zeros((n, 3))
    pos[1] = [4.4e9, 3.7e9, -1.2e9]  # "Pluto", ~5.9e9 km from "Sun"
    pos[2:] = np.linspace(1e8, 2e9, 6)[:, None] * np.array([1.0, 0.3, -0.2])
    mu = np.full(n, 1e3)
    mu[0], mu[1] = 1.327e11, 8.7e2
    jpos = jnp.asarray(pos)
    mu_hi, mu_lo = split_f64(jnp.asarray(mu).reshape(1, n))

    def exact_accel(i):
        acc = [Fraction(0)] * 3
        pi = [Fraction(pos[i][k]) for k in range(3)]
        for j in range(n):
            if j == i:
                continue
            pj = [Fraction(pos[j][k]) for k in range(3)]
            d = [a - b for a, b in zip(pj, pi)]
            r2 = sum(v * v for v in d)
            inv_r3 = Fraction(float(np.longdouble(float(r2)) ** np.longdouble(-1.5)))
            for k in range(3):
                acc[k] += Fraction(mu[j]) * d[k] * inv_r3
        return np.array([float(a) for a in acc])

    truth = exact_accel(1)
    out2 = np.asarray(
        pairwise_accel(jpos, mu_hi, mu_lo, interpret=True, tile_rows=8, tile_cols=8)
    )
    limbs = ex.from_f64(jpos)
    out3 = np.asarray(
        pairwise_accel_limbs(
            *[np.asarray(l) for l in limbs[:3]], mu_hi, mu_lo,
            interpret=True, tile_rows=8, tile_cols=8,
        )
    )
    scale = np.max(np.abs(truth))
    assert np.max(np.abs(out2[1] - truth)) / scale < 1e-13
    assert np.max(np.abs(out3[1] - truth)) / scale < 1e-13

    # --- flush-to-zero emulation of the weight chain -----------------------
    # numpy keeps f32 subnormals (gradual underflow); TPU flushes them.
    # Emulate the flush after every EFT op and evaluate both associations
    # on the Sun->Pluto pair.
    def ftz(x):
        v = np.asarray(x)
        out = np.where(np.abs(v) < np.float32(2.0**-126), np.float32(0), v)
        return jnp.asarray(out)

    def ftz2(x):
        return eft.TwoFloat(ftz(x.hi), ftz(x.lo))

    d = pos[0] - pos[1]
    r2 = float(d @ d)
    r2h, r2l = split_f64(jnp.asarray([r2]))
    u = ftz2(_rsqrt_df(eft.TwoFloat(r2h, r2l)))
    muh, mul_ = split_f64(jnp.asarray([mu[0]]))
    mu_tf = eft.TwoFloat(muh, mul_)
    u2 = ftz2(eft.sqr(u))
    w_ship = ftz2(eft.mul(ftz2(eft.mul(u2, mu_tf)), u))      # (u^2*mu)*u
    w_naive = ftz2(eft.mul(ftz2(eft.mul(u2, u)), mu_tf))     # (u^2*u)*mu
    w_true = np.longdouble(mu[0]) * np.longdouble(r2) ** np.longdouble(-1.5)

    def rel(w):
        v = np.asarray(w.hi, np.float64) + np.asarray(w.lo, np.float64)
        return abs(float((np.longdouble(v[0]) - w_true) / w_true))

    assert rel(w_ship) < 1e-12, rel(w_ship)    # survives the flush
    assert rel(w_naive) > 1e-10, rel(w_naive)  # loses the lo words to FTZ


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_precise_sums_kernel():
    """The precise beta-sum kernel path (elm2_step_qf(precise_sums=True)):
    (a) tracks the unfused elm2_step_q(precise_sums=True) twin to the
    expansion-increment precision on a single step, and (b) the packed
    entry point is bitwise-identical to the unpacked one."""
    from ephemeris_explorer_tpu.integrators import get, multistep
    from ephemeris_explorer_tpu.ops import nbody
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        combine_f64, pairwise_accel_limbs_pair,
    )

    n = 8
    rng = np.random.default_rng(9)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    vel = rng.normal(size=(n, 3))
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    mu_j = jnp.asarray(mu)
    mu_hi, mu_lo = split_f64(mu_j.reshape(1, -1))
    h = 600.0
    tab = get("QuinlanTremaine12")

    accel = lambda t, y: nbody.pairwise_accel(y, mu_j)  # noqa: E731

    def accel_limbs(t, limbs):
        return combine_f64(
            *pairwise_accel_limbs_pair(
                limbs[0], limbs[1], limbs[2], mu_hi, mu_lo,
                interpret=True, tile_rows=8, tile_cols=8,
            )
        )

    def accel_pair(t, limbs):
        return pairwise_accel_limbs_pair(
            limbs[0], limbs[1], limbs[2], mu_hi, mu_lo,
            interpret=True, tile_rows=8, tile_cols=8,
        )

    q = multistep.elm2_init_q(tab, accel, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    qf = multistep.elm2_qf_from_q(q)

    q1 = multistep.elm2_step_q(
        tab, accel, h, q, accel_limbs=accel_limbs, with_velocity=False,
        precise_sums=True,
    )
    qf1 = multistep.elm2_step_qf(
        tab, accel_pair, h, qf, interpret=True, precise_sums=True
    )
    y1q = np.asarray(ex_to_f64(q1.ys))
    y1f = np.asarray(ex_to_f64(qf1.ys))
    np.testing.assert_allclose(y1f, y1q, atol=np.abs(y1q).max() * 2.0**-50, rtol=0)

    # packed twin: same values as the unpacked kernel.  On real Mosaic the
    # layouts are bitwise-identical (elementwise kernel); under interpret
    # mode XLA:CPU fuses the renorm cascades differently per layout and
    # the DEEP limbs (~2^-60 of the value) round differently — the known
    # re-rounding hazard (ops/pallas_elm2.py docstring) — so CI asserts
    # value-level equality at the two-float floor instead of bitwise.
    qfp = multistep.elm2_qfp_from(qf, sub=4)
    qfp1 = multistep.elm2_step_qfp(
        tab, accel_pair, h, qfp, shape=(n, 3), interpret=True,
        precise_sums=True,
    )
    back = multistep.elm2_qfp_to(qfp1, (n, 3))
    yb = np.asarray(ex_to_f64(back.ys))
    np.testing.assert_allclose(yb, y1f, atol=np.abs(y1f).max() * 2.0**-50, rtol=0)
    np.testing.assert_array_equal(np.asarray(back.dd.hi), np.asarray(qf1.dd.hi))


# ---------------------------------------------------------------------------
# Magnitude-split mode (f32 weak tail + exact f64 strong set)
# ---------------------------------------------------------------------------


def _hierarchy(n=16, seed=7):
    """Sun + 3 planets + close moon pairs + light far bodies: the dominated
    geometry the split mode is built for (close pairs AND dominant
    attractors in every row's top-K)."""
    rng = np.random.default_rng(seed)
    AU = 1.5e11
    pos = [np.zeros(3)]
    mu = [1.33e20]
    for i in range(3):
        pp = rng.normal(size=3)
        pp = pp / np.linalg.norm(pp) * AU * (0.7 + i)
        pos.append(pp)
        mu.append(3e14 * (i + 1))
        for m in range(2):
            off = rng.normal(size=3)
            off = off / np.linalg.norm(off) * 4e8 * (1 + 0.002 * m)
            pos.append(pp + off)
            mu.append(5e12)
    while len(pos) < n:
        pos.append(rng.normal(size=3) * AU * 2)
        mu.append(1e10)
    return jnp.asarray(np.array(pos)), jnp.asarray(np.array(mu))


def _rel_err(a, ref):
    a, ref = np.asarray(a), np.asarray(ref)
    return np.linalg.norm(a - ref, axis=1) / np.linalg.norm(ref, axis=1)


def test_split_mode_exact_when_all_strong():
    """K = N-1 masks every pair out of the f32 kernel: the split mode must
    reduce to the pure-f64 gathered computation (the two passes partition
    the pair set — no bitwise-replica coupling to go wrong)."""
    from ephemeris_explorer_tpu.ops.nbody import pairwise_accel as dense_f64
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_split, strong_pair_indices, strong_pair_mask)

    rng = np.random.default_rng(3)
    n = 16
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 1e6)
    mu = jnp.asarray(rng.uniform(1e3, 1e5, size=n))
    idx = strong_pair_indices(pos, mu, k=n - 1)
    mask = strong_pair_mask(idx, n)
    a = pairwise_accel_split(pos, mu, idx, mask, tile_rows=8, tile_cols=8,
                             interpret=True, exact_f64=True)
    assert _rel_err(a, dense_f64(pos, mu)).max() < 1e-14
    # the production two-float correction covers the same partition at its
    # own ~2^-47 working precision
    a_df = pairwise_accel_split(pos, mu, idx, mask, tile_rows=8, tile_cols=8,
                                interpret=True)
    assert _rel_err(a_df, dense_f64(pos, mu)).max() < 1e-12


def test_strong_correction_df64_matches_f64():
    """The production two-float correction is the f64 chain to ~2^-45 on
    the strong sets it actually sees (hierarchy geometry, K=6): swapping
    it in must be invisible five orders under the ~1e-9 split envelope."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        _strong_correction, _strong_correction_df64, strong_pair_indices)

    import jax

    pos, mu = _hierarchy()
    idx = strong_pair_indices(pos, mu, k=6)
    ref = _strong_correction(pos, mu, idx)
    got = _strong_correction_df64(pos, mu, idx, interpret=True)
    assert _rel_err(got, ref).max() < 3e-13, _rel_err(got, ref).max()
    # ... and survives jit: the eft chain lives under Mosaic, out of the
    # HLO simplifier's reach (the jnp version of the same chain measurably
    # degrades to f32-grade 3.7e-8 when jitted — see _strong_corr_kernel)
    jitted = jax.jit(
        lambda p, m, i: _strong_correction_df64(p, m, i, interpret=True)
    )(pos, mu, idx)
    assert _rel_err(jitted, ref).max() < 3e-13, _rel_err(jitted, ref).max()


def test_strong_correction_fast_matches_f64():
    """The round-5 production correction (split-limb feed, TwoFloat
    differencing in-kernel): ~1.7e-12 on the hierarchy — the limbs'
    2^-48-of-|p| representation error amplified by |p|/|d| on the close
    pairs, three decades inside the split mode's ~1e-9 envelope.  The
    glue this buys: ~1190 us/step of f64 gather/transpose XLA feed drops
    to one packed f32 gather (measured anatomy in docs/PERF.md)."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        _strong_correction, _strong_correction_fast, strong_pair_indices)

    import jax

    pos, mu = _hierarchy()
    idx = strong_pair_indices(pos, mu, k=6)
    ref = _strong_correction(pos, mu, idx)
    got = _strong_correction_fast(pos, mu, idx, interpret=True)
    assert _rel_err(got, ref).max() < 5e-12, _rel_err(got, ref).max()
    # grade sanity: coarser than the f64-differenced feed (else the
    # cheaper feed would be measuring the wrong thing), finer than 1e-11
    assert _rel_err(got, ref).max() > 1e-14
    jitted = jax.jit(
        lambda p, m, i: _strong_correction_fast(p, m, i, interpret=True)
    )(pos, mu, idx)
    assert _rel_err(jitted, ref).max() < 5e-12, _rel_err(jitted, ref).max()


def test_split_mode_hierarchy_envelope():
    """The mode's target regime: for a dominated hierarchy the split mode
    lands at ~1e-9 (the weak tail's f32 noise against a sun-led field)
    vs the plain f32 kernel's close-pair-wrecked ~3e-5."""
    from ephemeris_explorer_tpu.ops.nbody import pairwise_accel as dense_f64
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_f32, pairwise_accel_split, strong_pair_indices,
        strong_pair_mask)

    pos, mu = _hierarchy()
    ref = dense_f64(pos, mu)
    idx = strong_pair_indices(pos, mu, k=6)
    mask = strong_pair_mask(idx, 16)
    split = _rel_err(
        pairwise_accel_split(pos, mu, idx, mask,
                             tile_rows=8, tile_cols=8, interpret=True), ref)
    plain = _rel_err(
        pairwise_accel_f32(pos.astype(jnp.float32),
                           mu.astype(jnp.float32).reshape(1, -1),
                           tile_rows=8, tile_cols=8, interpret=True), ref)
    assert split.max() < 2e-9, split.max()          # measured 6.3e-10
    assert plain.max() > 1e3 * split.max()          # measured 3.1e-5 (49000x)
    assert split.max() > 1e-12                      # sanity: f32 tail, not df64


def test_split_mode_random_cloud_envelope():
    """No-structure worst case: sum cancellation makes the weak tail's
    |contribution| exceed the net field, so the floor is ~2^-24 relative —
    still strictly better than the unsplit kernel on the same cloud."""
    from ephemeris_explorer_tpu.ops.nbody import pairwise_accel as dense_f64
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_f32, pairwise_accel_split, strong_pair_indices,
        strong_pair_mask)

    rng = np.random.default_rng(11)
    n = 64
    pos = jnp.asarray(rng.normal(size=(n, 3)) * 1e6)
    mu = jnp.asarray(rng.uniform(1e3, 1e5, size=n))
    ref = dense_f64(pos, mu)
    idx = strong_pair_indices(pos, mu, k=8)
    mask = strong_pair_mask(idx, n)
    split = _rel_err(
        pairwise_accel_split(pos, mu, idx, mask,
                             tile_rows=8, tile_cols=16, interpret=True), ref)
    plain = _rel_err(
        pairwise_accel_f32(pos.astype(jnp.float32),
                           mu.astype(jnp.float32).reshape(1, -1),
                           tile_rows=8, tile_cols=16, interpret=True), ref)
    assert split.max() < 4e-7, split.max()          # measured 1.6e-7
    assert split.max() < plain.max()                # measured 5.9e-7


def test_strong_pair_selection_invariants():
    """idx excludes self, mask marks exactly idx, and the selection is by
    weight mu_j/r^3: a close moon sibling must out-rank the sun for the
    moon row even though the sun dominates the CONTRIBUTION magnitude."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        strong_pair_indices, strong_pair_mask)

    pos, mu = _hierarchy()
    k = 5
    idx = np.asarray(strong_pair_indices(pos, mu, k=k))
    n = pos.shape[0]
    assert idx.shape == (n, k)
    for i in range(n):
        assert i not in idx[i]
        assert len(set(idx[i].tolist())) == k
    mask = np.asarray(strong_pair_mask(jnp.asarray(idx), n))
    # exactly idx plus the self diagonal (carried in the exclusion table
    # so the kernel can skip its per-pair self compare, r5)
    assert mask.sum() == n * k + n
    assert np.diagonal(mask).all()
    rows = np.repeat(np.arange(n), k)
    assert mask[rows, idx.reshape(-1)].all()
    # rows 2,3 are the first planet's moon pair: each moon's top-k must
    # contain its sibling (w = mu/r^3 puts the 8e5 m pair first) AND the
    # sun (the dominant attractor)
    assert 3 in idx[2] and 2 in idx[3]
    assert 0 in idx[2] and 0 in idx[3]


def test_split_rows_slices_match_square():
    """The rectangular (row-shardable) split-mode pieces are BITWISE the
    corresponding row slices of the square composition when run
    standalone — the invariant the sharded wrapper is built on (the
    shard_map-composed gate with its interpret-fusion caveat lives in
    test_sharding.py; the on-chip bitwise gate in tools/tpu_smoke.py)."""
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        _strong_correction_fast, pairwise_accel_f32_masked,
        pairwise_accel_f32_masked_rows, strong_pair_indices,
        strong_pair_indices_rows, strong_pair_mask, strong_pair_mask_rows)

    rng = np.random.default_rng(5)
    n, k, nl = 32, 4, 8
    pos = jnp.asarray(np.concatenate([
        rng.normal(size=(n // 2, 3)) * 1e6,
        rng.normal(size=(n // 2, 3)) * 1e6 + 3e7,
    ]))
    mu = jnp.asarray(rng.uniform(1e3, 1e5, n))
    tiles = dict(tile_rows=8, tile_cols=8)

    idx = strong_pair_indices(pos, mu, k=k)
    mask = strong_pair_mask(idx, n)
    for shard in range(n // nl):
        r0 = shard * nl
        rows = pos[r0:r0 + nl]
        idx_r = strong_pair_indices_rows(pos, rows, mu, jnp.int32(r0), k=k)
        np.testing.assert_array_equal(
            np.asarray(idx_r), np.asarray(idx[r0:r0 + nl]))
        mask_r = strong_pair_mask_rows(idx_r, n, jnp.int32(r0))
        np.testing.assert_array_equal(
            np.asarray(mask_r), np.asarray(mask[r0:r0 + nl]))

    pos32 = pos.astype(jnp.float32)
    mu32 = mu.astype(jnp.float32).reshape(1, -1)
    m_sq = np.asarray(pairwise_accel_f32_masked(
        pos32, mu32, mask, interpret=True, diag_in_mask=True, **tiles))
    c_sq = np.asarray(_strong_correction_fast(pos, mu, idx, interpret=True))
    for shard in range(n // nl):
        r0 = shard * nl
        m_r = pairwise_accel_f32_masked_rows(
            pos32, mu32, mask[r0:r0 + nl], pos32[r0:r0 + nl],
            interpret=True, **tiles)
        np.testing.assert_array_equal(np.asarray(m_r), m_sq[r0:r0 + nl])
        c_r = _strong_correction_fast(
            pos, mu, idx[r0:r0 + nl], interpret=True, rows=pos[r0:r0 + nl])
        np.testing.assert_array_equal(np.asarray(c_r), c_sq[r0:r0 + nl])
