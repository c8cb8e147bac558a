"""Real-Mosaic shard_map smoke: the production sharded compositions on TPU.

The CI suite validates the sharded scans bitwise on a virtual CPU mesh in
Pallas interpret mode (tests/test_sharding.py); this tool runs the SAME
compositions with real compiled Mosaic kernels inside `jax.shard_map` on
the actual TPU chip — a 1-device mesh, so the collectives are trivial but
the full production lowering (shard_map partitioning x Pallas custom
calls x scan) compiles and executes.  Each sharded result is checked
bitwise against the corresponding unsharded real-Mosaic engine.

This is the closest de-risking of the multi-chip path available on a
single-chip box; run it unchanged on a real pod slice (bump data/model in
`make_mesh`) when hardware appears.

Usage: python tools/tpu_smoke.py   (prints one PASS line per composition)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _cluster(n, seed=0, e=None):
    rng = np.random.default_rng(seed)
    shape = (n, 3) if e is None else (e, n, 3)
    pos = rng.normal(size=shape) * 1.0e6
    vel = rng.normal(size=shape)
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    return pos, vel, mu


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.integrators.multistep import (
        elm2_f_from, elm2_init, elm2_init_q, elm2_qf_from_q, elm2_step_f,
        elm2_step_qf, elm2_velocity_f, elm2_velocity_qf,
    )
    from ephemeris_explorer_tpu.ops import nbody
    from ephemeris_explorer_tpu.ops.eft import TwoFloat
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_df64, pairwise_accel_limbs_pair, split_f64,
    )
    from ephemeris_explorer_tpu.parallel import sharding as sh

    if jax.default_backend() not in ("tpu", "axon"):
        print("tpu_smoke: no TPU backend — nothing to smoke", file=sys.stderr)
        return 1

    tab = get("QuinlanTremaine12")
    h = 600.0
    steps = 8
    n = 256
    tiles = dict(tile_rows=128, tile_cols=256)
    mesh = sh.make_mesh(data=1, model=1, devices=jax.devices()[:1])

    pos, vel, mu = _cluster(n, seed=11)
    mu_j = jnp.asarray(mu)
    mu_hi, mu_lo = split_f64(mu_j.reshape(1, -1))
    accel64 = lambda t, y: nbody.pairwise_accel(y, mu_j)  # noqa: E731

    # --- N-axis f64-equivalent engine: rowsharded scan vs unsharded fused
    carry0 = elm2_f_from(
        elm2_init(tab, accel64, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    )

    def accel_pair(t, y):
        ah, al = pairwise_accel_df64(y.hi.T, y.lo.T, mu_hi, mu_lo, **tiles)
        return TwoFloat(ah, al)

    @jax.jit
    def ref_f(c):
        for _ in range(steps):
            c = elm2_step_f(tab, accel_pair, h, c)
        return c._replace(dy=elm2_velocity_f(tab, c, h))

    ref = ref_f(carry0)
    run_row, _ = sh.make_rowsharded_scan_f(mesh, tab, mu, h, steps, **tiles)
    out = run_row(carry0)
    np.testing.assert_array_equal(np.asarray(out.ys.hi), np.asarray(ref.ys.hi))
    np.testing.assert_array_equal(np.asarray(out.ys.lo), np.asarray(ref.ys.lo))
    np.testing.assert_array_equal(np.asarray(out.dd.hi), np.asarray(ref.dd.hi))
    np.testing.assert_allclose(
        np.asarray(out.dy), np.asarray(ref.dy), rtol=1e-14, atol=0
    )
    print(f"PASS rowsharded_scan_f    (N={n}, {steps} steps, real Mosaic x shard_map, bitwise vs unsharded)")

    # --- N-axis PARITY engine: rowsharded 4-limb/3-limb scan
    carry0q = elm2_qf_from_q(
        elm2_init_q(tab, accel64, 0.0, jnp.asarray(pos), jnp.asarray(vel), h)
    )

    def accel_pair3(t, limbs):
        return pairwise_accel_limbs_pair(
            limbs[0], limbs[1], limbs[2], mu_hi, mu_lo, **tiles
        )

    @jax.jit
    def ref_qf(c):
        for _ in range(steps):
            c = elm2_step_qf(tab, accel_pair3, h, c)
        return c._replace(dy=elm2_velocity_qf(tab, c, h))

    refq = ref_qf(carry0q)
    run_rowq, _ = sh.make_rowsharded_scan_qf(mesh, tab, mu, h, steps, **tiles)
    outq = run_rowq(carry0q)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(outq.ys[k]), np.asarray(refq.ys[k]))
    np.testing.assert_array_equal(np.asarray(outq.dd.hi), np.asarray(refq.dd.hi))
    # dy is reconstructed in plain f64 at the chunk boundary; on the
    # emulated-f64 TPU backend XLA contracts the (y0-y1)/h + c*wsum chain
    # with different FMA groupings inside vs outside shard_map — a few ULP
    # on dy only, the rings above stay bitwise
    np.testing.assert_allclose(
        np.asarray(outq.dy), np.asarray(refq.dy), rtol=1e-14, atol=0
    )
    print(f"PASS rowsharded_scan_qf   (N={n}, {steps} steps, parity engine, bitwise vs unsharded)")

    # --- N-axis PARITY engine + PRECISE BETA SUMS (the production default
    # for extended engines): the cascaded error-free reduction has to run
    # sharded on real Mosaic, not just via the virtual-CPU dryrun (which
    # exercises the f64-dot fallback, not the cascade) — VERDICT r4 weak-2
    @jax.jit
    def ref_qf_ps(c):
        for _ in range(steps):
            c = elm2_step_qf(tab, accel_pair3, h, c, precise_sums=True)
        return c._replace(dy=elm2_velocity_qf(tab, c, h, precise_sums=True))

    refq_ps = ref_qf_ps(carry0q)
    run_rowq_ps, _ = sh.make_rowsharded_scan_qf(
        mesh, tab, mu, h, steps, precise_sums=True, **tiles
    )
    outq_ps = run_rowq_ps(carry0q)
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(outq_ps.ys[k]), np.asarray(refq_ps.ys[k])
        )
    np.testing.assert_array_equal(
        np.asarray(outq_ps.dd.hi), np.asarray(refq_ps.dd.hi)
    )
    np.testing.assert_allclose(
        np.asarray(outq_ps.dy), np.asarray(refq_ps.dy), rtol=1e-14, atol=0
    )
    # the precise and plain beta sums must actually differ on-chip (else the
    # cascade silently didn't run): same engine, different rounding tail
    assert any(
        not np.array_equal(np.asarray(outq_ps.ys[k]), np.asarray(outq.ys[k]))
        for k in range(4)
    ), "precise_sums output is bitwise identical to the plain dot — cascade inert?"
    print(
        f"PASS rowsharded_scan_qf+psums (N={n}, {steps} steps, cascaded "
        "error-free beta sums SHARDED on real Mosaic, bitwise vs unsharded)"
    )

    # --- ensemble (data) axis: shard_map x fused pair-native scan
    e = 2
    epos, evel, emu = _cluster(n, seed=13, e=e)
    carry0e = sh.init_fused_ensemble_carry(tab, emu, 0.0, epos, evel, h)
    run_f, to_f = sh.make_fused_ensemble_scan_f(tab, emu, h, steps, **tiles)
    ref_e = run_f(to_f(carry0e))
    run_sm, to_f2 = sh.make_shardmap_ensemble_scan_f(
        mesh, tab, emu, h, steps, **tiles
    )
    out_e = run_sm(to_f2(carry0e))
    np.testing.assert_array_equal(
        np.asarray(out_e.ys.hi), np.asarray(ref_e.ys.hi)
    )
    np.testing.assert_array_equal(
        np.asarray(out_e.ys.lo), np.asarray(ref_e.ys.lo)
    )
    print(f"PASS shardmap_ensemble_f  (E={e} x N={n}, {steps} steps, bitwise vs fused single-program)")

    # --- distant-pair subnormal regression (DEVICE-ONLY failure mode) ------
    # TPU flushes f32 subnormals; interpret mode (numpy) does not, so the CI
    # variant of this check (tests/test_pallas_nbody.py::
    # test_distant_pair_weight_chain) cannot see the flush itself.  A
    # Sun->Pluto-class geometry exercises the u^3 ~ 5e-30 weight chain: with
    # the (u^2*mu)*u association every intermediate stays f32-normal; the
    # (u^2*u)*mu association silently degraded this row to ~1.2e-9 relative.
    from ephemeris_explorer_tpu.ops import expansion as ex

    dp = np.zeros((8, 3))
    dp[1] = [4.4e9, 3.7e9, -1.2e9]  # "Pluto", ~5.9e9 km out
    dp[2:] = np.linspace(1e8, 2e9, 6)[:, None] * np.array([1.0, 0.3, -0.2])
    dmu = np.full(8, 1e3)
    dmu[0], dmu[1] = 1.327e11, 8.7e2
    dmu_hi, dmu_lo = split_f64(jnp.asarray(dmu).reshape(1, -1))
    ref_np = np.zeros((8, 3))
    for i in range(8):
        for j in range(8):
            if i == j:
                continue
            d = dp[j] - dp[i]
            r2 = np.longdouble(d @ d)
            ref_np[i] += np.asarray(
                np.longdouble(dmu[j]) * d * r2 ** np.longdouble(-1.5), np.float64
            )
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel as pa2, pairwise_accel_limbs as pa3,
    )

    out2 = np.asarray(pa2(jnp.asarray(dp), dmu_hi, dmu_lo,
                          tile_rows=8, tile_cols=8))
    limbs = ex.from_f64(jnp.asarray(dp))
    out3 = np.asarray(pa3(*[np.asarray(l) for l in limbs[:3]],
                          dmu_hi, dmu_lo, tile_rows=8, tile_cols=8))
    scale = np.max(np.abs(ref_np[1]))
    rel2 = np.max(np.abs(out2[1] - ref_np[1])) / scale
    rel3 = np.max(np.abs(out3[1] - ref_np[1])) / scale
    assert rel2 < 1e-12, f"2-limb Sun->Pluto row degraded: {rel2}"
    assert rel3 < 1e-12, f"3-limb Sun->Pluto row degraded: {rel3}"
    print(f"PASS distant_pair_flush   (Sun->Pluto row, rel {rel2:.1e}/{rel3:.1e} on device FTZ)")

    # --- magnitude-split mode on real Mosaic --------------------------------
    # The CI envelope tests run the masked kernel in interpret mode; this
    # checks the real lowering (int8 mask tiles x f32 math x the Mosaic
    # two-float correction) lands at the same ~1e-9 envelope on a dominated
    # hierarchy.  The reference MUST be host numpy: the on-device
    # emulated-f64 dense kernel (ops/nbody.pairwise_accel) is itself only
    # ~3e-4-grade on close pairs on this platform (measured on this exact
    # fixture, worst rows = the moon pairs), i.e. three orders WORSE than
    # the thing being checked.
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_split, strong_pair_indices, strong_pair_mask,
    )

    rngh = np.random.default_rng(7)
    AUm = 1.5e11
    nh = 128
    hpos = [np.zeros(3)]
    hmu = [1.33e20]
    for i in range(3):
        pp = rngh.normal(size=3)
        pp = pp / np.linalg.norm(pp) * AUm * (0.7 + i)
        hpos.append(pp)
        hmu.append(3e14 * (i + 1))
        for m in range(2):
            off = rngh.normal(size=3)
            off = off / np.linalg.norm(off) * 4e8 * (1 + 0.002 * m)
            hpos.append(pp + off)
            hmu.append(5e12)
    while len(hpos) < nh:
        hpos.append(rngh.normal(size=3) * AUm * 2)
        hmu.append(1e10)
    hpos = jnp.asarray(np.array(hpos))
    hmu = jnp.asarray(np.array(hmu))
    idx = strong_pair_indices(hpos, hmu, k=8)
    smask = strong_pair_mask(idx, nh)
    a_split = np.asarray(
        pairwise_accel_split(hpos, hmu, idx, smask, tile_rows=8, tile_cols=128)
    )
    Ph = np.asarray(hpos)
    Mh = np.asarray(hmu)
    dh = Ph[None, :, :] - Ph[:, None, :]
    r2h = (dh * dh).sum(-1)
    np.fill_diagonal(r2h, 1.0)
    wh = Mh[None, :] / (r2h * np.sqrt(r2h))
    np.fill_diagonal(wh, 0.0)
    a_ref = (wh[:, :, None] * dh).sum(1)
    rel = np.linalg.norm(a_split - a_ref, axis=1) / np.linalg.norm(a_ref, axis=1)
    assert rel.max() < 5e-9, f"split-mode on-device envelope blew up: {rel.max()}"
    print(f"PASS split_mode_mosaic    (N={nh} hierarchy, max rel {rel.max():.1e} vs host f64)")

    # --- ROW-SHARDED split mode (r5): shard_map x masked/corr Mosaic
    # kernels, BITWISE vs the unsharded composition.  On real Mosaic the
    # eft chains live inside compiled kernels (out of the jit fusion's
    # reach), so the bitwise contract HOLDS here — unlike the CI mesh,
    # where interpret-mode inlining forces a value-level gate
    # (test_rowsharded_split_force_matches' docstring).
    refresh, force = sh.make_rowsharded_split_force(
        mesh, np.asarray(hmu), k=8, tile_rows=8, tile_cols=128
    )
    hp = jax.device_put(
        hpos, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("model", None))
    )
    sidx, smask2 = refresh(hp)
    np.testing.assert_array_equal(np.asarray(sidx), np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(smask2), np.asarray(smask))
    a_sh = np.asarray(force(hp, sidx, smask2))
    np.testing.assert_array_equal(a_sh, a_split)
    print(f"PASS split_rowsharded     (N={nh}, refresh+force, bitwise vs unsharded)")

    print("tpu_smoke: all production shard_map x Mosaic compositions OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
