#!/usr/bin/env python3
"""Benchmarks on one TPU chip.

Default (driver contract): prints exactly ONE JSON line for the headline
metric — body-steps/sec/chip on a synthetic 4096-body cluster, QT12 (one
O(N^2) force eval per step), f64-equivalent arithmetic.  Baseline target
(BASELINE.json north star): 1e6 body-steps/sec/chip.

``--all`` additionally benchmarks every BASELINE.json config:

  n4096_df64        headline: plain df64 state + Pallas two-float pair kernel
  n4096_parity      the parity-mode engine: quad-f32 expansion state +
                    3-limb Pallas force (elm2_step_q + pairwise_accel_limbs)
  fss_generation    full_solar_system ephemeris GENERATION (integration +
                    sampling + least-squares fit), sim-days/sec
  fleet64           64 batched spacecraft with flight-plan burns vs the
                    interpolated context, 300-day missions (vmapped)
  ensemble16x4096   16 initial conditions x 4096 bodies (vmapped Pallas scan)

and writes BENCH_all.json + fills BASELINE.json "published".
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

N_BODIES = 4096
STEPS_PER_CHUNK = 400
GROUPS = 2            # timed groups; spread across groups is published
CHUNKS_PER_GROUP = 3  # chunks queued back-to-back per group (one drain each)
FAST_CHUNK_MULT = 5   # extra chunks for the fast modes (sub-second groups
                      # otherwise drown in the fixed relay-drain jitter)
BASELINE = 1.0e6  # body-steps/sec/chip

# Measurement note (round 3): every host sync through the remote-device
# relay costs a FIXED ~0.26 s queue-drain round trip, independent of the
# work queued (measured by solving 3-chunk vs 5-chunk timings for the
# per-chunk cost).  Per-chunk syncs therefore under-report throughput by
# 15-40%; the timing below queues CHUNKS_PER_GROUP chunks per drain and
# syncs on the carry's scalar time (not a ring transfer) to amortise it.

REPO = Path(__file__).resolve().parent


def _cluster(n, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 3)) * 1.0e6
    vel = rng.normal(size=(n, 3)) * 1.0
    mu = rng.uniform(1.0e3, 1.0e5, size=n)
    return pos, vel, mu


def _force(x):
    """Force completion with a host transfer (block_until_ready is unreliable
    through remote-device relays)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0]).reshape(-1)[0]


def bench_headline() -> dict:
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.integrators.multistep import elm2_init, elm2_step
    from ephemeris_explorer_tpu.ops import nbody

    pos, vel, mu = _cluster(N_BODIES)
    tab = get("QuinlanTremaine12")
    mu_dev = jnp.asarray(mu)
    h = 600.0

    # Pallas two-float pair kernel + fused pair-state update (the whole
    # step stays in (hi, lo) f32 pairs - no emulated-f64 round trips);
    # fall back to the jnp kernel + plain carry if the platform can't
    # lower Pallas.  The warm-up call is INSIDE the guard so the fused
    # kernels' first lowering is covered, not just the probe.
    from ephemeris_explorer_tpu.integrators.multistep import elm2_velocity

    def _fused_path():
        # pair-native scan with the SUBLANE-PACKED carry (rings stored
        # (ORDER, 8, M/8) across steps; measured +29% over the unpacked
        # fused scan at N=4096 — the update kernel uses all 8 VPU sublanes)
        from ephemeris_explorer_tpu.integrators.multistep import (
            elm2_f_from,
            elm2_fp_from,
            elm2_step_fp,
            elm2_velocity_fp,
        )
        from ephemeris_explorer_tpu.ops.eft import TwoFloat
        from ephemeris_explorer_tpu.ops.pallas_nbody import (
            pairwise_accel as pallas_accel,
            pairwise_accel_df64,
            split_f64,
        )

        mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))
        shape = (N_BODIES, 3)

        def accel(t, y):
            return pallas_accel(y, mu_hi, mu_lo)

        def accel_pair(t, y):
            ah, al = pairwise_accel_df64(y.hi.T, y.lo.T, mu_hi, mu_lo)
            return TwoFloat(ah, al)

        @jax.jit
        def chunk(carry):
            def body(c, _):
                return elm2_step_fp(tab, accel_pair, h, c, shape), None

            c, _ = jax.lax.scan(body, carry, None, length=STEPS_PER_CHUNK)
            return c._replace(dy=elm2_velocity_fp(tab, c, h, shape))

        init = jax.jit(
            lambda p, v: elm2_fp_from(elm2_f_from(elm2_init(tab, accel, 0.0, p, v, h)))
        )
        carry = chunk(init(jnp.asarray(pos), jnp.asarray(vel)))
        assert np.isfinite(_force(carry.ys))
        return chunk, carry

    def _plain_path():
        def accel(t, y):
            return nbody.pairwise_accel(y, mu_dev)

        @jax.jit
        def chunk(carry):
            def body(c, _):
                return elm2_step(tab, accel, h, c, with_velocity=False), None

            c, _ = jax.lax.scan(body, carry, None, length=STEPS_PER_CHUNK)
            return c._replace(dy=elm2_velocity(tab, c, h))

        init = jax.jit(lambda p, v: elm2_init(tab, accel, 0.0, p, v, h))
        carry = chunk(init(jnp.asarray(pos), jnp.asarray(vel)))
        _force(carry.ys)
        return chunk, carry

    try:
        chunk, carry = _fused_path()
    except Exception:
        chunk, carry = _plain_path()

    # grouped timing (see the measurement note at the top): queue
    # CHUNKS_PER_GROUP chunks per host drain, sync on the scalar carry
    # time, publish the across-group spread as the error bar
    rates = []
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_GROUP):
            carry = chunk(carry)
        _force(carry.t)
        rates.append(
            N_BODIES * STEPS_PER_CHUNK * CHUNKS_PER_GROUP
            / (time.perf_counter() - t0)
        )
    elapsed = time.perf_counter() - t_all

    steps = GROUPS * CHUNKS_PER_GROUP * STEPS_PER_CHUNK
    value = N_BODIES * steps / elapsed
    final = np.asarray(carry.ys[0])
    assert np.isfinite(final).all(), "non-finite state after benchmark"
    return {
        "metric": f"body-steps/sec/chip (N={N_BODIES}, QT12 f64)",
        "value": round(value, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(value / BASELINE, 3),
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


def bench_parity() -> dict:
    """The engine the 100-year accuracy story rests on: expansion state +
    3-limb Pallas force (docs/ACCURACY.md), fused-update path (the Pallas
    VMEM state-update kernel + pair-native force ring, ops/pallas_elm2.py)."""
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.integrators.multistep import (
        elm2_init_q,
        elm2_qf_from_q,
        elm2_qfp_from,
        elm2_step_qfp,
        elm2_velocity_qfp,
    )
    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel as pallas_accel,
        pairwise_accel_limbs_pair,
        split_f64,
    )

    pos, vel, mu = _cluster(N_BODIES)
    tab = get("QuinlanTremaine12")
    mu_dev = jnp.asarray(mu)
    mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))
    h = 600.0
    shape = (N_BODIES, 3)

    def accel(t, y):
        return pallas_accel(y, mu_hi, mu_lo)

    def accel_pair(t, limbs):
        return pairwise_accel_limbs_pair(limbs[0], limbs[1], limbs[2], mu_hi, mu_lo)

    def accel_limbs(t, limbs):
        fh, fl = accel_pair(t, limbs)
        return fh.astype(jnp.float64) + fl.astype(jnp.float64)

    @jax.jit
    def chunk(carry):
        def body(c, _):
            # precise beta sums = the shipping accuracy arithmetic (round 4:
            # 10-y worst body 9.0 -> 0.84 m vs the 2^-106 truth); the bench
            # times the engine the accuracy story actually rests on
            return (
                elm2_step_qfp(tab, accel_pair, h, c, shape, precise_sums=True),
                None,
            )

        c, _ = jax.lax.scan(body, carry, None, length=STEPS_PER_CHUNK)
        # Cowell velocity deferred out of the scan (production generation
        # does the same per chunk); restored here so the carry stays exact
        return c._replace(dy=elm2_velocity_qfp(tab, c, h, shape))

    init = jax.jit(
        lambda p, v: elm2_qfp_from(
            elm2_qf_from_q(
                elm2_init_q(tab, accel, 0.0, p, v, h, accel_limbs=accel_limbs)
            )
        )
    )
    carry = init(jnp.asarray(pos), jnp.asarray(vel))
    carry = chunk(carry)
    _force(carry.t)

    rates = []
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_GROUP):
            carry = chunk(carry)
        _force(carry.t)
        rates.append(
            N_BODIES * STEPS_PER_CHUNK * CHUNKS_PER_GROUP
            / (time.perf_counter() - t0)
        )
    elapsed = time.perf_counter() - t_all

    steps = GROUPS * CHUNKS_PER_GROUP * STEPS_PER_CHUNK
    value = N_BODIES * steps / elapsed
    assert np.isfinite(_force(carry.ys))
    return {
        "metric": f"body-steps/sec/chip (N={N_BODIES}, QT12 expansion+3-limb parity engine, fused update)",
        "value": round(value, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(value / BASELINE, 3),
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


def bench_fss_generation() -> dict:
    """full_solar_system ephemeris generation incl. sampling + LSQ fit."""
    from ephemeris_explorer_tpu import Duration
    from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
    from ephemeris_explorer_tpu.io.scene import load_scene

    sc = load_scene(REPO / "systems" / "full_solar_system_2433282.5")
    span = Duration.from_years(1.0)
    # package-canonical chunking (ephemeris.CHUNK_STEPS + pow2 tail
    # bucket): generate_ephemeris double-buffers chunk fetches
    # (step_chunk_async), so the coefficient transfers overlap the next
    # chunk's integration — and the bench seeds the same persistent-cache
    # entries every Universe generation/extension reuses.
    # warm: compile all chunk shapes
    generate_ephemeris(sc.state, sc.settings, span)
    t0 = time.perf_counter()
    eph = generate_ephemeris(sc.state, sc.settings, span)
    elapsed = time.perf_counter() - t0
    assert eph["Earth"].segment_count > 0
    sim_days = span.as_seconds() / 86400.0
    value = sim_days / elapsed
    return {
        "metric": "full_solar_system generation incl. fit (32 bodies, dt 10 min, warm)",
        "value": round(value, 1),
        "unit": "sim-days/s",
        "vs_baseline": None,
    }


def _fleet_ships(sc, eph, n_ships: int, mission_days: float):
    """Synthetic heliocentric fleet around Earth's orbit with TNB burns."""
    from ephemeris_explorer_tpu.ftime import Duration, Epoch
    from ephemeris_explorer_tpu.io.scene import Ship, ShipBurn

    rng = np.random.default_rng(42)
    t0 = sc.state.epoch.as_offset_seconds() + 86400.0
    ep, ev = eph["Earth"].state_vector(t0)
    ships = []
    for k in range(n_ships):
        offset = rng.normal(size=3) * 5.0e5 + np.array([2.0e6, 0.0, 0.0])
        dv = 1.0 + rng.normal(size=3) * 1e-3
        burns = [
            ShipBurn(
                start=Epoch.from_offset_seconds(t0 + 10 * 86400.0 + k * 3600.0),
                duration=Duration.from_seconds(600.0),
                acceleration=np.array([2e-3, 0.0, 0.0]),
                reference="Sun",
            )
        ]
        ships.append(
            Ship(
                name=f"fleet-{k}",
                integrator="Verner87",
                tolerance=1e-3,
                start=Epoch.from_offset_seconds(t0),
                end=Epoch.from_offset_seconds(t0 + mission_days * 86400.0),
                position=ep + offset,
                velocity=ev * dv,
                burns=burns,
            )
        )
    return ships


def bench_fleet64() -> dict:
    from ephemeris_explorer_tpu import Duration
    from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
    from ephemeris_explorer_tpu.io.scene import load_scene
    from ephemeris_explorer_tpu.spacecraft import propagate_ships

    sc = load_scene(REPO / "systems" / "full_solar_system_2433282.5")
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(320.0))
    ships = _fleet_ships(sc, eph, 64, 300.0)
    # warm (compile)
    out = propagate_ships(eph, ships, max_knots=8192)
    spans = [tr.end_s - tr.start_s for tr in out.values()]
    assert min(spans) > 290 * 86400.0, "fleet did not cover its missions"
    # a full fleet run is ~1.5 s since the batched result fetch — time
    # several runs per group and publish spread (relay jitter otherwise).
    # 4 runs/group: at 2 the committed r3 artifact showed 4.62% spread
    # while the docs claimed 0.4% from a luckier manual run (VERDICT r3
    # item 3); amortising 2x more runs per drain pins it down.
    reps = 4
    rates = []
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(reps):
            propagate_ships(eph, ships, max_knots=8192)
        rates.append(reps * 64 * 300.0 / (time.perf_counter() - t0))
    elapsed = time.perf_counter() - t_all
    value = GROUPS * reps * 64 * 300.0 / elapsed
    return {
        "metric": "64-ship fleet, 300-day missions w/ burns vs interpolated context (warm)",
        "value": round(value, 1),
        "unit": "ship-days/s",
        "vs_baseline": None,
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


def bench_ensemble() -> dict:
    import jax
    import jax.numpy as jnp  # noqa: F401

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.parallel import sharding as sh

    E = 16
    tab = get("QuinlanTremaine12")
    h = 600.0
    mu = _cluster(N_BODIES)[2]
    pos = np.stack([_cluster(N_BODIES, seed=i)[0] for i in range(E)])
    vel = np.stack([_cluster(N_BODIES, seed=i)[1] for i in range(E)])

    # fused single-kernel ensemble grid + fused pair-state update (the
    # multi-chip GSPMD path keeps the vmapped layout; measured +22%
    # single-chip from fusing the dispatch)
    carry0 = sh.init_fused_ensemble_carry(tab, mu, 0.0, pos, vel, h)
    steps = 50
    try:
        # sublane-packed pair-native scan (rings stored packed across steps)
        run, to_f = sh.make_fused_ensemble_scan_fp(
            tab, mu, h, steps, shape=(E, N_BODIES, 3)
        )
        carry = run(to_f(carry0))
        assert np.isfinite(_force(carry.ys))
    except Exception:
        try:
            run, to_f = sh.make_fused_ensemble_scan_f(tab, mu, h, steps)
            carry = run(to_f(carry0))
            assert np.isfinite(_force(carry.ys))
        except Exception:
            run = sh.make_fused_ensemble_scan(tab, mu, h, steps)
            carry = run(carry0)
    _force(carry.t)

    rates = []
    reps = 2
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry = run(carry)
        _force(carry.t)
        rates.append(E * N_BODIES * steps * reps / (time.perf_counter() - t0))
    elapsed = time.perf_counter() - t_all
    value = E * N_BODIES * steps * reps * GROUPS / elapsed
    return {
        "metric": f"ensemble body-steps/sec/chip ({E} ICs x {N_BODIES} bodies, QT12 f64, fused grid)",
        "value": round(value, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(value / BASELINE, 3),
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


def bench_f32_fast() -> dict:
    """BEYOND-baseline extra: the single-precision fast mode
    (visualization-grade, ~1e-6 relative force error; see ACCURACY.md)."""
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.ops.pallas_nbody import pairwise_accel_f32

    pos, vel, mu = _cluster(N_BODIES)
    pos32 = jnp.asarray(pos, jnp.float64).astype(jnp.float32)
    mu32 = jnp.asarray(mu, jnp.float64).astype(jnp.float32).reshape(1, -1)

    @jax.jit
    def scan(p):
        def body(c, _):
            a = pairwise_accel_f32(c, mu32)
            return c + a * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, p, None, length=STEPS_PER_CHUNK)
        return c

    p = scan(pos32)
    _force(p)
    # The fast modes finish a 3-chunk group in well under a second, so a
    # single ~0.2 s relay drain swings the reading by double digits; time
    # FAST_CHUNK_MULT x the chunks per drain and publish the group spread.
    rates = []
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_GROUP * FAST_CHUNK_MULT):
            p = scan(p)
        _force(p)
        rates.append(
            N_BODIES * STEPS_PER_CHUNK * CHUNKS_PER_GROUP * FAST_CHUNK_MULT
            / (time.perf_counter() - t0)
        )
    elapsed = time.perf_counter() - t_all
    steps = STEPS_PER_CHUNK * CHUNKS_PER_GROUP * FAST_CHUNK_MULT * GROUPS
    value = N_BODIES * steps / elapsed
    return {
        "metric": f"fast-mode f32 force evals/sec/chip x bodies (N={N_BODIES}, ~1e-6 rel)",
        "value": round(value, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(value / BASELINE, 3),
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


def bench_mixed() -> dict:
    """BEYOND-baseline extra: the mixed-precision intermediate mode
    (error-free pair differences + f32 weight chain, ~1e-6 relative for
    every pair geometry; the middle rung between fast-f32 and df64)."""
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_mixed,
        split_f64,
    )

    pos, vel, mu = _cluster(N_BODIES)
    ph, plo = split_f64(jnp.asarray(pos), transpose=True)
    mu32 = jnp.asarray(mu, jnp.float64).astype(jnp.float32).reshape(1, -1)

    @jax.jit
    def scan(ph, plo):
        def body(c, _):
            a = pairwise_accel_mixed(c[0], c[1], mu32)
            return (c[0] + a.T * jnp.float32(1e-30), c[1]), None

        c, _ = jax.lax.scan(body, (ph, plo), None, length=STEPS_PER_CHUNK)
        return c

    c = scan(ph, plo)
    _force(c)
    # grouped + drain-amortised like bench_f32_fast (sub-second groups are
    # dominated by relay-drain jitter otherwise)
    rates = []
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_GROUP * FAST_CHUNK_MULT):
            c = scan(*c)
        _force(c)
        rates.append(
            N_BODIES * STEPS_PER_CHUNK * CHUNKS_PER_GROUP * FAST_CHUNK_MULT
            / (time.perf_counter() - t0)
        )
    elapsed = time.perf_counter() - t_all
    steps = STEPS_PER_CHUNK * CHUNKS_PER_GROUP * FAST_CHUNK_MULT * GROUPS
    value = N_BODIES * steps / elapsed
    return {
        "metric": f"mixed-mode force evals/sec/chip x bodies (N={N_BODIES}, ~1e-6 rel all geometries)",
        "value": round(value, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(value / BASELINE, 3),
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


def bench_split() -> dict:
    """BEYOND-baseline extra: the magnitude-split mode (f32 weak tail +
    exact f64 top-K strong pairs; ~1e-9 for dominated hierarchies, ~1e-7
    random clouds — the rung between mixed and df64; see ACCURACY.md).
    The strong set refreshes once per chunk, as in engine use."""
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        pairwise_accel_split,
        strong_pair_indices,
        strong_pair_mask,
    )

    pos, vel, mu = _cluster(N_BODIES)
    pos = jnp.asarray(pos)
    mu64 = jnp.asarray(mu)

    @jax.jit
    def scan(p):
        idx = strong_pair_indices(p, mu64, k=16)
        mask = strong_pair_mask(idx, N_BODIES)

        def body(c, _):
            a = pairwise_accel_split(c, mu64, idx, mask)
            return c + a * 1e-30, None

        c, _ = jax.lax.scan(body, p, None, length=STEPS_PER_CHUNK)
        return c

    p = scan(pos)
    _force(p)
    # grouped + drain-amortised like bench_f32_fast
    rates = []
    t_all = time.perf_counter()
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(CHUNKS_PER_GROUP * FAST_CHUNK_MULT):
            p = scan(p)
        _force(p)
        rates.append(
            N_BODIES * STEPS_PER_CHUNK * CHUNKS_PER_GROUP * FAST_CHUNK_MULT
            / (time.perf_counter() - t0)
        )
    elapsed = time.perf_counter() - t_all
    steps = STEPS_PER_CHUNK * CHUNKS_PER_GROUP * FAST_CHUNK_MULT * GROUPS
    value = N_BODIES * steps / elapsed
    return {
        "metric": (
            f"split-mode force evals/sec/chip x bodies (N={N_BODIES}, "
            "~1e-9 hierarchies / ~1e-7 clouds, K=16)"
        ),
        "value": round(value, 1),
        "unit": "body-steps/s",
        "vs_baseline": round(value / BASELINE, 3),
        "groups": GROUPS,
        "spread_pct": round(
            100.0 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 2
        ),
    }


ALL_BENCHES = {
    "n4096_df64": bench_headline,
    "n4096_parity": bench_parity,
    "fss_generation": bench_fss_generation,
    "fleet64": bench_fleet64,
    "ensemble16x4096": bench_ensemble,
    "n4096_f32_fast": bench_f32_fast,
    "n4096_mixed": bench_mixed,
    "n4096_split": bench_split,
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--all", action="store_true", help="run every BASELINE config")
    p.add_argument("--config", choices=sorted(ALL_BENCHES), default=None)
    p.add_argument(
        "--publish",
        action="store_true",
        help="with --config: write the result back even if it regresses the "
        "published number by >20%% (otherwise such runs are treated as "
        "ad-hoc/contended and NOT written back)",
    )
    args = p.parse_args()

    if args.config:
        result = ALL_BENCHES[args.config]()
        print(json.dumps(result))
        # keep the committed artifacts consistent with single-config re-runs
        # (a clean re-measure of one contended config must not leave stale
        # numbers in BENCH_all.json / BASELINE.published) — but guard the
        # rewrite: an ad-hoc cold-cache/contended/debug-env run that lands
        # far under the published number must not silently overwrite the
        # record (ADVICE r4).  --publish overrides.
        bench_path = REPO / "BENCH_all.json"
        if bench_path.exists() and "value" in result and not args.publish:
            prev = json.loads(bench_path.read_text()).get(args.config, {})
            if "value" in prev and result["value"] < 0.8 * prev["value"]:
                print(
                    json.dumps(
                        {
                            "notice": "result regresses published value by "
                            ">20%; NOT written back (rerun with --publish "
                            "to force)",
                            "published": prev["value"],
                            "measured": result["value"],
                        }
                    ),
                    flush=True,
                )
                return
        if bench_path.exists() and "value" in result:
            all_results = json.loads(bench_path.read_text())
            all_results[args.config] = result
            bench_path.write_text(json.dumps(all_results, indent=2) + "\n")
            baseline_path = REPO / "BASELINE.json"
            baseline = json.loads(baseline_path.read_text())
            baseline.setdefault("published", {})[args.config] = {
                "value": result["value"],
                "unit": result["unit"],
                "metric": result["metric"],
            }
            baseline_path.write_text(json.dumps(baseline, indent=2) + "\n")
        return
    if not args.all:
        print(json.dumps(bench_headline()))
        return

    results = {}
    for name, fn in ALL_BENCHES.items():
        try:
            results[name] = fn()
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        line = dict(results[name])
        line["config"] = name
        print(json.dumps(line), flush=True)

    (REPO / "BENCH_all.json").write_text(json.dumps(results, indent=2) + "\n")
    baseline_path = REPO / "BASELINE.json"
    baseline = json.loads(baseline_path.read_text())
    baseline["published"] = {
        name: (
            {"value": r["value"], "unit": r["unit"], "metric": r["metric"]}
            if "value" in r
            else r
        )
        for name, r in results.items()
    }
    baseline_path.write_text(json.dumps(baseline, indent=2) + "\n")


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
