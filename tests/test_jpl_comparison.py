"""JPL Horizons comparison gate (jpl_comparison.rs:56-117).

Integrates the 10-body solar system for a year with QT12 @ 6 h and compares
against Horizons state vectors every 12 h.  Requires a Horizons fixture
cache (network egress is blocked in CI): put cached responses under
tests/fixtures/horizons/ by running once with network access:

    from ephemeris_explorer_tpu.io import horizons
    horizons.fetch_solar_system(BODIES, start, end, step,
                                cache_dir="tests/fixtures/horizons")

Without the cache the test SKIPS; the self-convergence gates
(test_convergence.py) and dd128-truth validation (docs/ACCURACY.md) are the
offline accuracy net.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.integrators import get, multistep
from ephemeris_explorer_tpu.io import horizons
from ephemeris_explorer_tpu.ops import nbody

CACHE = Path(__file__).resolve().parent / "fixtures" / "horizons"

BODIES = [
    "Sun", "Mercury", "Venus", "Earth", "Moon", "Mars",
    "JupiterBarycenter", "SaturnBarycenter", "UranusBarycenter",
    "NeptuneBarycenter",
]


def _have_cache() -> bool:
    return CACHE.is_dir() and any(CACHE.glob("horizons_*.txt"))


@pytest.mark.slow
@pytest.mark.skipif(not _have_cache(), reason="no Horizons fixture cache")
def test_jpl_comparison():
    start = Epoch.parse("1950-01-01 00:00:00")
    end = Epoch.parse("1951-01-01 00:00:00")
    systems = horizons.fetch_solar_system(
        BODIES, start, end, Duration.from_hours(12.0), cache_dir=CACHE, offline=True
    )
    initial = systems[0]

    tab = get("QuinlanTremaine12")
    mu = jnp.asarray(initial.mus())
    accel = lambda t, y: nbody.pairwise_accel(y, mu)
    h = 6 * 3600.0
    carry = multistep.elm2_init(
        tab, accel, initial.epoch.as_offset_seconds(),
        jnp.asarray(initial.positions()), jnp.asarray(initial.velocities()), h,
    )

    def body(c, _):
        c = multistep.elm2_step(tab, accel, h, c)
        return c, c.ys[0]

    n_steps = int((end.as_offset_seconds() - start.as_offset_seconds()) / h)
    carry, ys = jax.lax.scan(body, carry, None, length=n_steps - tab.order)
    ys = np.asarray(ys)

    # compare every 12 h (every 2nd step) against Horizons
    worst = {name: 0.0 for name in BODIES}
    for k, system in enumerate(systems[1:], start=1):
        step_idx = k * 2 - tab.order - 1
        if step_idx < 0 or step_idx >= len(ys):
            continue
        ref = system.positions()
        err = np.linalg.norm(ys[step_idx] - ref, axis=-1)
        for i, name in enumerate(BODIES):
            worst[name] = max(worst[name], float(err[i]))

    # jpl_comparison.rs:103-114 error budget (Newtonian-only model)
    assert worst["Sun"] < 1.0
    for outer in ("JupiterBarycenter", "SaturnBarycenter", "UranusBarycenter",
                  "NeptuneBarycenter"):
        assert worst[outer] < 1.0, (outer, worst[outer])
    for inner in ("Venus", "Earth", "Moon", "Mars"):
        assert worst[inner] < 100.0, (inner, worst[inner])
    assert worst["Mercury"] < 200.0


@pytest.mark.slow
def test_real_jpl_76_year_endpoints():
    """Offline REAL-data gate: integrate full_solar_system from the bundled
    1950-01-01 Horizons snapshot for 76 years and compare Sun/Earth/Moon
    against the bundled real snapshot at JD 2461041.5
    (systems/sun_earth_moon_2461041.5).  The residual is dominated by the
    Newtonian point-mass model (relativistic precession, asteroids) — the
    bounds catch gross integrator/mu/frame regressions, the same role as
    jpl_comparison.rs's inner-planet budget over 1 year.

    dt = 1 h: the endpoint differs from the dt = 10 min run by < 10 km
    (model error dominates; measured with tools/accuracy_audit.py --oracle).
    """
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from accuracy_audit import oracle_76y

    errs = oracle_76y("plain", dt=3600.0, verbose=False)
    # measured (expansion engine, dt=600): Sun 12.7 km, Earth 4523 km,
    # Moon 3287 km; thresholds leave ~2x headroom over model error
    assert errs["Sun"] < 50.0, errs
    assert errs["Earth"] < 10_000.0, errs
    assert errs["Moon"] < 10_000.0, errs
