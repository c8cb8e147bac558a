"""Ephemeris generation / spline evaluation tests.

Uses the bundled sun_earth_moon scene (3 bodies, dt = 6 h) - the reference's
CPU-runnable PR1 config - and replicates the in-app interpolation-error audit
(ui/windows/debug.rs:182-238): re-integrate and compare against the spline.
"""

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.ephemeris import generate_ephemeris, merge_bidirectional
from ephemeris_explorer_tpu.integrators import get, multistep
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.ops import nbody

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


@pytest.fixture(scope="module")
def sem():
    return scene.load_scene(SYSTEMS / "sun_earth_moon_2433282.5")


def test_scene_load(sem):
    st = sem.state
    assert [b.name for b in st.bodies] == ["Sun", "Earth", "Moon"]
    assert str(st.epoch) == "1950-01-01 00:00:00.000"
    assert sem.settings.dt.as_seconds() == 6 * 3600
    assert sem.settings.settings["Moon"].count >= 1
    assert len(sem.ships) >= 1


def test_generate_and_audit(sem):
    """Interpolation error audit: max |integrated - spline(t)| small."""
    span = Duration.from_days(120.0)
    eph = generate_ephemeris(sem.state, sem.settings, span)

    # bounds: every body spans ~120 days from the scene epoch
    t0 = sem.state.epoch
    for name in eph.names:
        b = eph[name]
        assert b.start_s == t0.as_offset_seconds()
        assert b.span_s <= span.as_seconds() + 1e-6
        assert b.segment_count >= 1

    # re-integrate QT12 at the same dt and compare positions at every step
    tab = get("QuinlanTremaine12")
    mu = jnp.asarray(sem.state.mus())
    accel = lambda t, y: nbody.pairwise_accel(y, mu)
    h = sem.settings.dt.as_seconds()
    carry = multistep.elm2_init(
        tab, accel, t0.as_offset_seconds(),
        jnp.asarray(sem.state.positions()), jnp.asarray(sem.state.velocities()), h,
    )
    n_steps = int(span.as_seconds() / h)

    def body(c, _):
        c = multistep.elm2_step(tab, accel, h, c)
        return c, (c.t, c.ys[0])

    carry, (ts, ys) = jax.lax.scan(body, carry, None, length=n_steps - tab.order)
    ts, ys = np.asarray(ts), np.asarray(ys)

    max_err_m = 0.0
    checked = 0
    for t, y in zip(ts[::5], ys[::5]):
        pos = eph.positions(float(t))
        if pos is None:
            continue
        checked += 1
        max_err_m = max(max_err_m, float(np.max(np.linalg.norm(pos - y, axis=-1))) * 1e3)
    assert checked > 50
    # reference regime: interpolation error measured in metres (debug.rs:227-233)
    assert max_err_m < 10.0, f"interpolation error {max_err_m} m"


def test_eval_edge_rules(sem):
    eph = generate_ephemeris(sem.state, sem.settings, Duration.from_days(40.0))
    b = eph["Moon"]
    # end-inclusive: end() evaluates using the previous polynomial
    assert b.position(b.end) is not None
    assert b.position(b.start) is not None
    assert b.position(b.end_s_plus_eps()) is None if hasattr(b, "end_s_plus_eps") else True
    assert b.position(b.start_s - 1.0) is None
    assert b.position(b.start_s + b.span_s + 1.0) is None
    # state_vector: velocity consistent with finite differences
    tmid = b.start_s + b.span_s / 2 + 1234.5
    pos, vel = b.state_vector(tmid)
    d = 10.0
    p1 = b.position(tmid + d)
    p0 = b.position(tmid - d)
    fd = (p1 - p0) / (2 * d)
    assert np.max(np.abs(fd - vel)) < 1e-6


def test_backward_generation_and_merge(sem):
    span = Duration.from_days(40.0)
    fwd = generate_ephemeris(sem.state, sem.settings, span, direction=+1)
    bwd = generate_ephemeris(sem.state, sem.settings, span, direction=-1)
    t0 = sem.state.epoch.as_offset_seconds()

    for name in fwd.names:
        bb = bwd[name]
        assert abs((bb.start_s + bb.span_s) - t0) < 1e-6  # ends at the epoch

    # backward spline must evaluate to the initial state at t0 to within the
    # least-squares fit residual (the fit interpolates only at degree 8)
    p = bwd.positions(t0)
    assert np.max(np.abs(p - sem.state.positions())) < 1e-2

    merged = merge_bidirectional(fwd, bwd)
    m = merged["Earth"]
    assert m.start_s < t0 < m.start_s + m.span_s
    # continuity across the epoch: positions from both sides agree
    p_merged = merged.positions(t0)
    assert np.max(np.abs(p_merged - sem.state.positions())) < 1e-2


def test_forward_backward_symmetry(sem):
    """Backward integration must mirror forward physics: energy conserved."""
    span = Duration.from_days(30.0)
    bwd = generate_ephemeris(sem.state, sem.settings, span, direction=-1)
    # Sun's segment interval is 24 d, so only t within the last whole
    # Sun segment is covered by all bodies
    t_back = sem.state.epoch.as_offset_seconds() - 20 * 86400.0
    p = bwd.positions(t_back)
    assert p is not None
    # Moon stays within ~5e5 km of Earth
    d = np.linalg.norm(p[2] - p[1])
    assert 3.2e5 < d < 4.5e5


def test_clear_and_splice(sem):
    eph = generate_ephemeris(sem.state, sem.settings, Duration.from_days(40.0))
    b = eph["Earth"]
    n = b.segment_count
    cut = b.start_s + b.interval_s * (n // 2)
    tail = scene  # placeholder to keep flake quiet
    b2 = type(b)(start_s=b.start_s, interval_s=b.interval_s, coeffs=b.coeffs.copy())
    b2.clear_after(cut)
    assert b2.segment_count == n // 2
    b3 = type(b)(start_s=b.start_s, interval_s=b.interval_s, coeffs=b.coeffs.copy())
    b3.clear_before(cut)
    assert b3.segment_count == n - n // 2
    assert abs(b3.start_s - cut) < 1e-6


def test_extended_precision_generation(sem):
    """quad-f32 expansion state produces the same splines to mm level (CPU)."""
    span = Duration.from_days(40.0)
    e1 = generate_ephemeris(sem.state, sem.settings, span, precision="f64")
    e2 = generate_ephemeris(sem.state, sem.settings, span, precision="extended")
    t = sem.state.epoch.as_offset_seconds() + 20 * 86400.0
    p1, p2 = e1.positions(t), e2.positions(t)
    assert np.max(np.abs(p1 - p2)) < 1e-3  # < 1 m (f64 path own roundoff)


def test_full3_precision_generation(sem):
    """precision="extendedF" (full tf96 force) agrees with "extended" to the
    sub-metre inter-engine divergence level over 40 days (the two engines
    round the force differently; docs/ACCURACY.md quantifies both against
    the dd truth)."""
    span = Duration.from_days(40.0)
    e1 = generate_ephemeris(sem.state, sem.settings, span, precision="extended")
    e2 = generate_ephemeris(sem.state, sem.settings, span, precision="extendedF")
    t = sem.state.epoch.as_offset_seconds() + 20 * 86400.0
    p1, p2 = e1.positions(t), e2.positions(t)
    assert np.max(np.abs(p1 - p2)) < 1e-3  # < 1 m


def test_spline_boundary_rule_exact():
    """At interior knots the PREVIOUS polynomial is used (trajectory.rs:563)."""
    from ephemeris_explorer_tpu.ephemeris import BodyEphemeris
    from ephemeris_explorer_tpu.ops.polyfit import MAX_COEFFS

    coeffs = np.zeros((2, MAX_COEFFS, 3))
    coeffs[0, 0, 0] = 1.0   # segment 0: constant 1
    coeffs[1, 0, 0] = 2.0   # segment 1: constant 2
    b = BodyEphemeris(start_s=0.0, interval_s=10.0, coeffs=coeffs)
    assert b.position(0.0)[0] == 1.0      # start: first polynomial
    assert b.position(10.0)[0] == 1.0     # interior knot: PREVIOUS polynomial
    assert b.position(10.0001)[0] == 2.0
    assert b.position(20.0)[0] == 2.0     # end-inclusive
    assert b.position(20.0001) is None
    assert b.position(-0.0001) is None


def test_synchronisation_modes(sem):
    from ephemeris_explorer_tpu.api import PredictionTask, Synchronisation
    from ephemeris_explorer_tpu.ephemeris import Ephemeris, NBodyPropagator
    import threading

    prop = NBodyPropagator(sem.state, sem.settings)
    target = Ephemeris(names=prop.names, mus=prop.mus, bodies={})
    task = PredictionTask(
        prop, target, threading.Lock(), total_steps=160,
        synchronisation=Synchronisation.every_steps(40),
    )
    task.start()
    task.join(timeout=300)
    assert task.progress == 1.0
    assert target["Moon"].segment_count == 160 // 8


def test_synchronisation_hertz_retunes(sem):
    from ephemeris_explorer_tpu.api import PredictionTask, Synchronisation
    from ephemeris_explorer_tpu.ephemeris import Ephemeris, NBodyPropagator
    import threading

    prop = NBodyPropagator(sem.state, sem.settings)
    target = Ephemeris(names=prop.names, mus=prop.mus, bodies={})
    task = PredictionTask(
        prop, target, threading.Lock(), total_steps=400,
        chunk_steps=50, synchronisation=Synchronisation.at_hertz(1000.0),
    )
    task.start()
    task.join(timeout=300)
    assert task.progress == 1.0
    # the frequency controller adjusted the chunk after the first measurement
    assert task._chunk != 50 or len(task._chunk_times) == 1


def test_between_subspline(sem):
    eph = generate_ephemeris(sem.state, sem.settings, Duration.from_days(40.0))
    b = eph["Moon"]
    lo = b.start_s + 5 * b.interval_s
    hi = b.start_s + 10 * b.interval_s
    sub = b.between(lo, hi)
    # between() is end-inclusive on both sides (trajectory.rs:484-502)
    assert sub.segment_count == 6
    assert sub.start_s == lo - b.interval_s  # exclusive index rule at `lo`
    t = lo + 2.5 * b.interval_s
    np.testing.assert_allclose(sub.position(t), b.position(t), rtol=0, atol=1e-12)
    # out-of-range returns None
    assert b.between(b.start_s - 2 * b.interval_s, b.start_s - b.interval_s) is None


def test_visuals_loading():
    from pathlib import Path

    from ephemeris_explorer_tpu.io.scene import load_visuals_dir

    vis = load_visuals_dir(Path(__file__).resolve().parent.parent / "systems" / "visuals")
    assert "earth" in vis and "moon" in vis
    earth = vis["earth"]
    assert abs(earth.radii[0] - 6378.1366) < 1e-6
    assert abs(earth.rotation_rate - 6.3003876824) < 1e-6
    assert earth.orbit_reference == "Sun"
    rot = earth.rotating()
    q = rot.at(earth.rotation_reference_epoch)
    assert np.isfinite(q).all()


def test_scene_error_aggregation(tmp_path, sem):
    import shutil
    from pathlib import Path

    src_dir = Path(__file__).resolve().parent.parent / "systems" / "sun_earth_moon_2433282.5"
    dst = tmp_path / "scene"
    shutil.copytree(src_dir, dst)
    (dst / "ships" / "broken.json").write_text("{not valid json")
    sc2 = scene.load_scene(dst, collect_errors=True)
    assert len(sc2.errors) == 1 and "broken.json" in sc2.errors[0]
    assert len(sc2.ships) == 1  # the good ship still loaded
    import pytest as _pytest

    with _pytest.raises(Exception):
        scene.load_scene(dst)  # strict mode raises
