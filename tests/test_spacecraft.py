"""Spacecraft propagation tests.

Mirrors the reference's spacecraft end-to-end strategy
(ephemeris/tests/spacecraft_propagation.rs): propagate against a generated
ephemeris context and assert physical plausibility; plus unit checks of the
timeline/TNB machinery.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.spacecraft import (
    EPOCH_MAX,
    EPOCH_MIN,
    HermiteTrajectory,
    build_timeline,
    divergence_time,
    propagate_ship,
    segment_idx_at,
    tnb_to_inertial,
)
from ephemeris_explorer_tpu.io.scene import ShipBurn

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


def _burn(start_s, dur_s, acc, ref=None):
    return ShipBurn(
        start=Epoch.from_offset_seconds(start_s),
        duration=Duration.from_seconds(dur_s),
        acceleration=np.asarray(acc, dtype=np.float64),
        reference=ref,
    )


def test_timeline_construction():
    idx = {"Earth": 1, "Sun": 0}
    burns = [
        _burn(1000.0, 100.0, [0, 0, 1e-2], "Earth"),
        _burn(100.0, 50.0, [1e-2, 0, 0], "Sun"),
    ]
    tl = build_timeline(burns, idx)
    s = np.asarray(tl.starts)
    e = np.asarray(tl.ends)
    # coast, burn1, coast, burn2, coast
    assert tl.n_segments == 5
    assert s[0] == EPOCH_MIN and e[0] == 100.0
    assert (s[1], e[1]) == (100.0, 150.0)
    assert (s[2], e[2]) == (150.0, 1000.0)
    assert (s[3], e[3]) == (1000.0, 1100.0)
    assert s[4] == 1100.0 and e[4] == EPOCH_MAX
    assert int(segment_idx_at(tl, 120.0)) == 1
    assert int(segment_idx_at(tl, 150.0)) == 2  # end-exclusive
    assert int(segment_idx_at(tl, 1e9)) == 4


def test_divergence_time():
    idx = {"Earth": 0}
    old = build_timeline([_burn(100.0, 50.0, [1e-2, 0, 0], "Earth")], idx)
    # same first burn, changed second
    new = build_timeline(
        [_burn(100.0, 50.0, [1e-2, 0, 0], "Earth"), _burn(500.0, 10.0, [0, 1e-2, 0], "Earth")],
        idx,
    )
    t = float(divergence_time(new, old, 1e9))
    # common prefix: coast start MIN, burn at 100, coast at 150; the coast
    # differs in end (500 vs MAX) -> divergence at the coast start = 150
    assert t == 150.0


def test_tnb_frame():
    # circular orbit in xy-plane: velocity along +y at (r, 0, 0)
    pos = jnp.asarray([7000.0, 0.0, 0.0])
    vel = jnp.asarray([0.0, 7.5, 0.0])
    # prograde burn (T axis = first component)
    out = tnb_to_inertial(pos, vel, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-12)
    # third component = angular-momentum axis (r x v -> +z)
    out_n = tnb_to_inertial(pos, vel, jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out_n), [0.0, 0.0, 1.0], atol=1e-12)


@pytest.fixture(scope="module")
def sem_eph():
    sc = scene.load_scene(SYSTEMS / "sun_earth_moon_2433282.5")
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0))
    return sc, eph


def test_coast_propagation_matches_context(sem_eph):
    """The bundled Earth Station ship (no burns) stays near Earth."""
    sc, eph = sem_eph
    ship = sc.ships[0]
    assert ship.name == "Earth Station"
    traj = propagate_ship(eph, ship)
    assert traj.end_s > traj.start_s
    # ship starts ~7000 km from Earth and stays gravitationally bound (the
    # ship state is Earth + ~7000 km offset with orbital velocity)
    for frac in (0.0, 0.5, 1.0):
        t = traj.start_s + (traj.end_s - traj.start_s) * frac
        p = traj.position(t)
        earth = eph["Earth"].position(t)
        d = np.linalg.norm(p - earth)
        assert 6.0e3 < d < 6e4, (frac, d)


def test_hermite_eval_roundtrip(sem_eph):
    sc, eph = sem_eph
    traj = propagate_ship(eph, sc.ships[0])
    # knot exact values
    i = len(traj.ts) // 2
    t = float(traj.ts[i])
    np.testing.assert_allclose(traj.position(t), traj.pos[i], rtol=0, atol=1e-12)
    # interpolated velocity ~ finite difference of position
    tm = (traj.ts[i] + traj.ts[i + 1]) / 2.0
    p, v = traj.state_vector(tm)
    d = 1.0
    fd = (traj.position(tm + d) - traj.position(tm - d)) / (2 * d)
    assert np.max(np.abs(fd - v)) < 5e-6
    # out of bounds
    assert traj.position(traj.start_s - 10.0) is None
    assert traj.position(traj.end_s + 10.0) is None


def test_burn_changes_orbit(sem_eph):
    """A prograde burn raises the orbit energy relative to Earth."""
    sc, eph = sem_eph
    ship = sc.ships[0]
    from ephemeris_explorer_tpu.io.scene import Ship

    t_burn = ship.start.as_offset_seconds() + 3600.0
    burned = Ship(
        name="Burner",
        integrator="Verner87",
        tolerance=1e-3,
        start=ship.start,
        end=Epoch.from_offset_seconds(ship.start.as_offset_seconds() + 4 * 86400.0),
        position=ship.position,
        velocity=ship.velocity,
        burns=[_burn(t_burn, 300.0, [5e-3, 0.0, 0.0], "Earth")],  # prograde TNB
    )
    coast = Ship(**{**burned.__dict__, "name": "Coast", "burns": []})
    tb = propagate_ship(eph, burned)
    tc = propagate_ship(eph, coast)
    t_check = t_burn + 2 * 86400.0

    def energy_rel_earth(traj, t):
        p, v = traj.state_vector(t)
        ep, ev = eph["Earth"].state_vector(t)
        mu = sc.state.bodies[sc.state.body_index("Earth")].mu
        rel_p, rel_v = p - ep, v - ev
        return 0.5 * np.dot(rel_v, rel_v) - mu / np.linalg.norm(rel_p)

    eb = energy_rel_earth(tb, t_check)
    ec = energy_rel_earth(tc, t_check)
    assert eb > ec + 1e-4  # prograde burn raised specific orbital energy
    # delta-v roughly 5e-3 * 300 = 1.5 km/s applied
    _, vb = tb.state_vector(t_burn + 400.0)
    _, vc = tc.state_vector(t_burn + 400.0)
    dv = np.linalg.norm(vb - vc)
    assert 1.0 < dv < 2.0


def test_propagation_is_deterministic(sem_eph):
    sc, eph = sem_eph
    t1 = propagate_ship(eph, sc.ships[0])
    t2 = propagate_ship(eph, sc.ships[0])
    np.testing.assert_array_equal(t1.ts, t2.ts)
    np.testing.assert_array_equal(t1.pos, t2.pos)


def test_batched_fleet_matches_single(sem_eph):
    """vmapped fleet propagation gives identical results to single-ship runs."""
    import jax.numpy as jnp
    from ephemeris_explorer_tpu.io.scene import Ship
    from ephemeris_explorer_tpu.spacecraft import propagate_ships

    sc, eph = sem_eph
    base = sc.ships[0]
    ships = []
    for k in range(4):
        ships.append(
            Ship(
                name=f"fleet-{k}",
                integrator="Verner87",
                tolerance=1e-3,
                start=base.start,
                end=base.end,
                position=base.position + np.array([100.0 * k, 0, 0]),
                velocity=base.velocity,
                burns=(
                    [_burn(base.start.as_offset_seconds() + 3600.0, 120.0, [2e-3, 0, 0], "Earth")]
                    if k % 2
                    else []
                ),
            )
        )
    fleet = propagate_ships(eph, ships, max_knots=4096)
    assert set(fleet) == {s.name for s in ships}
    for s in ships:
        solo = propagate_ship(eph, s, max_knots=4096)
        batched = fleet[s.name]
        # vmapped and single-ship runs compile differently, so the adaptive
        # step sequences may differ at the last ulp; the trajectories must
        # agree to within the integration tolerance regime
        assert abs(solo.end_s - batched.end_s) < 1.0
        for frac in (0.1, 0.5, 0.9):
            t = solo.start_s + frac * (solo.end_s - solo.start_s)
            pa, pb = solo.position(t), batched.position(t)
            assert pa is not None and pb is not None
            assert np.max(np.abs(pa - pb)) < 1e-2, (s.name, frac)


def test_inertial_frame_burn(sem_eph):
    """Burns without a reference body use the inertial frame directly."""
    sc, eph = sem_eph
    base = sc.ships[0]
    from ephemeris_explorer_tpu.io.scene import Ship

    t0 = base.start.as_offset_seconds()
    ship = Ship(
        name="Inertial",
        integrator="DormandPrince54",
        tolerance=1e-3,
        start=base.start,
        end=Epoch.from_offset_seconds(t0 + 2 * 86400.0),
        position=base.position,
        velocity=base.velocity,
        burns=[_burn(t0 + 1800.0, 100.0, [0.0, 1e-2, 0.0], None)],  # inertial +y
    )
    coast = Ship(**{**ship.__dict__, "name": "Coast2", "burns": []})
    tb = propagate_ship(eph, ship)
    tc = propagate_ship(eph, coast)
    t = t0 + 2000.0
    _, vb = tb.state_vector(t)
    _, vc = tc.state_vector(t)
    dv = vb - vc
    # delta-v is ~1 km/s along +y exactly (no frame rotation)
    assert abs(dv[1] - 1.0) < 2e-2 and abs(dv[0]) < 5e-2 and abs(dv[2]) < 5e-2


def test_degenerate_tnb_frame_fails_cleanly(sem_eph):
    """A relative burn with zero relative velocity must stop the propagation
    (EVAL_FAILED), not poison the trajectory with NaNs — mirrors
    TNB::try_new returning None (dynamics/spacecraft.rs:242-253)."""
    from ephemeris_explorer_tpu.io.scene import Ship

    sc, eph = sem_eph
    t0 = sc.state.epoch.as_offset_seconds()
    earth_p, earth_v = eph["Earth"].state_vector(t0)
    ship = Ship(
        name="Degenerate",
        integrator="Verner87",
        tolerance=1e-3,
        start=Epoch.from_offset_seconds(t0),
        end=Epoch.from_offset_seconds(t0 + 86400.0),
        position=earth_p + np.array([7000.0, 0.0, 0.0]),
        velocity=earth_v,  # zero velocity RELATIVE to Earth -> degenerate TNB
        burns=[_burn(t0, 600.0, [1e-3, 0.0, 0.0], "Earth")],
    )
    traj = propagate_ship(eph, ship)
    # propagation aborted at/near start; whatever was flushed is finite
    assert traj.end_s < t0 + 86400.0
    assert np.all(np.isfinite(traj.pos)) and np.all(np.isfinite(traj.vel))


def test_packed_ephemeris_relative_burn_requires_index(sem_eph):
    sc, eph = sem_eph
    packed = eph.pack()
    ship = sc.ships[0]
    from ephemeris_explorer_tpu.io.scene import Ship

    burned = Ship(
        **{
            **ship.__dict__,
            "name": "NeedsIndex",
            "burns": [_burn(ship.start.as_offset_seconds() + 60.0, 10.0, [1e-3, 0, 0], "Earth")],
        }
    )
    with pytest.raises(ValueError, match="body_index"):
        propagate_ship(packed, burned)
    # works when the index is supplied
    index = {n: i for i, n in enumerate(eph.names)}
    traj = propagate_ship(packed, burned, body_index=index)
    assert traj.end_s > traj.start_s


def test_knot_buffer_exhaustion_resumes(sem_eph):
    """A mission that overflows a tiny knot buffer must resume in chunks and
    still cover the full requested span (prediction.rs:429-432 flush-on-error
    semantics + incremental continuation), matching the large-buffer result
    to within the integration tolerance."""
    sc, eph = sem_eph
    ship = sc.ships[0]
    small = propagate_ship(eph, ship, max_knots=256)
    big = propagate_ship(eph, ship, max_knots=16384)
    assert len(small.ts) > 256  # actually resumed past the buffer
    assert abs(small.end_s - big.end_s) < 1.0
    for frac in (0.25, 0.5, 0.9):
        t = big.start_s + frac * (big.end_s - big.start_s)
        pa, pb = small.position(t), big.position(t)
        assert pa is not None and pb is not None
        # restart resets the adaptive step sequence, so the per-step 1 m
        # tolerance compounds along the orbit; bound the divergence at the
        # sub-km level (measured ~0.2 km mid-mission on this LEO-type orbit)
        assert np.max(np.abs(pa - pb)) < 1.0, frac


def test_fleet_knot_exhaustion_fallback(sem_eph):
    """propagate_ships falls back to the chunked single-ship driver for
    ships that exhaust the batch knot buffer."""
    from ephemeris_explorer_tpu.spacecraft import propagate_ships

    sc, eph = sem_eph
    fleet = propagate_ships(eph, [sc.ships[0]], max_knots=256)
    traj = fleet[sc.ships[0].name]
    assert len(traj.ts) > 256
    big = propagate_ship(eph, sc.ships[0])
    assert abs(traj.end_s - big.end_s) < 1.0


def test_replan_with_tiny_knot_buffer(sem_eph):
    """Universe.replan must deliver full coverage even when max_knots is far
    below the mission's knot count."""
    from ephemeris_explorer_tpu.api import Universe

    sc, _ = sem_eph
    uni = Universe(sc)
    uni.generate(Duration.from_days(40.0))
    uni.spawn_ship(sc.ships[0], propagate_now=False)
    traj = uni.replan(sc.ships[0].name, max_knots=256)
    end = min(
        sc.ships[0].end.as_offset_seconds(),
        uni.ephemeris.end.as_offset_seconds(),
    )
    assert traj.end_s >= end - 1.0
    assert len(traj.ts) > 256


def test_ship_across_scene_epoch(sem_eph):
    """A ship starting BEFORE the scene epoch flies on the merged fwd+bwd
    ephemeris (bidirectional coverage)."""
    from ephemeris_explorer_tpu.ephemeris import generate_ephemeris, merge_bidirectional
    from ephemeris_explorer_tpu.io.scene import Ship

    sc, _ = sem_eph
    fwd = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0), +1)
    bwd = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0), -1)
    eph = merge_bidirectional(fwd, bwd)
    t0 = sc.state.epoch.as_offset_seconds()
    base = sc.ships[0]
    # back-propagated start state: just start earlier on the same orbit
    ship = Ship(
        name="CrossEpoch",
        integrator="Verner87",
        tolerance=1e-3,
        start=Epoch.from_offset_seconds(t0 - 10 * 86400.0),
        end=Epoch.from_offset_seconds(t0 + 10 * 86400.0),
        position=base.position + np.array([5e4, 0, 0]),
        velocity=base.velocity,
        burns=[],
    )
    traj = propagate_ship(eph, ship, max_knots=32768)
    assert traj.start_s < t0 < traj.end_s
    assert traj.end_s >= ship.end.as_offset_seconds() - 1.0
