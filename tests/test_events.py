"""SOI assignment / transition / apsis / analysis tests."""

from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu import analysis, events
from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.io.scene import Ship, ShipBurn
from ephemeris_explorer_tpu.spacecraft import propagate_ship

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


@pytest.fixture(scope="module")
def ctx():
    sc = scene.load_scene(SYSTEMS / "sun_earth_moon_2433282.5")
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0))
    soi = analysis.assign_soi(sc.state)
    return sc, eph, soi


def test_assign_soi(ctx):
    sc, eph, soi = ctx
    i_sun = sc.state.body_index("Sun")
    i_earth = sc.state.body_index("Earth")
    i_moon = sc.state.body_index("Moon")
    assert np.isinf(soi.radii[i_sun])
    assert soi.parent[i_earth] == i_sun
    assert soi.parent[i_moon] == i_earth
    # Earth's SOI ~ 9.2e5 km; Moon's ~ 6.6e4 km
    assert 8e5 < soi.radii[i_earth] < 1.1e6
    assert 5e4 < soi.radii[i_moon] < 8e4
    assert soi.depth[i_sun] == 0 and soi.depth[i_earth] == 1 and soi.depth[i_moon] == 2


def test_hierarchy(ctx):
    sc, eph, soi = ctx
    h = analysis.hierarchy_at(eph, soi, sc.state.epoch.as_offset_seconds() + 86400.0)
    i_sun = sc.state.body_index("Sun")
    i_earth = sc.state.body_index("Earth")
    i_moon = sc.state.body_index("Moon")
    assert h[i_moon] == i_earth
    assert h[i_earth] == i_sun
    assert h[i_sun] == -1


def test_soi_transitions_and_apsides(ctx):
    """An Earth-orbiting ship: stays in Earth SOI, periapses/apoapses detected."""
    sc, eph, soi = ctx
    ship = sc.ships[0]  # Earth Station, elliptical-ish Earth orbit
    traj = propagate_ship(eph, ship)
    packed = eph.pack()

    tr = events.soi_transitions(traj, packed, soi.radii)
    i_earth = sc.state.body_index("Earth")
    assert len(tr) >= 1
    assert tr[0][1] == i_earth  # starts inside Earth's SOI
    assert all(b == i_earth for _, b in tr)  # never leaves over 3 days

    aps = events.apsides(traj, packed, tr)
    # ~7000 km orbit with ~1.6h period over 3 days: tens of apsides
    assert len(aps) >= 10
    for a in aps:
        assert a.body == i_earth
        assert 5e3 < a.distance < 1e5
    kinds = {a.periapsis for a in aps}
    assert kinds == {True, False}
    # alternating peri/apo
    for x, y in zip(aps, aps[1:]):
        assert x.periapsis != y.periapsis
        assert y.time > x.time


def test_escape_transition(ctx):
    """A huge burn escapes Earth's SOI; transitions show Earth -> Sun."""
    sc, eph, soi = ctx
    base = sc.ships[0]
    t0 = base.start.as_offset_seconds()
    ship = Ship(
        name="Escaper",
        integrator="Verner87",
        tolerance=1e-3,
        start=base.start,
        end=Epoch.from_offset_seconds(t0 + 20 * 86400.0),
        position=base.position,
        velocity=base.velocity,
        burns=[
            ShipBurn(
                start=Epoch.from_offset_seconds(t0 + 600.0),
                duration=Duration.from_seconds(600.0),
                acceleration=np.array([8e-3, 0.0, 0.0]),
                reference="Earth",
            )
        ],
    )
    traj = propagate_ship(eph, ship)
    packed = eph.pack()
    tr = events.soi_transitions(traj, packed, soi.radii)
    i_earth = sc.state.body_index("Earth")
    i_sun = sc.state.body_index("Sun")
    bodies = [b for _, b in tr]
    assert bodies[0] == i_earth
    assert i_sun in bodies, f"expected escape to Sun SOI, got {tr}"

    # segmentation: Earth segment then Sun segment; Earth span is an Escape
    segs = analysis.segment_trajectory(
        tr,
        None,
        [b.name for b in sc.state.bodies],
        soi_parent_of=lambda b, t: int(soi.parent[b]),
        start=traj.start_s,
        end=traj.end_s,
    )
    names = [s.name for s in segs]
    assert any("Earth Escape" in n for n in names), names
    assert any("Sun" in n for n in names), names


def test_closest_separation(ctx):
    sc, eph, soi = ctx
    ship = sc.ships[0]
    traj = propagate_ship(eph, ship)
    t = analysis.closest_separation(
        traj.position,
        eph["Moon"].position,
        traj.start_s,
        traj.end_s,
        precision=1.0,
    )
    assert t is not None and traj.start_s <= t <= traj.end_s


def test_relative_trajectory(ctx):
    from ephemeris_explorer_tpu.analysis import RelativeTrajectory

    sc, eph, soi = ctx
    rel = RelativeTrajectory(eph["Moon"], eph["Earth"])
    t = rel.start_s + (rel.end_s - rel.start_s) / 2
    p = rel.position(t)
    assert 3.4e5 < np.linalg.norm(p) < 4.2e5  # Moon-Earth distance
    pv = rel.state_vector(t)
    assert np.linalg.norm(pv[1]) < 1.2e0  # relative speed ~1 km/s
    tmin = rel.closest_separation(precision=1.0)
    assert tmin is not None and rel.contains(tmin)
    # bounds are the intersection
    assert rel.start_s == max(eph["Moon"].start_s, eph["Earth"].start_s)


def test_segment_classification_branches():
    """All Capture/Escape/Flyby/Transit/Orbit branches (analysis.rs:279-296)."""
    names = ["Sun", "Earth", "Moon"]
    parent = {0: -1, 1: 0, 2: 1}  # Moon's SOI parent = Earth
    soi_parent_of = lambda b, t: parent[b]

    def kinds(transitions):
        segs = analysis.segment_trajectory(
            transitions, None, names, soi_parent_of, start=0.0, end=1000.0
        )
        return [(s.kind.value, s.body) for s in segs]

    # single span, no transitions around it -> Orbit
    assert kinds([(0.0, 1)]) == [("Orbit", 1)]
    # Earth -> Moon -> Earth: the Moon span is a Flyby (entered from and
    # leaving to its SOI parent)
    got = kinds([(0.0, 1), (100.0, 2), (200.0, 1)])
    assert ("Flyby", 2) in got
    # Earth -> Moon (stays): Capture
    got = kinds([(0.0, 1), (100.0, 2)])
    assert got[-1] == ("Capture", 2)
    # Moon -> Earth (leaves to parent): the Moon span is an Escape
    got = kinds([(0.0, 2), (100.0, 1)])
    assert got[0] == ("Escape", 2)
    # Sun -> Moon -> Sun: Moon entered NOT from its parent -> Transit
    got = kinds([(0.0, 0), (100.0, 2), (200.0, 0)])
    assert ("Transit", 2) in got


def test_segment_burn_subdivision():
    from ephemeris_explorer_tpu.spacecraft import build_timeline
    from ephemeris_explorer_tpu.io.scene import ShipBurn
    from ephemeris_explorer_tpu import Duration, Epoch

    names = ["Sun", "Earth"]
    tl = build_timeline(
        [ShipBurn(
            start=Epoch.from_offset_seconds(100.0),
            duration=Duration.from_seconds(50.0),
            acceleration=np.array([1e-2, 0, 0]),
            reference="Earth",
        )],
        {"Earth": 1, "Sun": 0},
    )
    segs = analysis.segment_trajectory(
        [(0.0, 1)], tl, names, lambda b, t: 0, start=0.0, end=1000.0
    )
    # coast + burn + coast pieces, burn flagged and named "... Burn"
    assert [s.burn for s in segs] == [False, True, False]
    assert "Burn" in segs[1].name
    assert segs[1].start == 100.0 and segs[1].end == 150.0


def test_apsis_times_match_kepler_closed_form():
    """Apsis epochs/distances vs the two-body closed form.

    A ship on an eccentric Kepler orbit around a lone central body has
    periapsis passages at t0 + k*T and apoapsides at t0 + (k + 1/2)*T with
    T = 2*pi*sqrt(a^3/mu); detected events must hit those to sub-second
    accuracy (bisection precision is 1e-3 s; the integrator and Hermite
    interpolation own the rest).  Closed-form analogue of the radial-velocity
    zero crossings in dynamics/spacecraft.rs:566-583.
    """
    mu = 398600.4418
    a, e = 9000.0, 0.35
    T = 2.0 * np.pi * np.sqrt(a**3 / mu)
    r_p = a * (1.0 - e)
    v_p = np.sqrt(mu * (1.0 + e) / (a * (1.0 - e)))

    epoch = Epoch.from_offset_seconds(0.0)
    state = scene.SolarSystemState(
        "TwoBody",
        epoch,
        [scene.Body("Star", mu, np.zeros(3), np.zeros(3))],
    )
    settings = scene.EphemeridesSettings(
        Duration.from_seconds(600.0),
        {"Star": scene.InterpolationParameters(degree=6, count=1)},
    )
    eph = generate_ephemeris(state, settings, Duration.from_days(1.5))
    packed = eph.pack()
    soi = analysis.assign_soi(state)

    n_periods = 3
    ship = Ship(
        name="Kepler",
        integrator="Verner87",
        tolerance=1e-9,
        start=epoch,
        end=Epoch.from_offset_seconds((n_periods + 0.2) * T),
        position=np.array([r_p, 0.0, 0.0]),
        velocity=np.array([0.0, v_p, 0.0]),
    )
    traj = propagate_ship(eph, ship)

    tr = events.soi_transitions(traj, packed, soi.radii)
    assert [b for _, b in tr] == [0]
    aps = events.apsides(traj, packed, tr)
    assert len(aps) >= 2 * n_periods  # alternating apo/peri over 3 periods

    for ap in aps:
        k = round((ap.time - epoch.as_offset_seconds()) / (T / 2.0))
        t_exact = epoch.as_offset_seconds() + k * (T / 2.0)
        assert abs(ap.time - t_exact) < 0.5, (ap, t_exact)
        want_peri = k % 2 == 0
        assert ap.periapsis == want_peri
        r_exact = r_p if want_peri else a * (1.0 + e)
        # km: Hermite knots every 600 s put ~1 m of interpolation error at
        # the periapsis speed; 5 m bounds it with margin
        assert abs(ap.distance - r_exact) < 5e-3, (ap, r_exact)
