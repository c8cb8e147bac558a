"""End-to-end mission acceptance test.

Replicates ephemeris/tests/spacecraft_propagation.rs:401-483: generate a
full-system ephemeris, propagate the bundled 4-burn Mars Transfer Ship
(Earth departure -> Mars capture) with Verner87 at AbsTol 1e-3 km, and assert
Earth/Mars proximity.  The bundled ship was authored against the
full_solar_system scene, which shares its epoch (JD 2433282.5 =
1950-01-01 TAI) with the reference test.
"""

from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.spacecraft import propagate_ship

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


@pytest.fixture(scope="module")
def full_eph():
    sc = scene.load_scene(SYSTEMS / "full_solar_system_2433282.5")
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(440.0))
    return sc, eph


@pytest.mark.slow
def test_mars_transfer_mission(full_eph):
    sc, eph = full_eph
    ship = next(s for s in sc.ships if s.name == "Mars Transfer Ship")
    assert str(ship.start) == "1950-01-01 00:00:00.000"

    end = Epoch.parse("1951-01-01 00:00:00")
    traj = propagate_ship(eph, ship, until=end, max_knots=65536)
    assert traj.end_s >= end.as_offset_seconds() - 1.0, (
        f"propagation stopped early at {Epoch.from_offset_seconds(traj.end_s)}"
    )

    def distance_from(body: str, when: str) -> float:
        t = Epoch.parse(when)
        p = traj.position(t)
        b = eph[body].position(t)
        assert p is not None and b is not None
        return float(np.linalg.norm(p - b))

    # spacecraft_propagation.rs:476-480
    assert distance_from("Earth", "1950-01-01 00:00:00") < 10_000.0
    assert distance_from("Earth", "1950-01-01 00:15:00") < 10_000.0
    assert distance_from("Mars", "1950-07-27 15:45:00") < 10_000.0
    assert distance_from("Mars", "1951-01-01 00:00:00") < 10_000.0


@pytest.mark.slow
def test_full_system_ephemeris_sane(full_eph):
    sc, eph = full_eph
    t0 = sc.state.epoch.as_offset_seconds()
    # Earth-Sun distance stays ~1 AU all year
    for frac in np.linspace(0.05, 0.95, 7):
        t = t0 + frac * 365.0 * 86400.0
        p = eph.positions(t)
        assert p is not None
        au = np.linalg.norm(p[eph.names.index("Earth")] - p[eph.names.index("Sun")])
        assert 1.45e8 < au < 1.55e8
        moon = np.linalg.norm(p[eph.names.index("Moon")] - p[eph.names.index("Earth")])
        assert 3.4e5 < moon < 4.2e5


def test_artemis_scene_loads_and_flies():
    """The 2026-epoch scene (sun_earth_moon_2461041.5) works end-to-end."""
    from ephemeris_explorer_tpu.spacecraft import propagate_ship

    sc = scene.load_scene(SYSTEMS / "sun_earth_moon_2461041.5")
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0))
    assert sc.ships, "scene bundles Artemis II"
    ship = sc.ships[0]
    traj = propagate_ship(eph, ship, max_knots=32768)
    assert traj.end_s > traj.start_s
    # the ship stays gravitationally bound to the Earth-Moon neighbourhood
    p = traj.position(traj.start_s + (traj.end_s - traj.start_s) / 2)
    e = eph["Earth"].position(traj.start_s + (traj.end_s - traj.start_s) / 2)
    assert np.linalg.norm(p - e) < 2e6
