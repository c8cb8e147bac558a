"""Offline-safe horizons module tests (GM table, time scales, CSV parsing,
and the full fetch->cache->parse->state.json pipeline against a recorded-
format response built from the bundled REAL Horizons snapshot)."""

import json
from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.io import horizons, scene
from ephemeris_explorer_tpu.io.naif_ids import NAIF_IDS

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"

_MONTH_ABBR = {v: k for k, v in horizons._HORIZONS_MONTHS.items()}


def _horizons_date(tt: Epoch) -> str:
    """Format a TT epoch the way Horizons prints the calendar column:
    'A.D. 1950-Jan-01 00:00:32.1840'."""
    s = str(tt)  # "1950-01-01 00:00:32.184"
    return f"A.D. {s[:5]}{_MONTH_ABBR[s[5:7]]}{s[7:]}0"


def _fake_response(rows) -> str:
    """A format-faithful Horizons text response (header + $$SOE CSV block).

    The vector DATA comes from the bundled real snapshot; only the framing
    text is reconstructed, matching what lib.rs:100-121 consumes.
    """
    lines = [
        "API VERSION: 1.2",
        "API SOURCE: NASA/JPL Horizons API",
        "*" * 79,
        "Ephemeris / API_USER",
        "Center body name: Solar System Barycenter (0)     {source: DE441}",
        "Output units    : KM-S",
        "Output type     : GEOMETRIC cartesian states",
        "Output format   : 2 (position and velocity)",
        "Reference frame : ICRF",
        "*" * 79,
        "JDTDB, Calendar Date (TDB), X, Y, Z, VX, VY, VZ,",
        "*" * 24,
        "$$SOE",
    ]
    for tt, pos, vel in rows:
        jd = tt.to_jd()
        nums = ", ".join(f"{v: .16E}" for v in (*pos, *vel))
        lines.append(f"{jd:.9f}, {_horizons_date(tt)}, {nums},")
    lines += ["$$EOE", "*" * 79]
    return "\n".join(lines) + "\n"


def test_fetch_cache_roundtrip(tmp_path):
    """fetch_body end-to-end offline: request URL -> cache key -> response
    parse -> TT->TAI epoch conversion -> Body with DE440 mu.  The recorded
    response carries the REAL vectors of the bundled 1950-01-01 snapshot, so
    the parsed output must reproduce systems/sun_earth_moon_2433282.5
    byte-for-byte through write_state_json."""
    bundled = scene.load_state(SYSTEMS / "sun_earth_moon_2433282.5" / "state.json")
    start = bundled.epoch
    end = start + Duration.from_seconds(1.0)
    step = Duration.from_seconds(60.0)
    tt = horizons.to_tt(start)

    for b in bundled.bodies:
        url = horizons.request_url(NAIF_IDS[b.name], start, end, step)
        p = horizons.cache_path_for(tmp_path, url)
        p.write_text(_fake_response([(tt, b.position, b.velocity)]))

    # offline fetch must hit the cache and parse
    rows = horizons.fetch_body("Earth", start, end, step, cache_dir=tmp_path, offline=True)
    assert len(rows) == 1
    epoch, body = rows[0]
    assert abs(epoch.as_offset_seconds() - start.as_offset_seconds()) < 1e-9
    i = bundled.body_index("Earth")
    np.testing.assert_allclose(body.position, bundled.bodies[i].position, rtol=1e-15)
    np.testing.assert_allclose(body.velocity, bundled.bodies[i].velocity, rtol=1e-15)
    assert abs(body.mu - 398600.435507) < 1e-3  # DE440 Earth GM, not the file's

    # the CLI path writes a state.json whose bodies match the bundled scene
    out = horizons.write_state_json(
        [b.name for b in bundled.bodies], start,
        out_dir=tmp_path, cache_dir=tmp_path, offline=True,
    )
    assert out.name == "solar_system_2433282.5.json"
    got = json.loads(out.read_text())
    want = json.loads((SYSTEMS / "sun_earth_moon_2433282.5" / "state.json").read_text())
    # reference Epoch Display always writes .mmm (epoch.rs:244-246); the
    # bundled file's bare "00:00:00" predates that, so compare parsed epochs
    assert Epoch.parse(got["epoch"]) == Epoch.parse(want["epoch"])
    for gb, wb in zip(got["bodies"], want["bodies"]):
        assert gb["name"] == wb["name"]
        np.testing.assert_allclose(gb["position"], wb["position"], rtol=1e-15)
        np.testing.assert_allclose(gb["velocity"], wb["velocity"], rtol=1e-15)


def test_fetch_offline_without_cache_raises(tmp_path):
    with pytest.raises(RuntimeError, match="offline"):
        horizons.fetch_body(
            "Earth",
            Epoch.parse("1950-01-01 00:00:00"),
            Epoch.parse("1950-01-02 00:00:00"),
            Duration.from_hours(12.0),
            cache_dir=tmp_path,
            offline=True,
        )


def test_gm_table():
    gm = horizons.gravitational_parameters()
    assert len(gm) > 50
    # DE440 values, km^3/s^2
    assert abs(gm[399] - 398600.435507) < 1e-3        # Earth
    assert abs(gm[10] - 1.32712440041e11) < 1e3       # Sun
    assert abs(gm[301] - 4902.800118) < 1e-3          # Moon


def test_naif_ids():
    assert NAIF_IDS["Sun"] == 10
    assert NAIF_IDS["Earth"] == 399
    assert NAIF_IDS["Moon"] == 301
    assert NAIF_IDS["JupiterBarycenter"] == 5
    assert len(NAIF_IDS) >= 300


def test_tt_tai_roundtrip():
    e = Epoch.parse("1950-01-01 00:00:00")
    assert abs(horizons.from_tt(horizons.to_tt(e)).as_offset_seconds() - e.as_offset_seconds()) < 1e-9
    assert abs(horizons.to_tt(e).as_offset_seconds() - e.as_offset_seconds() - 32.184) < 1e-6


def test_csv_line_parse():
    # JDTDB 2433282.5 (TT) = 1950-01-01 TT -> TAI is 32.184 s earlier
    line = "2433282.500000000, A.D. 1950-Jan-01 00:00:00.0000, 1.0e5, 2.0e5, 3.0e5, 1.5, -2.5, 0.25,"
    epoch, pos, vel = horizons._parse_csv_line(line)
    assert abs(epoch.as_offset_seconds() - (Epoch.parse("1950-01-01 00:00:00").as_offset_seconds() - 32.184)) < 1e-6
    np.testing.assert_array_equal(pos, [1.0e5, 2.0e5, 3.0e5])
    np.testing.assert_array_equal(vel, [1.5, -2.5, 0.25])
