"""Offline-safe horizons module tests (GM table, time scales, CSV parsing)."""

import numpy as np

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.io import horizons
from ephemeris_explorer_tpu.io.naif_ids import NAIF_IDS


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
