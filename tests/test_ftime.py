"""Epoch/Duration parse-format byte compatibility (the [API] gate)."""

import pytest

from ephemeris_explorer_tpu.ftime import (
    Duration,
    DurationParseError,
    Epoch,
    EpochParseError,
    JD_TAI_EPOCH,
)


def test_epoch_parse_format_roundtrip():
    cases = [
        "1950-01-01 00:00:00.000",
        "1958-01-01 00:00:00.000",
        "2000-01-01 12:00:00.000",
        "1969-07-20 20:17:40.000",
        "2433-02-28 23:59:59.999",
        "1900-02-28 01:02:03.456",
    ]
    for s in cases:
        assert str(Epoch.parse(s)) == s


def test_epoch_parse_variants():
    # no millis / truncated fraction digits (epoch.rs:203-213)
    assert Epoch.parse("1950-01-01 00:00:00") == Epoch.parse("1950-01-01 00:00:00.000")
    assert Epoch.parse("1950-01-01 00:00:00.5") == Epoch.parse("1950-01-01 00:00:00.500")
    assert Epoch.parse("1950-01-01 00:00:00.1239") == Epoch.parse("1950-01-01 00:00:00.123")


def test_epoch_reference_values():
    # TAI epoch zero
    assert Epoch.parse("1958-01-01 00:00:00").as_offset_seconds() == 0.0
    # scene epoch: JD 2433282.5 = 1950-01-01 (solar_system_json/src/main.rs:79)
    e = Epoch.parse("1950-01-01 00:00:00")
    assert abs(e.to_jd() - 2433282.5) < 1e-9
    assert Epoch.from_jd(2433282.5) == e
    # negative epochs (pre-1958) format correctly
    assert str(e) == "1950-01-01 00:00:00.000"


def test_epoch_leap_day_validation():
    with pytest.raises(EpochParseError):
        Epoch.parse("1950-02-29 00:00:00")  # not a leap year
    assert str(Epoch.parse("1952-02-29 12:00:00")) == "1952-02-29 12:00:00.000"
    with pytest.raises(EpochParseError):
        Epoch.parse("1950-13-01 00:00:00")
    with pytest.raises(EpochParseError):
        Epoch.parse("1950-01-01")  # missing time


def test_duration_parse():
    assert Duration.parse("10 minutes").as_seconds() == 600.0
    assert Duration.parse("6 h").as_seconds() == 21600.0
    assert Duration.parse("5 min 15 s").as_seconds() == 315.0
    assert Duration.parse("1 y").as_seconds() == 365.25 * 86400.0
    assert Duration.parse("-1 min 30 s").as_seconds() == -90.0
    assert Duration.parse("250 ms").as_seconds() == 0.25
    with pytest.raises(DurationParseError):
        Duration.parse("")
    with pytest.raises(DurationParseError):
        Duration.parse("10 parsecs")


def test_duration_format():
    # duration.rs:217-277 unit decomposition
    assert str(Duration.from_seconds(90.0)) == "1 m 30 s"
    assert str(Duration.from_seconds(0.0)) == "0 s"
    assert str(Duration.from_seconds(0.25)) == "250 ms"
    assert str(Duration.from_days(366.25)) == "1 y 1 d"
    assert str(Duration.from_seconds(-3661.5)) == "-1 h 1 m 1 s 500 ms"
    # roundtrip through the ship-JSON style strings
    for s in ("5 min 15 s", "6 m 30 s", "1 m", "5 m 10 s"):
        d = Duration.parse(s)
        assert Duration.parse(str(d)).as_seconds() == d.as_seconds()


def test_epoch_arithmetic():
    e = Epoch.parse("1950-06-15 06:30:00")
    d = Duration.from_hours(30.0)
    assert str(e + d) == "1950-06-16 12:30:00.000"
    assert ((e + d) - e).as_seconds() == d.as_seconds()
    assert e.floor(Duration.from_days(1.0)).as_offset_seconds() % 86400.0 == 0.0
