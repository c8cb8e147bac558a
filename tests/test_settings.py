"""settings.toml persistence (settings.rs:59-189 semantics)."""

from pathlib import Path

from ephemeris_explorer_tpu.settings import AppSettings, DEFAULT_SYSTEM_PATH


def test_defaults_when_missing(tmp_path):
    s = AppSettings.load(tmp_path / "nope" / "settings.toml")
    assert s.system_path == DEFAULT_SYSTEM_PATH
    assert s.time_scale == 1.0
    assert s.method == "QuinlanTremaine12"


def test_roundtrip_and_write_on_change(tmp_path):
    p = tmp_path / "settings.toml"
    s = AppSettings.load(p)
    s.set("time_scale", 1000.0)       # auto-writes
    s.set("system_path", "systems/sun_earth_moon_2433282.5")
    assert p.exists()

    s2 = AppSettings.load(p)
    assert s2.time_scale == 1000.0
    assert s2.system_path == "systems/sun_earth_moon_2433282.5"
    assert s2.auto_extend is True


def test_unknown_keys_preserved(tmp_path):
    """UI-only keys (bloom, fov, window geometry) round-trip unmodified so
    the file can be shared with a rendering front (settings.rs:31-48)."""
    p = tmp_path / "settings.toml"
    p.write_text(
        "[user]\n"
        'system_path = "systems/full_solar_system_2433282.5"\n'
        "bloom_intensity = 0.15\n"
        "fov = 45.0\n"
        "show_labels = true\n"
        "[window]\n"
        "size = [1280.0, 720.0]\n"
        "position = [0, 0]\n"
    )
    s = AppSettings.load(p)
    assert s.user_extra["bloom_intensity"] == 0.15
    assert s.window["size"] == [1280.0, 720.0]
    s.set("time_scale", 50.0)
    s2 = AppSettings.load(p)
    assert s2.user_extra["fov"] == 45.0
    assert s2.user_extra["show_labels"] is True
    assert s2.window["position"] == [0, 0]
    assert s2.time_scale == 50.0


def test_malformed_file_falls_back(tmp_path):
    p = tmp_path / "settings.toml"
    p.write_text("not [valid toml ===")
    s = AppSettings.load(p)
    assert s.system_path == DEFAULT_SYSTEM_PATH


def test_default_path_is_config_dir(monkeypatch, tmp_path):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    from ephemeris_explorer_tpu.settings import default_settings_path

    assert default_settings_path() == tmp_path / "Ephemeris Explorer" / "settings.toml"
