"""Simulation clock / warp / auto-extend / plotting tests."""

from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.plot import PlotPoints
from ephemeris_explorer_tpu.simulation import (
    SimulationClock,
    Warp,
    cubic_ease_in_out,
    evaluate_scene,
)
from ephemeris_explorer_tpu.spacecraft import propagate_ship

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


@pytest.fixture(scope="module")
def ctx():
    sc = scene.load_scene(SYSTEMS / "sun_earth_moon_2433282.5")
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0))
    return sc, eph


def test_clock_bounds_and_advance(ctx):
    sc, eph = ctx
    clock = SimulationClock(current=sc.state.epoch, time_scale=3600.0)
    clock.sync_bounds([eph[n] for n in eph.names])
    assert clock.start.as_offset_seconds() == sc.state.epoch.as_offset_seconds()
    clock.advance(1.0)
    assert clock.current.as_offset_seconds() == sc.state.epoch.as_offset_seconds() + 3600.0
    # clamped at the end
    clock.advance(1e9)
    assert clock.current.as_offset_seconds() == clock.end.as_offset_seconds()


def test_auto_extend_trigger(ctx):
    sc, eph = ctx
    clock = SimulationClock(current=sc.state.epoch, time_scale=86400.0)
    clock.sync_bounds([eph[n] for n in eph.names])
    clock.set_time(Epoch.from_offset_seconds(clock.end.as_offset_seconds() - 1000.0))
    req = clock.auto_extend_span()
    assert req is not None
    span, direction = req
    assert direction == +1
    assert span.as_seconds() == 2 * 5.0 * 86400.0


def test_warp_easing(ctx):
    sc, eph = ctx
    clock = SimulationClock(current=sc.state.epoch)
    clock.sync_bounds([eph[n] for n in eph.names])
    target = Epoch.from_offset_seconds(sc.state.epoch.as_offset_seconds() + 10 * 86400.0)
    warp = Warp(clock, target)
    assert clock.paused
    while not warp.done:
        warp.tick(0.1)
    assert not clock.paused
    assert abs(clock.current.as_offset_seconds() - target.as_offset_seconds()) < 1e-6
    assert cubic_ease_in_out(0.0) == 0.0 and cubic_ease_in_out(1.0) == 1.0


def test_evaluate_scene(ctx):
    sc, eph = ctx
    ship_traj = propagate_ship(eph, sc.ships[0])
    at = Epoch.from_offset_seconds(ship_traj.start_s + 3600.0)
    out = evaluate_scene(eph, {"Earth Station": ship_traj}, at)
    assert set(out) == {"Sun", "Earth", "Moon", "Earth Station"}
    # out-of-span ships are omitted, bodies still present
    out2 = evaluate_scene(eph, {"Earth Station": ship_traj},
                          Epoch.from_offset_seconds(ship_traj.end_s + 86400.0))
    assert "Earth Station" not in out2 and "Earth" in out2


def test_plot_polyline_and_picking(ctx):
    sc, eph = ctx
    moon = eph["Moon"]

    def eval_sv(t):
        sv = moon.state_vector(t)
        return None if sv is None else (sv[0], sv[1])

    cam = np.array([0.0, 0.0, 5e8])
    pts = PlotPoints.build(
        eval_sv, moon.start_s, moon.start_s + 27.3 * 86400.0, cam,
        tan2_angular_resolution=2e-5, max_points=5000,
    )
    # one lunar orbit resolved by a modest number of adaptive points
    assert 10 < len(pts.times) < 5000
    assert np.all(np.diff(pts.times) > 0)
    # polyline approximates the true trajectory within the angular budget
    tm = (pts.times[0] + pts.times[-1]) / 2
    approx = pts.evaluate(tm)
    exact = moon.position(tm)
    assert np.linalg.norm(approx - exact) < 5e4

    # picking: a ray straight at the mid point comes close to the polyline
    target = pts.evaluate(tm)
    direction = target - cam
    direction = direction / np.linalg.norm(direction)
    hits = pts.ray_distances(cam, direction)
    assert hits
    assert min(h[1] for h in hits) < 5e4
