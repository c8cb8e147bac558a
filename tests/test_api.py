"""Universe / FlightPlan / PredictionTask orchestration tests."""

from pathlib import Path

import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.api import Burn, FlightPlan, Universe
from ephemeris_explorer_tpu.integrators.adaptive import AdaptiveParams
from ephemeris_explorer_tpu.io import scene as scene_io

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


@pytest.fixture()
def uni():
    u = Universe.load(SYSTEMS / "sun_earth_moon_2433282.5")
    u.generate(Duration.from_days(40.0))
    return u


def test_generate_and_extend(uni):
    t0 = uni.state.epoch
    assert uni.ephemeris.contains(t0.as_offset_seconds() + 86400.0)
    end0 = uni.ephemeris.end
    # extend forward incrementally: bounds advance without regeneration
    uni.extend(Duration.from_days(30.0))
    assert uni.ephemeris.end.as_offset_seconds() > end0.as_offset_seconds()
    # the overlap region is unchanged
    mid = t0.as_offset_seconds() + 20 * 86400.0
    assert uni.ephemeris.positions(mid) is not None


def test_backward_extension(uni):
    t0 = uni.state.epoch.as_offset_seconds()
    uni.extend(Duration.from_days(30.0), direction=-1)
    p = uni.ephemeris.positions(t0 - 20 * 86400.0)
    assert p is not None


def test_background_task_controls(uni):
    task = uni.extend(Duration.from_days(60.0), background=True)
    task.pause()
    assert task.paused
    task.resume()
    task.join(timeout=300)
    assert not task.in_progress
    assert task.progress == 1.0


def test_export_roundtrip(uni, tmp_path):
    at = Epoch.from_offset_seconds(uni.state.epoch.as_offset_seconds() + 10 * 86400.0)
    snap = uni.export_state(at)
    path = tmp_path / "state.json"
    scene_io.save_state(snap, path)
    re = scene_io.load_state(path)
    assert [b.name for b in re.bodies] == uni.names
    assert str(re.epoch) == str(at)
    # the snapshot is a valid initial state: positions match the spline
    np.testing.assert_allclose(
        re.bodies[1].position, uni.ephemeris[uni.names[1]].position(at), rtol=0, atol=1e-9
    )


def test_flight_plan_overlap_and_dv():
    p = AdaptiveParams()
    fp = FlightPlan(method="Verner87", params=p, end=Epoch.from_offset_seconds(1e6))
    b1 = Burn(
        start=Epoch.from_offset_seconds(0.0),
        duration=Duration.from_seconds(100.0),
        acceleration=np.array([1e-2, 0, 0]),
        reference="Earth",
    )
    b2 = Burn(
        start=Epoch.from_offset_seconds(50.0),
        duration=Duration.from_seconds(100.0),
        acceleration=np.array([0, 1e-2, 0]),
        reference="Earth",
    )
    fp.add_burn(b1)
    fp.add_burn(b2)
    fp.compute_overlaps()
    assert b1.overlaps and b2.overlaps
    assert fp.total_delta_v() == 0.0  # overlapping burns are inactive
    fp.remove_burn(b2.id)
    fp.compute_overlaps()
    assert not b1.overlaps
    assert abs(fp.total_delta_v() - 1.0) < 1e-12


def test_replan_incremental(uni):
    ship = uni.scene.ships[0]
    entry = uni.spawn_ship(ship)
    traj1 = entry.trajectory
    n1 = len(traj1.ts)
    assert n1 > 10

    # add a burn near the end: replan restarts from the last common event
    t_burn = traj1.start_s + 0.8 * (traj1.end_s - traj1.start_s)
    entry.plan.add_burn(
        Burn(
            start=Epoch.from_offset_seconds(t_burn),
            duration=Duration.from_seconds(60.0),
            acceleration=np.array([1e-3, 0, 0]),
            reference="Earth",
        )
    )
    before = traj1.pos[: n1 // 2].copy()
    uni.replan(ship.name)
    traj2 = uni.ships[ship.name].trajectory
    # early knots unchanged (incremental restart preserved them)
    np.testing.assert_array_equal(traj2.pos[: n1 // 2], before)
    # trajectory diverges after the burn
    assert traj2.end_s >= traj1.end_s - 1.0


def test_replan_preserves_pre_restart_events(uni):
    """Incremental replans maintain the event containers with clear_after +
    insert (dynamics/spacecraft.rs:331-361,427-446): events strictly before
    the restart epoch survive OBJECT-IDENTICALLY, not recomputed."""
    ship = uni.scene.ships[0]
    entry = uni.spawn_ship(ship, propagate_now=False)
    span = ship.end.as_offset_seconds() - ship.start.as_offset_seconds()
    # an existing early burn so a later change restarts AFTER it (adding a
    # burn to a burn-less plan always diverges at the first coast segment
    # and is a legitimate full restart)
    t_b1 = ship.start.as_offset_seconds() + 0.2 * span
    entry.plan.add_burn(
        Burn(
            start=Epoch.from_offset_seconds(t_b1),
            duration=Duration.from_seconds(60.0),
            acceleration=np.array([5e-4, 0, 0]),
            reference="Earth",
        )
    )
    uni.replan(ship.name)
    traj1 = entry.trajectory
    assert len(entry.transitions) >= 1
    assert len(entry.apsides) >= 1

    # restart epoch will be the end of burn 1 (the last common timeline event)
    t_restart = t_b1 + 60.0
    t_burn2 = traj1.start_s + 0.8 * (traj1.end_s - traj1.start_s)
    pre_tr = [e for e in entry.transitions if e[0] <= t_restart]
    pre_ap = [a for a in entry.apsides if a.time <= t_restart]
    pre_tr_ids = [id(e) for e in pre_tr]
    pre_ap_ids = [id(a) for a in pre_ap]
    assert pre_ap, "fixture ship should have apsides before the restart"

    entry.plan.add_burn(
        Burn(
            start=Epoch.from_offset_seconds(t_burn2),
            duration=Duration.from_seconds(60.0),
            acceleration=np.array([1e-3, 0, 0]),
            reference="Earth",
        )
    )
    uni.replan(ship.name)
    # everything at/before the restart must be the same tuples/objects
    got_tr = [e for e in entry.transitions if e[0] <= t_restart]
    got_ap = [a for a in entry.apsides if a.time <= t_restart]
    assert [id(e) for e in got_tr][: len(pre_tr_ids)] == pre_tr_ids
    assert [id(a) for a in got_ap][: len(pre_ap_ids)] == pre_ap_ids
    # containers stay sorted and deduped after the merge
    ts = [e[0] for e in entry.transitions]
    assert ts == sorted(ts)
    bodies = [b for _, b in entry.transitions]
    assert all(bodies[i] != bodies[i + 1] for i in range(len(bodies) - 1))
    ats = [a.time for a in entry.apsides]
    assert ats == sorted(ats)


def test_event_containers_unit():
    """Container semantics vs spacecraft.rs:302-446."""
    from ephemeris_explorer_tpu.events import Apsides, Apsis, SoiTransitions

    tr = SoiTransitions()
    tr.insert(10.0, 1)
    tr.insert(20.0, 2)
    tr.insert(15.0, 2)   # dedup: predecessor at 10.0 is body 1 -> inserted
    assert list(tr) == [(10.0, 1), (15.0, 2), (20.0, 2)]
    tr2 = SoiTransitions()
    tr2.insert(10.0, 1)
    tr2.insert(12.0, 1)  # dedup against predecessor body
    assert list(tr2) == [(10.0, 1)]
    assert tr.soi_at(14.9) == 1 and tr.soi_at(15.0) == 2 and tr.soi_at(5.0) is None
    tr.clear_after(15.0)  # keeps exact match
    assert list(tr) == [(10.0, 1), (15.0, 2)]
    tr.insert(15.0, 3)    # exact-time replace
    assert list(tr) == [(10.0, 1), (15.0, 3)]
    tr.clear_before(15.0)
    assert list(tr) == [(15.0, 3)]

    ap = Apsides()
    a1 = Apsis(5.0, 0, 100.0, True)
    a2 = Apsis(9.0, 0, 200.0, False)
    ap.extend([a2, a1])
    assert list(ap) == [a1, a2]
    ap.clear_after(5.0)
    assert list(ap) == [a1]


def test_ship_analysis(uni):
    ship = uni.scene.ships[0]
    uni.spawn_ship(ship)
    entry = uni.ships[ship.name]
    assert len(entry.transitions) >= 1
    segs = uni.ship_segments(ship.name)
    assert len(segs) >= 1
    assert any("Orbit" in s.name or "Earth" in s.name for s in segs)


def test_interpolation_error_audit(uni):
    from ephemeris_explorer_tpu.api import interpolation_error

    errs = interpolation_error(
        uni.ephemeris, uni.state, uni.settings, span=Duration.from_days(30.0)
    )
    assert set(errs) == set(uni.names)
    # the audit's own regime: metres (debug.rs reports metres)
    assert all(e < 10.0 for e in errs.values()), errs


def test_rotation():
    import numpy as np

    from ephemeris_explorer_tpu.rotation import Rotating, quat_rotate

    rot = Rotating(
        right_ascension=0.0,
        declination=np.pi / 2,  # z-axis spin
        reference_epoch=Epoch.ZERO,
        reference_rotation=0.0,
        rotation_rate=np.pi,  # half turn per day
    )
    q = rot.at(Epoch.ZERO + Duration.from_days(1.0))
    v = quat_rotate(q, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [-1.0, 0.0, 0.0], atol=1e-12)


def test_explorer_session_tick(uni):
    from ephemeris_explorer_tpu.api import ExplorerSession

    uni.spawn_ship(uni.scene.ships[0])
    sess = ExplorerSession(uni, time_scale=86400.0)  # 1 day per real second
    frame = sess.tick(0.5)
    assert "Earth" in frame and "Earth Station" in frame
    # drive the clock to the edge: an auto-extension request fires
    sess.clock.set_time(sess.clock.end)
    sess.tick(0.1)
    assert sess._extend_task is not None
    sess._extend_task.join(timeout=300)
    sess.tick(0.1)  # merge the extension
    assert sess.clock.end.as_offset_seconds() > uni.state.epoch.as_offset_seconds() + 39 * 86400


def test_concurrent_forward_backward_tasks(uni):
    """fwd + bwd predictions run as concurrent tasks (main.rs:109-114)."""
    t_f = uni.extend(Duration.from_days(20.0), +1, background=True)
    t_b = uni.extend(Duration.from_days(30.0), -1, background=True)
    t_f.join(timeout=300)
    t_b.join(timeout=300)
    t0 = uni.state.epoch.as_offset_seconds()
    # 40 d initial + 20 d fwd: covered up to the Sun's 48 d segment boundary
    assert uni.ephemeris.positions(t0 + 45 * 86400.0) is not None
    # 30 d bwd: covered back to the Sun's -24 d boundary
    assert uni.ephemeris.positions(t0 - 12 * 86400.0) is not None


def test_spawn_scene_ships_and_export(uni):
    entries = uni.spawn_scene_ships()
    assert len(entries) == len(uni.scene.ships)
    name = uni.scene.ships[0].name
    js = uni.export_ship(name)
    from ephemeris_explorer_tpu.io.scene import load_ship
    import json as _json

    re_ship = load_ship(_json.loads(js))
    assert re_ship.name == name
    assert re_ship.integrator == uni.ships[name].plan.method


def test_extend_to_epoch(uni):
    target = Epoch.from_offset_seconds(
        uni.state.epoch.as_offset_seconds() + 100 * 86400.0
    )
    uni.extend_to(target)
    # covered up to the last full Sun segment before the target
    assert uni.ephemeris.end.as_offset_seconds() >= target.as_offset_seconds() - 24 * 86400.0
    back = Epoch.from_offset_seconds(uni.state.epoch.as_offset_seconds() - 50 * 86400.0)
    uni.extend_to(back)
    assert uni.ephemeris.start.as_offset_seconds() <= back.as_offset_seconds() + 24 * 86400.0
    # already covered -> no-op
    assert uni.extend_to(uni.state.epoch) is None


def test_replan_deferred_outside_context(uni):
    """Ships whose start is outside the context don't propagate (guard,
    flight_plan.rs:342-344) and pick up later when coverage arrives."""
    from ephemeris_explorer_tpu.io.scene import Ship

    far = Epoch.from_offset_seconds(uni.state.epoch.as_offset_seconds() + 60 * 86400.0)
    ship = Ship(
        name="Late",
        integrator="Verner87",
        tolerance=1e-3,
        start=far,
        end=Epoch.from_offset_seconds(far.as_offset_seconds() + 86400.0),
        position=uni.scene.ships[0].position,
        velocity=uni.scene.ships[0].velocity,
        burns=[],
    )
    entry = uni.spawn_ship(ship)
    assert len(entry.trajectory.ts) == 0  # deferred
    uni.extend(Duration.from_days(60.0))
    uni.replan("Late")
    assert len(entry.trajectory.ts) > 1
    assert entry.trajectory.start_s == far.as_offset_seconds()


def test_spawn_ship_relative(uni):
    import math

    at = Epoch.from_offset_seconds(uni.state.epoch.as_offset_seconds() + 86400.0)
    mu_e = uni.state.bodies[uni.body_index["Earth"]].mu
    r = 7000.0
    v = math.sqrt(mu_e / r)
    entry = uni.spawn_ship_relative(
        "RelSat", "Earth", [r, 0.0, 0.0], [0.0, v, 0.0],
        at=at, end=Epoch.from_offset_seconds(at.as_offset_seconds() + 86400.0),
    )
    traj = entry.trajectory
    t = at.as_offset_seconds() + 43200.0
    d = np.linalg.norm(traj.position(t) - uni.ephemeris["Earth"].position(t))
    assert abs(d - r) < 200.0  # circular-ish orbit around Earth


def test_reader_writer_hammer(uni):
    """Tight reader loop racing a background backward extension.

    The backward merge path (clear_before + prepend) is the torn-state
    hazard: new coefficients with an old start shift every evaluation by a
    whole chunk span.  BodyEphemeris publishes (start_s, coeffs) atomically
    and Universe readers take the lock, so positions at a fixed epoch inside
    the already-covered span must be bit-stable throughout.
    """
    t0 = uni.state.epoch
    at = Epoch.from_offset_seconds(t0.as_offset_seconds() + 10 * 86400.0)
    ref = uni.positions(at)
    assert ref is not None

    # small chunks -> many merge events to race against
    from ephemeris_explorer_tpu.api import PredictionTask

    prop = uni._propagator(-1)
    n_steps = int(round(Duration.from_days(60.0).as_seconds() / prop.dt_s))
    task = PredictionTask(
        prop, uni.ephemeris, uni.lock, prop.steps_done + n_steps, chunk_steps=64
    ).start()

    worst = 0.0
    reads = 0
    while task.in_progress:
        p = uni.positions(at)
        assert p is not None
        worst = max(worst, float(np.max(np.abs(p - ref))))
        reads += 1
        snap = uni.export_state(at)  # multi-body consistent read under lock
        assert len(snap.bodies) == len(uni.names)
    task.join(timeout=300)
    assert reads > 0
    assert worst == 0.0, f"torn read: positions drifted by {worst} km"
    # the backward extension actually landed
    assert uni.ephemeris.start.as_offset_seconds() < t0.as_offset_seconds()


def test_clear_after_out_of_range_noop():
    """UniformSpline::clear_after is a no-op for t outside the spline
    (trajectory.rs: get_index returns None for t < start)."""
    from ephemeris_explorer_tpu.ephemeris import BodyEphemeris

    coeffs = np.zeros((4, 9, 3))
    b = BodyEphemeris(start_s=100.0, interval_s=10.0, coeffs=coeffs)
    b.clear_after(0.0)  # before start: reference semantics = untouched
    assert b.segment_count == 4
    b.clear_after(1000.0)  # after end: untouched
    assert b.segment_count == 4
    b.clear_after(120.0)  # in range: truncates
    assert b.segment_count == 2


def test_edit_burn_surface(uni):
    """Universe.add_burn/edit_burn/remove_burn/set_plan_end mirror the
    reference's burn editor: mutate + incremental replan from divergence
    (ui/windows/body.rs:655-864, flight_plan.rs:310-361)."""
    ship = uni.scene.ships[0]
    entry = uni.spawn_ship(ship)
    traj1 = entry.trajectory
    n1 = len(traj1.ts)

    t_burn = traj1.start_s + 0.7 * (traj1.end_s - traj1.start_s)
    bid = uni.add_burn(
        ship.name,
        Burn(
            start=Epoch.from_offset_seconds(t_burn),
            duration=Duration.from_seconds(60.0),
            acceleration=np.array([1e-3, 0, 0]),
            reference="Earth",
        ),
    )
    traj2 = uni.ships[ship.name].trajectory
    early = traj2.pos[: n1 // 2].copy()

    # drag the burn later: knots before the OLD start are preserved
    burn = uni.edit_burn(
        ship.name, bid, start=Epoch.from_offset_seconds(t_burn + 1800.0)
    )
    assert burn.start.as_offset_seconds() == t_burn + 1800.0
    traj3 = uni.ships[ship.name].trajectory
    np.testing.assert_array_equal(traj3.pos[: n1 // 2], early)

    # edit acceleration + disable: trajectory returns to coast-only track
    uni.edit_burn(ship.name, bid, acceleration=[2e-3, 0, 0], enabled=False)
    traj4 = uni.ships[ship.name].trajectory
    got = traj4.get(traj1.ts[-1])
    ref = traj1.get(traj1.ts[-1])
    assert got is not None and ref is not None
    np.testing.assert_allclose(got[0], ref[0], atol=1e-6)

    # remove + shorten the plan end
    uni.remove_burn(ship.name, bid)
    assert bid not in uni.ships[ship.name].plan.burns
    end = Epoch.from_offset_seconds(traj1.start_s + 0.5 * (traj1.end_s - traj1.start_s))
    uni.set_plan_end(ship.name, end)
    assert uni.ships[ship.name].plan.end == end


def test_universe_lifecycle_fuzz(uni):
    """Randomized burn-editing / extension / query sequence holds the
    container invariants after every operation (sorted event times within
    bounds, strictly increasing knots, finite states)."""
    rng = np.random.default_rng(42)
    ship = uni.scene.ships[0]
    entry = uni.spawn_ship(ship)
    name = ship.name

    def span():
        tr = uni.ships[name].trajectory
        return tr.start_s, tr.end_s

    def check():
        tr = uni.ships[name].trajectory
        ts = np.asarray(tr.ts)
        assert np.all(np.diff(ts) > 0), "knots not strictly increasing"
        assert np.isfinite(np.asarray(tr.pos)).all()
        assert np.isfinite(np.asarray(tr.vel)).all()
        ev = [t for t, *_ in uni.ships[name].transitions]
        assert ev == sorted(ev)
        for t in ev:
            assert tr.start_s - 1.0 <= t <= tr.end_s + 1.0
        ap = [a.time for a in uni.ships[name].apsides]
        assert ap == sorted(ap)

    burn_ids = []
    for i in range(10):
        op = rng.integers(0, 5)
        s0, s1 = span()
        if op == 0 or not burn_ids:  # add
            t = s0 + (0.2 + 0.6 * rng.random()) * (s1 - s0)
            bid = uni.add_burn(
                name,
                Burn(
                    start=Epoch.from_offset_seconds(float(t)),
                    duration=Duration.from_seconds(float(30 + 60 * rng.random())),
                    acceleration=rng.normal(size=3) * 1e-4,
                    reference="Earth" if rng.random() < 0.5 else None,
                ),
            )
            burn_ids.append(bid)
        elif op == 1:  # shift a burn
            bid = burn_ids[rng.integers(0, len(burn_ids))]
            b = uni.ships[name].plan.burns.get(bid)
            if b is not None:
                uni.edit_burn(
                    name, bid,
                    start=b.start + Duration.from_seconds(float(rng.normal() * 600)),
                )
        elif op == 2:  # toggle
            bid = burn_ids[rng.integers(0, len(burn_ids))]
            b = uni.ships[name].plan.burns.get(bid)
            if b is not None:
                uni.edit_burn(name, bid, enabled=not b.enabled)
        elif op == 3:  # remove
            bid = burn_ids.pop(rng.integers(0, len(burn_ids)))
            uni.remove_burn(name, bid)
        else:  # queries at random epochs
            t = s0 + rng.random() * (s1 - s0)
            got = uni.ships[name].trajectory.get(float(t))
            if got is not None:
                assert np.isfinite(np.asarray(got[0])).all()
            uni.positions(Epoch.from_offset_seconds(float(t)))
            uni.ship_segments(name)
        check()
