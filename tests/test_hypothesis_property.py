"""Hypothesis property tests for the time scalars, the fit, and the spline
edge rules.

These complement the seeded-random sweeps in ``test_property.py`` with
shrinking adversarial search over the invariants the reference encodes
structurally:

* civil-date math is its own inverse (ftime/src/epoch.rs:266-290, Hinnant);
* ``Epoch``/``Duration`` parse/format round-trip at millisecond granularity
  (epoch.rs:155-249, duration.rs:217-345);
* the batched least-squares fit is EXACT on polynomials of the fitted degree
  (celestial.rs:19-136 solves the same LSQ problem);
* ``UniformSpline`` end-inclusive indexing matches the literal
  trajectory.rs:552-617 rule for arbitrary (start, interval) geometry;
* ``Timeline`` stays gap-free under adversarial burn layouts, including
  zero-gap adjacency (spacecraft.rs:119-222).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from ephemeris_explorer_tpu.ftime import (
    Duration,
    Epoch,
    civil_from_days,
    days_from_civil,
)
from ephemeris_explorer_tpu.ephemeris import BodyEphemeris
from ephemeris_explorer_tpu.io.scene import ShipBurn
from ephemeris_explorer_tpu.ops import polyfit
from ephemeris_explorer_tpu.spacecraft import (
    EPOCH_MAX,
    EPOCH_MIN,
    build_timeline,
    segment_idx_at,
)

COMMON = settings(max_examples=200, deadline=None)


# ---------------------------------------------------------------------------
# ftime
# ---------------------------------------------------------------------------


@COMMON
@given(st.integers(min_value=-1_000_000, max_value=3_000_000))
def test_civil_days_roundtrip(z):
    y, m, d = civil_from_days(z)
    assert days_from_civil(y, m, d) == z
    assert 1 <= m <= 12 and 1 <= d <= 31


@COMMON
@given(
    st.integers(min_value=1, max_value=9999),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=31),
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=999),
)
def test_epoch_format_parse_roundtrip(y, mo, d, h, mi, s, ms):
    try:
        e = Epoch.from_datetime(y, mo, d, h, mi, s, ms)
    except Exception:
        # invalid civil date (e.g. Feb 30) — ctor must reject, nothing to test
        return
    e2 = Epoch.parse(str(e))
    # str() carries millisecond resolution; the epoch is ms-quantised already
    assert abs(e2.offset - e.offset) < 5e-4, (str(e), e.offset, e2.offset)


@COMMON
@given(st.integers(min_value=-(2**53), max_value=2**53))
def test_epoch_ms_quantised_str_parse_identity(total_ms):
    """Any ms-quantised offset round-trips to the same millisecond.

    NOT bitwise: ``from_datetime`` reconstructs ``days*86400 + sod + ms/1e3``,
    which rounds differently than the original float near day boundaries
    (e.g. -0.001 -> -1.0 + 0.999) — the reference's f64 arithmetic
    (epoch.rs:52-60) has the identical property, so the invariant is
    millisecond agreement + formatting idempotence.
    """
    e = Epoch.from_offset_seconds(total_ms * 1e-3)
    # formatting needs a representable civil year (format is %04d)
    y = civil_from_days(int(np.floor(e.offset / 86400.0)) - 4383)[0]
    if not (1 <= y <= 9999):
        return
    s = str(e)
    e2 = Epoch.parse(s)
    assert abs(e2.offset - e.offset) <= 5e-4 + 1e-9 * abs(e.offset)
    assert str(e2) == s


@COMMON
@given(st.integers(min_value=0, max_value=10**15))
def test_duration_format_parse_roundtrip(total_ms):
    d = Duration(total_ms * 1e-3)
    assert Duration.parse(str(d)).seconds == d.seconds
    dn = Duration(-total_ms * 1e-3)
    assert Duration.parse(str(dn)).seconds == dn.seconds


@COMMON
@given(
    st.floats(min_value=-1e12, max_value=1e12, allow_nan=False),
    st.floats(min_value=1e-3, max_value=1e6, allow_nan=False),
)
def test_duration_floor_round_properties(sec, to):
    d, t = Duration(sec), Duration(to)
    f = d.floor(t)
    # floor: integer multiple of `to`, within one `to` below (fp-tolerant)
    k = f.seconds / to
    assert abs(k - round(k)) < 1e-6 * max(1.0, abs(k))
    assert f.seconds <= d.seconds + 1e-9 * max(1.0, abs(sec))
    assert d.seconds - f.seconds < to * (1 + 1e-9)
    r = d.round(t)
    # round: within to/2 of the original (half-away-from-zero at the midpoint)
    assert abs(r.seconds - d.seconds) <= to / 2 * (1 + 1e-9) + 1e-9 * abs(sec)


# ---------------------------------------------------------------------------
# least-squares fit
# ---------------------------------------------------------------------------


@COMMON
@given(
    st.integers(min_value=1, max_value=8),
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=9,
        max_size=9,
    ),
    st.booleans(),
)
def test_fit_exact_on_polynomials(degree, raw_coeffs, backward):
    """Fitting samples OF a degree-d polynomial returns that polynomial."""
    true_c = np.zeros(polyfit.MAX_COEFFS)
    true_c[: degree + 1] = raw_coeffs[: degree + 1]
    taus = polyfit.sample_taus(backward=backward)
    samples = np.polyval(true_c[::-1], taus)  # (9,)
    m = polyfit.fit_matrix(degree, backward=backward)
    got = m @ samples
    scale = max(1.0, np.abs(true_c).max())
    np.testing.assert_allclose(got, true_c, atol=5e-9 * scale, rtol=0)


@COMMON
@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=9,
        max_size=9,
    ),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_horner_matches_polyval(coeffs, tau):
    c = np.asarray(coeffs)
    got = np.asarray(polyfit.horner(c[:, None].repeat(3, axis=1), tau))
    want = np.polyval(c[::-1], tau)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


# ---------------------------------------------------------------------------
# spline edge rules
# ---------------------------------------------------------------------------


def _literal_eval(b: BodyEphemeris, t: float):
    """trajectory.rs:552-617, transcribed independently of the implementation."""
    local = t - b.start_s
    n = b.segment_count
    if local < 0.0 or local > b.interval_s * n:
        return None
    idx = min(max(int(np.ceil(local / b.interval_s)) - 1, 0), n - 1)
    tau = (local - b.interval_s * idx) / b.interval_s
    out = np.zeros(3)
    for k in range(polyfit.MAX_COEFFS - 1, -1, -1):
        out = out * tau + b.coeffs[idx][k]
    return out


@COMMON
@given(
    st.floats(min_value=-1e8, max_value=1e8, allow_nan=False),
    st.floats(min_value=1e-2, max_value=1e6, allow_nan=False),
    st.integers(min_value=1, max_value=6),
    st.floats(min_value=-0.5, max_value=1.5, allow_nan=False),
)
def test_spline_indexing_literal_rule(start, interval, nseg, frac):
    rng = np.random.default_rng(abs(hash((round(start, 3), nseg))) % 2**32)
    b = BodyEphemeris(
        start_s=start,
        interval_s=interval,
        coeffs=rng.normal(size=(nseg, polyfit.MAX_COEFFS, 3)),
    )
    # probe at an arbitrary fraction of the span, including out-of-range
    t = start + frac * nseg * interval
    want, got = _literal_eval(b, t), b.position(t)
    if want is None or got is None:
        assert want is None and got is None, (t, frac)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# cubic-Hermite trajectory (trajectory.rs:635-855)
# ---------------------------------------------------------------------------


def _hermite_traj(ts, rng):
    from ephemeris_explorer_tpu.spacecraft import HermiteTrajectory

    k = len(ts)
    return HermiteTrajectory(
        ts=np.asarray(ts, dtype=np.float64),
        pos=rng.normal(size=(k, 3)),
        vel=rng.normal(size=(k, 3)),
    )


@st.composite
def knot_times(draw, min_knots=2, max_knots=8):
    start = draw(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
    gaps = draw(
        st.lists(
            st.floats(min_value=1e-2, max_value=1e4, allow_nan=False),
            min_size=min_knots - 1,
            max_size=max_knots - 1,
        )
    )
    return start + np.concatenate([[0.0], np.cumsum(gaps)])


@COMMON
@given(knot_times(), st.integers(min_value=0, max_value=2**31 - 1))
def test_hermite_knot_rules(ts, seed):
    traj = _hermite_traj(ts, np.random.default_rng(seed))
    k = len(ts)
    for i in range(k):
        np.testing.assert_array_equal(traj.position(float(ts[i])), traj.pos[i])
        p, v = traj.get(float(ts[i]))
        np.testing.assert_array_equal(p, traj.pos[i])
        np.testing.assert_array_equal(v, traj.vel[i])
    # strictly outside -> None; get() at a non-knot -> None
    span = ts[-1] - ts[0]
    assert traj.position(float(ts[0] - 0.1 * span - 1.0)) is None
    assert traj.position(float(ts[-1] + 0.1 * span + 1.0)) is None
    mid = float(0.5 * (ts[0] + ts[1]))
    if mid not in ts:
        assert traj.get(mid) is None


@COMMON
@given(
    knot_times(),
    st.lists(
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False),
        min_size=12,
        max_size=12,
    ),
    st.floats(min_value=1e-4, max_value=1.0 - 1e-4, allow_nan=False),
)
def test_hermite_exact_on_cubics(ts, raw, frac):
    """Knots sampled from a true cubic (matching derivatives) reproduce it."""
    from ephemeris_explorer_tpu.spacecraft import HermiteTrajectory

    c = np.asarray(raw).reshape(4, 3)  # cubic coeffs per component
    # scale time into the unit-ish range so x**3 stays conditioned
    t0, t1 = ts[0], ts[-1]
    u = (np.asarray(ts) - t0) / (t1 - t0)
    pos = ((c[3] * u[:, None] + c[2]) * u[:, None] + c[1]) * u[:, None] + c[0]
    vel = ((3 * c[3] * u[:, None] + 2 * c[2]) * u[:, None] + c[1]) / (t1 - t0)
    traj = HermiteTrajectory(ts=np.asarray(ts, float), pos=pos, vel=vel)
    for i in range(len(ts) - 1):
        t = float(ts[i] + frac * (ts[i + 1] - ts[i]))
        uu = (t - t0) / (t1 - t0)
        want = ((c[3] * uu + c[2]) * uu + c[1]) * uu + c[0]
        got, dgot = traj.state_vector(t)
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7)
        wantd = ((3 * c[3] * uu + 2 * c[2]) * uu + c[1]) / (t1 - t0)
        np.testing.assert_allclose(dgot, wantd, rtol=1e-5, atol=1e-5)


@COMMON
@given(
    knot_times(min_knots=3, max_knots=8),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_hermite_join_algebra(ts, seed, cut_frac):
    """join = clear_after(other.start) + extend (spacecraft.rs:557-561):
    the result keeps exactly the knots strictly before other's start, then
    other's knots; time order is preserved."""
    rng = np.random.default_rng(seed)
    traj = _hermite_traj(ts, rng)
    cut = float(ts[0] + cut_frac * (ts[-1] - ts[0]))
    other = _hermite_traj(cut + np.array([0.0, 1.0, 2.0]), rng)
    expect_kept = traj.ts[traj.ts < cut]
    traj.join(other)
    assert len(traj.ts) == len(expect_kept) + 3
    np.testing.assert_array_equal(traj.ts[: len(expect_kept)], expect_kept)
    np.testing.assert_array_equal(traj.ts[len(expect_kept):], other.ts)
    assert np.all(np.diff(traj.ts) > 0)


# ---------------------------------------------------------------------------
# timeline algebra
# ---------------------------------------------------------------------------


@COMMON
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1e5, max_value=1e5, allow_nan=False),
            st.floats(min_value=1e-3, max_value=1e4, allow_nan=False),
            st.booleans(),  # make this burn START exactly at the previous END
        ),
        min_size=0,
        max_size=6,
    )
)
def test_timeline_gap_free_adversarial(raw):
    burns, prev_end = [], None
    for start, dur, glue in sorted(raw, key=lambda r: r[0]):
        s = prev_end if (glue and prev_end is not None) else start
        if prev_end is not None and s < prev_end:
            s = prev_end  # keep non-overlapping, allow exact adjacency
        burns.append(
            ShipBurn(
                start=Epoch.from_offset_seconds(float(s)),
                duration=Duration.from_seconds(float(dur)),
                acceleration=np.array([1e-3, 0.0, 0.0]),
                reference=None,
            )
        )
        prev_end = s + dur
    tl = build_timeline(burns, {})
    starts, ends = np.asarray(tl.starts), np.asarray(tl.ends)
    assert starts[0] == EPOCH_MIN and ends[-1] == EPOCH_MAX
    np.testing.assert_array_equal(starts[1:], ends[:-1])
    assert np.all(ends >= starts)
    for s in starts[1:-1]:
        i = int(segment_idx_at(tl, float(s)))
        assert starts[i] <= s < ends[i]


# ---------------------------------------------------------------------------
# Event containers: SoiTransitions / Apsides algebra
# (dynamics/spacecraft.rs:302-379, 412-446)
# ---------------------------------------------------------------------------

_ops = st.lists(
    st.tuples(
        st.sampled_from(["insert", "clear_after", "clear_before"]),
        st.integers(min_value=0, max_value=40),   # time (small grid forces collisions)
        st.integers(min_value=0, max_value=3),    # body
    ),
    min_size=0,
    max_size=30,
)


@given(_ops, st.integers(min_value=0, max_value=40))
@settings(max_examples=300, deadline=None)
def test_soi_transitions_invariants(ops, probe_t):
    from ephemeris_explorer_tpu.events import SoiTransitions

    tr = SoiTransitions()
    for op, t, b in ops:
        if op == "insert":
            before = list(tr)
            tr.insert(float(t), b)
            # a no-op only when the predecessor carries the same body and
            # the exact time is absent; a replacement never changes length
            if (t, b) not in [(int(x), y) for x, y in tr]:
                assert list(tr) == before  # dedup'd against predecessor
        elif op == "clear_after":
            tr.clear_after(float(t))
            assert all(x <= t for x, _ in tr)
        else:
            tr.clear_before(float(t))
            assert all(x >= t for x, _ in tr)
        times = [x for x, _ in tr]
        assert times == sorted(times) and len(set(times)) == len(times)

    # soi_at == naive last-entry-with-time<=t scan
    naive = None
    for x, b in tr:
        if x <= probe_t:
            naive = b
    assert tr.soi_at(float(probe_t)) == naive


@given(_ops)
@settings(max_examples=300, deadline=None)
def test_soi_transitions_extend_is_insert_each(ops):
    from ephemeris_explorer_tpu.events import SoiTransitions

    inserts = [(float(t), b) for op, t, b in ops if op == "insert"]
    cut = len(inserts) // 2
    one = SoiTransitions()
    for t, b in inserts:
        one.insert(t, b)
    two = SoiTransitions()
    for t, b in inserts[:cut]:
        two.insert(t, b)
    two.extend(SoiTransitions(_raw_sorted(inserts[cut:])))
    # extend == insert-each over the suffix (order preserved by construction)
    ref = SoiTransitions()
    for t, b in inserts[:cut]:
        ref.insert(t, b)
    for t, b in _raw_sorted(inserts[cut:]):
        ref.insert(t, b)
    assert two == ref


def _raw_sorted(pairs):
    """Sorted, exact-time-deduped raw entry list (container precondition)."""
    out = {}
    for t, b in pairs:
        out[t] = b
    return sorted(out.items())


@given(_ops)
@settings(max_examples=300, deadline=None)
def test_apsides_invariants(ops):
    from ephemeris_explorer_tpu.events import Apsides, Apsis

    aps = Apsides()
    for op, t, b in ops:
        if op == "insert":
            n0 = len(aps)
            existed = any(a.time == float(t) for a in aps)
            aps.insert(Apsis(float(t), b, 1.0 + t, bool(b % 2)))
            assert len(aps) == n0 + (0 if existed else 1)  # replace-at-time
            got = [a for a in aps if a.time == float(t)]
            assert len(got) == 1 and got[0].body == b
        elif op == "clear_after":
            aps.clear_after(float(t))
            assert all(a.time <= t for a in aps)
        times = [a.time for a in aps]
        assert times == sorted(times) and len(set(times)) == len(times)
