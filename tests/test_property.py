"""Property-style randomized tests for spline edge rules and timeline algebra.

Seeded-random sweeps (no hypothesis dependency) over the invariants that the
reference encodes structurally: UniformSpline's end-inclusive indexing and
splice algebra (trajectory.rs:412-633) and Timeline's gap-free coverage
(spacecraft.rs:119-222).
"""

import numpy as np

from ephemeris_explorer_tpu.ephemeris import BodyEphemeris
from ephemeris_explorer_tpu.ftime import Duration, Epoch
from ephemeris_explorer_tpu.io.scene import ShipBurn
from ephemeris_explorer_tpu.ops.polyfit import MAX_COEFFS
from ephemeris_explorer_tpu.spacecraft import (
    EPOCH_MAX,
    EPOCH_MIN,
    build_timeline,
    divergence_time,
    segment_idx_at,
)

RNG = np.random.default_rng(2026)


def _random_spline(rng, nseg=None):
    nseg = int(rng.integers(1, 12)) if nseg is None else nseg
    start = float(rng.uniform(-1e6, 1e6))
    interval = float(rng.uniform(10.0, 1e4))
    coeffs = rng.normal(size=(nseg, MAX_COEFFS, 3))
    return BodyEphemeris(start_s=start, interval_s=interval, coeffs=coeffs)


def _manual_eval(b: BodyEphemeris, t: float):
    """Independent evaluation following trajectory.rs:552-617 literally."""
    local = t - b.start_s
    n = b.segment_count
    if local < 0.0 or local > b.interval_s * n:
        return None
    idx = max(int(np.ceil(local / b.interval_s)) - 1, 0)
    idx = min(idx, n - 1)
    tau = (local - b.interval_s * idx) / b.interval_s
    c = b.coeffs[idx]
    out = np.zeros(3)
    for k in range(MAX_COEFFS - 1, -1, -1):
        out = out * tau + c[k]
    return out


def test_spline_indexing_matches_literal_rule():
    for _ in range(50):
        b = _random_spline(RNG)
        lo = b.start_s - 2 * b.interval_s
        hi = b.end_s + 2 * b.interval_s
        for t in RNG.uniform(lo, hi, size=20):
            want = _manual_eval(b, float(t))
            got = b.position(float(t))
            if want is None:
                assert got is None, t
            else:
                np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
        # knot points exactly (float assoc can push the last knot out of
        # range in both implementations identically; None==None is agreement)
        for k in range(b.segment_count + 1):
            t = b.start_s + k * b.interval_s
            want, got = _manual_eval(b, t), b.position(t)
            if want is None or got is None:
                assert want is None and got is None, (k, t)
            else:
                np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_spline_splice_roundtrip():
    """between(left half) + append(between(right half)) reproduces the
    original (mid-segment probe epochs avoid the knot rule)."""
    for _ in range(30):
        b = _random_spline(RNG, nseg=int(RNG.integers(2, 10)))
        k = int(RNG.integers(1, b.segment_count))
        mid = 0.5 * b.interval_s
        left = b.between(b.start_s + mid, b.start_s + (k - 1) * b.interval_s + mid)
        right = b.between(b.start_s + k * b.interval_s + mid, b.end_s - mid)
        assert left.segment_count == k
        assert right.segment_count == b.segment_count - k
        left.append(right)
        np.testing.assert_array_equal(left.coeffs, b.coeffs)
        assert left.start_s == b.start_s and left.end_s == b.end_s


def test_spline_clear_invariants():
    """Literal reference rules (trajectory.rs:537-549): clear_after truncates
    to get_index(at) = floor; clear_before drains to
    get_index_exclusive(at + interval), a NO-OP when that lands out of range
    (at inside the last segment)."""
    for _ in range(30):
        b = _random_spline(RNG, nseg=int(RNG.integers(2, 10)))
        t = float(RNG.uniform(b.start_s, b.end_s))
        u = (t - b.start_s) / b.interval_s
        n = b.segment_count

        ca = BodyEphemeris(b.start_s, b.interval_s, b.coeffs.copy())
        ca.clear_after(t)
        assert ca.segment_count == int(np.floor(u))
        assert ca.start_s == b.start_s

        cb = BodyEphemeris(b.start_s, b.interval_s, b.coeffs.copy())
        cb.clear_before(t)
        local2 = t + b.interval_s - b.start_s
        if local2 < 0.0 or local2 > b.interval_s * n:
            # get_index_exclusive(at + interval) out of range: reference no-op
            assert cb.segment_count == n and cb.start_s == b.start_s
        else:
            idx = min(max(int(np.ceil(local2 / b.interval_s)) - 1, 0), n)
            assert cb.segment_count == n - idx
            np.testing.assert_allclose(
                cb.start_s, b.start_s + idx * b.interval_s, rtol=0, atol=1e-9
            )


def _random_burns(rng, n):
    """n sorted NON-overlapping burns."""
    starts = np.sort(rng.uniform(-1e5, 1e5, size=n))
    burns = []
    for i, s in enumerate(starts):
        max_d = (starts[i + 1] - s) if i + 1 < n else 1e4
        d = float(rng.uniform(1.0, max(max_d * 0.9, 1.5)))
        burns.append(
            ShipBurn(
                start=Epoch.from_offset_seconds(float(s)),
                duration=Duration.from_seconds(d),
                acceleration=rng.normal(size=3) * 1e-3,
                reference=None,
            )
        )
    return burns


def test_timeline_coverage_gap_free():
    for _ in range(40):
        n = int(RNG.integers(0, 6))
        tl = build_timeline(_random_burns(RNG, n), {})
        starts = np.asarray(tl.starts)
        ends = np.asarray(tl.ends)
        # covers (-inf, inf): first start, last end, no gaps/overlaps
        assert starts[0] == EPOCH_MIN
        assert ends[-1] == EPOCH_MAX
        np.testing.assert_array_equal(starts[1:], ends[:-1])
        assert np.all(ends >= starts)
        # segment_idx_at returns the covering segment (end-exclusive)
        for t in RNG.uniform(-2e5, 2e5, size=20):
            i = int(segment_idx_at(tl, float(t)))
            assert starts[i] <= t < ends[i], (t, i)


def test_divergence_time_properties():
    for _ in range(40):
        n = int(RNG.integers(1, 5))
        burns = _random_burns(RNG, n)
        tl = build_timeline(burns, {})
        # self-divergence before `before` = last segment start before it
        before = float(RNG.uniform(-2e5, 2e5))
        t = float(divergence_time(tl, tl, before))
        starts = np.asarray(tl.starts)
        expect = starts[starts < before].max() if np.any(starts < before) else EPOCH_MIN
        assert t == expect, (t, expect)

        # appending one extra burn diverges no later than the first change
        extra = ShipBurn(
            start=burns[-1].end + Duration.from_seconds(100.0),
            duration=Duration.from_seconds(50.0),
            acceleration=np.array([1e-3, 0, 0]),
            reference=None,
        )
        tl2 = build_timeline(burns + [extra], {})
        t2 = float(divergence_time(tl2, tl, 1e301))
        assert t2 <= extra.start.as_offset_seconds()
        # and the common prefix (all original burns) is preserved
        assert t2 >= burns[-1].end.as_offset_seconds()
