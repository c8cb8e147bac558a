"""Trajectory event detection: SOI crossings and apsides.

Rebuilds the reference's per-step event machinery
(``ephemeris_explorer/src/dynamics/spacecraft.rs:41-162, 302-604``) as a
vectorised post-processing pass over a propagated trajectory:

1. evaluate the sign functions at every knot for every body in one batched
   device pass (sphere-of-influence distance; radial velocity),
2. find sign-change intervals,
3. refine each flagged (interval, body) pair with a fixed-iteration bisection
   (100 iterations / 1e-3 s precision, find_zero_crossing semantics) in one
   vmapped device call.

The reference detects events inside the integration solout; detecting them
after the fact over the same knot sequence yields the same events because the
sign functions are evaluated on the identical cubic-Hermite interpolant.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .ephemeris import PackedEphemeris

ASCENDING = +1    # f goes - to +
DESCENDING = -1   # f goes + to -

BISECT_ITERS = 100
BISECT_PRECISION = 1e-3  # seconds (dynamics/spacecraft.rs:155)


@dataclass(frozen=True)
class Event:
    time: float
    body: int           # body index
    direction: int      # ASCENDING | DESCENDING


@dataclass(frozen=True)
class Apsis:
    time: float
    body: int
    distance: float
    periapsis: bool


class SoiTransitions:
    """Sorted (time, body) transition list with incremental maintenance.

    Mirrors ``SoiTransitions`` (dynamics/spacecraft.rs:302-379): ``insert``
    replaces an exact-time entry, dedups against the predecessor's body and
    keeps the list sorted; ``clear_after(t)`` keeps entries with time <= t;
    ``extend`` is insert-each.  List-like for existing consumers.
    """

    __slots__ = ("entries",)

    def __init__(self, entries=None):
        self.entries: list[tuple[float, int]] = list(entries or [])

    # -- list-like --------------------------------------------------------
    def __iter__(self):
        return iter(self.entries)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        return self.entries[i]

    def __eq__(self, other):
        return list(self) == list(other)

    def __repr__(self):
        return f"SoiTransitions({self.entries!r})"

    # -- queries (spacecraft.rs:308-329) ----------------------------------
    def _search(self, time: float) -> tuple[bool, int]:
        import bisect

        # key= avoids rebuilding the full time list per call (insert/extend
        # over long missions would otherwise be O(n^2))
        i = bisect.bisect_left(self.entries, time, key=lambda e: e[0])
        found = i < len(self.entries) and self.entries[i][0] == time
        return found, i

    def soi_at_idx(self, time: float) -> int | None:
        found, i = self._search(time)
        if found:
            return i
        return None if i == 0 else i - 1

    def soi_at(self, time: float) -> int | None:
        i = self.soi_at_idx(time)
        return None if i is None else self.entries[i][1]

    # -- mutation (spacecraft.rs:331-361) ----------------------------------
    def insert(self, time: float, body: int) -> None:
        found, i = self._search(time)
        if found:
            self.entries[i] = (time, body)
        elif i > 0 and self.entries[i - 1][1] == body:
            pass  # dedup against predecessor
        else:
            self.entries.insert(i, (time, body))

    def clear_after(self, time: float) -> None:
        found, i = self._search(time)
        del self.entries[i + 1 if found else i :]

    def clear_before(self, time: float) -> None:
        _, i = self._search(time)
        del self.entries[:i]

    def extend(self, other) -> None:
        for time, body in other:
            self.insert(time, body)


class Apsides:
    """Sorted apsis list with clear_after/extend (spacecraft.rs:412-446)."""

    __slots__ = ("entries",)

    def __init__(self, entries=None):
        self.entries: list[Apsis] = list(entries or [])

    def __iter__(self):
        return iter(self.entries)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i):
        return self.entries[i]

    def __eq__(self, other):
        return list(self) == list(other)

    def __repr__(self):
        return f"Apsides({self.entries!r})"

    def _search(self, time: float) -> tuple[bool, int]:
        import bisect

        i = bisect.bisect_left(self.entries, time, key=lambda a: a.time)
        found = i < len(self.entries) and self.entries[i].time == time
        return found, i

    def insert(self, apsis: Apsis) -> None:
        found, i = self._search(apsis.time)
        if found:
            self.entries[i] = apsis
        else:
            self.entries.insert(i, apsis)

    def clear_after(self, time: float) -> None:
        found, i = self._search(time)
        del self.entries[i + 1 if found else i :]

    def extend(self, other) -> None:
        for a in other:
            self.insert(a)


def hermite_eval_batch(knot_ts, knot_pos, knot_vel, ts):
    """Vectorised cubic-Hermite evaluation of the ship trajectory.

    knot_ts (K,), knot_pos/vel (K, 3); ts (M,) times inside the knot range.
    Returns (pos (M, 3), vel (M, 3)).
    """
    idx = jnp.clip(jnp.searchsorted(knot_ts, ts, side="right") - 1, 0, len(knot_ts) - 2)
    t0 = knot_ts[idx]
    t1 = knot_ts[idx + 1]
    p0, p1 = knot_pos[idx], knot_pos[idx + 1]
    v0, v1 = knot_vel[idx], knot_vel[idx + 1]
    dt = (t1 - t0)[:, None]
    a0, a1 = p0, v0
    dpv = p1 - p0
    a2 = dpv * 3.0 / dt**2 - (v0 * 2.0 + v1) / dt
    a3 = dpv * -2.0 / dt**3 + (v0 + v1) / dt**2
    x = (ts - t0)[:, None]
    pos = ((a3 * x + a2) * x + a1) * x + a0
    vel = (a3 * x * 3.0 + a2 * 2.0) * x + a1
    return pos, vel


def _soi_sign_fn(eph: PackedEphemeris, soi_radii):
    radii2 = jnp.asarray(soi_radii) ** 2

    def f(knots, ts):
        """(M,) times -> (M, B) signed SOI distance^2 for every body."""
        kts, kpos, kvel = knots
        spos, _ = hermite_eval_batch(kts, kpos, kvel, ts)
        bpos = jax.vmap(eph.positions)(ts)           # (M, B, 3)
        d2 = jnp.sum((spos[:, None, :] - bpos) ** 2, axis=-1)
        return d2 - radii2[None, :]

    return f


def _radial_velocity_fn(eph: PackedEphemeris):
    def f(knots, ts, body):
        """(M,) times + (M,) body indices -> (M,) radial velocity."""
        kts, kpos, kvel = knots
        spos, svel = hermite_eval_batch(kts, kpos, kvel, ts)

        def body_sv(t, b):
            p, v = eph.state_vectors(t)
            return p[b], v[b]

        bpos, bvel = jax.vmap(body_sv)(ts, body)
        rel_p = spos - bpos
        rel_v = svel - bvel
        return jnp.sum(rel_p * rel_v, axis=-1)

    return f


def _bisect(f, t0s, t1s, f0s):
    """Vectorised bisection (find_zero_crossing, dynamics/spacecraft.rs:111-162)."""

    def body(_, state):
        x0, x1, f0 = state
        mid = x0 + (x1 - x0) / 2.0
        fm = f(mid)
        same = jnp.sign(f0) == jnp.sign(fm)
        x0n = jnp.where(same, mid, x0)
        f0n = jnp.where(same, fm, f0)
        x1n = jnp.where(same, x1, mid)
        return (x0n, x1n, f0n)

    x0, x1, _ = jax.lax.fori_loop(0, BISECT_ITERS, body, (t0s, t1s, f0s))
    return x0


def soi_transitions(
    traj, eph: PackedEphemeris, soi_radii
) -> list[tuple[float, int]]:
    """Ordered (time, body-index) SOI transition list for a trajectory.

    Mirrors the solout's transition bookkeeping
    (dynamics/spacecraft.rs:554-564 + SoiTransitions::insert dedup): on a
    descending crossing the ship enters that body's SOI; on an ascending
    crossing it enters the smallest containing SOI among the other bodies.
    """
    kts = jnp.asarray(traj.ts)
    kpos = jnp.asarray(traj.pos)
    kvel = jnp.asarray(traj.vel)
    knots = (kts, kpos, kvel)
    if len(traj.ts) < 2:
        return []

    fsoi = _soi_sign_fn(eph, soi_radii)
    vals = np.asarray(jax.jit(fsoi)(knots, kts))       # (K, B)
    sign = np.sign(vals)
    flips = sign[:-1] * sign[1:] < 0                    # (K-1, B)
    iv, ib = np.nonzero(flips)
    events: list[Event] = []
    if len(iv):
        t0s = jnp.asarray(traj.ts[iv])
        t1s = jnp.asarray(traj.ts[iv + 1])
        bodies = jnp.asarray(ib)

        def g(ts):
            return fsoi(knots, ts)[jnp.arange(ts.shape[0]), bodies]

        roots = np.asarray(_bisect(jax.jit(g), t0s, t1s, jnp.asarray(vals[iv, ib])))
        for t, b, v0 in zip(roots, ib, vals[iv, ib]):
            events.append(Event(float(t), int(b), ASCENDING if v0 < 0 else DESCENDING))
    events.sort(key=lambda e: e.time)

    # initial SOI (new_solution, dynamics/spacecraft.rs:524-537)
    transitions: list[tuple[float, int]] = []
    init_soi = soi_at(eph, soi_radii, float(traj.ts[0]), traj.pos[0])
    if init_soi is not None:
        transitions.append((float(traj.ts[0]), init_soi))

    for e in events:
        if e.direction == DESCENDING:
            entered = e.body
        else:
            p, _ = hermite_eval_batch(kts, kpos, kvel, jnp.asarray([e.time]))
            entered = soi_at(eph, soi_radii, e.time, np.asarray(p[0]), except_=[e.body])
            if entered is None:
                continue
        if transitions and transitions[-1][1] == entered:
            continue  # dedup (SoiTransitions::insert, :332-337)
        transitions.append((e.time, entered))
    return transitions


def soi_at(eph: PackedEphemeris, soi_radii, t, position, except_=()) -> int | None:
    """Smallest containing SOI at `t` (find_soi, dynamics/spacecraft.rs:204-216)."""
    bpos = np.asarray(eph.positions(jnp.asarray(t)))
    d2 = np.sum((np.asarray(position)[None, :] - bpos) ** 2, axis=-1)
    r2 = np.asarray(soi_radii) ** 2
    inside = d2 < r2
    for b in except_:
        inside[b] = False
    if not inside.any():
        return None
    cands = np.nonzero(inside)[0]
    return int(cands[np.argmin(d2[cands])])


def apsides(
    traj, eph: PackedEphemeris, transitions: list[tuple[float, int]]
) -> list[Apsis]:
    """Periapsis/apoapsis events relative to the active SOI body.

    Mirrors dynamics/spacecraft.rs:566-583: radial-velocity zero crossings
    within each knot interval, bounded by SOI transitions.
    """
    if len(traj.ts) < 2 or not transitions:
        return []
    kts = jnp.asarray(traj.ts)
    knots = (kts, jnp.asarray(traj.pos), jnp.asarray(traj.vel))

    # active SOI body for each knot interval
    tr_times = np.array([t for t, _ in transitions])
    tr_bodies = np.array([b for _, b in transitions])
    idx = np.clip(np.searchsorted(tr_times, traj.ts, side="right") - 1, 0, len(tr_times) - 1)
    body_per_knot = tr_bodies[idx]                      # (K,)

    frv = _radial_velocity_fn(eph)
    vals = np.asarray(jax.jit(frv)(knots, kts, jnp.asarray(body_per_knot)))

    # a sign change within interval [k, k+1] counts only when the SOI body is
    # the same at both ends (transitions split the search spans)
    same = body_per_knot[:-1] == body_per_knot[1:]
    flips = (np.sign(vals[:-1]) * np.sign(vals[1:]) < 0) & same
    iv = np.nonzero(flips)[0]
    out: list[Apsis] = []
    if len(iv) == 0:
        return out
    t0s = jnp.asarray(traj.ts[iv])
    t1s = jnp.asarray(traj.ts[iv + 1])
    bodies = jnp.asarray(body_per_knot[iv])

    def g(ts):
        return frv(knots, ts, bodies)

    roots = np.asarray(_bisect(jax.jit(g), t0s, t1s, jnp.asarray(vals[iv])))
    for t, b, v0 in zip(roots, body_per_knot[iv], vals[iv]):
        p, _ = hermite_eval_batch(knots[0], knots[1], knots[2], jnp.asarray([t]))
        bp = np.asarray(eph.positions(jnp.asarray(t)))[b]
        dist = float(np.linalg.norm(np.asarray(p[0]) - bp))
        out.append(Apsis(float(t), int(b), dist, periapsis=v0 < 0))
    out.sort(key=lambda a: a.time)
    return out
