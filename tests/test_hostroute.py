"""CI gate for the host-routed small-batch propagation path.

Round 3 shipped interactive replans through a CPU-committed compile of the
batched adaptive driver (`spacecraft._jitted_propagate_batch(backend="cpu")`,
routed by `_propagate_backend`), but on this CPU-only CI box the routing
branch is dead by default, so nothing exercised it.  These tests pin the
path down explicitly:

* the explicit ``backend="cpu"`` wrapper (device_put-committed operands)
  must produce BITWISE-identical results to the plain jit path on identical
  inputs — same program, same backend here, so any difference is a transfer
  or placement bug in the wrapper;
* `_host_packed` must mirror a device pack to numpy without changing values
  and must cache per pack snapshot;
* `make_host_mirror` must be a genuine LRU (hit refreshes recency), bounded,
  and must pin the keying device buffer while the entry lives;
* `_propagate_backend` must route small batches to the host exactly when
  the default backend is an accelerator.

Reference semantics being protected: restart/replan latency paths
(flight_plan.rs:264-303, prediction.rs:429-432).
"""

import gc
from pathlib import Path

import jax
import numpy as np
import pytest

from ephemeris_explorer_tpu import Duration, Epoch
from ephemeris_explorer_tpu.ephemeris import generate_ephemeris
from ephemeris_explorer_tpu.hostmirror import make_host_mirror
from ephemeris_explorer_tpu.io import scene
from ephemeris_explorer_tpu.io.scene import ShipBurn
from ephemeris_explorer_tpu.spacecraft import (
    _host_packed,
    _jitted_propagate_batch,
    _propagate_backend,
    build_timeline,
    ship_params,
    stack_timelines,
)

SYSTEMS = Path(__file__).resolve().parent.parent / "systems"


# ---------------------------------------------------------------------------
# make_host_mirror unit gates
# ---------------------------------------------------------------------------


def test_host_mirror_hit_miss():
    calls = []
    mirror = make_host_mirror(lambda src: calls.append(src) or len(calls), capacity=4)
    k1, k2 = object(), object()
    assert mirror(k1, "a") == 1
    assert mirror(k1, "a") == 1  # hit: no rebuild
    assert calls == ["a"]
    assert mirror(k2, "b") == 2  # distinct key: miss
    assert calls == ["a", "b"]


def test_host_mirror_lru_not_fifo():
    """A hit must refresh recency: insert a,b; touch a; insert c.
    FIFO would evict a (the oldest insert); LRU keeps a and evicts b."""
    builds = []
    mirror = make_host_mirror(lambda src: builds.append(src) or src, capacity=2)
    ka, kb, kc = object(), object(), object()
    mirror(ka, "a")
    mirror(kb, "b")
    mirror(ka, "a")          # touch a -> b is now least-recently-used
    mirror(kc, "c")          # evicts b, NOT a
    assert builds == ["a", "b", "c"]
    mirror(ka, "a")          # still cached: no rebuild
    assert builds == ["a", "b", "c"]
    mirror(kb, "b")          # was evicted: rebuilds
    assert builds == ["a", "b", "c", "b"]


def test_host_mirror_capacity_bound():
    mirror = make_host_mirror(lambda src: src, capacity=3)
    keys = [object() for _ in range(10)]
    for i, k in enumerate(keys):
        mirror(k, i)
    assert len(mirror.cache) == 3


def test_host_mirror_pins_key():
    """The cache must hold a strong ref to the keying object so its id()
    cannot be recycled by a new allocation while the entry lives."""
    mirror = make_host_mirror(lambda src: src, capacity=2)

    class K:  # noqa: D401 - sentinel with identity semantics
        pass

    k = K()
    kid = id(k)
    mirror(k, "v")
    del k
    gc.collect()
    # the entry still holds the object: same id maps to the same entry and
    # the stored object is alive (not a dangling id)
    entry = mirror.cache[kid]
    assert isinstance(entry[0], K)
    assert entry[1] == "v"


# ---------------------------------------------------------------------------
# Routing predicate
# ---------------------------------------------------------------------------


def test_propagate_backend_routing(monkeypatch):
    # On an accelerator box: small batches go to the host, big fleets stay
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _propagate_backend(1) == "cpu"
    assert _propagate_backend(16) == "cpu"
    assert _propagate_backend(17) is None
    assert _propagate_backend(64) is None
    # On a cpu box there is nothing to route
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert _propagate_backend(1) is None


# ---------------------------------------------------------------------------
# Cross-backend equality of the batched driver
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sem_ctx():
    sc = scene.load_scene(SYSTEMS / "sun_earth_moon_2433282.5")
    # NOTE: shorter spans can commit zero complete spline segments (pack
    # end_s == start) — 40 d matches the spacecraft test fixture
    eph = generate_ephemeris(sc.state, sc.settings, Duration.from_days(40.0))
    return sc, eph


def _result_arrays(r):
    return [np.asarray(x) for x in jax.device_get(r)]


def test_cross_backend_bitwise_equality(sem_ctx):
    """device-path driver vs the backend="cpu" wrapper on identical
    (packed, timeline, state) inputs: identical knot counts, times,
    positions, velocities, reasons — bitwise.

    On this CI box both compiles land on the cpu backend, so the test
    isolates exactly what the wrapper adds: the device_put commit of every
    operand (including the numpy pack mirror) and the host-side param
    vectors.  Any placement/transfer bug shows up as a result difference.
    """
    sc, eph = sem_ctx
    ship = sc.ships[0]
    index = {n: i for i, n in enumerate(eph.names)}
    packed = eph.pack()

    # include a body-relative burn so the TNB/frame interpolation path runs
    t0 = ship.start.as_offset_seconds()
    burns = list(ship.burns) + [
        ShipBurn(
            start=Epoch.from_offset_seconds(t0 + 3000.0),
            duration=Duration.from_seconds(120.0),
            acceleration=np.asarray([1e-3, 0.0, 0.0]),
            reference="Earth",
        )
    ]
    tl = stack_timelines([build_timeline(burns, index)])
    params = ship_params(ship)
    end = t0 + 2.0 * 86400.0
    args = (
        np.asarray([t0]),
        np.asarray(ship.position, dtype=np.float64)[None],
        np.asarray(ship.velocity, dtype=np.float64)[None],
        np.asarray([end]),
    )

    fn_dev = _jitted_propagate_batch(ship.integrator, params, 4096, None)
    fn_cpu = _jitted_propagate_batch(ship.integrator, params, 4096, "cpu")
    r_dev = _result_arrays(fn_dev(packed, tl, *args))
    r_cpu = _result_arrays(fn_cpu(_host_packed(packed), tl, *args))

    assert len(r_dev) == len(r_cpu)
    for a, b in zip(r_dev, r_cpu):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)
    # sanity: the run actually produced knots (field 3 = count)
    assert int(np.asarray(r_dev[3]).max()) > 2


def test_host_packed_mirror(sem_ctx):
    """_host_packed returns a numpy pack with identical values and caches
    one mirror per pack snapshot."""
    _, eph = sem_ctx
    packed = eph.pack()
    m1 = _host_packed(packed)
    assert isinstance(m1.coeffs, np.ndarray)
    for dev, host in zip(packed, m1):
        np.testing.assert_array_equal(np.asarray(dev), np.asarray(host))
    # cached: same snapshot -> same mirror object
    m2 = _host_packed(packed)
    assert m1 is m2 or all(a is b for a, b in zip(m1, m2))
    # an already-host pack passes through untouched
    assert _host_packed(m1) is m1
