"""ctypes bridge to the native dd-truth stepper (native/eet_ddtruth.cpp).

The C++ twin of :mod:`.truth_np` — bit-identical double-double (~2^-106)
force + ELM2 stepping, compiled scalar code instead of per-ufunc numpy
dispatch.  Exists because the century accuracy audit integrates ~5e6 truth
steps at N=32, where numpy's dispatch overhead made the truth an hours-long
CPU run (tools/accuracy_audit.py --truth ddf).

Bitwise safety: dd arithmetic is only exact under strict IEEE-754 binary64
with no FMA contraction, so the library is built with ``-ffp-contract=off``
AND :func:`available` verifies the contract at load time — one force eval
plus a short chunk are compared bitwise against :mod:`.truth_np`; any
mismatch (mis-built .so, exotic toolchain) rejects the library and callers
fall back to the numpy path.  The audit therefore never silently changes
truth bits by using this module: it returns the same trajectory, faster.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from . import truth_np

_PKG_SO = Path(__file__).resolve().parent / "_eet_ddtruth.so"
_SRC = Path(__file__).resolve().parent.parent / "native" / "eet_ddtruth.cpp"
_SO = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib = None
_tried = False

# Strict-IEEE build: -ffp-contract=off is the load-bearing flag (GCC fuses
# a*b+c into fma by default at -O2+, which breaks every EFT in the kernel;
# the load-time gate below would catch it, but build it right first).
# -fno-math-errno only drops the libm errno protocol around sqrt — results
# are bit-identical, but the call-free sqrt lets the pair loop vectorize.
_FLAGS = [
    "-O3", "-march=native", "-ffp-contract=off", "-fno-math-errno", "-std=c++17",
]


def _build() -> Path:
    if _PKG_SO.exists():
        return _PKG_SO
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = ["g++", *_FLAGS, "-shared", "-fPIC", "-o", str(_SO), str(_SRC), "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _selftest(lib) -> bool:
    """Bitwise gate: native force + 3-step chunk vs the numpy twin."""
    rng = np.random.default_rng(20260819)
    n = 5
    pos = rng.uniform(-4.0, 4.0, (n, 3))
    pos_tf = truth_np.TF(pos, 2.0 ** -54 * rng.uniform(-1, 1, (n, 3)) * np.abs(pos))
    mu = rng.uniform(0.1, 3.0, n)

    want = truth_np.pairwise_accel_dd(pos_tf, mu)
    acc_hi = np.empty((n, 3))
    acc_lo = np.empty((n, 3))
    lib.eet_ddtruth_force(
        n, _dp(np.ascontiguousarray(pos_tf.hi)), _dp(np.ascontiguousarray(pos_tf.lo)),
        _dp(np.ascontiguousarray(mu)), _dp(acc_hi), _dp(acc_lo), 2,
    )
    if not (np.array_equal(acc_hi, want.hi) and np.array_equal(acc_lo, want.lo)):
        return False

    from .integrators.methods import get

    tab = get("QuinlanTremaine12")
    vel = rng.uniform(-0.5, 0.5, (n, 3))
    h = 1.0 / 512.0
    carry = truth_np.elm2_init(tab, mu, 0.0, pos, vel, h)
    want_c = carry
    for _ in range(3):
        want_c = truth_np.elm2_step(tab, mu, h, want_c)
    got_c = run_chunk(tab, mu, h, carry, 3, n_threads=1, _lib_override=lib)
    return (
        got_c.t == want_c.t
        and all(
            np.array_equal(a, b)
            for a, b in (
                (got_c.ys.hi, want_c.ys.hi), (got_c.ys.lo, want_c.ys.lo),
                (got_c.ddys.hi, want_c.ddys.hi), (got_c.ddys.lo, want_c.ddys.lo),
                (got_c.dy.hi, want_c.dy.hi), (got_c.dy.lo, want_c.dy.lo),
            )
        )
    )


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            lib = ctypes.CDLL(str(_build()))
            d = ctypes.POINTER(ctypes.c_double)
            lib.eet_ddtruth_force.argtypes = [
                ctypes.c_int64, d, d, d, d, d, ctypes.c_int,
            ]
            lib.eet_ddtruth_chunk.argtypes = [
                ctypes.c_int64, ctypes.c_int64, d, d, d,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, d, ctypes.c_int64, d, d, d, d, d, d, d,
                ctypes.c_int,
            ]
            if not _selftest(lib):
                return None
        except Exception:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def run_chunk(tab, mu, h, carry, n_steps, n_threads: int = 2, _lib_override=None):
    """``n_steps`` of truth_np.elm2_step, bit-identical, in native code.

    Takes and returns a :class:`truth_np.CarryDD`; the input carry is not
    mutated.  Scalars are precomputed with the exact f64 expressions the
    numpy stepper uses (``h*h/tab.beta_d`` etc.) so association matches.
    """
    lib = _lib_override or _load()
    if lib is None:
        raise RuntimeError("native dd-truth library unavailable")
    order = int(tab.order)
    c_y = np.ascontiguousarray(tab.c_y, dtype=np.float64)
    c_dy = np.ascontiguousarray(tab.c_dy, dtype=np.float64)
    cbn = np.ascontiguousarray(tab.cowell_beta_n, dtype=np.float64)
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    n = mu.shape[0]

    ys_hi = np.ascontiguousarray(carry.ys.hi, dtype=np.float64).copy()
    ys_lo = np.ascontiguousarray(carry.ys.lo, dtype=np.float64).copy()
    dd_hi = np.ascontiguousarray(carry.ddys.hi, dtype=np.float64).copy()
    dd_lo = np.ascontiguousarray(carry.ddys.lo, dtype=np.float64).copy()
    dy_hi = np.ascontiguousarray(carry.dy.hi, dtype=np.float64).copy()
    dy_lo = np.ascontiguousarray(carry.dy.lo, dtype=np.float64).copy()
    t = np.array([carry.t], dtype=np.float64)

    lib.eet_ddtruth_chunk(
        order, n, _dp(c_y), _dp(c_dy), _dp(cbn),
        float(h * h / tab.beta_d), float(1.0 / h), float(h / tab.cowell_beta_d),
        float(h), _dp(mu), int(n_steps), _dp(t),
        _dp(ys_hi), _dp(ys_lo), _dp(dd_hi), _dp(dd_lo), _dp(dy_hi), _dp(dy_lo),
        int(n_threads),
    )
    return truth_np.CarryDD(
        t=float(t[0]),
        ys=truth_np.TF(ys_hi, ys_lo),
        ddys=truth_np.TF(dd_hi, dd_lo),
        dy=truth_np.TF(dy_hi, dy_lo),
    )
