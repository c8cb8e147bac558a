"""Executable accuracy gates behind docs/ACCURACY.md.

Mirrors the reference's rule that every accuracy claim is an executable test
(/root/reference/ephemeris/tests/solar_system_convergence.rs:225-360): the
audit harness (tools/accuracy_audit.py) regenerates the ACCURACY.md tables,
and this CI-sized slice of it gates regressions in the expansion-state
engine (integrators/multistep.elm2_step_q + ops/expansion.py) against the
double-double truth.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from accuracy_audit import audit  # noqa: E402


def test_expansion_state_60d_vs_dd_truth():
    """60-day full_solar_system: expansion state stays within 10 m of the
    dd128 truth (measured 2.1 m), and the plain-f64 reference numerics drift
    is an order of magnitude larger — the expansion engine must never regress
    to plain-f64 error levels."""
    res = audit(
        "full_solar_system_2433282.5",
        total_steps=8640,  # 60 days @ 600 s
        checkpoints=1,
        modes=["expansion", "ref64"],
        verbose=False,
    )
    (days, err_all, err_planets) = res["expansion"][-1]
    assert abs(days - 60.0) < 1.0
    assert err_all < 0.010, f"expansion engine drifted {err_all * 1e3:.1f} m @ 60 d"
    assert err_planets < 0.001, f"planets {err_planets * 1e3:.2f} m @ 60 d"

    # context row: plain f64 (the reference's own numerics) is ~135 m here;
    # sanity-bound it loosely so the truth itself is also being exercised
    (_, ref_all, _) = res["ref64"][-1]
    assert 0.010 < ref_all < 1.0, f"ref64 vs dd unexpectedly {ref_all} km"


import pytest  # noqa: E402


@pytest.mark.slow
def test_expansion3_1y_vs_dd_truth():
    """1-year full_solar_system: the expansion3 engine (error-free pair
    deltas) stays within 15 m of the dd128 truth (measured 7.7 m @ 1 y in
    docs/accuracy_100y.csv).  Catches the century-scale slow-systematic-bias
    class (e.g. the 2^-47 rsqrt bias tf96 removed) that the 60-day gate
    cannot see — 1-year spans are the reference's own gate size
    (solar_system_convergence.rs:225-360)."""
    res = audit(
        "full_solar_system_2433282.5",
        total_steps=52596,  # 365.25 days @ 600 s
        checkpoints=1,
        modes=["expansion3"],
        verbose=False,
    )
    (days, err_all, err_planets) = res["expansion3"][-1]
    assert abs(days - 365.25) < 1.0
    assert err_all < 0.015, f"expansion3 drifted {err_all * 1e3:.1f} m @ 1 y"
    assert err_planets < 0.005, f"planets {err_planets * 1e3:.2f} m @ 1 y"
