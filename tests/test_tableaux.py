"""Tableau registry invariants for all 25 named methods."""

import numpy as np
import pytest

from ephemeris_explorer_tpu.integrators.methods import (
    ADAPTIVE_METHODS,
    ELMTableau,
    ERKNGTableau,
    ERKNTableau,
    ERKTableau,
    REGISTRY,
    SRKNTableau,
)


def test_registry_complete():
    assert len(REGISTRY) == 25
    for name in ADAPTIVE_METHODS:
        assert name in REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_invariants(name):
    tab = REGISTRY[name]
    if isinstance(tab, ERKTableau):
        assert abs(tab.b.sum() - 1.0) < 1e-9
        for i in range(tab.stages):
            assert abs(tab.a[i, :i].sum() - tab.c[i]) < 1e-7, i
        if tab.e is not None:
            # e = b - b*: embedded weights also sum to 1 -> e sums to ~0
            assert abs(tab.e.sum()) < 1e-9
            assert np.abs(tab.e).max() > 0.0
    elif isinstance(tab, ERKNTableau):
        assert abs(tab.bp.sum() - 0.5) < 1e-9
        assert abs(tab.bv.sum() - 1.0) < 1e-9
        assert abs(tab.ep.sum()) < 1e-9
        assert abs(tab.ev.sum()) < 1e-9
    elif isinstance(tab, ERKNGTableau):
        assert abs(tab.bp.sum() - 0.5) < 1e-9
        assert abs(tab.bv.sum() - 1.0) < 1e-9
    elif isinstance(tab, SRKNTableau):
        assert abs(tab.a.sum() - 1.0) < 1e-8
        assert abs(tab.b.sum() - 1.0) < 1e-8
        assert abs(tab.c[0]) < 1e-15  # first stage at t0
    elif isinstance(tab, ELMTableau):
        # consistency: sum of alpha = 0 (order condition for y)
        assert abs(tab.alpha.sum()) < 1e-12
        assert tab.cowell_beta_n is None or len(tab.cowell_beta_n) == tab.order
    else:
        raise AssertionError(type(tab))
