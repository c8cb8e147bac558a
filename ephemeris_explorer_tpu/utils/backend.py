"""Numeric-precision backends.

The integrators and force kernels are written generically over a small value
algebra (add / sub / scale-by-coefficient / zeros).  Three concrete backends
implement it:

* ``plain``  - ordinary jnp arrays of a given dtype.  With f64 on CPU this
  reproduces the reference's numerics (the Rust code integrates in f64,
  /root/reference/ephemeris/src/propagators/nbody.rs).
* ``twofloat`` over f32 ("df64") - the TPU fast path: ~49-bit compensated
  arithmetic on hi/lo f32 pairs, the strategy the reference's own convergence
  suite validates with its Double<T> state
  (/root/reference/ephemeris/tests/solar_system_convergence.rs:12-110).
* ``twofloat`` over f64 ("dd128") - double-double truth runs on CPU.

Integrator coefficients come in as exact ``fractions.Fraction`` and are
materialised per-backend (f64 scalar, or exact hi/lo split).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import eft
from ..ops.eft import TwoFloat

Value = Any  # jax.Array | TwoFloat


def _fr_to_float(c) -> float:
    if isinstance(c, Fraction):
        return float(c)
    return float(c)


@dataclass(frozen=True)
class Backend:
    """A numeric policy: how state values are represented and combined."""

    name: str            # "f64" | "f32" | "df64" | "dd128"
    base_dtype: Any      # jnp.float32 / jnp.float64
    compensated: bool    # TwoFloat representation?

    # -- representation ----------------------------------------------------
    def wrap(self, x) -> Value:
        """Host f64 array -> backend value (exact where possible)."""
        if self.compensated:
            return eft.from_f64(x, self.base_dtype)
        return jnp.asarray(np.asarray(x), dtype=self.base_dtype)

    def unwrap(self, x: Value) -> np.ndarray:
        """Backend value -> host f64 array."""
        if self.compensated:
            return eft.to_f64(x)
        return np.asarray(x, dtype=np.float64)

    def coeff(self, c) -> Value:
        """Materialise an exact rational coefficient as a backend scalar."""
        if self.compensated:
            f = Fraction(c) if not isinstance(c, Fraction) else c
            hi = np.asarray(float(f), dtype=self.base_dtype)
            lo = np.asarray(float(f - Fraction(float(hi))), dtype=self.base_dtype)
            return TwoFloat(jnp.asarray(hi), jnp.asarray(lo))
        return jnp.asarray(_fr_to_float(c), dtype=self.base_dtype)

    def scalar(self, x: float) -> Value:
        """Materialise a runtime f64 scalar (e.g. the step size h)."""
        if self.compensated:
            return eft.from_f64(np.float64(x), self.base_dtype)
        return jnp.asarray(x, dtype=self.base_dtype)

    # -- algebra -----------------------------------------------------------
    def add(self, x: Value, y: Value) -> Value:
        if self.compensated:
            return eft.add(x, y)
        return x + y

    def sub(self, x: Value, y: Value) -> Value:
        if self.compensated:
            return eft.sub(x, y)
        return x - y

    def neg(self, x: Value) -> Value:
        return -x

    def mul(self, x: Value, y: Value) -> Value:
        if self.compensated:
            return eft.mul(x, y)
        return x * y

    def scale(self, x: Value, c: Value) -> Value:
        """x * c where c is a backend scalar (coefficient or h-product)."""
        if self.compensated:
            return eft.mul(x, c)
        return x * c

    def axpy(self, acc: Value, c: Value, x: Value) -> Value:
        """acc + c * x."""
        return self.add(acc, self.scale(x, c))

    def div(self, x: Value, y: Value) -> Value:
        if self.compensated:
            return eft.div(x, y)
        return x / y

    def zeros_like(self, x: Value) -> Value:
        if self.compensated:
            return eft.zeros_like(x)
        return jnp.zeros_like(x)

    def zeros(self, shape) -> Value:
        z = jnp.zeros(shape, dtype=self.base_dtype)
        if self.compensated:
            return TwoFloat(z, z)
        return z

    def where(self, cond, x: Value, y: Value) -> Value:
        if self.compensated:
            return eft.where(cond, x, y)
        return jnp.where(cond, x, y)

    def hi(self, x: Value) -> jax.Array:
        """Cheap base-precision view (for diagnostics / tolerances)."""
        return x.hi if self.compensated else x

    # h-coefficient helper: exact product h * rational for step updates
    def h_coeff(self, h: float, c) -> Value:
        """Backend scalar for h * c with c an exact rational, computed in f64+."""
        f = Fraction(c) if not isinstance(c, Fraction) else c
        if self.compensated:
            # compute h*c in extended precision on host
            v = np.float64(h) * f  # Fraction result (exact)
            hi = np.asarray(float(v), dtype=self.base_dtype)
            lo = np.asarray(float(v - Fraction(float(hi))), dtype=self.base_dtype)
            return TwoFloat(jnp.asarray(hi), jnp.asarray(lo))
        return jnp.asarray(np.float64(h) * float(f), dtype=self.base_dtype)


F64 = Backend("f64", jnp.float64, False)
F32 = Backend("f32", jnp.float32, False)
DF64 = Backend("df64", jnp.float32, True)
DD128 = Backend("dd128", jnp.float64, True)

_BACKENDS = {b.name: b for b in (F64, F32, DF64, DD128)}


def get_backend(name: str | Backend) -> Backend:
    if isinstance(name, Backend):
        return name
    return _BACKENDS[name]


def default_backend() -> Backend:
    """f64 where supported (CPU with x64), df64 on TPU."""
    if jax.default_backend() in ("tpu", "axon") or not jax.config.read("jax_enable_x64"):
        return DF64
    return F64
