"""Fixed-size floating-point expansions over exact f32 arithmetic.

TPU's native f64 is double-word f32 EMULATION whose operations are not
correctly rounded, which breaks classical error-free transformations built on
top of it (a compensated state over emulated f64 gains nothing - measured).
Raw f32 ops on the VPU, however, ARE exactly rounded IEEE arithmetic, so we
build extended precision directly on f32: a value is an unevaluated sum of
``K`` f32 limbs (Shewchuk/QD-style expansion), giving ~24*K significant bits
(K=4 -> ~2^-96, far beyond CPU f64).

Only the handful of operations the long-horizon integrator state needs are
provided:

* :func:`renorm`       - Priest renormalisation (quick-two-sum sweep)
* :func:`add`          - expansion + expansion
* :func:`scale_pow2i`  - exact scaling by small +-2^k integers (the ELM2
  alpha coefficients are all in {+-1, +-2})
* :func:`from_f64` / :func:`to_f64` - exact lifts of (emulated) f64 values

Everything is element-wise jnp, vmappable and scan-friendly; an expansion is
a tuple of K same-shaped f32 arrays (a pytree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .eft import two_sum

K = 4  # limbs


def zeros(shape) -> tuple:
    z = jnp.zeros(shape, jnp.float32)
    return (z,) * K


def renorm(*limbs) -> tuple:
    """Renormalise a limb list to K non-overlapping-ish limbs.

    Two bottom-up two_sum sweeps (distillation cascade) push the mass into
    the leading limbs; terms beyond K are folded into the last limb (they are
    O(ulp^K) of the head by then).  Branch-free and element-wise.
    """
    x = list(limbs)
    n = len(x)
    for _ in range(3):
        for i in range(n - 2, -1, -1):
            x[i], x[i + 1] = two_sum(x[i], x[i + 1])
    tail = x[K - 1] if n >= K else x[-1]
    for t in x[K:]:
        tail = tail + t
    out = x[: K - 1] + [tail]
    while len(out) < K:
        out.append(jnp.zeros_like(out[0]))
    return tuple(out[:K])


def add(a: tuple, b: tuple) -> tuple:
    """Expansion + expansion -> K-limb expansion.

    Limbs are interleaved (a0 b0 a1 b1 ...) so the distillation sweeps see a
    near-sorted sequence."""
    merged = []
    for x, y in zip(a, b):
        merged.append(x)
        merged.append(y)
    return renorm(*merged)


def from_two(hi, lo) -> tuple:
    z = jnp.zeros_like(hi)
    return (hi, lo, z, z)


def from_f64_host(x) -> tuple:
    """EXACT host-side limb split of real IEEE f64 (numpy) values.

    Shipping an f64 array to the TPU rounds it to the emulated-f64 pair
    (~2^-49 relative).  For heliocentric initial positions that truncation
    is a few-micrometre perturbation of the initial conditions, which
    shifts each close moon's semi-major axis and turns into a SECULAR
    ~m/yr along-track drift (measured: Triton 5.4 m/yr, docs/ACCURACY.md
    round 3).  Split on the host instead — three f32 limbs represent any
    binary64 exactly — and ship the limbs; f32 transfers are exact.
    """
    import numpy as np

    x = np.asarray(x, np.float64)
    limbs = []
    for _ in range(K - 1):
        l = x.astype(np.float32)
        limbs.append(l)
        x = x - l.astype(np.float64)
    limbs.append(x.astype(np.float32))  # zero for f64 input (3 limbs exact)
    return tuple(jnp.asarray(l) for l in limbs)


def from_f64(x) -> tuple:
    """Exact lift of an f64 (or emulated-f64) array into f32 limbs."""
    a0 = x.astype(jnp.float32)
    r = x - a0.astype(x.dtype)
    a1 = r.astype(jnp.float32)
    r = r - a1.astype(x.dtype)
    a2 = r.astype(jnp.float32)
    z = jnp.zeros_like(a2)
    return (a0, a1, a2, z)


def to_f64(a: tuple):
    """Round an expansion to (emulated) f64: sum low-to-high."""
    out = a[-1].astype(jnp.float64)
    for x in a[-2::-1]:
        out = out + x.astype(jnp.float64)
    return out


def hi_lo(a: tuple):
    """The two leading limbs - a ready-made df64 pair for the force kernel."""
    return a[0], a[1]


def scale_pow2i(a: tuple, c: float) -> tuple:
    """Exact scaling by +-2^k (the ELM2 alpha coefficients): per-limb."""
    cf = jnp.float32(c)
    return tuple(x * cf for x in a)


def neg(a: tuple) -> tuple:
    return tuple(-x for x in a)
