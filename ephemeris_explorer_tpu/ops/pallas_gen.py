"""Pallas TPU kernel: whole multistep chunks for small-N generation.

Ephemeris GENERATION runs at celestial N (tens of bodies), where a scan
step costs ~12 us on TPU: the emulated-f64 force + state chains are ~60
tiny HLO ops whose per-op dispatch dwarfs their arithmetic.  This kernel
runs the ENTIRE chunk - n_steps of (ELM2 update, O(N^2) two-float force,
ring shift, position emission) - inside one Pallas program with the rings
resident in VMEM, so the per-step cost collapses to the arithmetic.

Numerics match the production two-float class (~2^-48): the state update
is the K=2 kernel of :mod:`.pallas_elm2`, and the force is the same
df64 pair math as :mod:`.pallas_nbody` (shared helpers), evaluated on one
(N, N) tile.

Reference semantics: ELM2 position update `second_order/mod.rs:91-131` +
pairwise Newtonian gravity `propagators/nbody.rs:16-39`; the sampling
emission replaces the reference's per-step Solout clone
(`integration/src/lib.rs:532-558`) with a dense (steps, N, 3) buffer the
chunked fit pass consumes.

Layout: component-major flat rows (M = 3N: [x_0..x_N, y_0.., z_0..]) so
per-component (1, N) lane slices are contiguous; the pair tile needs one
(1, N) -> (N, 1) relayout per component per step (tiny at this N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import eft
from .eft import TwoFloat
from .pallas_elm2 import _coef_array, _coef_reader
from .pallas_nbody import _dd_tree_sum, _rsqrt_df, _sqr_presplit

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _pair_force(y: TwoFloat, mu: TwoFloat, n: int) -> TwoFloat:
    """df64 pairwise acceleration from a component-major (1, 3N) position row.

    Returns the (1, 3N) component-major acceleration row.
    """
    comps = []
    for c in range(3):
        yc = TwoFloat(y.hi[:, c * n : (c + 1) * n], y.lo[:, c * n : (c + 1) * n])
        comps.append(yc)

    rows = [TwoFloat(jnp.transpose(cc.hi), jnp.transpose(cc.lo)) for cc in comps]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    self_mask = row_ids == col_ids

    d = [eft.sub(cc, rr) for cc, rr in zip(comps, rows)]  # (N, N) pj - pi
    d_splits = [eft.split(dc.hi) for dc in d]
    r2 = eft.add(
        eft.add(_sqr_presplit(d[0], d_splits[0]), _sqr_presplit(d[1], d_splits[1])),
        _sqr_presplit(d[2], d_splits[2]),
    )
    one = jnp.ones_like(r2.hi)
    r2 = eft.where(self_mask, TwoFloat(one, jnp.zeros_like(one)), r2)
    u = _rsqrt_df(r2)
    w = eft.mul(eft.mul(eft.sqr(u), u), mu)
    zero = jnp.zeros_like(w.hi)
    w = eft.where(self_mask, TwoFloat(zero, zero), w)
    w_split = eft.split(w.hi)

    out_h, out_l = [], []
    for c in range(3):
        term = eft.mul_presplit(w, w_split, d[c], d_splits[c])
        s = _dd_tree_sum(term, axis=1)            # (N, 1)
        out_h.append(jnp.transpose(s.hi))         # (1, N)
        out_l.append(jnp.transpose(s.lo))
    return TwoFloat(
        jnp.concatenate(out_h, axis=1), jnp.concatenate(out_l, axis=1)
    )


def _gen_kernel(
    coef_ref, mu_hi_ref, mu_lo_ref,
    ysh_ref, ysl_ref, ddh_ref, ddl_ref,
    eh_ref, el_ref, oysh_ref, oysl_ref, oddh_ref, oddl_ref,
    *, order: int, c_y: tuple, dy_nonzero: tuple,
    n: int, m: int, n_steps: int, splat: bool,
):
    coef = _coef_reader(coef_ref, 1, m, splat)
    mu = TwoFloat(mu_hi_ref[:, :], mu_lo_ref[:, :])

    def step(k, rings):
        ysh, ysl, ddh, ddl = rings
        # ELM2 position update (same math as pallas_elm2._update_kernel2)
        acc = None
        for j in dy_nonzero:
            dd = TwoFloat(ddh[j, :][None, :], ddl[j, :][None, :])
            term = eft.mul(dd, coef(j))
            acc = term if acc is None else eft.add(acc, term)
        inc = eft.mul(acc, coef(order))
        sum1 = None
        for j in range(order):
            c = float(c_y[j])
            if c == 0.0:
                continue
            cf = jnp.float32(c)
            term = TwoFloat(ysh[j, :][None, :] * cf, ysl[j, :][None, :] * cf)
            sum1 = term if sum1 is None else eft.add(sum1, term)
        y = eft.add(sum1, inc)

        f = _pair_force(y, mu, n)

        eh_ref[pl.ds(k, 1), :] = y.hi
        el_ref[pl.ds(k, 1), :] = y.lo

        shift = lambda new, ring: jnp.concatenate(  # noqa: E731
            [new, ring[: order - 1]], axis=0
        )
        return (
            shift(y.hi, ysh), shift(y.lo, ysl),
            shift(f.hi, ddh), shift(f.lo, ddl),
        )

    rings = (ysh_ref[:, :], ysl_ref[:, :], ddh_ref[:, :], ddl_ref[:, :])
    rings = jax.lax.fori_loop(0, n_steps, step, rings)
    oysh_ref[:, :], oysl_ref[:, :] = rings[0], rings[1]
    oddh_ref[:, :], oddl_ref[:, :] = rings[2], rings[3]


@partial(
    jax.jit,
    static_argnames=("order", "c_y", "dy_nonzero", "n", "n_steps", "interpret"),
)
def _gen_scan_flat(
    coef, mu_hi, mu_lo, ysh, ysl, ddh, ddl,
    *, order, c_y, dy_nonzero, n, n_steps, interpret=False,
):
    o, m = ysh.shape
    kernel = partial(
        _gen_kernel, order=order, c_y=c_y, dy_nonzero=dy_nonzero,
        n=n, m=m, n_steps=n_steps, splat=not interpret,
    )
    coef_space = pltpu.VMEM if interpret else pltpu.SMEM
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=coef_space)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_shape=[jax.ShapeDtypeStruct((n_steps, m), jnp.float32)] * 2
            + [jax.ShapeDtypeStruct((o, m), jnp.float32)] * 4,
            interpret=interpret,
        )(coef, mu_hi, mu_lo, ysh, ysl, ddh, ddl)


def elm2_gen_scan(tab, h, carry, mu_pair, n_steps: int, interpret: bool = False):
    """Run `n_steps` fused generation steps from an f64 ELM2Carry.

    carry: :class:`..integrators.multistep.ELM2Carry` with (ORDER, N, 3)
    f64 rings.  mu_pair: TwoFloat (1, N).  Returns (ys_f64, new_carry)
    where ys_f64 is the (n_steps, N, 3) emitted positions (the scan
    emission the fit pass consumes) and new_carry the advanced f64 carry
    (velocity stale - restore via elm2_velocity).
    """
    from ..integrators.multistep import ELM2Carry

    o, n_real, _ = carry.ys.shape

    # the in-kernel reduction tree needs a power-of-two body count: pad
    # with massless "ghost" bodies parked far away (mu = 0 -> they exert
    # nothing; their own drift toward the system is ~1e-13 km/s^2 and
    # their rows are discarded)
    n = 1 << (n_real - 1).bit_length()
    pad = n - n_real
    m = 3 * n

    def pad_bodies(x64, ghost_base):
        if pad == 0:
            return x64
        ghosts = jnp.zeros((o, pad, 3), x64.dtype) + ghost_base
        return jnp.concatenate([x64, ghosts], axis=1)

    ghost_pos = (
        1.0e12 + 1.0e9 * jnp.arange(pad, dtype=jnp.float64)[:, None]
        if pad
        else 0.0
    )
    ys64 = pad_bodies(carry.ys, ghost_pos)
    dd64 = pad_bodies(carry.ddys, 0.0)
    if pad:
        zpad = jnp.zeros((1, pad), jnp.float32)
        mu_pair = TwoFloat(
            jnp.concatenate([mu_pair.hi, zpad], axis=1),
            jnp.concatenate([mu_pair.lo, zpad], axis=1),
        )

    def to_flat(x64):
        x = jnp.swapaxes(x64, 1, 2).reshape(o, m)   # (O, 3, N) -> (O, 3N)
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
        return hi, lo

    ysh, ysl = to_flat(ys64)
    ddh, ddl = to_flat(dd64)
    coef = _coef_array(tab, float(h), o, m, interpret)
    dy_nonzero = tuple(j for j, c in enumerate(tab.c_dy) if float(c) != 0.0)
    assert all(abs(c) in (0.0, 1.0, 2.0) for c in tab.c_y), tab.name

    eh, el, oysh, oysl, oddh, oddl = _gen_scan_flat(
        coef, mu_pair.hi, mu_pair.lo, ysh, ysl, ddh, ddl,
        order=o,
        c_y=tuple(float(c) for c in tab.c_y),
        dy_nonzero=dy_nonzero,
        n=n, n_steps=n_steps, interpret=interpret,
    )

    def from_flat(hi, lo, lead):
        x = hi.astype(jnp.float64) + lo.astype(jnp.float64)
        return jnp.swapaxes(x.reshape(lead, 3, n), 1, 2)[:, :n_real]

    ys_f64 = from_flat(eh, el, n_steps)                     # (S, N, 3)
    new = ELM2Carry(
        t=carry.t + n_steps * h,
        ys=from_flat(oysh, oysl, o),
        ddys=from_flat(oddh, oddl, o),
        dy=carry.dy,
    )
    return ys_f64, new
