"""Pallas TPU kernel: the ELM2 expansion-state position update.

The parity engine's per-step cost outside the O(N^2) force kernel is the
multistep state update: the alpha combination of two 4-limb expansion
positions, the 12-term weighted sum of stored accelerations, and the h^2
increment add - a ~500-op elementwise chain over (ORDER, N, 3) buffers.
Expressed in XLA with emulated-f64 arithmetic it costs ~1.1 ms/step at
N=4096 (measured round 2) because the long dependency chain of unfused
elementwise passes round-trips HBM.  This kernel runs the whole chain in
VMEM on raw f32 EFT arithmetic:

* the acceleration ring is kept as TwoFloat (hi, lo) f32 pairs - exactly
  the force kernel's native output (``pairwise_accel_limbs_pair``; the
  unfused path combined to emulated f64 only for the state update to
  re-split it),
* the weighted sum ``sum_j c_dy[j] * dd[j]`` runs in TwoFloat arithmetic
  with the exact-rational coefficients pre-split into (hi, lo) f32 pairs,
* the alpha combination and increment add use the same f32 expansion
  renormalisation as :mod:`.expansion` (exact +-2^k scalings + two_sum
  distillation), so the committed position keeps ~2^-90 precision.

The split coefficients are passed PRE-BROADCAST as a (ORDER+1, 2, M)
VMEM array, never as f32 scalars: XLA:CPU evaluates pure-scalar f32
sub-DAGs (e.g. the Dekker split of a scalar coefficient) with different
rounding than the same chain on arrays, which erases the error-free
transform and costs the entire low word of the increment (measured:
~2^-25 instead of ~2^-48 relative accuracy under jit; eager and
array-operand versions are exact; optimization barriers do NOT help).
Array operands side-step the scalar evaluator entirely.

Reference semantics: ELM2 position update, `second_order/mod.rs:91-131`
(y_{n+1} = sum_j alpha_j y_{n-j} + h^2/beta_d sum_j beta_j f_{n-j}).

Velocity is NOT computed here - the Cowell reconstruction is deferred to
sample/chunk boundaries (:func:`..integrators.multistep.elm2_velocity_qf`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import eft, expansion as ex
from .eft import TwoFloat

try:  # pragma: no cover - import mirrors pallas_nbody
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _split_const(x: float) -> tuple[float, float]:
    """Exact f64 -> (hi, lo) f32 split, done host-side."""
    hi = np.float32(x)
    lo = np.float32(x - np.float64(hi))
    return float(hi), float(lo)


def _coef_reader(coef_ref, sub: int, mt: int, splat: bool):
    """Read the split coefficient row j as a (SUB, MT/SUB) TwoFloat.

    splat=True (device/Mosaic): coef_ref is a small (order+1, 2) SMEM
    array; scalars are splat in-kernel - Mosaic performs no unsafe
    scalar rewrites.  splat=False (interpret on XLA:CPU): coef_ref is the
    pre-broadcast (order+1, 2, M) VMEM array, because XLA:CPU re-rounds
    pure-scalar f32 chains (see module docstring) and an in-kernel splat
    can be sunk back to scalars.
    """
    shape = (sub, mt // sub)
    if splat:
        return lambda j: TwoFloat(
            jnp.full(shape, coef_ref[j, 0]), jnp.full(shape, coef_ref[j, 1])
        )
    return lambda j: TwoFloat(
        coef_ref[j, 0, :].reshape(shape), coef_ref[j, 1, :].reshape(shape)
    )


def _row(ref, j: int, sub: int):
    """Ring entry j as a (SUB, MT/SUB) tile.

    The update math is elementwise over lanes, so each logical (1, MT)
    row is viewed as SUB sublane rows - a (1, M) layout uses 1 of the
    VPU's 8 sublanes and was measured 6x slower at ensemble M.
    """
    if sub == 1:
        return ref[j, :][None, :]
    return ref[pl.ds(j * sub, sub), :]


def _update_kernel(
    coef_ref,
    ys0_ref, ys1_ref, ys2_ref, ys3_ref, ddh_ref, ddl_ref,
    o0_ref, o1_ref, o2_ref, o3_ref,
    *, order: int, c_y: tuple, dy_nonzero: tuple, mt: int, sub: int, splat: bool,
    precise: bool = False,
):
    """One block of the position update.

    coef_ref: split c_dy rows + the h^2/beta_d factor (see _coef_reader);
    in ``precise`` mode, 3-limb PRE-SCALED weight rows (w_j = c_dy[j] *
    h^2/beta_d, one f128 host rounding each).  Other refs: limb/pair rings
    (ORDER*SUB, MT/SUB) f32; outputs (SUB, MT/SUB) f32.
    """
    if precise:
        # pair-precision beta sum accumulated as a 4-limb expansion: the
        # c_dy row cancels ~29x, so dd accumulation loses ~2^-49 x 29 of
        # the increment per step (same grade as the emulated-f64 dot,
        # measured 8.7e-14 on TPU); exact two_prod terms + expansion adds
        # hold ~2^-60 (measured 8.4e-19 — integrators/multistep._wsum_precise
        # is the jnp twin of this chain)
        shape = (sub, mt // sub)
        if splat:
            cof = lambda j, k: jnp.full(shape, coef_ref[j, k])  # noqa: E731
        else:
            cof = lambda j, k: coef_ref[j, k, :].reshape(shape)  # noqa: E731
        inc4 = None
        for j in dy_nonzero:
            hi_j = _row(ddh_ref, j, sub)
            lo_j = _row(ddl_ref, j, sub)
            b0, b1, b2 = cof(j, 0), cof(j, 1), cof(j, 2)
            p, pe = eft.two_prod(hi_j, b0)
            q, qe = eft.two_prod(lo_j, b0)
            r, re = eft.two_prod(hi_j, b1)
            s = qe + re + lo_j * b1 + hi_j * b2
            term = ex.renorm(p, pe, q, r, s)
            inc4 = term if inc4 is None else ex.add(inc4, term)
    else:
        coef = _coef_reader(coef_ref, sub, mt, splat)
        # weighted acceleration sum in TwoFloat arithmetic.  The c_dy
        # coefficients alternate in sign with ~6x cancellation, so partial
        # sums pass near zero: the accurate add is REQUIRED (add_sloppy's
        # quick_two_sum precondition |s| >= |e| fails under cancellation).
        acc = None
        for j in dy_nonzero:
            dd = TwoFloat(_row(ddh_ref, j, sub), _row(ddl_ref, j, sub))
            term = eft.mul(dd, coef(j))
            acc = term if acc is None else eft.add(acc, term)
        inc = eft.mul(acc, coef(order))
        inc4 = ex.from_two(inc.hi, inc.lo)

    # alpha combination over the position ring (exact +-2^k scalings),
    # then the increment add - same add/renorm cascade as ops.expansion
    refs = (ys0_ref, ys1_ref, ys2_ref, ys3_ref)
    sum1 = None
    for j in range(order):
        c = float(c_y[j])
        if c == 0.0:
            continue
        cf = jnp.float32(c)
        term = tuple(_row(r, j, sub) * cf for r in refs)
        sum1 = term if sum1 is None else ex.add(sum1, term)
    y_new = ex.add(sum1, inc4)

    o0_ref[:, :] = y_new[0]
    o1_ref[:, :] = y_new[1]
    o2_ref[:, :] = y_new[2]
    o3_ref[:, :] = y_new[3]


def _lane_block(m: int, n_rings: int, order: int, max_lanes: int | None = None) -> int:
    """Largest divisor of m keeping one block's ring traffic under ~8 MB
    (and under `max_lanes` lanes when given)."""
    budget = (8 << 20) // (n_rings * order * 4)
    if max_lanes is not None:
        budget = min(budget, max_lanes)
    mt = m
    while mt > budget and mt % 2 == 0:
        mt //= 2
    return mt


@partial(
    jax.jit,
    static_argnames=("order", "c_y", "dy_nonzero", "sub", "interpret", "precise"),
)
def _elm2q_update_flat_sub(
    coef, ys0, ys1, ys2, ys3, ddh, ddl, *, order, c_y, dy_nonzero, sub=1,
    interpret=False, precise=False,
):
    """Pre-packed flat 4-limb update: rings (O*SUB, M/SUB) in, (SUB, M/SUB)
    out.  See :func:`_elm2f_update_flat_sub` for the packed-layout contract."""
    osub, mp = ys0.shape
    o = order
    assert osub == o * sub
    m = mp * sub
    # lane-blocked grid: at ORDER=12, N=4096 one block holds the whole
    # problem (~3.5 MB); larger batches (ensembles) split along lanes.
    mt = _lane_block(m, 6, o)
    assert mt % sub == 0, (mt, sub)
    kernel = partial(
        _update_kernel, order=order, c_y=c_y, dy_nonzero=dy_nonzero,
        mt=mt, sub=sub, splat=not interpret, precise=precise,
    )
    ncoef = 3 if precise else 2
    coef_rows = o if precise else o + 1
    coef_spec = (
        pl.BlockSpec(
            (coef_rows, ncoef, mt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        if interpret
        else pl.BlockSpec(memory_space=pltpu.SMEM)
    )
    ring = pl.BlockSpec((o * sub, mt // sub), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((sub, mt // sub), lambda i: (0, i), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(m // mt,),
            in_specs=[coef_spec] + [ring] * 6,
            out_specs=[out] * 4,
            out_shape=[jax.ShapeDtypeStruct((sub, mp), jnp.float32)] * 4,
            interpret=interpret,
        )(coef, ys0, ys1, ys2, ys3, ddh, ddl)
    return outs


def _elm2q_update_flat(
    coef, ys, ddh, ddl, *, order, c_y, dy_nonzero, interpret=False, precise=False
):
    o, m = ys[0].shape
    outs = _elm2q_update_flat_sub(
        coef, ys[0], ys[1], ys[2], ys[3], ddh, ddl,
        order=order, c_y=c_y, dy_nonzero=dy_nonzero, sub=1, interpret=interpret,
        precise=precise,
    )
    return tuple(x.reshape(1, m) for x in outs)


def elm2_update_coeffs(tab, h: float) -> np.ndarray:
    """The (order + 1, 2) split-coefficient table for :func:`elm2q_update`."""
    rows = [_split_const(float(c)) for c in tab.c_dy]
    rows.append(_split_const(float(h) * float(h) / float(tab.beta_d)))
    return np.asarray(rows, dtype=np.float32)


def elm2_update_coeffs_precise(tab, h: float) -> np.ndarray:
    """The (order, 3) PRE-SCALED 3-limb weight table for the precise beta
    sum: w_j = c_dy[j] * h^2/beta_d with one f128 host rounding, split
    exactly into three f32 limbs (multistep._prescale_f128/_split3_host)."""
    from ..integrators.multistep import _prescale_f128, _split3_host

    w = _prescale_f128(tab.c_dy, float(h) * float(h), float(tab.beta_d))
    return np.asarray([_split3_host(x) for x in w], dtype=np.float32)


def _coef_array(tab, h: float, o: int, m: int, interpret: bool,
                precise: bool = False):
    """(rows, k) for device SMEM, or pre-broadcast (rows, k, M) for
    interpret mode (see _coef_reader)."""
    c = (
        elm2_update_coeffs_precise(tab, h) if precise
        else elm2_update_coeffs(tab, h)
    )
    if interpret:
        r, k = c.shape
        return jnp.asarray(np.broadcast_to(c[:, :, None], (r, k, m)))
    return jnp.asarray(c)


def elm2q_update(tab, h: float, ys: tuple, dd: TwoFloat, interpret: bool = False,
                 precise: bool = False):
    """y_{n+1} limbs from the (aligned) position/acceleration rings.

    ys: 4-tuple of (ORDER, N, 3) f32 limb arrays, newest first.
    dd: TwoFloat of (ORDER, N, 3) f32, dd[j] = f(ys[j]).
    Returns a 4-tuple of (N, 3) f32 limbs of y_{n+1}.
    ``precise``: pair-precision beta sum (see _update_kernel).
    """
    o, n, three = ys[0].shape
    m = n * three
    flat = tuple(l.reshape(o, m) for l in ys)
    assert all(abs(c) in (0.0, 1.0, 2.0) for c in tab.c_y), tab.name
    coef = _coef_array(tab, h, o, m, interpret, precise)
    dy_nonzero = tuple(
        j for j, c in enumerate(tab.c_dy) if float(c) != 0.0
    )
    outs = _elm2q_update_flat(
        coef,
        flat,
        dd.hi.reshape(o, m),
        dd.lo.reshape(o, m),
        order=o,
        c_y=tuple(float(c) for c in tab.c_y),
        dy_nonzero=dy_nonzero,
        interpret=interpret,
        precise=precise,
    )
    return tuple(l.reshape(n, three) for l in outs)


# ---------------------------------------------------------------------------
# Two-float (K=2) variant: the f64-equivalent production state
# ---------------------------------------------------------------------------
#
# Same structure as the 4-limb kernel above, for the plain "df64" state the
# headline and ensemble configurations integrate: positions as TwoFloat
# (hi, lo) f32 pairs - the same ~2^-48 working precision as XLA's emulated
# f64, computed with correctly-rounded EFTs instead of the emulation's
# unfused elementwise chains.  At 16 x 4096 the emulated-f64 state update
# was ~30% of the ensemble step.


def _update_kernel2(
    coef_ref,
    ysh_ref, ysl_ref, ddh_ref, ddl_ref,
    oh_ref, ol_ref,
    *, order: int, c_y: tuple, dy_nonzero: tuple, mt: int, sub: int, splat: bool,
):
    coef = _coef_reader(coef_ref, sub, mt, splat)
    acc = None
    for j in dy_nonzero:
        dd = TwoFloat(_row(ddh_ref, j, sub), _row(ddl_ref, j, sub))
        term = eft.mul(dd, coef(j))
        acc = term if acc is None else eft.add(acc, term)
    inc = eft.mul(acc, coef(order))

    # alpha combination: exact +-2^k scalings, accurate adds (2y_n - y_{n-1}
    # cancels catastrophically by construction)
    sum1 = None
    for j in range(order):
        c = float(c_y[j])
        if c == 0.0:
            continue
        cf = jnp.float32(c)
        term = TwoFloat(_row(ysh_ref, j, sub) * cf, _row(ysl_ref, j, sub) * cf)
        sum1 = term if sum1 is None else eft.add(sum1, term)
    y = eft.add(sum1, inc)
    oh_ref[:, :] = y.hi
    ol_ref[:, :] = y.lo


@partial(
    jax.jit,
    static_argnames=("order", "c_y", "dy_nonzero", "sub", "interpret", "max_lanes"),
)
def _elm2f_update_flat_sub(
    coef, ysh, ysl, ddh, ddl, *, order, c_y, dy_nonzero, sub=1, interpret=False,
    max_lanes=None,
):
    """Pre-packed flat update: rings (O*SUB, M/SUB) in, (SUB, M/SUB) out.

    ``sub`` > 1 is the sublane-packed layout: each logical (1, M) row is
    stored as SUB sublane rows, so the elementwise update uses all VPU
    sublanes (2.1x kernel speedup at ensemble M, measured round 2).  The
    caller owns keeping the rings packed ACROSS steps — packing at the
    call boundary retiles the rings in HBM every step and nets a loss
    (measured; docs/ROADMAP.md round-3 item).
    """
    osub, mp = ysh.shape
    o = order
    assert osub == o * sub
    m = mp * sub
    mt = _lane_block(m, 4, o, max_lanes)
    assert mt % sub == 0, (mt, sub)
    kernel = partial(
        _update_kernel2, order=order, c_y=c_y, dy_nonzero=dy_nonzero,
        mt=mt, sub=sub, splat=not interpret,
    )
    coef_spec = (
        pl.BlockSpec((o + 1, 2, mt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        if interpret
        else pl.BlockSpec(memory_space=pltpu.SMEM)
    )
    ring = pl.BlockSpec((o * sub, mt // sub), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((sub, mt // sub), lambda i: (0, i), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(m // mt,),
            in_specs=[coef_spec] + [ring] * 4,
            out_specs=[out] * 2,
            out_shape=[jax.ShapeDtypeStruct((sub, mp), jnp.float32)] * 2,
            interpret=interpret,
        )(coef, ysh, ysl, ddh, ddl)
    return outs


def _elm2f_update_flat(
    coef, ysh, ysl, ddh, ddl, *, order, c_y, dy_nonzero, interpret=False,
    max_lanes=None,
):
    o, m = ysh.shape
    outs = _elm2f_update_flat_sub(
        coef, ysh, ysl, ddh, ddl, order=order, c_y=c_y, dy_nonzero=dy_nonzero,
        sub=1, interpret=interpret, max_lanes=max_lanes,
    )
    return tuple(x.reshape(1, m) for x in outs)


def elm2f_update(
    tab, h: float, ys: TwoFloat, dd: TwoFloat, interpret: bool = False,
    max_lanes: int | None = None,
):
    """y_{n+1} pair from TwoFloat position/acceleration rings.

    ys/dd: TwoFloat of (ORDER, ..., 3) f32, newest first, aligned.
    Returns a TwoFloat of shape (..., 3).  ``max_lanes`` caps the lane
    block (tuning knob: very wide rows spill vector registers).
    """
    shape = ys.hi.shape
    o = shape[0]
    m = int(np.prod(shape[1:]))
    assert all(abs(c) in (0.0, 1.0, 2.0) for c in tab.c_y), tab.name
    coef = _coef_array(tab, h, o, m, interpret)
    dy_nonzero = tuple(j for j, c in enumerate(tab.c_dy) if float(c) != 0.0)
    oh, ol = _elm2f_update_flat(
        coef,
        ys.hi.reshape(o, m),
        ys.lo.reshape(o, m),
        dd.hi.reshape(o, m),
        dd.lo.reshape(o, m),
        order=o,
        c_y=tuple(float(c) for c in tab.c_y),
        dy_nonzero=dy_nonzero,
        interpret=interpret,
        max_lanes=max_lanes,
    )
    return TwoFloat(oh.reshape(shape[1:]), ol.reshape(shape[1:]))


# ---------------------------------------------------------------------------
# Sublane-packed entry points: rings stored (ORDER, SUB, M/SUB) across steps
# ---------------------------------------------------------------------------
#
# The kernels above process each ring row as (1, M) — one of the VPU's 8
# sublanes.  Packing rows to (SUB, M/SUB) makes the kernel itself 2.1x
# faster at ensemble M (measured round 2), but repacking at the call
# boundary retiles the rings in HBM every step and nets a LOSS.  These
# entry points therefore take rings that the CARRY stores packed
# (integrators/multistep.ELM2CarryFP/QFP): the shift logic concatenates in
# packed layout, and only y_new (one row, not ORDER of them) is reshaped
# to logical (N, 3) at the force interface.


def elm2f_update_packed(
    tab, h: float, ys: TwoFloat, dd: TwoFloat, interpret: bool = False,
    max_lanes: int | None = None,
):
    """y_{n+1} pair from PACKED TwoFloat rings.

    ys/dd: TwoFloat of (ORDER, SUB, M/SUB) f32, newest first, aligned —
    each ring row's logical (M,) elements stored across SUB sublane rows.
    Returns a TwoFloat of shape (SUB, M/SUB) (packed y_new).  Bitwise-
    identical to :func:`elm2f_update` on the unpacked view (the update is
    elementwise; packing only changes the layout).
    """
    o, sub, mp = ys.hi.shape
    m = sub * mp
    assert all(abs(c) in (0.0, 1.0, 2.0) for c in tab.c_y), tab.name
    coef = _coef_array(tab, h, o, m, interpret)
    dy_nonzero = tuple(j for j, c in enumerate(tab.c_dy) if float(c) != 0.0)
    oh, ol = _elm2f_update_flat_sub(
        coef,
        ys.hi.reshape(o * sub, mp),
        ys.lo.reshape(o * sub, mp),
        dd.hi.reshape(o * sub, mp),
        dd.lo.reshape(o * sub, mp),
        order=o,
        c_y=tuple(float(c) for c in tab.c_y),
        dy_nonzero=dy_nonzero,
        sub=sub,
        interpret=interpret,
        max_lanes=max_lanes,
    )
    return TwoFloat(oh, ol)


def elm2q_update_packed(
    tab, h: float, ys: tuple, dd: TwoFloat, interpret: bool = False,
    precise: bool = False,
):
    """y_{n+1} limbs from PACKED 4-limb rings.

    ys: 4-tuple of (ORDER, SUB, M/SUB) f32 limb arrays; dd: TwoFloat of the
    same packed shape.  Returns a 4-tuple of (SUB, M/SUB) f32 limbs.
    """
    o, sub, mp = ys[0].shape
    m = sub * mp
    assert all(abs(c) in (0.0, 1.0, 2.0) for c in tab.c_y), tab.name
    coef = _coef_array(tab, h, o, m, interpret, precise)
    dy_nonzero = tuple(j for j, c in enumerate(tab.c_dy) if float(c) != 0.0)
    return _elm2q_update_flat_sub(
        coef,
        ys[0].reshape(o * sub, mp),
        ys[1].reshape(o * sub, mp),
        ys[2].reshape(o * sub, mp),
        ys[3].reshape(o * sub, mp),
        dd.hi.reshape(o * sub, mp),
        dd.lo.reshape(o * sub, mp),
        order=o,
        c_y=tuple(float(c) for c in tab.c_y),
        dy_nonzero=dy_nonzero,
        sub=sub,
        interpret=interpret,
        precise=precise,
    )
