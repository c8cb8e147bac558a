"""Multi-chip scale-out: device meshes, sharded N-body kernels, ensembles.

The reference is single-process CPU Rust (SURVEY.md 2.6); its scaling axes in
the rebuild are:

* N (bodies)   - shard the O(N^2) pair interaction by receiver rows across
  mesh axis "model"; each device all-gathers source positions over ICI and
  computes its local rows (a transpose-free row decomposition, the standard
  N-body SPMD recipe);
* E (ensemble) - independent initial conditions / batched spacecraft are data
  parallel across mesh axis "data" (pure vmap, no collectives);
* time         - sequential lax.scan (not parallelisable; physics).

Both the GSPMD path (jit + sharding annotations; XLA inserts collectives) and
an explicit shard_map path (manual all_gather) are provided.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrators.multistep import ELM2Carry, elm2_init, elm2_step, elm2_velocity
from ..ops import nbody


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Explicit shard_map kernel: row-sharded pairwise acceleration
# ---------------------------------------------------------------------------


def pairwise_accel_rowsharded(mesh: Mesh, pos, mu):
    """O(N^2) accel with bodies sharded over the "model" axis.

    pos (N, 3) and the result are sharded on rows; mu is replicated.  Inside
    each shard we all_gather the source positions/mus over ICI and compute the
    local receiver rows - no psum needed for a row decomposition.
    """

    def kernel(pos_l, mu_l):
        # pos_l: (N/D, 3) local rows; gather full sources
        pos_all = jax.lax.all_gather(pos_l, "model", tiled=True)   # (N, 3)
        mu_all = jax.lax.all_gather(mu_l, "model", tiled=True)     # (N,)
        d = pos_all[None, :, :] - pos_l[:, None, :]                # (N/D, N, 3)
        r2 = jnp.sum(d * d, axis=-1)
        # self-interaction mask via global row ids
        shard = jax.lax.axis_index("model")
        nl = pos_l.shape[0]
        rows = shard * nl + jnp.arange(nl)
        self_mask = rows[:, None] == jnp.arange(pos_all.shape[0])[None, :]
        r2 = jnp.where(self_mask, 1.0, r2)
        inv_r = jax.lax.rsqrt(r2)
        inv_r3 = jnp.where(self_mask, 0.0, inv_r * inv_r * inv_r)
        w = mu_all[None, :] * inv_r3
        return jnp.einsum("ij,ijc->ic", w, d)

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("model", None), P("model")),
        out_specs=P("model", None),
    )(pos, mu)


# ---------------------------------------------------------------------------
# Row-sharded PRODUCTION force: shard_map x Pallas pair kernels
# ---------------------------------------------------------------------------
#
# pairwise_accel_rowsharded above is the plain-jnp (emulated-f64) reference
# decomposition.  The functions below compose the SAME row decomposition with
# the production Pallas arithmetic: each shard all-gathers the split source
# positions over ICI ("model" axis) and runs the rectangular pair kernel
# (ops/pallas_nbody.pairwise_accel_df64_rows / _limbs_pair_rows) on its local
# receiver rows; the fused update kernels are elementwise over rows and run
# shard-local with zero collectives.  Results are bitwise-identical to the
# unsharded kernels for equal tile_cols (column accumulation order is the
# only order-sensitive part).


def _local_row0(nl: int):
    """Global id of this shard's row 0 ((1,) int32 scalar for SMEM)."""
    row0 = jax.lax.axis_index("model").astype(jnp.int32) * nl
    return row0.reshape(1)


def pairwise_accel_rowsharded_pair(
    mesh: Mesh, pos_hi, pos_lo, mu_hi, mu_lo,
    interpret: bool = False, **force_tiles,
):
    """Row-sharded O(N^2) force on the production two-float Pallas kernel.

    pos_hi/pos_lo: (N, 3) f32 split positions, sharded on rows over "model".
    mu_hi/mu_lo:   (1, N) f32 split mu, replicated.
    Returns (acc_hi, acc_lo) of shape (N, 3), row-sharded like the input.
    """
    from ..ops.pallas_nbody import pairwise_accel_df64_rows

    def kernel(ph_l, pl_l, mu_h, mu_l):
        ph_all = jax.lax.all_gather(ph_l, "model", axis=0, tiled=True)  # (N, 3)
        pl_all = jax.lax.all_gather(pl_l, "model", axis=0, tiled=True)
        row0 = _local_row0(ph_l.shape[0])
        return pairwise_accel_df64_rows(
            ph_all.T, pl_all.T, mu_h, mu_l, ph_l, pl_l, row0,
            interpret=interpret, **force_tiles,
        )

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (same contract note as make_shardmap_ensemble_scan_f)
    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("model", None), P("model", None), P(None, None), P(None, None)),
        out_specs=(P("model", None), P("model", None)),
        check_vma=False,
    )(pos_hi, pos_lo, mu_hi, mu_lo)


def make_rowsharded_scan_f(
    mesh: Mesh, tab, mus, h, n_steps: int, interpret: bool = False, **force_tiles
):
    """N-axis (model-parallel) fused scan: the ELM2CarryF rings row-sharded
    over "model", force via all_gather + rectangular pair kernel, TwoFloat
    update kernel shard-local.

    This is the production composition SURVEY.md 2.6 names for sharded N
    ("all_gather inside shard_map for the N^2 tile reduction"), mirroring
    what :func:`make_shardmap_ensemble_scan_f` does for the ensemble axis.
    Returns (run, to_f); feed ``to_f(elm2_init(...))`` carries.
    """
    from ..integrators.multistep import (
        ELM2CarryF, elm2_f_from, elm2_step_f, elm2_velocity_f,
    )
    from ..ops.eft import TwoFloat
    from ..ops.pallas_nbody import pairwise_accel_df64_rows, split_f64

    mu_dev = jnp.asarray(mus)
    mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

    def local_scan(mu_h, mu_l, carry: ELM2CarryF) -> ELM2CarryF:
        row0 = _local_row0(carry.ys.hi.shape[1])

        def accel_pair(t, y):  # y: TwoFloat (NL, 3) local rows
            ph_all = jax.lax.all_gather(y.hi, "model", axis=0, tiled=True)
            pl_all = jax.lax.all_gather(y.lo, "model", axis=0, tiled=True)
            ah, al = pairwise_accel_df64_rows(
                ph_all.T, pl_all.T, mu_h, mu_l, y.hi, y.lo, row0,
                interpret=interpret, **force_tiles,
            )
            return TwoFloat(ah, al)

        def body(c, _):
            return elm2_step_f(tab, accel_pair, h, c, interpret=interpret), None

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c._replace(dy=elm2_velocity_f(tab, c, h))

    row = P(None, "model")
    spec = ELM2CarryF(
        t=P(),
        ys=TwoFloat(row, row),
        dd=TwoFloat(row, row),
        dy=P("model"),
    )
    run = jax.jit(
        jax.shard_map(
            local_scan, mesh=mesh,
            in_specs=(P(None, None), P(None, None), spec),
            out_specs=spec, check_vma=False,
        )
    )
    return (lambda carry: run(mu_hi, mu_lo, carry)), jax.jit(elm2_f_from)


def make_rowsharded_scan_qf(
    mesh: Mesh, tab, mus, h, n_steps: int, interpret: bool = False,
    precise_sums: bool = False, **force_tiles
):
    """Row-sharded PARITY engine: 4-limb expansion rings sharded over
    "model", 3-limb rectangular force kernel + shard-local fused update.

    The full-precision (~2^-90 state, error-free pair differences) engine
    of the accuracy story, scaled over the N axis.  Returns (run, to_qf);
    feed ``to_qf(elm2_init_q(...))`` carries.  ``precise_sums`` selects the
    pair-precision beta sum in the update kernel (shard-local — the
    composition with all_gather is unchanged).
    """
    from ..integrators.multistep import (
        ELM2CarryQF, elm2_qf_from_q, elm2_step_qf, elm2_velocity_qf,
    )
    from ..ops.eft import TwoFloat
    from ..ops.pallas_nbody import pairwise_accel_limbs_pair_rows, split_f64

    mu_dev = jnp.asarray(mus)
    mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

    def local_scan(mu_h, mu_l, carry: ELM2CarryQF) -> ELM2CarryQF:
        row0 = _local_row0(carry.ys[0].shape[1])

        def accel_pair(t, limbs):  # (l0, l1, l2) local rows (NL, 3)
            alls = [
                jax.lax.all_gather(l, "model", axis=0, tiled=True) for l in limbs
            ]
            return pairwise_accel_limbs_pair_rows(
                alls[0].T, alls[1].T, alls[2].T, mu_h, mu_l,
                limbs[0], limbs[1], limbs[2], row0,
                interpret=interpret, **force_tiles,
            )

        def body(c, _):
            return (
                elm2_step_qf(
                    tab, accel_pair, h, c, interpret=interpret,
                    precise_sums=precise_sums,
                ),
                None,
            )

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c._replace(dy=elm2_velocity_qf(tab, c, h))

    row = P(None, "model")
    spec = ELM2CarryQF(
        t=P(),
        ys=(row, row, row, row),
        dd=TwoFloat(row, row),
        dy=P("model"),
    )
    run = jax.jit(
        jax.shard_map(
            local_scan, mesh=mesh,
            in_specs=(P(None, None), P(None, None), spec),
            out_specs=spec, check_vma=False,
        )
    )
    return (lambda carry: run(mu_hi, mu_lo, carry)), jax.jit(elm2_qf_from_q)


# ---------------------------------------------------------------------------
# Sharded multistep stepping (GSPMD)
# ---------------------------------------------------------------------------


def make_rowsharded_split_force(
    mesh: Mesh, mus, k: int = 16, interpret: bool = False, **force_tiles
):
    """Row-sharded magnitude-split force (round-5 mode, SURVEY.md 2.6's
    row decomposition applied to the ~1e-9 rung): returns
    ``(refresh, force)``.

    * ``refresh(pos)``: per-CHUNK strong-set refresh — all_gather the f64
      positions over "model", local top-k + exclusion table (with the
      GLOBAL self diagonal, so the masked kernel needs no row-id scalar).
      Returns (idx, mask) row-sharded over "model".
    * ``force(pos, idx, mask)``: per-STEP acceleration — all_gather +
      `pairwise_accel_split_rows` (rectangular masked f32 kernel + the
      fast strong-set correction gathering from the full source set).

    Both are bitwise-identical to the unsharded
    `pairwise_accel_split` / `strong_pair_indices` / `strong_pair_mask`
    for equal tile_cols: every piece is per-receiver-row independent
    with column order preserved (CI: test_sharding.py; on-chip:
    tools/tpu_smoke.py split leg).
    """
    from ..ops.pallas_nbody import (
        pairwise_accel_split_rows,
        strong_pair_indices_rows,
        strong_pair_mask_rows,
    )

    mu_dev = jnp.asarray(mus)

    def refresh_kernel(pos_l):
        pos_all = jax.lax.all_gather(pos_l, "model", axis=0, tiled=True)
        row0 = jax.lax.axis_index("model").astype(jnp.int32) * pos_l.shape[0]
        idx = strong_pair_indices_rows(pos_all, pos_l, mu_dev, row0, k=k)
        return idx, strong_pair_mask_rows(idx, pos_all.shape[0], row0)

    def force_kernel(pos_l, idx_l, mask_l):
        pos_all = jax.lax.all_gather(pos_l, "model", axis=0, tiled=True)
        return pairwise_accel_split_rows(
            pos_all, pos_l, mu_dev, idx_l, mask_l,
            interpret=interpret, **force_tiles,
        )

    row = P("model", None)
    refresh = jax.jit(jax.shard_map(
        refresh_kernel, mesh=mesh,
        in_specs=(row,), out_specs=(row, row), check_vma=False,
    ))
    force = jax.jit(jax.shard_map(
        force_kernel, mesh=mesh,
        in_specs=(row, row, row), out_specs=row, check_vma=False,
    ))
    return refresh, force


def carry_sharding(mesh: Mesh, ensemble: bool) -> ELM2Carry:
    """PartitionSpecs for an ELM2Carry: bodies on "model", ensembles on "data"."""
    lead = ("data",) if ensemble else ()

    def sh(*spec):
        return NamedSharding(mesh, P(*lead, *spec))

    return ELM2Carry(
        t=NamedSharding(mesh, P(*lead)),
        ys=sh(None, "model", None),
        ddys=sh(None, "model", None),
        dy=sh("model", None),
    )


def _ensemble_accel(mus):
    """Per-ensemble force: Pallas pair kernel on TPU (no O(N^2) HBM
    materialisation - a vmapped jnp kernel at 16 x 4096 bodies would need
    3 GB temporaries per elementwise op), fused jnp elsewhere."""
    mu_dev = jnp.asarray(mus)
    if jax.default_backend() in ("tpu", "axon"):
        from ..ops.pallas_nbody import pairwise_accel as pallas_accel, split_f64

        mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

        def accel(t, y):
            return pallas_accel(y, mu_hi, mu_lo)

        return accel
    return lambda t, y: nbody.pairwise_accel(y, mu_dev)


def make_sharded_ensemble_step(mesh: Mesh, tab, mus, h):
    """One QT12 step for an (E, ...) ensemble, sharded (E->data, N->model).

    Returns a jitted step with explicit in/out shardings; XLA GSPMD inserts
    the all-gather for the pair interaction over the "model" axis and keeps
    the ensemble axis fully parallel.
    """
    accel = _ensemble_accel(mus)

    def step(carry: ELM2Carry) -> ELM2Carry:
        return jax.vmap(lambda c: elm2_step(tab, accel, h, c))(carry)

    sh = carry_sharding(mesh, ensemble=True)
    return jax.jit(step, in_shardings=(sh,), out_shardings=sh)


def make_sharded_ensemble_scan(mesh: Mesh, tab, mus, h, n_steps: int):
    """`n_steps` QT12 ensemble steps in ONE device program (scan inside jit).

    Per-call dispatch latency dominates single-step execution through remote
    device transports (~20 ms/call measured); chunked scans amortise it.
    """
    accel = _ensemble_accel(mus)

    def run(carry: ELM2Carry) -> ELM2Carry:
        def body(c, _):
            return jax.vmap(lambda cc: elm2_step(tab, accel, h, cc))(c), None

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c

    sh = carry_sharding(mesh, ensemble=True)
    return jax.jit(run, in_shardings=(sh,), out_shardings=sh)


def make_shardmap_ensemble_scan_f(
    mesh: Mesh, tab, mus, h, n_steps: int, interpret: bool = False, **force_tiles
):
    """Multi-chip × fused: ensemble members sharded over "data", each shard
    running the PAIR-NATIVE fused scan (Pallas force grid + TwoFloat update
    kernel) on its local members.

    Pallas custom calls cannot be partitioned by GSPMD, so the composition
    is explicit SPMD: `jax.shard_map` splits the ensemble axis and every
    shard launches its own kernels — zero collectives in the loop (members
    are independent), which is exactly the data-parallel serving shape.
    Returns (run, to_f); feed `to_f(init_fused_ensemble_carry(...))` — the
    fused layout keeps the ensemble axis inside the rings (ys/dd as
    (ORDER, E, N, 3) pairs), sharded on E.
    """
    from ..integrators.multistep import ELM2CarryF, elm2_f_from, elm2_step_f, elm2_velocity_f
    from ..ops.eft import TwoFloat
    from ..ops.pallas_nbody import pairwise_accel_df64_ensemble, split_f64

    mu_dev = jnp.asarray(mus)
    mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

    def accel_pair(t, y):  # y: TwoFloat (E_local, N, 3)
        ah, al = pairwise_accel_df64_ensemble(
            jnp.swapaxes(y.hi, 1, 2), jnp.swapaxes(y.lo, 1, 2), mu_hi, mu_lo,
            interpret=interpret, **force_tiles,
        )
        return TwoFloat(ah, al)

    def local_scan(carry: ELM2CarryF) -> ELM2CarryF:
        def body(c, _):
            return elm2_step_f(tab, accel_pair, h, c, interpret=interpret), None

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c._replace(dy=elm2_velocity_f(tab, c, h))

    # the fused carry keeps the ensemble axis INSIDE (ORDER, E, N, 3);
    # shard the E axis (index 1 on ys/dd rings, 0 on dy, t replicated)
    spec = ELM2CarryF(
        t=P(),
        ys=TwoFloat(P(None, "data"), P(None, "data")),
        dd=TwoFloat(P(None, "data"), P(None, "data")),
        dy=P("data"),
    )
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation; the manual specs above are the full contract here
    run = jax.jit(
        jax.shard_map(
            local_scan, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )
    )
    return run, jax.jit(elm2_f_from)


def init_ensemble_carry(mesh: Mesh, tab, mus, t0, pos, vel, h) -> ELM2Carry:
    """Startup for an (E, N, 3) ensemble; runs the starter vmapped."""
    accel = _ensemble_accel(mus)

    def init_one(p, v):
        return elm2_init(tab, accel, t0, p, v, h)

    carry = jax.vmap(init_one)(jnp.asarray(pos), jnp.asarray(vel))
    sh = carry_sharding(mesh, ensemble=True)
    return jax.device_put(carry, sh)


# ---------------------------------------------------------------------------
# Fused ensemble stepping (single fused Pallas grid, no vmap)
# ---------------------------------------------------------------------------
#
# A vmapped pallas_call lifts the ensemble axis into a per-member dispatch
# that costs ~25% at 16 x 4096; the fused path instead feeds the whole
# (E, N, 3) batch to ONE kernel with grid (E, N/TR).  elm2_step is
# shape-generic (its weighted sums reduce the leading ORDER axis and
# everything else is elementwise), so the carry simply keeps the ensemble
# axis inside: ys/ddys are (ORDER, E, N, 3), dy is (E, N, 3), one shared t.
# Single-chip oriented (the Pallas kernel does not shard); the vmapped GSPMD
# path above remains the multi-chip route.


# ---------------------------------------------------------------------------
# Sharded fleet propagation (ships data-parallel over the mesh)
# ---------------------------------------------------------------------------


def make_sharded_fleet_propagator(mesh: Mesh, method: str, params, max_knots: int):
    """Batched spacecraft propagation with ships sharded over axis "data".

    The packed ephemeris (the celestial context every ship reads) is
    REPLICATED; per-ship inputs/outputs are sharded on the leading batch
    axis.  GSPMD keeps each shard's vmapped while_loops fully local — no
    collectives in the hot loop, the canonical data-parallel serving shape.
    Returns (fn, place) where place(packed, tl, t0, p0, v0, end) device_puts
    the operands with the right shardings.
    """
    from ..integrators.methods import get as get_method
    from ..spacecraft import propagate_batch

    tab = get_method(method)
    repl = NamedSharding(mesh, P())
    batch1 = NamedSharding(mesh, P("data"))
    batch2 = NamedSharding(mesh, P("data", None))

    def _tl_sharding(tl):
        return type(tl)(
            starts=batch2, ends=batch2, accels=NamedSharding(mesh, P("data", None, None)),
            frame_kind=batch2, frame_body=batch2,
        )

    def place(packed, tl, t0s, p0s, v0s, ends):
        packed = jax.device_put(packed, jax.tree_util.tree_map(lambda _: repl, packed))
        tl = jax.device_put(tl, _tl_sharding(tl))
        return (
            packed,
            tl,
            jax.device_put(t0s, batch1),
            jax.device_put(p0s, batch2),
            jax.device_put(v0s, batch2),
            jax.device_put(ends, batch1),
        )

    @jax.jit
    def fn(packed, tl, t0s, p0s, v0s, ends):
        return propagate_batch(
            tab, packed, tl, t0s, p0s, v0s, ends, params, max_knots=max_knots
        )

    return fn, place


def _fused_ensemble_accel(mus):
    mu_dev = jnp.asarray(mus)
    if jax.default_backend() in ("tpu", "axon"):
        from ..ops.pallas_nbody import pairwise_accel_ensemble, split_f64

        mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

        def accel(t, y):  # y: (E, N, 3)
            return pairwise_accel_ensemble(y, mu_hi, mu_lo)

        return accel
    return lambda t, y: jax.vmap(lambda yy: nbody.pairwise_accel(yy, mu_dev))(y)


def init_fused_ensemble_carry(tab, mus, t0, pos, vel, h) -> ELM2Carry:
    """Startup for the fused layout: pos/vel (E, N, 3) -> ys (ORDER, E, N, 3)."""
    accel = _fused_ensemble_accel(mus)
    return elm2_init(tab, accel, t0, jnp.asarray(pos), jnp.asarray(vel), h)


def make_fused_ensemble_scan(tab, mus, h, n_steps: int):
    """`n_steps` QT12 steps of the whole ensemble per device program.

    Velocity is deferred out of the scan (Newtonian forces never read it)
    and reconstructed once per program - same carry, less per-step work.
    """
    accel = _fused_ensemble_accel(mus)

    @jax.jit
    def run(carry: ELM2Carry) -> ELM2Carry:
        def body(c, _):
            return elm2_step(tab, accel, h, c, with_velocity=False), None

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c._replace(dy=elm2_velocity(tab, c, h))

    return run


def make_fused_ensemble_scan_fp(
    tab, mus, h, n_steps: int, shape: tuple, interpret: bool = False,
    **force_tiles,
):
    """Sublane-PACKED pair-native ensemble stepping: like
    :func:`make_fused_ensemble_scan_f` but the rings live packed
    (ORDER, SUB, E*N*3/SUB) across steps, so the update kernel uses all 8
    VPU sublanes with only y_new/f_new crossing the packed boundary per
    step (measured +29% at 1 x 4096 vs the unpacked fused scan).

    ``shape`` is the logical member shape, e.g. (E, N, 3).
    Returns (run, to_fp) where to_fp converts an ELM2Carry startup carry.
    """
    from ..integrators.multistep import (
        elm2_f_from, elm2_fp_from, elm2_step_fp, elm2_velocity_fp,
    )
    from ..ops.eft import TwoFloat
    from ..ops.pallas_nbody import pairwise_accel_df64_ensemble, split_f64

    mu_dev = jnp.asarray(mus)
    mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))
    shape = tuple(shape)

    def accel_pair(t, y):  # y: TwoFloat of `shape` = (E, N, 3)
        ah, al = pairwise_accel_df64_ensemble(
            jnp.swapaxes(y.hi, 1, 2), jnp.swapaxes(y.lo, 1, 2), mu_hi, mu_lo,
            interpret=interpret, **force_tiles,
        )
        return TwoFloat(ah, al)

    @jax.jit
    def run(carry):
        def body(c, _):
            return elm2_step_fp(tab, accel_pair, h, c, shape, interpret=interpret), None

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c._replace(dy=elm2_velocity_fp(tab, c, h, shape))

    return run, jax.jit(lambda c: elm2_fp_from(elm2_f_from(c)))


def make_fused_ensemble_scan_f(tab, mus, h, n_steps: int, interpret: bool = False,
                               **force_tiles):
    """Fully pair-native ensemble stepping: fused force grid + fused
    TwoFloat state-update kernel, no emulated-f64 ops in the loop.

    Returns (run, to_f) where to_f converts an ELM2Carry startup carry.
    Requires a Pallas-capable backend (TPU, or CPU with ``interpret``).
    """
    from ..integrators.multistep import ELM2CarryF, elm2_f_from, elm2_step_f, elm2_velocity_f
    from ..ops.eft import TwoFloat
    from ..ops.pallas_nbody import pairwise_accel_df64_ensemble, split_f64

    mu_dev = jnp.asarray(mus)
    mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

    def accel_pair(t, y):  # y: TwoFloat (E, N, 3)
        ah, al = pairwise_accel_df64_ensemble(
            jnp.swapaxes(y.hi, 1, 2), jnp.swapaxes(y.lo, 1, 2), mu_hi, mu_lo,
            interpret=interpret, **force_tiles,
        )
        return TwoFloat(ah, al)

    @jax.jit
    def run(carry: ELM2CarryF) -> ELM2CarryF:
        def body(c, _):
            return elm2_step_f(tab, accel_pair, h, c, interpret=interpret), None

        c, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return c._replace(dy=elm2_velocity_f(tab, c, h))

    return run, jax.jit(elm2_f_from)
