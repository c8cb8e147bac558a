#!/usr/bin/env python3
"""Per-piece anatomy of the magnitude-split force mode at bench shape.

Times each component of ``pairwise_accel_split`` at N=4096 under the same
drain-amortised scan harness as ``bench.py`` (400-step chunks, multiple
chunks per host drain), so the pieces are directly comparable to the
published n4096_split number:

  masked        the masked f32 Pallas kernel alone (per step)
  corr          the df64 strong-set correction alone (per step; includes
                its XLA glue: gather / f64 diff / limb split / transposes)
  corr_kernel   the correction's Pallas kernel alone on pre-gathered
                fixed limbs (per step; isolates the XLA glue by diff)
  split_fixed   the full composition with idx/mask passed in (per step)
  topk          one strong_pair_indices + strong_pair_mask refresh
                (per CHUNK; divide by 400 for the per-step share)
  split_bench   the exact bench composition (per-chunk refresh inside
                the jitted chunk) — should reproduce n4096_split

Writes docs/split_anatomy.json and prints a table.
"""

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
N = 4096
STEPS = 400
CHUNKS = 3          # chunks queued per drain
REPS = 4            # timed groups per piece; medians published


def _force(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0]).reshape(-1)[0]


def _time_scan(make_chunk, carry, reps=REPS, chunks=CHUNKS, steps=STEPS):
    """Median per-step seconds for a jitted chunk fn carry -> carry."""
    carry = make_chunk(carry)
    _force(carry)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chunks):
            carry = make_chunk(carry)
        _force(carry)
        rates.append((time.perf_counter() - t0) / (chunks * steps))
    return float(np.median(rates)), [float(r) for r in rates]


def main():
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.ops.pallas_nbody import (
        _split_f64,
        _strong_correction_df64,
        pairwise_accel_f32_masked,
        pairwise_accel_split,
        strong_pair_indices,
        strong_pair_mask,
    )

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(N, 3)) * 1.0e6)
    mu = jnp.asarray(rng.uniform(1.0e3, 1.0e5, size=N))
    idx = strong_pair_indices(pos, mu, k=16)
    mask = strong_pair_mask(idx, N)
    _force((idx, mask))
    out = {"n": N, "steps_per_chunk": STEPS, "device": str(jax.devices()[0])}

    # -- masked f32 kernel alone ------------------------------------------
    mu32 = mu.astype(jnp.float32).reshape(1, -1)

    @jax.jit
    def chunk_masked(p32):
        def body(c, _):
            a = pairwise_accel_f32_masked(c, mu32, mask)
            return c + a * jnp.float32(1e-30), None

        c, _ = jax.lax.scan(body, p32, None, length=STEPS)
        return c

    med, runs = _time_scan(chunk_masked, pos.astype(jnp.float32))
    out["masked_us_per_step"] = {"median": med * 1e6, "runs_us": [r * 1e6 for r in runs]}

    # -- correction alone (gather + glue + Pallas kernel) -----------------
    # NOTE the closure: `idx` baked into the jit as a CONSTANT lets XLA
    # simplify the gather feed.  The bench computes idx in-jit (a runtime
    # value), which is the *_argidx variants below — the round-5 isolation
    # runs showed the constant/argument gap IS the split mode's anatomy
    # (dd feed: 280 us const vs 1232 us runtime at N=4096).
    @jax.jit
    def chunk_corr(p):
        def body(c, _):
            a = _strong_correction_df64(c, mu, idx)
            return c + a * 1e-30, None

        c, _ = jax.lax.scan(body, p, None, length=STEPS)
        return c

    med, runs = _time_scan(chunk_corr, pos)
    out["corr_us_per_step"] = {"median": med * 1e6, "runs_us": [r * 1e6 for r in runs]}

    # -- dd-feed correction with RUNTIME idx (the r4 shipped path) --------
    @jax.jit
    def chunk_corr_dd_arg(p, i2):
        def body(c, _):
            a = _strong_correction_df64(c, mu, i2)
            return c + a * 1e-30, None

        c, _ = jax.lax.scan(body, p, None, length=STEPS)
        return c

    med, runs = _time_scan(lambda p: chunk_corr_dd_arg(p, idx), pos)
    out["corr_dd_argidx_us_per_step"] = {
        "median": med * 1e6, "runs_us": [r * 1e6 for r in runs]
    }

    # -- fast correction (r5 production: packed f32 gather, TwoFloat
    #    differencing in-kernel) with RUNTIME idx --------------------------
    from ephemeris_explorer_tpu.ops.pallas_nbody import _strong_correction_fast

    @jax.jit
    def chunk_corr_fast_arg(p, i2):
        def body(c, _):
            a = _strong_correction_fast(c, mu, i2)
            return c + a * 1e-30, None

        c, _ = jax.lax.scan(body, p, None, length=STEPS)
        return c

    med, runs = _time_scan(lambda p: chunk_corr_fast_arg(p, idx), pos)
    out["corr_fast_argidx_us_per_step"] = {
        "median": med * 1e6, "runs_us": [r * 1e6 for r in runs]
    }

    # -- correction Pallas kernel alone on fixed pre-gathered limbs -------
    from functools import partial

    import jax.experimental.pallas as pl  # noqa: F401
    from ephemeris_explorer_tpu.ops.pallas_nbody import _strong_corr_kernel
    import jax.experimental.pallas.tpu as pltpu  # noqa: F401

    d64 = pos[idx] - pos[:, None, :]
    d = _split_f64(jnp.transpose(d64, (2, 1, 0)))
    muj = _split_f64(mu[idx].T)
    _force((d.hi, muj.hi))

    def _corr_kernel_only(dh, dl, mh, ml, tc=512):
        import jax.experimental.pallas as pl
        import jax.experimental.pallas.tpu as pltpu

        kp, n = mh.shape
        return pl.pallas_call(
            _strong_corr_kernel,
            grid=(n // tc,),
            in_specs=[
                pl.BlockSpec((3, kp, tc), lambda i: (i * 0, i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, kp, tc), lambda i: (i * 0, i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, tc), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, tc), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((3, tc), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tc), lambda i: (i * 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((3, n), jnp.float32),
                jax.ShapeDtypeStruct((3, n), jnp.float32),
            ],
        )(dh, dl, mh, ml)

    @jax.jit
    def chunk_kernel_only(carry):
        dh, dl = carry

        def body(c, _):
            oh, ol = _corr_kernel_only(c[0], c[1], muj.hi, muj.lo)
            return (c[0] + oh[:, None, :] * jnp.float32(1e-30), c[1]), None

        c, _ = jax.lax.scan(body, (dh, dl), None, length=STEPS)
        return c

    med, runs = _time_scan(chunk_kernel_only, (d.hi, d.lo))
    out["corr_kernel_us_per_step"] = {
        "median": med * 1e6, "runs_us": [r * 1e6 for r in runs]
    }

    # -- full composition, idx/mask fixed (no per-chunk refresh) ----------
    @jax.jit
    def chunk_split_fixed(p):
        def body(c, _):
            a = pairwise_accel_split(c, mu, idx, mask)
            return c + a * 1e-30, None

        c, _ = jax.lax.scan(body, p, None, length=STEPS)
        return c

    med, runs = _time_scan(chunk_split_fixed, pos)
    out["split_fixed_us_per_step"] = {
        "median": med * 1e6, "runs_us": [r * 1e6 for r in runs]
    }

    # -- per-chunk refresh cost (topk + mask build), one call -------------
    @jax.jit
    def refresh(p):
        i2 = strong_pair_indices(p, mu, k=16)
        return i2, strong_pair_mask(i2, N)

    _force(refresh(pos))
    ts = []
    for _ in range(REPS * 2):
        t0 = time.perf_counter()
        _force(refresh(pos))
        ts.append(time.perf_counter() - t0)
    out["refresh_ms_per_chunk"] = {
        "median": float(np.median(ts)) * 1e3,
        "runs_ms": [t * 1e3 for t in ts],
        "us_per_step_at_400": float(np.median(ts)) / STEPS * 1e6,
    }

    # -- the exact bench composition --------------------------------------
    @jax.jit
    def chunk_bench(p):
        i2 = strong_pair_indices(p, mu, k=16)
        m2 = strong_pair_mask(i2, N)

        def body(c, _):
            a = pairwise_accel_split(c, mu, i2, m2)
            return c + a * 1e-30, None

        c, _ = jax.lax.scan(body, p, None, length=STEPS)
        return c

    med, runs = _time_scan(chunk_bench, pos)
    out["split_bench_us_per_step"] = {
        "median": med * 1e6, "runs_us": [r * 1e6 for r in runs]
    }
    out["split_bench_body_steps_per_s"] = N / med

    (REPO / "docs" / "split_anatomy.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    for k, v in out.items():
        print(k, json.dumps(v) if isinstance(v, dict) else v)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(REPO))
    main()
