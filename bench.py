#!/usr/bin/env python3
"""Headline benchmark: N-body integration throughput on one TPU chip.

Metric: body-steps/sec/chip on a synthetic 4096-body cluster integrated with
the production method (QuinlanTremaine12, one O(N^2) force evaluation per
step) in f64 (double-word emulation on TPU).  Baseline target (BASELINE.json
north star): 1e6 body-steps/sec/chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

N_BODIES = 4096
STEPS_PER_CHUNK = 100
CHUNKS = 5
BASELINE = 1.0e6  # body-steps/sec/chip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.integrators.multistep import elm2_init, elm2_step
    from ephemeris_explorer_tpu.ops import nbody

    rng = np.random.default_rng(0)
    # Plummer-like cluster in km / km/s / km^3 s^-2
    pos = rng.normal(size=(N_BODIES, 3)) * 1.0e6
    vel = rng.normal(size=(N_BODIES, 3)) * 1.0
    mu = rng.uniform(1.0e3, 1.0e5, size=N_BODIES)

    tab = get("QuinlanTremaine12")
    mu_dev = jnp.asarray(mu)
    h = 600.0

    # Pallas two-float pair kernel (compute-bound, ~1.6x the fused-XLA f64
    # path); fall back to the jnp kernel if the platform can't lower it.
    try:
        from ephemeris_explorer_tpu.ops.pallas_nbody import (
            pairwise_accel as pallas_accel,
            split_f64,
        )

        mu_hi, mu_lo = split_f64(mu_dev.reshape(1, -1))

        def accel(t, y):
            return pallas_accel(y, mu_hi, mu_lo)

        _probe = np.asarray(accel(0.0, jnp.asarray(pos)))
        assert np.isfinite(_probe).all()
    except Exception:

        def accel(t, y):
            return nbody.pairwise_accel(y, mu_dev)

    @jax.jit
    def chunk(carry):
        def body(c, _):
            return elm2_step(tab, accel, h, c), None

        c, _ = jax.lax.scan(body, carry, None, length=STEPS_PER_CHUNK)
        return c

    # jit the startup too: eager dispatch over remote-device relays is slow
    init = jax.jit(lambda p, v: elm2_init(tab, accel, 0.0, p, v, h))
    carry = init(jnp.asarray(pos), jnp.asarray(vel))
    # warmup/compile; a host transfer forces real completion (block_until_ready
    # is unreliable through remote-device relays)
    carry = chunk(carry)
    _ = np.asarray(carry.ys[0, 0])

    t0 = time.perf_counter()
    for _ in range(CHUNKS):
        carry = chunk(carry)
    _ = np.asarray(carry.ys[0, 0])
    elapsed = time.perf_counter() - t0

    steps = CHUNKS * STEPS_PER_CHUNK
    body_steps_per_sec = N_BODIES * steps / elapsed

    # sanity: no NaNs and cluster has not exploded
    final = np.asarray(carry.ys[0])
    assert np.isfinite(final).all(), "non-finite state after benchmark"

    print(
        json.dumps(
            {
                "metric": f"body-steps/sec/chip (N={N_BODIES}, QT12 f64)",
                "value": round(body_steps_per_sec, 1),
                "unit": "body-steps/s",
                "vs_baseline": round(body_steps_per_sec / BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
