#!/usr/bin/env python3
"""Ensemble stress config: 4096-body cluster x 16 initial conditions.

The BASELINE "synthetic 4096-body cluster, ensemble of 16 ICs" config:
vmapped QT12 stepping over the ensemble axis, shardable over a device mesh
(data axis = ensembles, model axis = bodies).  On one chip this measures the
vmapped-scan throughput; on a mesh the same code scales out via GSPMD.

Run:  python examples/ensemble.py [--bodies 4096] [--ensembles 16] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bodies", type=int, default=4096)
    p.add_argument("--ensembles", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--data", type=int, default=1, help="mesh data-axis size")
    p.add_argument("--model", type=int, default=1, help="mesh model-axis size")
    args = p.parse_args()

    from ephemeris_explorer_tpu.integrators import get
    from ephemeris_explorer_tpu.parallel import sharding as sh

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(args.ensembles, args.bodies, 3)) * 1e6
    vel = rng.normal(size=(args.ensembles, args.bodies, 3))
    mu = rng.uniform(1e3, 1e5, size=args.bodies)
    tab = get("QuinlanTremaine12")
    h = 600.0

    mesh = sh.make_mesh(data=args.data, model=args.model)
    carry = sh.init_ensemble_carry(mesh, tab, mu, 0.0, pos, vel, h)
    run = sh.make_sharded_ensemble_scan(mesh, tab, mu, h, args.steps)

    carry = run(carry)
    _ = np.asarray(carry.t)  # force completion (warmup/compile)
    t0 = time.perf_counter()
    carry = run(carry)
    _ = np.asarray(carry.t)
    el = (time.perf_counter() - t0) / args.steps
    rate = args.ensembles * args.bodies / el
    print(
        f"ensemble {args.ensembles} x {args.bodies} bodies: {el*1e3:.2f} ms/step "
        f"-> {rate/1e6:.2f}M body-steps/s aggregate "
        f"(mesh data={args.data} model={args.model}, {len(jax.devices())} device(s))"
    )


if __name__ == "__main__":
    main()
