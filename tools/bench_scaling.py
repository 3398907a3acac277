#!/usr/bin/env python
"""Weak-scaling curve for the sharded screen (BASELINE north-star #3).

Runs the PRODUCTION sharded screen phase-1 (`_screen_counts_mesh`) on
1/2/4/8-device meshes with the per-device workload held constant (weak
scaling: the SNP panel grows with the mesh) and reports pairs/s plus
efficiency vs the 1-device run.

On this machine only virtual CPU devices exist (the devices share 2 physical
cores, so the curve measures methodology, not ICI bandwidth); on a real
multi-chip host the same script runs unchanged — set JAX_PLATFORMS=tpu and
drop the host-device forcing.  Usage:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_scaling.py

Prints one JSON line: {"devices": [...], "pairs_per_s": [...],
"efficiency": [...]}.
"""
from __future__ import annotations

import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon sitecustomize force-registers the tunneled TPU backend before
# this script runs; flip back to CPU before first backend use (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_ID = 512
TILE = 512
TILES_PER_DEVICE = 8  # weak scaling: work grows with the mesh
REPS = 3


def run_one(n_dev: int) -> float:
    import jax
    import jax.numpy as jnp

    from gmat_tpu.dist.mesh import make_mesh
    from gmat_tpu.scan.screen import _screen_counts_mesh, _pad_rows_to

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    m = TILE * TILES_PER_DEVICE * n_dev
    geno = rng.binomial(2, 0.3, size=(N_ID, m)).astype(np.float32)
    mat = jnp.asarray(geno - geno.mean(0, keepdims=True))
    py = jnp.asarray(rng.standard_normal(N_ID).astype(np.float32) * 0.1)
    bins = jnp.zeros(m, jnp.int32)
    table = jnp.full((111,), 1e9, jnp.float32)
    anchors = jnp.asarray(np.arange(m, dtype=np.int32))
    # rectangular worklist so per-device work is exactly equal
    n_tiles = m // TILE
    work = np.stack(np.meshgrid(np.arange(n_tiles, dtype=np.int32),
                                np.arange(n_tiles, dtype=np.int32),
                                indexing="ij"), -1).reshape(-1, 2)
    work_d = jnp.asarray(_pad_rows_to(work, n_dev))

    def run():
        return int(np.asarray(_screen_counts_mesh(
            mesh, anchors, mat, mat, py, bins, bins, table, work_d,
            "nodiag", TILE)).sum())

    run()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(REPS):
        run()
    dt = (time.perf_counter() - t0) / REPS
    return len(work) * TILE * TILE / dt


def main():
    devices = [1, 2, 4, 8]
    rates = [run_one(d) for d in devices]
    eff = [r / (rates[0] * d) for d, r in zip(devices, rates)]
    print(json.dumps({
        "devices": devices,
        "pairs_per_s": [round(r, 1) for r in rates],
        "efficiency": [round(e, 3) for e in eff],
        "note": ("virtual CPU devices share this host's cores; run on a "
                 "real multi-chip host for ICI-limited numbers"),
    }))


if __name__ == "__main__":
    sys.exit(main())
