#!/usr/bin/env python
"""Headline benchmark: epiAA effect-screen throughput (SNP-pairs/s).

Runs the f32 MXU screen GEMM — the TPU-native equivalent of the reference's
C/OpenMP `remma_epiAA_eff_cpu` kernel (_remma_epi_eff_cpu.c:91-137) — on a
mouse-sized cohort (n=1304 individuals) with a synthetic 262144-SNP panel
(34.4G pairs), anchor-tiled exactly like the production screen
(gmat_tpu/scan/screen.py).  `vs_baseline` compares against the reference C
kernel measured on this host (tools/bench_reference.py -> bench_baseline.json).

Sizing (measured on the tunneled chip, 2026-08): each dispatch costs ~21 ms
RTT, and the screen GEMM sustains ~134 TF/s effective at tile 4096, so the
panel is sized to make one dispatch ~0.7 s of pure MXU work (50G+ pairs/s;
16384 SNPs measured only 4.6G pairs/s because RTT dominated).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parent

N_ID = 1304
N_SNP = 262144
TILE = 4096


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=N_SNP)
    geno = rng.binomial(2, freqs[None, :], size=(N_ID, N_SNP)).astype(np.float32)
    p_hat = geno.sum(0) / (2 * N_ID)
    mat = np.asarray(geno - 2 * p_hat[None, :], dtype=np.float32)
    py = (rng.standard_normal(N_ID) * 0.1).astype(np.float32)
    cut = np.float32(1.0e9)  # no hits: pure scan cost, same as the C baseline

    # Same math as the production phase-1 screen (gmat_tpu/scan/screen.py's
    # triangular tile worklist), inlined with a constant threshold so the
    # program is as small as possible: the tunnel's remote-compile service is
    # flaky, and the benchmark must compile reliably.  One dispatch, one
    # scalar fetch (per-tile host syncs cost ~30-60 ms RTT each here).
    from gmat_tpu.scan.screen import _tile_worklist

    mat_d = jax.device_put(jnp.asarray(mat))
    py_d = jax.device_put(jnp.asarray(py))
    work = jnp.asarray(
        _tile_worklist(np.arange(N_SNP, dtype=np.int32), N_SNP, "tri", TILE)
    )
    j_ids = jnp.arange(N_SNP, dtype=jnp.int32)
    jt = jnp.arange(TILE, dtype=jnp.int32)

    @jax.jit
    def screen_all(m, py_):
        a_scaled = m * py_[:, None]

        def pair_fn(tp):
            t, pt = tp[0] * TILE, tp[1] * TILE
            a = jax.lax.dynamic_slice_in_dim(a_scaled, t, TILE, axis=1)
            b = jax.lax.dynamic_slice_in_dim(m, pt, TILE, axis=1)
            s = a.T @ b
            valid = (pt + jt)[None, :] > (t + jt)[:, None]
            return jnp.sum((jnp.abs(s) > cut) & valid)

        return jnp.sum(jax.lax.map(pair_fn, work))

    def run():
        return int(screen_all(mat_d, py_d))

    total = run()  # compile + warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        total = run()
    dt = (time.perf_counter() - t0) / reps
    assert total == 0

    pairs = N_SNP * (N_SNP - 1) // 2
    pairs_per_s = pairs / dt

    base_file = ROOT / "bench_baseline.json"
    vs = None
    if base_file.exists():
        base = json.loads(base_file.read_text())
        vs = pairs_per_s / base["reference_epiAA_screen_pairs_per_s"]
    print(
        json.dumps(
            {
                "metric": "epiAA_screen_pairs_per_s",
                "value": round(pairs_per_s, 1),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
