"""Measure the fused screen's global-compaction scatter cost vs kcap.

The production sweep dispatches 4 chunks of W=520 visits with kcap=2048:
each chunk's global compaction scatters wc*kcap = 1.06M source rows, and
XLA TPU row-scatter degrades from ~3.4 ns/row at 32k rows to ~90 ns/row
at 1M+ (CLAUDE.md measured table) — a suspected ~0.3-0.4 s of the 1.9 s
sweep.  Times `_fused_screen_scan` at the bench shape for kcap tiers and
a scatter-free variant (per-visit buffers only) to bound the cost.

Run on the tunneled TPU: python tools/bench_kcap.py [kcaps...]
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

N_ID, N_SNP, TILE = 1304, 262144, 4096
W = 520  # one production chunk

try:
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    from scipy.stats import norm

    from gmat_tpu.scan import screen as sc

    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=N_SNP)
    geno = rng.binomial(2, freqs[None, :], size=(N_ID, N_SNP)) \
        .astype(np.float32)
    p_hat = geno.sum(0) / (2 * N_ID)
    mat = np.asarray(geno - 2 * p_hat[None, :], dtype=np.float32)
    del geno
    py = (rng.standard_normal(N_ID) * 0.1).astype(np.float32)

    # same cut formula as bench.py's production section (~711k hits/sweep
    # = ~178k per 520-visit chunk)
    v = float(np.mean(mat * mat))
    sig = float(np.sqrt(np.sum(py * py) / N_ID)) * v * np.sqrt(N_ID)
    cut = float(norm.isf(2e-8 / 2) * sig)

    mat_d = jax.device_put(jnp.asarray(mat))
    py_d = jax.device_put(jnp.asarray(py))
    anchors = np.arange(N_SNP - 1, dtype=np.int32)
    n_tiles = -(-len(anchors) // TILE)
    padded = np.pad(anchors, (0, n_tiles * TILE - len(anchors)),
                    constant_values=anchors[-1])
    padded_d = jnp.asarray(padded)
    a_gath = sc._gather_scale(mat_d, padded_d, py_d)
    bins_anchor = jnp.zeros(len(padded), jnp.int32)
    t2_p = jnp.full((11, 1), cut, jnp.float32)
    work = sc._tile_worklist(padded, N_SNP, "tri", TILE)
    wl = jnp.asarray(work[:W])

    def timeit(name, fn, reps=3):
        fn()  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {np.median(ts):.3f} s (min {min(ts):.3f})  -> {out}",
              flush=True)

    kcaps = [int(a) for a in sys.argv[1:]] or [2048, 512, 256]
    for kc in kcaps:
        gf = partial(sc._fused_screen_scan, mask_mode="tri", tile=TILE,
                     flat_cut=True, m=N_SNP, cap=min(1 << 22, W * kc),
                     rounds=2, krow=8, kcap=kc)

        def run(gf=gf):
            out = gf(wl, a_gath, mat_d, padded_d, bins_anchor, t2_p)
            return int(np.asarray(out["total"])), int(np.asarray(
                out["flags"]).sum())

        timeit(f"full_kcap{kc}", run)

    # scatter-free bound: per-visit compaction only (map of _fused_visit),
    # reduced outputs so nothing big is built or fetched.  Arrays are jit
    # ARGUMENTS — a closure would bake the 1.4 GB panel into the program
    # as constants and stall the remote compile service
    @jax.jit
    def visits_fn(w, ag, bm, ap, ba, tp):
        def one(tp_row):
            c, f, a_idx, rc, cols, vals = sc._fused_visit(
                tp_row, ag, bm, ap, ba, tp, "tri", TILE, 2, 8, True, N_SNP)
            return c, jnp.sum(cols), jnp.sum(vals)

        return jax.lax.map(one, w)

    def visits_only():
        out = visits_fn(wl, a_gath, mat_d, padded_d, bins_anchor, t2_p)
        return int(np.asarray(out[0]).sum())

    timeit("visits_only", visits_only)


if __name__ == "__main__":
    main()
