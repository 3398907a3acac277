#!/usr/bin/env python
"""On-hardware oracle check for the fused screen's extracted columns.

The fused screen's one-hot compaction contractions must run at HIGHEST
matmul precision: at the TPU's DEFAULT precision they compute in bf16 and
corrupt integer column indices above 256 (ADVICE r4 high).  CPU tests
cannot reproduce that (CPU f32 matmuls are exact), so this tool runs the
production `_run_screen` path on the real backend and verifies every
extracted (snp_0, snp_1) pair and effect against a float64 numpy oracle.

Run:  python tools/check_tpu_extraction.py        (uses default backend)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    from gmat_tpu.scan.screen import _run_screen

    rng = np.random.default_rng(7)
    n, m, tile = 1304, 8192, 1024
    freqs = rng.uniform(0.05, 0.95, size=m)
    geno = rng.binomial(2, freqs[None, :], size=(n, m)).astype(np.float32)
    mat = np.asarray(geno - geno.mean(0)[None, :], dtype=np.float32)
    py = (rng.standard_normal(n) * 0.1).astype(np.float32)

    eff = (mat * py[:, None]).T.astype(np.float64) @ mat.astype(np.float64)
    tri = np.triu_indices(m, k=1)
    cut = float(np.quantile(np.abs(eff[tri]), 1 - 2e-4))  # ~6.7k hits

    anchors = np.arange(m - 1, dtype=np.int32)
    bins = np.zeros(m, dtype=np.int64)
    table = np.full(111, cut, dtype=np.float32)
    t0 = time.perf_counter()
    i0, j0, e0 = _run_screen(jnp.asarray(mat), jnp.asarray(mat),
                             jnp.asarray(py), anchors, bins, bins, table,
                             "tri", tile)
    dt = time.perf_counter() - t0
    print(f"backend={jax.default_backend()} hits={len(i0)} in {dt:.2f} s")

    margin = 2.0 ** -6 * cut + 1e-3 * cut  # slack band + bf16 GEMM error
    core = {(int(i), int(j)) for i, j in zip(*tri)
            if np.abs(eff[i, j]) > cut + margin}
    outer = {(int(i), int(j)) for i, j in zip(*tri)
             if np.abs(eff[i, j]) > (1 - 2.0 ** -6) * cut - margin}
    got = set(zip(i0.tolist(), j0.tolist()))
    assert len(got) == len(i0), "duplicate extracted pairs"
    missing = core - got
    spurious = got - outer
    assert not missing, f"missed {len(missing)} clear hits: {sorted(missing)[:5]}"
    assert not spurious, (f"{len(spurious)} spurious pairs (column corruption?):"
                          f" {sorted(spurious)[:5]}")
    err = np.abs(e0 - eff[i0, j0]) / np.maximum(1e-30, np.abs(eff[i0, j0]))
    print(f"max relative eff error: {err.max():.3e}")
    assert err.max() < 2e-2, "extracted effects off beyond bf16 GEMM error"
    print("OK: extracted columns exact, effects within GEMM precision")


if __name__ == "__main__":
    main()
