#!/usr/bin/env python
"""Measured matmul speed-of-light for the exact-scan shapes (north-star #2).

BASELINE.json's original target is '>=50% of peak FLOPs on the pair-variance
GEMM'.  The roofline denominator (197 TF/s bf16 MXU peak) assumes large
MXU-aligned operands; the exact scan's LHS is the (n, n) = (1304, 1304) PVP
matrix.  This measures the actual ceiling of this chip for:

  - f32 default-precision (bf16-compute/f32-accum) at n=1304 (the scan's
    true shape), n=1408 (128-aligned pad), and 4096 (large square);
  - explicit bf16 inputs with f32 accumulation at the same shapes.

One JSON line -> BASELINE_sol.json is the honest denominator record.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

REPS = 5
K = 1 << 19  # RHS columns: big enough to hide dispatch overhead
K_BIG = 1 << 17  # n=4096 would OOM HBM at the full K


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    out = {}

    def measure(name, n, dtype):
        k_cols = K_BIG if n >= 4096 else K
        a = jnp.asarray(rng.standard_normal((n, n)), dtype)
        b = jnp.asarray(rng.standard_normal((n, k_cols)), dtype)

        @jax.jit
        def mm(a_, b_):
            return jnp.sum(
                jnp.dot(a_, b_, preferred_element_type=jnp.float32)
                .astype(jnp.float32))

        float(mm(a, b))  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(mm(a, b))
        dt = (time.perf_counter() - t0) / REPS
        tf = 2.0 * n * n * k_cols / dt / 1e12
        out[name] = round(tf, 2)
        print(f"{name}: {tf:.1f} TF/s", file=sys.stderr, flush=True)

    for n in (1304, 1408, 4096):
        measure(f"f32_n{n}", n, jnp.float32)
        measure(f"bf16_n{n}", n, jnp.bfloat16)

    out["note"] = ("TF/s of (n,n)@(n,524288) on this chip; f32 = default "
                   "precision (bf16 multiply, f32 accumulate). The exact "
                   "scan's pair-variance GEMM LHS is PVP at n=1304.")
    line = json.dumps(out)
    print(line)
    (ROOT / "BASELINE_sol.json").write_text(line + "\n")


if __name__ == "__main__":
    main()
