"""Micro-profile the longwas balance fixed REML's per-iteration ops.

The bench's fixed section runs at 14.2 SNPs/s (832 s for 11,833 SNPs of
10-iteration REMLs) while its FLOP count (~24 TFLOP total) says ~1 s at
MXU rates — something is ~800x off roofline.  Suspects: the per-(SNP,id)
batched 16x16 `jnp.linalg.inv` (310k LU inverses per batch-iter at
snp_batch=256) and the batched 16/21-dim eigh/cholesky factorizations.
Times each op class at the bench batch shapes, plus one real `batch_fn`
call for the total.

Run on the tunneled TPU: python tools/bench_longwas_profile.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

B, N, T, K = 256, 1212, 16, 21  # snp_batch, ids, timepoints, var params
G = 1001  # gamma grid


def timeit(name, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts) * 1e3:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((B, N, T, T)).astype(np.float32)
    spd = np.einsum("bntu,bntv->bnuv", a, a) / T \
        + 4 * np.eye(T, dtype=np.float32)
    spd_d = jax.device_put(jnp.asarray(spd))
    a21 = rng.standard_normal((B, K, K)).astype(np.float32)
    spd21 = np.einsum("bij,bkj->bik", a21, a21) / K \
        + 4 * np.eye(K, dtype=np.float32)
    spd21_d = jax.device_put(jnp.asarray(spd21))
    spd16_d = spd_d[:, 0]

    f_inv = jax.jit(lambda x: jnp.linalg.inv(x).sum())
    timeit(f"inv_batched_{B}x{N}x{T}x{T}", lambda: float(f_inv(spd_d)))

    f_chol = jax.jit(lambda x: jnp.linalg.cholesky(x).sum())
    timeit(f"chol_batched_{B}x{T}x{T}", lambda: float(f_chol(spd16_d)))
    timeit(f"chol_batched_{B}x{K}x{K}", lambda: float(f_chol(spd21_d)))

    f_eigh = jax.jit(lambda x: sum(o.sum() for o in jnp.linalg.eigh(x)))
    timeit(f"eigh_batched_{B}x{T}x{T}", lambda: float(f_eigh(spd16_d)))
    timeit(f"eigh_batched_{B}x{K}x{K}", lambda: float(f_eigh(spd21_d)))

    # the gamma-grid candidate PD gate at its real shape: (B, G, 4, 4) x2
    c4 = rng.standard_normal((B, G, 4, 4)).astype(np.float32)
    c4 = np.einsum("bgij,bgkj->bgik", c4, c4) + 2 * np.eye(4,
                                                           dtype=np.float32)
    c4_d = jax.device_put(jnp.asarray(c4))
    from gmat_tpu.longwas.balance_gwas import _chol_pd_unrolled

    f_pd = jax.jit(lambda x: _chol_pd_unrolled(x).sum())
    timeit(f"pd_gate_{B}x{G}x4x4", lambda: float(f_pd(c4_d)))

    # einsum block at _fdai_core shapes (the FLOP body, no factorizations)
    y = jax.device_put(jnp.asarray(
        rng.standard_normal((N, T)).astype(np.float32)))
    xm = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, T, 8)).astype(np.float32)))
    leg = jax.device_put(jnp.asarray(
        rng.standard_normal((T, 4)).astype(np.float32)))

    @jax.jit
    def einsum_body(vinv, xmat):
        xvy = jnp.einsum("bntp,bntu,nu->bp", xmat, vinv, y)
        g_all = jnp.einsum("tc,bntu,ud->bncd", leg, vinv, leg)
        h_all = jnp.einsum("tc,bntu,bnup->bncp", leg, vinv, xmat)
        t4 = jnp.einsum("bncp,bndq->bcdpq", h_all, h_all)
        return xvy.sum() + g_all.sum() + t4.sum()

    vinv_d = spd_d
    timeit("einsum_body", lambda: float(einsum_body(vinv_d, xm)))


if __name__ == "__main__":
    main()
