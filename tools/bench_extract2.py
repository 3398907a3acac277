#!/usr/bin/env python
"""Round 2: isolate the per-visit cost of each extraction primitive.

bench_extract.py showed fused candidate emission costs ~1.8 ms/visit over
the 0.3 ms/visit count-only floor.  This times each suspect in isolation on
the same worklist to find where the time goes and which cheap substitute
(bf16 top_k, iterative argmax, group-collapsed top_k) hits the
<=0.5 ms/visit budget that makes the fused screen >=2e10 pairs/s.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_ID = 1304
N_SNP = 262144
TILE = 4096
REPS = 3
K_TP = 1024


def _panel(rng, n, m):
    freqs = rng.uniform(0.05, 0.95, size=m)
    geno = rng.binomial(2, freqs[None, :], size=(n, m)).astype(np.float32)
    p_hat = geno.sum(0) / (2 * n)
    return np.asarray(geno - 2 * p_hat[None, :], dtype=np.float32)


def _cut_for(mat, py, hit_frac):
    from scipy.stats import norm

    v = float(np.mean(np.mean(mat * mat, axis=0)))
    sig = np.sqrt(np.sum(py * py) / py.size) * v * np.sqrt(mat.shape[0])
    return float(norm.isf(hit_frac / 2) * sig)


def build_worklist(m, tile):
    n_tiles = m // tile
    return np.asarray(
        [(t, pt) for t in range(n_tiles) for pt in range(n_tiles)
         if (pt + 1) * tile - 1 > t * tile],
        dtype=np.int32,
    )


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    mat = _panel(rng, N_ID, N_SNP)
    py = (rng.standard_normal(N_ID) * 0.1).astype(np.float32)
    cut = np.float32(_cut_for(mat, py, 2e-7))
    a_gath = jax.device_put(jnp.asarray(mat * py[:, None]))
    b_mat = jax.device_put(jnp.asarray(mat))
    work = jnp.asarray(build_worklist(N_SNP, TILE))
    n_work = len(build_worklist(N_SNP, TILE))
    pairs = N_SNP * (N_SNP - 1) // 2
    jt = jnp.arange(TILE, dtype=jnp.int32)

    def visit_common(tp, ag, bm):
        t, pt = tp[0] * TILE, tp[1] * TILE
        a = jax.lax.dynamic_slice_in_dim(ag, t, TILE, axis=1)
        b = jax.lax.dynamic_slice_in_dim(bm, pt, TILE, axis=1)
        s = a.T @ b
        i_ids = t + jt
        j_ids = pt + jt
        hit = (jnp.abs(s) > cut) & (j_ids[None, :] > i_ids[:, None])
        return s, i_ids, j_ids, hit

    def wrap(body):
        @jax.jit
        def fn(ag, bm):
            return jax.lax.map(lambda tp: body(tp, ag, bm), work)

        return fn

    def count_rc(tp, ag, bm):
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        rc = jnp.sum(hit, axis=1, dtype=jnp.int32)
        return jnp.sum(rc), jnp.max(rc)

    def topk_f32(tp, ag, bm):
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        key = jnp.where(hit, jnp.abs(s) + 1.0, 0.0)
        kv, kidx = jax.lax.top_k(key, 4)
        return jnp.sum(hit, dtype=jnp.int32), jnp.sum(kidx)

    def topk_bf16(tp, ag, bm):
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        key = jnp.where(hit, jnp.abs(s) + 1.0, 0.0).astype(jnp.bfloat16)
        kv, kidx = jax.lax.top_k(key, 4)
        return jnp.sum(hit, dtype=jnp.int32), jnp.sum(kidx)

    def topk_u8(tp, ag, bm):
        # selection only needs hit>non-hit; u8 {1,0} key with index
        # tie-break is enough when k >= rc (retry covers the rest)
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        key = hit.astype(jnp.uint8)
        kv, kidx = jax.lax.top_k(key, 4)
        return jnp.sum(hit, dtype=jnp.int32), jnp.sum(kidx)

    def iter_argmax(tp, ag, bm):
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        key = jnp.where(hit, jnp.abs(s) + 1.0, 0.0)
        total = jnp.sum(hit, dtype=jnp.int32)
        acc = jnp.int32(0)
        cols = jnp.arange(TILE, dtype=jnp.int32)[None, :]
        for _ in range(4):
            idx = jnp.argmax(key, axis=1)  # (TA,)
            acc = acc + jnp.sum(idx.astype(jnp.int32))
            key = jnp.where(cols == idx[:, None], 0.0, key)
        return total, acc

    def group_topk(tp, ag, bm):
        # collapse 8 columns -> 1 by max, top_k on the 512-wide panel,
        # then resolve within-group by comparing the 8 members
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        key = jnp.where(hit, jnp.abs(s) + 1.0, 0.0)
        g = key.reshape(TILE, TILE // 8, 8)
        gmax = jnp.max(g, axis=2)  # (TA, 512)
        gcnt = jnp.sum(hit.reshape(TILE, TILE // 8, 8), axis=2,
                       dtype=jnp.int32)
        collide = jnp.max(gcnt)  # >1 => a group holds 2 hits (fallback)
        kv, gidx = jax.lax.top_k(gmax, 4)  # (TA, 4)
        member = jnp.take_along_axis(g, gidx[:, :, None], axis=1)  # (TA,4,8)
        within = jnp.argmax(member, axis=2).astype(jnp.int32)  # (TA, 4)
        kidx = gidx * 8 + within
        return jnp.sum(hit, dtype=jnp.int32), jnp.sum(kidx), collide

    def pack_mask(tp, ag, bm):
        # binary-pack the hit mask 32:1 (one pass); host would unpack
        s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
        w = (2 ** jnp.arange(32, dtype=jnp.uint32))
        packed = jnp.sum(
            hit.reshape(TILE, TILE // 32, 32).astype(jnp.uint32) * w,
            axis=2, dtype=jnp.uint32)
        return jnp.sum(hit, dtype=jnp.int32), packed

    strategies = {
        "count_rc": wrap(count_rc),
        "topk_f32": wrap(topk_f32),
        "topk_bf16": wrap(topk_bf16),
        "topk_u8": wrap(topk_u8),
        "iter_argmax4": wrap(iter_argmax),
        "group8_topk4": wrap(group_topk),
        "pack_mask32": wrap(pack_mask),
    }

    for name, fn in strategies.items():
        try:
            t0 = time.perf_counter()
            out = jax.tree.map(np.asarray, fn(a_gath, b_mat))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = jax.tree.map(np.asarray, fn(a_gath, b_mat))
            dt = (time.perf_counter() - t0) / REPS
            print(json.dumps({
                "strategy": name, "seconds": round(dt, 4),
                "ms_per_visit": round(dt / n_work * 1e3, 3),
                "pairs_per_s": round(pairs / dt, 1),
                "hits": int(np.asarray(out[0]).sum()),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"strategy": name, "error": repr(exc)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
