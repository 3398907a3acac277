#!/usr/bin/env python
"""Round 3: full fused screen visit built on iterative argmax.

bench_extract2.py: count+rc floor 0.353 ms/visit; top_k adds 1.12 ms but 4x
iterative argmax adds only 0.2 ms.  This times complete fused variants
(candidate emission + row-offset compaction + host-shaped outputs) and
checks hit-set exactness against a numpy oracle on one visit.
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
    work_np = build_worklist(N_SNP, TILE)
    work = jnp.asarray(work_np)
    n_work = len(work_np)
    pairs = N_SNP * (N_SNP - 1) // 2
    jt = jnp.arange(TILE, dtype=jnp.int32)

    def make_fused(KR, with_rc_fetch=True):
        @jax.jit
        def fused(ag, bm):
            def one(tp):
                t, pt = tp[0] * TILE, tp[1] * TILE
                a = jax.lax.dynamic_slice_in_dim(ag, t, TILE, axis=1)
                b = jax.lax.dynamic_slice_in_dim(bm, pt, TILE, axis=1)
                s = a.T @ b
                i_ids = t + jt
                j_ids = pt + jt
                hit = (jnp.abs(s) > cut) & (j_ids[None, :] > i_ids[:, None])
                rc = jnp.sum(hit, axis=1, dtype=jnp.int32)
                count = jnp.sum(rc)
                max_rc = jnp.max(rc)
                key = jnp.where(hit, jnp.abs(s) + 1.0, 0.0)
                cols = jnp.arange(TILE, dtype=jnp.int32)[None, :]
                idxs = []
                for _ in range(KR):
                    idx = jnp.argmax(key, axis=1)
                    idxs.append(idx.astype(jnp.int32))
                    key = jnp.where(cols == idx[:, None], 0.0, key)
                kidx = jnp.stack(idxs, axis=1)  # (TA, KR) desc |s| order
                vals = jnp.take_along_axis(s, kidx, axis=1)  # signed eff
                rc_cap = jnp.minimum(rc, KR)
                offs = jnp.cumsum(rc_cap) - rc_cap
                rank = jnp.arange(KR, dtype=jnp.int32)[None, :]
                dest = jnp.where(rank < rc_cap[:, None],
                                 offs[:, None] + rank, K_TP)
                dest = jnp.minimum(dest, K_TP).ravel()
                buf_j = jnp.zeros((K_TP + 1,), jnp.int32).at[dest].set(
                    (pt + kidx).ravel(), mode="drop")
                buf_e = jnp.zeros((K_TP + 1,), jnp.float32).at[dest].set(
                    vals.ravel(), mode="drop")
                out = (count, max_rc, buf_j[:K_TP], buf_e[:K_TP])
                if with_rc_fetch:
                    out = out + (rc_cap,)
                return out

            return jax.lax.map(one, work)

        return fused

    strategies = {
        "fused_iter4": make_fused(4),
        "fused_iter6": make_fused(6),
        "fused_iter4_norc": make_fused(4, with_rc_fetch=False),
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
            counts = out[0]
            print(json.dumps({
                "strategy": name, "seconds": round(dt, 4),
                "ms_per_visit": round(dt / n_work * 1e3, 3),
                "pairs_per_s": round(pairs / dt, 1),
                "hits": int(counts.sum()), "max_rc": int(out[1].max()),
                "tp_overflow": int(np.sum(counts > K_TP)),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"strategy": name, "error": repr(exc)[:200]}),
                  flush=True)

    # exactness oracle on one mid-worklist visit (numpy recompute)
    fn = strategies["fused_iter4"]
    out = jax.tree.map(np.asarray, fn(a_gath, b_mat))
    v = n_work // 2
    t, pt = work_np[v]
    s = (mat[:, t * TILE:(t + 1) * TILE] * py[:, None]).T @ \
        mat[:, pt * TILE:(pt + 1) * TILE]
    ii = t * TILE + np.arange(TILE)
    jj = pt * TILE + np.arange(TILE)
    hit = (np.abs(s) > cut) & (jj[None, :] > ii[:, None])
    want = set(zip(*[(a, pt * TILE + b) for a, b in zip(*np.nonzero(hit))]
                   )) if hit.any() else set()
    want = {(int(a) + t * TILE, int(b) + pt * TILE)
            for a, b in zip(*np.nonzero(hit))}
    rc_cap = out[4][v]
    count = int(out[0][v])
    got_j = out[2][v][:count]
    i_expand = np.repeat(ii, rc_cap)
    got = set(zip(i_expand.tolist(), got_j.tolist()))
    assert int(out[1][v]) <= 4, "oracle visit overflowed k; pick another"
    assert got == want, (len(got), len(want))
    print(json.dumps({"oracle_visit": v, "hits": count, "exact": True}),
          flush=True)


if __name__ == "__main__":
    main()
