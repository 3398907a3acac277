#!/usr/bin/env python
"""Microbenchmark: screen-extraction strategies per (anchor,partner) tile
visit, on the real TPU.

The production screen's phase-2 extraction (5.2 s at 710k hits) is 6.5x the
phase-1 counts pass (0.8 s) at the bench shape — VERDICT round-2 item 1.
This measures candidate FUSED single-pass designs that emit hit candidates
during the counts GEMM itself, so the re-GEMM disappears:

  count   : phase-1 count-only sweep (today's phase 1; the floor)
  direct  : per-row top-k of the masked |s| panel, k=KROW
  segment : two-stage — per-row segment hit counts (reshape-sum), top-KSEG
            segments gathered, then top-KROW inside the gathered panel

Each strategy is ONE jitted program lax.map-ed over the full triangular
worklist (m=262144, tile=4096, n=1304, ~2e-7 hit fraction => ~700k hits),
fetched to host, timed over 3 reps.  Prints one JSON line per strategy.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N_ID = 1304
N_SNP = 262144
TILE = 4096
REPS = 3
K_TP = 1024  # per-tile-pair candidate capacity


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

    @jax.jit
    def count_only(ag, bm):
        def one(tp):
            _, _, _, hit = visit_common(tp, ag, bm)
            return jnp.sum(hit, dtype=jnp.int32)

        return jax.lax.map(one, work)

    def compact_rows(i_ids, cols, vals, rc, KROW):
        """(TA, KROW) per-row candidates -> (K_TP,) buffers via row-offset
        scatter; rows beyond their rc write to the drop slot."""
        rc_cap = jnp.minimum(rc, KROW)
        offs = jnp.cumsum(rc_cap) - rc_cap
        rank = jnp.arange(KROW, dtype=jnp.int32)[None, :]
        dest = jnp.where(rank < rc_cap[:, None], offs[:, None] + rank, K_TP)
        dest = jnp.minimum(dest, K_TP).ravel()
        bi = jnp.zeros((K_TP + 1,), jnp.int32).at[dest].set(
            jnp.broadcast_to(i_ids[:, None], (TILE, KROW)).ravel(),
            mode="drop")
        bj = jnp.zeros((K_TP + 1,), jnp.int32).at[dest].set(
            cols.ravel(), mode="drop")
        be = jnp.zeros((K_TP + 1,), jnp.float32).at[dest].set(
            vals.ravel(), mode="drop")
        return bi[:K_TP], bj[:K_TP], be[:K_TP]

    def make_direct(KROW):
        @jax.jit
        def direct(ag, bm):
            def one(tp):
                s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
                key = jnp.where(hit, jnp.abs(s) + 1.0, 0.0)
                _, kidx = jax.lax.top_k(key, KROW)
                rc = jnp.sum(hit, axis=1, dtype=jnp.int32)
                cols = j_ids[0] + kidx  # kidx is the within-tile column
                vals = jnp.take_along_axis(s, kidx, axis=1)
                bi, bj, be = compact_rows(i_ids, cols, vals, rc, KROW)
                return (jnp.sum(hit, dtype=jnp.int32), jnp.max(rc), bi, bj, be)

            return jax.lax.map(one, work)

        return direct

    def make_segment(SEG, KSEG, KROW):
        NSEG = TILE // SEG

        @jax.jit
        def segment(ag, bm):
            def one(tp):
                s, i_ids, j_ids, hit = visit_common(tp, ag, bm)
                hs = hit.reshape(TILE, NSEG, SEG)
                seg_cnt = jnp.sum(hs, axis=2, dtype=jnp.int32)
                nz_seg = jnp.sum(seg_cnt > 0, axis=1, dtype=jnp.int32)
                _, seg_idx = jax.lax.top_k(seg_cnt, KSEG)
                s3 = s.reshape(TILE, NSEG, SEG)
                sg = jnp.take_along_axis(s3, seg_idx[:, :, None], axis=1)
                hg = jnp.take_along_axis(hs, seg_idx[:, :, None], axis=1)
                key = jnp.where(hg, jnp.abs(sg) + 1.0, 0.0).reshape(
                    TILE, KSEG * SEG)
                _, kidx = jax.lax.top_k(key, KROW)
                rc = jnp.sum(hit, axis=1, dtype=jnp.int32)
                sel_seg = jnp.take_along_axis(seg_idx, kidx // SEG, axis=1)
                cols = j_ids[0] + sel_seg * SEG + kidx % SEG
                vals = jnp.take_along_axis(
                    sg.reshape(TILE, KSEG * SEG), kidx, axis=1)
                bi, bj, be = compact_rows(i_ids, cols, vals, rc, KROW)
                return (jnp.sum(hit, dtype=jnp.int32), jnp.max(rc),
                        jnp.max(nz_seg), bi, bj, be)

            return jax.lax.map(one, work)

        return segment

    strategies = {
        "count": (count_only, 1),
        "direct_k4": (make_direct(4), 2),
        "segment_s128_g2_k4": (make_segment(128, 2, 4), 3),
        "segment_s512_g2_k8": (make_segment(512, 2, 8), 3),
    }

    for name, (fn, nmeta) in strategies.items():
        try:
            t0 = time.perf_counter()
            out = fn(a_gath, b_mat)
            out = jax.tree.map(np.asarray, out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(a_gath, b_mat)
                out = jax.tree.map(np.asarray, out)
            dt = (time.perf_counter() - t0) / REPS
            if name == "count":
                total = int(out.sum())
                extra = {}
            else:
                total = int(out[0].sum())
                extra = {"max_rc": int(out[1].max())}
                if nmeta == 3 and len(out) == 6:
                    extra["max_nzseg"] = int(out[2].max())
                # how many candidates actually captured (counts<=caps)
                extra["tp_overflow"] = int(np.sum(out[0] > K_TP))
            print(json.dumps({
                "strategy": name, "seconds": round(dt, 4),
                "pairs_per_s": round(pairs / dt, 1), "hits": total,
                "visits": n_work, "compile_s": round(compile_s, 1),
                **extra,
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"strategy": name, "error": repr(exc)}),
                  flush=True)


if __name__ == "__main__":
    main()
