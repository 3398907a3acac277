"""Per-stage profile of the fused-screen visit on the real TPU.

Times cumulative variants of the per-visit pipeline over one production
chunk (W=520 visits of the bench shape) to locate the cost the round-4
engine pays over the pure GEMM:

  gemm      GEMM + count only
  passA     + hit3 / bc / max_bc
  round1    + peeled round (lax.argmax over lanes)
  round1b   + peeled round (two plain-max formulation, no argmax)
  extract   + full extraction (cond + while_loop + storage slabs)
  visitcomp + per-visit searchsorted compaction -> (kcap,) buffers
  full      + global compaction (= _fused_screen_scan)

Run: python tools/bench_fused_profile.py  (on the tunneled TPU)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from functools import partial

N_ID, N_SNP, TILE = 1304, 262144, 4096
W = 520
RMAX = 16
KCAP = 8192

try:
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _searchsorted_i32(csum, slots):
    """Local copy of the (retired) binary-search compaction primitives —
    kept here so the slot->source gather formulation stays measurable."""
    nrow = csum.shape[0]
    lo = jnp.zeros_like(slots)
    hi = jnp.full_like(slots, nrow)
    for _ in range(max(1, (nrow + 1).bit_length())):
        mid = (lo + hi) // 2
        pred = (mid < hi) & (csum[jnp.minimum(mid, nrow - 1)] <= slots)
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def _searchsorted_rows_i32(csum2d, rows, slots):
    ncol = csum2d.shape[1]
    flat = csum2d.reshape(-1)
    base = rows * ncol
    lo = jnp.zeros_like(slots)
    hi = jnp.full_like(slots, ncol)
    for _ in range(max(1, (ncol + 1).bit_length())):
        mid = (lo + hi) // 2
        v = flat[base + jnp.minimum(mid, ncol - 1)]
        pred = (mid < hi) & (v <= slots)
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def main():

    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=N_SNP)
    geno = rng.binomial(2, freqs[None, :], size=(N_ID, N_SNP)).astype(np.float32)
    p_hat = geno.sum(0) / (2 * N_ID)
    mat = np.asarray(geno - 2 * p_hat[None, :], dtype=np.float32)
    del geno
    py = (rng.standard_normal(N_ID) * 0.1).astype(np.float32)
    v = float(np.mean(np.mean(mat * mat, axis=0)))
    from scipy.stats import norm
    sig = np.sqrt(np.sum(py * py) / py.size) * v * np.sqrt(N_ID)
    cut = np.float32(norm.isf(1e-7) * sig)

    n_tiles = N_SNP // TILE
    work = np.asarray([(t, pt) for t in range(n_tiles)
                       for pt in range(n_tiles)
                       if (pt + 1) * TILE - 1 > t * TILE], np.int32)
    work = work[:W]
    a_gath_h = jax.device_put(jnp.asarray(mat * py[:, None]))
    b_mat_h = jax.device_put(jnp.asarray(mat))
    del mat
    blk = 128
    n_blk = TILE // blk
    iota_b = jnp.arange(blk, dtype=jnp.int32)[None, None, :]
    _ctx = {}  # traced array args, bound per jit call (NOT constants)

    def prologue(tp_row):
        a_gath, b_mat = _ctx["a"], _ctx["b"]
        t, pt = tp_row[0] * TILE, tp_row[1] * TILE
        a = jax.lax.dynamic_slice_in_dim(a_gath, t, TILE, axis=1)
        b = jax.lax.dynamic_slice_in_dim(b_mat, pt, TILE, axis=1)
        s = a.T @ b
        jt = jnp.arange(TILE, dtype=jnp.int32)
        valid = (pt + jt)[None, :] > (t + jt)[:, None]
        hit = (jnp.abs(s) > cut) & valid
        return s, hit

    def v_gemm(tp_row):
        s, hit = prologue(tp_row)
        return (jnp.sum(hit.astype(jnp.int32)),)

    def passA_of(tp_row):
        s, hit = prologue(tp_row)
        hit3 = hit.reshape(TILE, n_blk, blk)
        s3 = s.reshape(TILE, n_blk, blk)
        rc = jnp.sum(hit, axis=1, dtype=jnp.int32)
        bc = jnp.sum(hit3, axis=2, dtype=jnp.int32)
        return s3, hit3, rc, bc

    def v_passA(tp_row):
        s3, hit3, rc, bc = passA_of(tp_row)
        return jnp.sum(rc), jnp.max(bc)

    def round_argmax(key3, s3):
        ki = jax.lax.argmax(key3, 2, jnp.int32)
        sel = iota_b == ki[:, :, None]
        kv = jnp.max(key3, axis=2)
        sval = jnp.sum(jnp.where(sel, s3, 0), axis=2)
        return sel, jnp.where(kv > 0, sval, 0), ki

    def round_twomax(key3, s3):
        kv = jnp.max(key3, axis=2)
        ki = jnp.max(jnp.where(key3 == kv[:, :, None], iota_b, -1), axis=2)
        sel = iota_b == ki[:, :, None]
        sval = jnp.sum(jnp.where(sel, s3, 0), axis=2)
        return sel, jnp.where(kv > 0, sval, 0), ki

    def make_v_round(rof):
        def f(tp_row):
            s3, hit3, rc, bc = passA_of(tp_row)
            key0 = jnp.where(hit3, jnp.abs(s3) + 1, 0)
            sel, vals, ki = rof(key0, s3)
            return jnp.sum(rc), jnp.max(bc), jnp.sum(vals), jnp.sum(ki)
        return f

    def extract_of(tp_row, rof):
        s3, hit3, rc, bc = passA_of(tp_row)
        count = jnp.sum(rc, dtype=jnp.int32)
        max_bc = jnp.max(bc)
        zero = tp_row[0] * 0

        def extract(_):
            key0 = jnp.where(hit3, jnp.abs(s3) + 1, 0)
            vals_st = jnp.zeros((RMAX, TILE, n_blk), jnp.float32) + 0.0 * zero
            cols_st = jnp.zeros((RMAX, TILE, n_blk), jnp.int32) + zero
            sel1, vals1, ki1 = rof(key0, s3)
            vals_st = jax.lax.dynamic_update_slice(vals_st, vals1[None],
                                                   (zero, zero, zero))
            cols_st = jax.lax.dynamic_update_slice(cols_st, ki1[None],
                                                   (zero, zero, zero))

            def later(st):
                vals_st, cols_st = st
                key = jnp.where(sel1, 0, key0)

                def body(stt):
                    r, key3, vals_st, cols_st = stt
                    sel, vals, ki = rof(key3, s3)
                    vals_st = jax.lax.dynamic_update_slice(
                        vals_st, vals[None], (r, zero, zero))
                    cols_st = jax.lax.dynamic_update_slice(
                        cols_st, ki[None], (r, zero, zero))
                    return r + 1, jnp.where(sel, 0, key3), vals_st, cols_st

                _, _, vals_st, cols_st = jax.lax.while_loop(
                    lambda stt: stt[0] < jnp.minimum(max_bc, RMAX), body,
                    (zero + 1, key, vals_st, cols_st))
                return vals_st, cols_st

            return jax.lax.cond(max_bc > 1, later, lambda st: st,
                                (vals_st, cols_st))

        def empty(_):
            return (jnp.zeros((RMAX, TILE, n_blk), jnp.float32) + 0.0 * zero,
                    jnp.zeros((RMAX, TILE, n_blk), jnp.int32) + zero)

        vals_st, cols_st = jax.lax.cond(count > 0, extract, empty, None)
        return count, rc, bc, vals_st, cols_st

    def v_extract(tp_row):
        count, rc, bc, vals_st, cols_st = extract_of(tp_row, round_twomax)
        return count, jnp.sum(vals_st), jnp.sum(cols_st)

    slot = jnp.arange(KCAP, dtype=jnp.int32)

    def compact_of(tp_row):
        count, rc, bc, vals_st, cols_st = extract_of(tp_row, round_twomax)
        csum = jnp.cumsum(rc, dtype=jnp.int32)
        lv = csum[-1]
        row = jnp.minimum(_searchsorted_i32(csum, slot), TILE - 1)
        rank = slot - (csum[row] - rc[row])
        bcc = jnp.cumsum(bc, axis=1, dtype=jnp.int32)
        blk_i = jnp.minimum(_searchsorted_rows_i32(bcc, row, rank), n_blk - 1)
        cell = row * n_blk + blk_i
        r = jnp.clip(rank - (bcc.reshape(-1)[cell] - bc.reshape(-1)[cell]),
                     0, RMAX - 1)
        src = r * (TILE * n_blk) + cell
        return (count, jnp.minimum(lv, KCAP), vals_st.reshape(-1)[src],
                cols_st.reshape(-1)[src])

    def v_visitcomp(tp_row):
        count, lv, be, bj = compact_of(tp_row)
        return count, lv, jnp.sum(be), jnp.sum(bj)

    CAP = min(1 << 22, W * KCAP)

    @jax.jit
    def full(worklist, ag, bm):
        _ctx["a"], _ctx["b"] = ag, bm
        counts, lv, be, bj = jax.lax.map(v_visitcomp, worklist)
        csum_w = jnp.cumsum(lv, dtype=jnp.int32)
        total = csum_w[-1]
        gslot = jnp.arange(CAP, dtype=jnp.int32)
        vis = jnp.minimum(_searchsorted_i32(csum_w, gslot), lv.shape[0] - 1)
        rank = jnp.clip(gslot - (csum_w[vis] - lv[vis]), 0, KCAP - 1)
        src = vis * KCAP + rank
        return total, be.reshape(-1)[src], bj.reshape(-1)[src]

    wl = jnp.asarray(work)

    def timeit(name, fn):
        t0 = time.perf_counter()
        out = fn()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{name:10s} {dt:7.3f} s/chunk  {dt / W * 1e3:6.2f} ms/visit "
              f"(compile+warm {compile_s:.1f} s)", flush=True)
        return dt

    def make_unroll(n_rounds, outer_cond=False):
        def f(tp_row):
            s3, hit3, rc, bc = passA_of(tp_row)
            count = jnp.sum(rc, dtype=jnp.int32)

            def body(_):
                key = jnp.where(hit3, jnp.abs(s3) + 1, 0)
                vs, cs = [], []
                for _r in range(n_rounds):
                    sel, vals, ki = round_twomax(key, s3)
                    vs.append(vals)
                    cs.append(ki)
                    if _r + 1 < n_rounds:
                        key = jnp.where(sel, 0, key)
                return jnp.stack(vs), jnp.stack(cs)

            if outer_cond:
                zero = tp_row[0] * 0
                vals_st, cols_st = jax.lax.cond(
                    count > 0, body,
                    lambda _: (jnp.zeros((n_rounds, TILE, n_blk),
                                         jnp.float32) + 0.0 * zero,
                               jnp.zeros((n_rounds, TILE, n_blk),
                                         jnp.int32) + zero), None)
            else:
                vals_st, cols_st = body(None)
            return count, jnp.max(bc), jnp.sum(vals_st), jnp.sum(cols_st)

        return f

    # the REAL round-4 engine pieces (screen.py), same chunk
    from gmat_tpu.scan import screen as sc

    anchors_padded_h = jnp.arange(N_SNP, dtype=jnp.int32)
    bins_anchor_h = jnp.zeros(N_SNP, dtype=jnp.int32)
    t2_p_h = jnp.full((11, N_SNP), cut, dtype=jnp.float32)

    def real_visit(tp_row):
        out = sc._fused_visit(tp_row, _ctx["a"], _ctx["b"], _ctx["ap"],
                              _ctx["ba"], _ctx["tp"], "tri", TILE, 2, 8,
                              True, N_SNP)
        count, flag, a_idx, rc_cap, cols, vals = out
        return count, jnp.sum(rc_cap), jnp.sum(cols), jnp.sum(vals)

    for bs in (None, 2, 4):
        def g_real(w, ag, bm, ap, ba, tp, bs=bs):
            _ctx.update(a=ag, b=bm, ap=ap, ba=ba, tp=tp)
            if bs:
                return jax.lax.map(real_visit, w, batch_size=bs)
            return jax.lax.map(real_visit, w)

        gr = jax.jit(g_real)
        timeit(f"realvisit_b{bs}", lambda gr=gr: [
            np.asarray(x[:4]) for x in gr(wl, a_gath_h, b_mat_h,
                                          anchors_padded_h, bins_anchor_h,
                                          t2_p_h)])

    for kc in (KCAP, 2048, 512):
        gf = partial(sc._fused_screen_scan, mask_mode="tri", tile=TILE,
                     flat_cut=True, m=N_SNP, cap=min(1 << 22, W * kc),
                     rounds=2, krow=8, kcap=kc)

        def run_real_full(gf=gf):
            out = gf(wl, a_gath_h, b_mat_h, anchors_padded_h, bins_anchor_h,
                     t2_p_h)
            return (int(np.asarray(out[1])),)

        timeit(f"full_k{kc}", run_real_full)

    ROUNDS, KROW = 2, 8

    def make_compact(with_scatter):
        """The real v5 per-row compaction (stack + prefix + one-hot
        einsum), optionally + the per-visit (kcap, 3) scatter."""
        def f(tp_row):
            s3, hit3, rc, bc = passA_of(tp_row)
            count = jnp.sum(rc, dtype=jnp.int32)
            key = jnp.where(hit3, jnp.abs(s3) + 1, 0)
            colbase = (jnp.arange(n_blk, dtype=jnp.int32) * blk)[None, :]
            vs, cs = [], []
            for r in range(ROUNDS):
                kv = jnp.max(key, axis=2)
                ki = jnp.max(jnp.where(key == kv[:, :, None], iota_b, -1),
                             axis=2)
                sel = iota_b == ki[:, :, None]
                sval = jnp.sum(jnp.where(sel, s3, 0), axis=2)
                vs.append(jnp.where(kv > 0, sval, 0))
                cs.append(colbase + ki)
                if r + 1 < ROUNDS:
                    key = jnp.where(sel, 0, key)
            vals_c = jnp.stack(vs, axis=2).reshape(TILE, n_blk * ROUNDS)
            cols_c = jnp.stack(cs, axis=2).reshape(TILE, n_blk * ROUNDS)
            acc = (bc[:, :, None] > jnp.arange(ROUNDS, dtype=jnp.int32)
                   ).reshape(TILE, n_blk * ROUNDS)
            pos = jnp.cumsum(acc.astype(jnp.int32), axis=1) - 1
            oh = ((pos[:, :, None]
                   == jnp.arange(KROW, dtype=jnp.int32)[None, None])
                  & acc[:, :, None]).astype(jnp.float32)
            vals = jnp.einsum("rc,rck->rk", vals_c, oh)
            cols = jnp.einsum("rc,rck->rk", cols_c.astype(jnp.float32), oh
                              ).astype(jnp.int32)
            rc_cap = jnp.minimum(rc, KROW)
            if not with_scatter:
                return count, jnp.sum(rc_cap), jnp.sum(vals), jnp.sum(cols)
            offs = jnp.cumsum(rc_cap, dtype=jnp.int32) - rc_cap
            lv = offs[-1] + rc_cap[-1]
            rankk = jnp.arange(KROW, dtype=jnp.int32)[None, :]
            dest = jnp.where(rankk < rc_cap[:, None],
                             offs[:, None] + rankk, KCAP)
            dest = jnp.minimum(dest, KCAP).ravel()
            rows3 = jnp.stack(
                [jnp.broadcast_to(jnp.arange(TILE, dtype=jnp.int32)[:, None],
                                  (TILE, KROW)).ravel().astype(jnp.float32),
                 cols.ravel().astype(jnp.float32), vals.ravel()], axis=1)
            buf = jnp.zeros((KCAP + 1, 3), jnp.float32).at[dest, :].set(
                rows3, mode="drop")
            return count, jnp.minimum(lv, KCAP), jnp.sum(buf), lv

        return f

    for name, vf in [("gemm", v_gemm),
                     ("unroll2", make_unroll(2)),
                     ("u2compact", make_compact(False)),
                     ("u2buf", make_compact(True))]:
        def g_fn(w, ag, bm, vf=vf):
            _ctx["a"], _ctx["b"] = ag, bm
            return jax.lax.map(vf, w)

        g = jax.jit(g_fn)
        timeit(name,
               lambda g=g: [np.asarray(x[:4]) for x in g(wl, a_gath_h,
                                                         b_mat_h)])

    timeit("full", lambda: (int(np.asarray(full(wl, a_gath_h,
                                                b_mat_h)[0])),))


def yeast():
    """Tier-2 profile at the yeast shape (n=4168, m=28220, 28 visits,
    ~4.6k hits/visit): where do the ~23 ms/visit go?"""
    from scipy.stats import norm

    from gmat_tpu.scan import screen as sc

    n, m, tile = 4168, 28220, 4096
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.05, 0.95, size=m)
    geno = rng.binomial(2, freqs[None, :], size=(n, m)).astype(np.float32)
    p_hat = geno.sum(0) / (2 * n)
    mat = np.asarray(geno - 2 * p_hat[None, :], dtype=np.float32)
    del geno
    py = (rng.standard_normal(n) * 0.1).astype(np.float32)
    v = float(np.mean(np.mean(mat * mat, axis=0)))
    sig = np.sqrt(np.sum(py * py) / py.size) * v * np.sqrt(n)
    cut = np.float32(norm.isf(1e-5) * sig)

    n_tiles = -(-m // tile)
    width = (n_tiles + 1) * tile
    b_pad = np.zeros((n, width), np.float32)
    b_pad[:, :m] = mat
    anchors = np.arange(n_tiles * tile, dtype=np.int32)
    anchors = np.minimum(anchors, m - 2)
    a_gath = jax.device_put(jnp.asarray(mat[:, anchors] * py[:, None]))
    b_d = jax.device_put(jnp.asarray(b_pad))
    del mat, b_pad
    ap = jnp.asarray(anchors)
    ba = jnp.zeros(len(anchors), dtype=jnp.int32)
    tp = jnp.full((11, width), cut, dtype=jnp.float32)
    work = np.asarray([(t, pt) for t in range(n_tiles)
                       for pt in range(n_tiles)
                       if (pt + 1) * tile - 1 > int(anchors[t * tile])],
                      np.int32)
    wl = jnp.asarray(work)
    W2 = len(work)
    print(f"yeast visits: {W2}", flush=True)

    def timeit(name, fn):
        t0 = time.perf_counter()
        fn()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"yeast {name:14s} {dt:7.3f} s  {dt / W2 * 1e3:6.2f} ms/visit"
              f" (compile+warm {compile_s:.1f} s)", flush=True)

    def mk(rounds, krow, kcap):
        gf = partial(sc._fused_screen_scan, mask_mode="tri", tile=tile,
                     flat_cut=True, m=m, cap=min(1 << 22, W2 * kcap),
                     rounds=rounds, krow=krow, kcap=kcap)
        return lambda: (int(np.asarray(gf(wl, a_gath, b_d, ap, ba, tp)[1])),)

    def visit_only(rounds, krow):
        def g_fn(w, ag, bm):
            def vf(tp_row):
                out = sc._fused_visit(tp_row, ag, bm, ap, ba, tp, "tri",
                                      tile, rounds, krow, True, m)
                return (out[0], jnp.sum(out[3]), jnp.sum(out[4]),
                        jnp.sum(out[5]))

            return jax.lax.map(vf, w)

        g = jax.jit(g_fn)
        return lambda: (np.asarray(g(wl, a_gath, b_d)[0]),)

    timeit("visit_r8k64", visit_only(8, 64))
    timeit("full_r8k64_32k", mk(8, 64, 32768))
    timeit("full_r8k64_8k", mk(8, 64, 8192))
    timeit("full_r8k16_8k", mk(8, 16, 8192))


if __name__ == "__main__":
    if "--yeast-only" not in sys.argv:
        main()
    yeast()
