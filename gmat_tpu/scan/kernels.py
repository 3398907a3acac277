"""Pallas TPU kernels for the epistasis effect screen.

The screen S = (A ⊙ py)ᵀ B is the TPU-native equivalent of the reference's
C/OpenMP kernel family (/root/reference/gmat/remma/_remma_epi_eff_cpu.c:91-137).
XLA already runs the GEMM at MXU peak; what it cannot avoid is materializing
the full (m x m) effect matrix in HBM when hits must be located.  The Pallas
path fuses GEMM -> |.|>cut -> triangular mask -> popcount per (TI x TJ) tile
entirely in VMEM, writing only a tiny per-tile count grid to HBM:

    phase 1  pallas_screen_counts : one pass, counts only (this kernel);
    phase 2  hits are extracted by recomputing just the non-empty tiles
             (rare at production p_cut) with the XLA tile kernel.

At p_cut = 1e-5 phase 2 touches ~0.1% of tiles, so the screen's HBM write
traffic drops from O(m^2) to O((m/TILE)^2).
"""
from __future__ import annotations

import logging
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

TILE = 512  # MXU-aligned tile edge (multiple of 128)

_PROBE_CACHE: bool | None = None


def mosaic_probe() -> bool:
    """Cached try-compile+run of a trivial Mosaic kernel on the default
    backend.  On this machine's tunneled TPU the remote-compile service
    rejects Mosaic programs (CLAUDE.md); when that env is fixed this probe
    starts returning True with zero code changes and the screen/scan
    engines switch over (VERDICT round-2 item 5)."""
    global _PROBE_CACHE
    if _PROBE_CACHE is not None:
        return _PROBE_CACHE
    try:
        if jax.default_backend() != "tpu":
            _PROBE_CACHE = False
            return False
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            o_ref[:, :] = x_ref[:, :] + 1.0

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(jnp.zeros((8, 128), jnp.float32))
        _PROBE_CACHE = bool(np.asarray(out)[0, 0] == 1.0)
    except Exception as exc:  # remote-compile 500, Mosaic reject, ...
        logger.info("Mosaic capability probe failed: %r", exc)
        _PROBE_CACHE = False
    logger.info("Mosaic capability probe: %s",
                "available" if _PROBE_CACHE else "unavailable")
    return _PROBE_CACHE


def engine_choice() -> str:
    """Which screen/scan engine to run: 'xla', 'pallas', or
    'pallas-interpret'.

    GMAT_TPU_ENGINE=xla|pallas|auto overrides; 'pallas' on a non-TPU
    backend selects interpret mode (the test hook for the driver wiring).
    Default 'auto' probes Mosaic once per process and falls back to the
    XLA engine exactly as before when the probe fails."""
    mode = os.environ.get("GMAT_TPU_ENGINE", "auto")
    if mode == "xla":
        return "xla"
    if mode == "pallas":
        return "pallas" if jax.default_backend() == "tpu" \
            else "pallas-interpret"
    return "pallas" if mosaic_probe() else "xla"


def _count_kernel(cut_ref, a_ref, b_ref, py_ref, out_ref):
    # All integer arithmetic pinned to int32 (the package enables x64
    # globally, and Mosaic rejects any int64 op).  The per-tile count goes to
    # a statically-indexed (8, 128) output block — (1, 1) blocks violate the
    # TPU tiling constraint and dynamic scalar stores promote indices to i64.
    from jax.experimental import pallas as pl

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile = jnp.int32(TILE)
    cut = cut_ref[0]
    touches_upper = tj * tile + (tile - jnp.int32(1)) > ti * tile

    @pl.when(touches_upper)
    def _():
        s = jnp.dot(
            (a_ref[:, :] * py_ref[:, :]).T,
            b_ref[:, :],
            preferred_element_type=jnp.float32,
        )
        row_ids = ti * tile + jax.lax.broadcasted_iota(
            jnp.int32, (TILE, TILE), 0
        )
        col_ids = tj * tile + jax.lax.broadcasted_iota(
            jnp.int32, (TILE, TILE), 1
        )
        hit = (jnp.abs(s) > cut) & (col_ids > row_ids)
        # count via an f32 reduction: jnp.sum's integer accumulator would be
        # promoted to int64 under the package-global x64 mode
        count = jnp.sum(hit.astype(jnp.float32)).astype(jnp.int32)
        # count at [0,0] via iota mask (a scatter would use i64 indices)
        b0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        b1 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        out_ref[:, :] = jnp.where((b0 == 0) & (b1 == 0), count, jnp.int32(0))

    @pl.when(jnp.logical_not(touches_upper))
    def _():
        out_ref[:, :] = jnp.zeros((8, 128), dtype=jnp.int32)


def pallas_screen_counts(mat, py, cut, interpret: bool = False):
    """Per-tile hit counts for the triangular AA/DD screen.

    mat: (n, m) float32 coded genotypes (m padded to TILE internally);
    py:  (n,)   float32;  cut: scalar threshold.
    Returns an (m_tiles, m_tiles) int32 count grid (lower tiles zero).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = mat.shape
    m_pad = ((m + TILE - 1) // TILE) * TILE
    if m_pad != m:
        # padding columns are all-zero -> |s| = 0 <= cut -> no spurious hits
        mat = jnp.pad(mat, ((0, 0), (0, m_pad - m)))
    n_tiles = m_pad // TILE
    grid = (n_tiles, n_tiles)
    out = pl.pallas_call(
        _count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cut (1,)
            pl.BlockSpec((n, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, n_tiles * 128),
                                       jnp.int32),
        interpret=interpret,
    )(jnp.asarray([cut], dtype=jnp.float32),
      mat.astype(jnp.float32),
      mat.astype(jnp.float32),
      py.astype(jnp.float32)[:, None])
    return out[::8, ::128]  # count lives at [0, 0] of each (8, 128) block


def _row_compact(hit_row, col_ids_row, payload_rows, K):
    """Compact ONE tile row's hits to the slot front WITHOUT scatter.

    Mosaic has no general scatter, so the compaction is a 2-D iota match:
    dest[j] = exclusive-rank of hit j (int32 cumsum); slot k then selects
    the unique j with dest==k via a (K, TJ) comparison and masked sums.
    All int math is pinned int32 (the package-global x64 mode would promote
    plain sums/indices to i64, which Mosaic rejects).

    hit_row: (1, TJ) bool; col_ids_row: (1, TJ) int32; payload_rows: list of
    (1, TJ) f32 rows compacted with the same permutation.  Returns
    (count i32 scalar, cols (K,) int32 with -1 past count, payloads (K,)).
    Hits ranked >= K are dropped — the caller detects count > K and
    retries with a larger K (the cap-retry contract of the XLA engine,
    screen.py::_run_screen)."""
    tj = hit_row.shape[1]
    hit_i = hit_row.astype(jnp.int32)
    dest = jnp.cumsum(hit_i, axis=1) - 1  # int32 in, int32 out
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, tj), 0)
    match = (k_iota == dest) & hit_row  # (K, TJ); <=1 true per k-row
    count = jnp.sum(hit_row.astype(jnp.float32)).astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
    cols = jnp.sum(jnp.where(match, col_ids_row, 0), axis=1,
                   dtype=jnp.int32)
    cols = jnp.where(slot < count, cols, jnp.int32(-1))
    outs = [jnp.sum(jnp.where(match, p, 0.0), axis=1) for p in payload_rows]
    return count, cols, outs


def _exact_kernel_factory(TJ, K, mask_mode, n_at8, m_true):
    """Kernel body for the fused exact-scan tile (one 8-anchor band x one
    TJ-partner tile per grid step).  Statics baked in by the caller."""
    from jax.experimental import pallas as pl

    def kernel(crit_ref, a_ref, b_ref, py_ref, pvp_ref, cnt_ref, col_ref,
               eff_ref, var_ref, chi_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        crit = crit_ref[0]
        col_ids = (j * jnp.int32(TJ) + jax.lax.broadcasted_iota(
            jnp.int32, (1, TJ), 1))
        py = py_ref[:, :]  # (n, 1)
        pvp = pvp_ref[:, :]
        cnt_block = jnp.zeros((8, 128), dtype=jnp.int32)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0
        row_sel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        for a in range(8):  # unrolled: static row stores
            anchor = i * jnp.int32(8) + jnp.int32(a)
            e = a_ref[:, a:a + 1] * b_ref[:, :]  # (n, TJ)
            eff = jnp.sum(e * py, axis=0, keepdims=True)  # (1, TJ)
            pvpe = jnp.dot(pvp, e, preferred_element_type=jnp.float32)
            var = jnp.sum(e * pvpe, axis=0, keepdims=True)
            chi = eff * eff / var  # 0/0 -> NaN -> never a hit
            if mask_mode == "tri":
                valid = col_ids > anchor
            else:  # AD full rectangle minus the diagonal
                valid = col_ids != anchor
            valid &= (col_ids < jnp.int32(m_true)) & (
                anchor < jnp.int32(m_true))
            hit = (chi > crit) & valid
            cnt, cols, (effs, vars_, chis) = _row_compact(
                hit, col_ids, [eff, var, chi], K)
            cnt_block = jnp.where(lane0 & (row_sel == a), cnt, cnt_block)
            col_ref[a, :] = cols
            eff_ref[a, :] = effs
            var_ref[a, :] = vars_
            chi_ref[a, :] = chis
        cnt_ref[:, :] = cnt_block

    return kernel


def pallas_exact_scan(mat0, mat1, py, pvp, chi_crit, mask_mode="tri",
                      K=128, TJ=256, interpret: bool = False):
    """Fused exact-scan: eff + pair-variance GEMM + chi threshold + in-VMEM
    compaction, one Pallas program (SURVEY §3.3 north-star kernel; reference
    C analogue _remma_epi_eff_cpu.c:91-137 computes eff only — the variance
    column is what the exact test adds, remma_epiAA.py:71-82).

    Per grid step: an 8-anchor band against a TJ-partner tile; per anchor
    e = m0[:, a] * m1[:, J], eff = e'py, var = colsum(e * (pvp @ e)) with
    the (n, n) @ (n, TJ) GEMM on the MXU; chi = eff^2/var is thresholded
    and each row's hits are compacted in VMEM (`_row_compact`), so HBM gets
    fixed (8, K) blocks instead of four dense (m, m) panels.

    Returns (counts (m8, n_pt), cols/effs/vars/chis (m8, n_pt, K)) numpy
    arrays; rows past m and slots past counts are -1/garbage.  Caller
    retries with larger K if any count > K (`pallas_exact_hits`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mat0 = jnp.asarray(mat0, jnp.float32)
    mat1 = jnp.asarray(mat1, jnp.float32)
    n, m = mat0.shape
    m8 = -(-m // 8) * 8
    m_pad = -(-mat1.shape[1] // TJ) * TJ
    if m8 != m:
        mat0 = jnp.pad(mat0, ((0, 0), (0, m8 - m)))
    if m_pad != mat1.shape[1]:
        mat1 = jnp.pad(mat1, ((0, 0), (0, m_pad - mat1.shape[1])))
    n_at, n_pt = m8 // 8, m_pad // TJ
    kernel = _exact_kernel_factory(TJ, K, mask_mode, n_at, m)
    outs = pl.pallas_call(
        kernel,
        grid=(n_at, n_pt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chi_crit (1,)
            pl.BlockSpec((n, 8), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TJ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m8, n_pt * 128), jnp.int32),
            jax.ShapeDtypeStruct((m8, n_pt * K), jnp.int32),
            jax.ShapeDtypeStruct((m8, n_pt * K), jnp.float32),
            jax.ShapeDtypeStruct((m8, n_pt * K), jnp.float32),
            jax.ShapeDtypeStruct((m8, n_pt * K), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([chi_crit], jnp.float32), mat0, mat1,
      py.astype(jnp.float32)[:, None], pvp.astype(jnp.float32))
    cnt = np.asarray(outs[0]).reshape(m8, n_pt, 128)[:, :, 0]
    packed = [np.asarray(o).reshape(m8, n_pt, K) for o in outs[1:]]
    return (cnt, *packed)


def pallas_exact_hits(mat0, mat1, py, pvp, chi_crit, mask_mode="tri",
                      K=128, TJ=256, interpret: bool = False):
    """Host assembly over `pallas_exact_scan` with cap-retry: returns
    (i, j, eff, var, chi) numpy arrays of every chi > chi_crit pair."""
    while True:
        cnt, cols, effs, vars_, chis = pallas_exact_scan(
            mat0, mat1, py, pvp, chi_crit, mask_mode, K, TJ, interpret)
        mx = int(cnt.max()) if cnt.size else 0
        if mx <= K:
            break
        K = 1 << (mx - 1).bit_length()  # one retry always suffices: the
        # true per-(row, tile) hit count bounds every later extraction
    keep = cols >= 0
    ridx, _, _ = np.nonzero(keep)
    return (ridx.astype(np.int64), cols[keep].astype(np.int64), effs[keep],
            vars_[keep], chis[keep])


def _screen_extract_factory(K, m_true):
    """Kernel body for the in-VMEM screen hit extraction: one 8-row band of
    one hot (TILE x TILE) tile per grid step, hits compacted per row."""
    from jax.experimental import pallas as pl

    def kernel(tiles_ref, cut_ref, a_ref, b_ref, py_ref, cnt_ref, col_ref,
               eff_ref):
        g = pl.program_id(0)
        band = pl.program_id(1)
        ti = tiles_ref[g, 0]
        tj = tiles_ref[g, 1]
        cut = cut_ref[0]
        s8 = jnp.dot(
            (a_ref[:, :] * py_ref[:, :]).T, b_ref[:, :],
            preferred_element_type=jnp.float32,
        )  # (8, TILE)
        col_ids = tj * jnp.int32(TILE) + jax.lax.broadcasted_iota(
            jnp.int32, (1, TILE), 1)
        cnt_block = jnp.zeros((8, 128), dtype=jnp.int32)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0
        row_sel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        for a in range(8):  # unrolled: static row stores
            row_id = ti * jnp.int32(TILE) + band * jnp.int32(8) + jnp.int32(a)
            s_row = s8[a:a + 1, :]
            hit = (jnp.abs(s_row) > cut) & (col_ids > row_id) & (
                col_ids < jnp.int32(m_true)) & (row_id < jnp.int32(m_true))
            cnt, cols, (effs,) = _row_compact(hit, col_ids, [s_row], K)
            cnt_block = jnp.where(lane0 & (row_sel == a), cnt, cnt_block)
            col_ref[a, :] = cols
            eff_ref[a, :] = effs
        cnt_ref[:, :] = cnt_block

    return kernel


def pallas_extract_hot_tiles(mat_p, py, cut, tiles, m, K=128,
                             interpret: bool = False):
    """Phase 2 IN-KERNEL: recompute every hot (TILE, TILE) tile and compact
    its hits in VMEM — ONE Pallas program for the whole hot list, the tile
    coordinates scalar-prefetched so the block index maps DMA exactly the
    needed genotype columns.  HBM receives (8, K) compacted blocks instead
    of dense effect panels.

    mat_p: (n, m_pad) TILE-padded codings; tiles: (n_hot, 2) int32 tile
    coords; m: true SNP count (masks padding).  Returns per-row
    (counts (n_hot*TILE,), cols (n_hot*TILE, K), effs (n_hot*TILE, K));
    the row order is tiles-major then in-tile row.  Rows with count > K
    were truncated — the caller retries with a larger K."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = mat_p.shape[0]
    n_hot = tiles.shape[0]
    bands = TILE // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tiles, cut
        grid=(n_hot, bands),
        in_specs=[
            pl.BlockSpec((n, 8), lambda g, b, tiles, cut:
                         (0, tiles[g, 0] * bands + b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TILE), lambda g, b, tiles, cut:
                         (0, tiles[g, 1]), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda g, b, tiles, cut: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda g, b, tiles, cut:
                         (g * bands + b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda g, b, tiles, cut:
                         (g * bands + b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda g, b, tiles, cut:
                         (g * bands + b, 0), memory_space=pltpu.VMEM),
        ],
    )
    outs = pl.pallas_call(
        _screen_extract_factory(K, m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_hot * TILE, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_hot * TILE, K), jnp.int32),
            jax.ShapeDtypeStruct((n_hot * TILE, K), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(tiles, jnp.int32),
      jnp.asarray([cut], jnp.float32),
      mat_p, mat_p, py.astype(jnp.float32)[:, None])
    return (np.asarray(outs[0])[:, 0], np.asarray(outs[1]),
            np.asarray(outs[2]))


@partial(jax.jit, static_argnames=("cap", "m"))
def extract_tile_hits(mat, py, cut, ti, tj, m, cap=16384):
    """Phase 2 (XLA variant): recompute one (TI, TJ) tile and compact its
    hits with jnp.nonzero; kept as the fallback/reference for the Pallas
    in-kernel extraction above.

    `mat` must already be zero-padded to a TILE multiple (dynamic_slice
    clamps out-of-range starts, which would silently shift edge tiles);
    `m` is the true SNP count for masking the padding columns.
    """
    a = jax.lax.dynamic_slice_in_dim(mat, ti * TILE, TILE, axis=1)
    b = jax.lax.dynamic_slice_in_dim(mat, tj * TILE, TILE, axis=1)
    s = (a * py[:, None]).T @ b
    row_ids = ti * TILE + jnp.arange(TILE, dtype=jnp.int32)[:, None]
    col_ids = tj * TILE + jnp.arange(TILE, dtype=jnp.int32)[None, :]
    hit = (jnp.abs(s) > cut) & (col_ids > row_ids) & (col_ids < m)
    count = jnp.sum(hit)
    rr, cc = jnp.nonzero(hit, size=cap, fill_value=0)
    return count, ti * TILE + rr, tj * TILE + cc, s[rr, cc]


def pallas_screen(mat, py, cut, interpret: bool = False):
    """Full two-phase screen: (idx0, idx1, eff) numpy arrays of hits.

    Single-chip TPU entry; the CPU/test path uses interpret=True.

    NOTE: on tunneled/remote-compile TPU backends where Mosaic kernels cannot
    be compiled (e.g. a libtpu version skew between client and terminal),
    fall back to the XLA screen engine in gmat_tpu/scan/screen.py — it runs
    the same GEMM at MXU peak with the threshold/count fused by XLA.
    """
    mat = jnp.asarray(mat, dtype=jnp.float32)
    py = jnp.asarray(py, dtype=jnp.float32)
    n, m = mat.shape
    counts = np.asarray(pallas_screen_counts(mat, py, cut, interpret=interpret))
    m_pad = ((m + TILE - 1) // TILE) * TILE
    mat_p = jnp.pad(mat, ((0, 0), (0, m_pad - m))) if m_pad != m else mat
    hot = np.stack(np.nonzero(counts), axis=1).astype(np.int32)
    if not len(hot):
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.float32),)
    # phase 2 in-kernel, ONE program for all hot tiles; per-row cap with
    # retry (a tile-total count can't overflow a row cap sized from the
    # densest row, so one doubling loop converges)
    K = 128
    while True:
        row_cnt, cols, effs = pallas_extract_hot_tiles(
            mat_p, py, cut, hot, m, K=K, interpret=interpret)
        mx = int(row_cnt.max())
        if mx <= K:
            break
        K = 1 << (mx - 1).bit_length()
    keep = cols >= 0
    rrow, _ = np.nonzero(keep)
    band_row = rrow % TILE
    tile_of = hot[rrow // TILE, 0]
    return ((tile_of.astype(np.int64) * TILE + band_row),
            cols[keep].astype(np.int64),
            effs[keep])
