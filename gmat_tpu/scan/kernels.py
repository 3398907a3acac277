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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TILE = 512  # MXU-aligned tile edge (multiple of 128)


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


@partial(jax.jit, static_argnames=("cap", "m"))
def extract_tile_hits(mat, py, cut, ti, tj, m, cap=16384):
    """Phase 2: recompute one (TI, TJ) tile and compact its hits.

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
    out_i, out_j, out_e = [], [], []
    for ti, tj in zip(*np.nonzero(counts)):
        cnt, hi, hj, he = extract_tile_hits(mat_p, py, jnp.float32(cut),
                                            int(ti), int(tj), m)
        cnt = int(cnt)
        if cnt > 16384:
            # keep-almost-everything cuts: re-extract with a capacity that
            # fits (one extra compile at the larger cap — same retry contract
            # as the XLA engine, scan/screen.py::_run_screen)
            cap = 1 << int(cnt - 1).bit_length()
            cnt, hi, hj, he = extract_tile_hits(
                mat_p, py, jnp.float32(cut), int(ti), int(tj), m, cap=cap
            )
            cnt = int(cnt)
        out_i.append(np.asarray(hi)[:cnt])
        out_j.append(np.asarray(hj)[:cnt])
        out_e.append(np.asarray(he)[:cnt])
    if not out_i:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.float32),)
    return (np.concatenate(out_i).astype(np.int64),
            np.concatenate(out_j).astype(np.int64),
            np.concatenate(out_e))
