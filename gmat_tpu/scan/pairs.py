"""Exact epistasis score-test scans (epiAA / epiAD / epiDD) and pair tests.

Parity targets:
- `remma_epiAA`  (/root/reference/gmat/remma/remma_epiAA/remma_epiAA.py:16-86):
  strict upper-triangle scan over additive x additive pairs,
  columns `snp_0 snp_1 eff chi p_val`, keep p < p_cut.
- `remma_epiAD`  (remma_epiAD/remma_epiAD.py:50-90): full ordered rectangle
  (anchor over all SNPs, partner over all SNPs, i==j included),
  anchor additive-coded, partner dominance-coded.
- `remma_epiDD`  (remma_epiDD/remma_epiDD.py:50-92): triangular, both
  dominance-coded.
- `remma_epi*_pair` (remma_epiAA_pair.py:16-92): explicit pair lists,
  columns `snp_0 snp_1 eff var chi p`.
- `*_parallel` (remma_epiAA.py:109-140): balanced triangular anchor split.

Per pair (i, j) with epistasis covariate e = m_i ⊙ m_j (elementwise over
individuals):   eff = eᵀ·pymat,   var = eᵀ·pvpmat·e,   chi = eff²/var.

TPU-first design: the per-anchor partner sweep is a batched GEMM —
vmap over a tile of anchors of (pvpmat @ E) with E = m_i ⊙ M, giving
MXU-shaped (n x n x tile·m) contractions; chi/p computed on device; the
host only filters p < p_cut per tile and appends rows (file contract
preserved).  The anchor tiling doubles as the unit of multi-chip sharding
(gmat_tpu/dist/mesh.py).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gmat_tpu.config import ScanConfig
from gmat_tpu.core.coding import additive_code, dominance_code
from gmat_tpu.core.stats import chi2_sf
from gmat_tpu.io.pheno import design_matrix
from gmat_tpu.scan.common import prepare_genotypes, score_pieces

logger = logging.getLogger(__name__)

_HEADER_SCAN = "snp_0 snp_1 eff chi p_val"
_HEADER_PAIR = "snp_0 snp_1 eff var chi p"


def _one_anchor(a_col, mat0, mat1, pymat, pvpmat):
    e = mat0[:, a_col][:, None] * mat1  # (n, m)
    eff = e.T @ pymat
    var = jnp.sum(e * (pvpmat @ e), axis=0)
    return eff, var


@jax.jit
def _anchor_tile_kernel(anchor_cols, mat0, mat1, pymat, pvpmat):
    """(TA,) anchors -> eff, chi, p over the full partner axis: (TA, m)."""
    eff, var = jax.vmap(_one_anchor, in_axes=(0, None, None, None, None))(
        anchor_cols, mat0, mat1, pymat, pvpmat
    )
    chi = eff * eff / var
    return eff, var, chi, chi2_sf(chi, 1)


@jax.jit
def _pair_kernel(cols0, cols1, mat0, mat1, pymat, pvpmat):
    e = mat0[:, cols0] * mat1[:, cols1]  # (n, B)
    eff = e.T @ pymat
    var = jnp.sum(e * (pvpmat @ e), axis=0)
    chi = eff * eff / var
    return eff, var, chi, chi2_sf(chi, 1)


def _scan_anchors(mat0, mat1, pieces, snp_lst_0, num_snp, triangular, p_cut,
                  out_file, tile=None):
    """Device-tiled anchor sweep; host filters p<p_cut and appends rows."""
    import time

    tile = tile or ScanConfig.anchor_tile
    np.savetxt(out_file, [_HEADER_SCAN], fmt="%s")
    anchors = np.asarray(list(snp_lst_0), dtype=np.int32)
    partner_ids = np.arange(num_snp)
    clock_t0 = time.perf_counter()
    with open(out_file, "a") as fout:
        for start in range(0, len(anchors), tile):
            batch = anchors[start:start + tile]
            pad = tile - len(batch)
            padded = np.pad(batch, (0, pad), constant_values=batch[-1])
            eff, var, chi, p = (
                np.asarray(a)
                for a in _anchor_tile_kernel(
                    jnp.asarray(padded), mat0, mat1, pieces.pymat, pieces.pvpmat
                )
            )
            for b, i in enumerate(batch):
                js = partner_ids[i + 1:] if triangular else partner_ids
                row_p = p[b, i + 1:] if triangular else p[b]
                keep = row_p < p_cut
                if not np.any(keep):
                    continue
                sel = js[keep]
                df = pd.DataFrame(
                    {
                        0: np.full(sel.shape, i, dtype=np.int64),
                        1: sel.astype(np.int64),
                        2: (eff[b, i + 1:] if triangular else eff[b])[keep],
                        3: (chi[b, i + 1:] if triangular else chi[b])[keep],
                        4: row_p[keep],
                    }
                )
                df.to_csv(fout, sep=" ", header=False, index=False)
    # scan-timing log contract (reference remma_epiAA.py:69-85 logs clock/CPU
    # time around the anchor loop); pairs/s is the TPU throughput analog
    dt = time.perf_counter() - clock_t0
    n_pairs = (
        int(np.sum(num_snp - 1 - anchors)) if triangular
        else len(anchors) * num_snp
    )
    logger.info("Exact scan: %d anchors, %d tests in %.3f s (%.3g pairs/s)",
                len(anchors), n_pairs, dt, n_pairs / max(dt, 1e-9))
    return 0


_CODINGS = {
    "AA": (additive_code, additive_code, True),
    "AD": (additive_code, dominance_code, False),
    "DD": (dominance_code, dominance_code, True),
}


def _epi_setup(pheno_file, bed_prefix, gmat_lst, var_com, kind):
    code0, code1, triangular = _CODINGS[kind]
    dm = design_matrix(pheno_file, bed_prefix)
    pieces = score_pieces(dm, gmat_lst, var_com)
    geno, _, _ = prepare_genotypes(bed_prefix)
    g = jnp.asarray(geno)
    mat0, _, _ = code0(g)
    mat1, _, _ = code1(g)
    return mat0, mat1, pieces, geno.shape[1], triangular


def _validate_anchors(snp_lst_0, num_snp, triangular):
    hi = num_snp - 1 if triangular else num_snp
    if snp_lst_0 is None:
        return range(hi)
    if max(snp_lst_0) >= hi or min(snp_lst_0) < 0:
        raise ValueError("snp_lst_0 is out of range!")
    return snp_lst_0


def _remma_epi(kind, pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0,
               p_cut, out_file, tile=None):
    mat0, mat1, pieces, num_snp, triangular = _epi_setup(
        pheno_file, bed_prefix, gmat_lst, var_com, kind
    )
    snp_lst_0 = _validate_anchors(snp_lst_0, num_snp, triangular)
    return _scan_anchors(mat0, mat1, pieces, snp_lst_0, num_snp, triangular,
                         p_cut, out_file, tile=tile)


def remma_epiAA(pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0=None,
                p_cut=1.0e-5, out_file="epiAA"):
    """Exhaustive additive x additive scan (strict upper triangle)."""
    return _remma_epi("AA", pheno_file, bed_prefix, gmat_lst, var_com,
                      snp_lst_0, p_cut, out_file)


def remma_epiAD(pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0=None,
                p_cut=1.0e-5, out_file="epiAD"):
    """Exhaustive additive x dominance scan (full ordered rectangle)."""
    return _remma_epi("AD", pheno_file, bed_prefix, gmat_lst, var_com,
                      snp_lst_0, p_cut, out_file)


def remma_epiDD(pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0=None,
                p_cut=1.0e-5, out_file="epiDD"):
    """Exhaustive dominance x dominance scan (strict upper triangle)."""
    return _remma_epi("DD", pheno_file, bed_prefix, gmat_lst, var_com,
                      snp_lst_0, p_cut, out_file)


def balanced_anchor_split(num_snp: int, n_parts: int, part: int,
                          triangular: bool = True) -> list[int]:
    """Balanced triangular anchor split for manual multi-machine sharding.

    Pairs block (part-1) with block (2*n_parts - part) so every worker sees
    the same pair count (reference remma_epiAA.py:126-137; the AD variant
    caps at num_snp instead of num_snp-1, remma_epiAD.py:133-142).
    """
    num_snp_part = num_snp // (2 * n_parts)
    p0 = (part - 1) * num_snp_part
    p1 = part * num_snp_part
    p2 = (2 * n_parts - part) * num_snp_part
    p3 = (2 * n_parts - part + 1) * num_snp_part
    if part == 1:
        p3 = num_snp - 1 if triangular else num_snp
    return list(range(p0, p1)) + list(range(p2, p3))


def _remma_epi_parallel(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                        parallel, p_cut, out_file):
    from gmat_tpu.io.bed import read_bim

    num_snp = len(read_bim(bed_prefix + ".bim"))
    triangular = _CODINGS[kind][2]
    snp_lst_0 = balanced_anchor_split(num_snp, parallel[0], parallel[1],
                                      triangular=triangular)
    logger.info("Parallel part %d/%d: %d anchors", parallel[1], parallel[0],
                len(snp_lst_0))
    return _remma_epi(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                      snp_lst_0, p_cut, f"{out_file}.{parallel[1]}")


def remma_epiAA_parallel(pheno_file, bed_prefix, gmat_lst, var_com, parallel,
                         p_cut=1.0e-5, out_file="epiAA_parallel"):
    return _remma_epi_parallel("AA", pheno_file, bed_prefix, gmat_lst,
                               var_com, parallel, p_cut, out_file)


def remma_epiAD_parallel(pheno_file, bed_prefix, gmat_lst, var_com, parallel,
                         p_cut=1.0e-5, out_file="epiAD_parallel"):
    return _remma_epi_parallel("AD", pheno_file, bed_prefix, gmat_lst,
                               var_com, parallel, p_cut, out_file)


def remma_epiDD_parallel(pheno_file, bed_prefix, gmat_lst, var_com, parallel,
                         p_cut=1.0e-5, out_file="epiDD_parallel"):
    return _remma_epi_parallel("DD", pheno_file, bed_prefix, gmat_lst,
                               var_com, parallel, p_cut, out_file)


def _remma_epi_pair(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                    snp_pair_file, max_test_pair, p_cut, out_file):
    """Exact test for an explicit pair list, chunked max_test_pair at a time
    (reference remma_epiAA_pair.py:16-92)."""
    mat0, mat1, pieces, num_snp, _ = _epi_setup(
        pheno_file, bed_prefix, gmat_lst, var_com, kind
    )
    pairs = pd.read_csv(snp_pair_file, sep=r"\s+", usecols=[0, 1],
                        skiprows=1, header=None).to_numpy(dtype=np.int64)
    if pairs.size and (pairs.max() > num_snp - 1 or pairs.min() < 0):
        raise ValueError("snp_pair is out of range!")
    np.savetxt(out_file, [_HEADER_PAIR], fmt="%s")
    with open(out_file, "a") as fout:
        for start in range(0, len(pairs), max_test_pair):
            chunk = pairs[start:start + max_test_pair]
            eff, var, chi, p = (
                np.asarray(a)
                for a in _pair_kernel(
                    jnp.asarray(chunk[:, 0]), jnp.asarray(chunk[:, 1]),
                    mat0, mat1, pieces.pymat, pieces.pvpmat,
                )
            )
            keep = p < p_cut
            df = pd.DataFrame(
                {
                    0: chunk[keep, 0].astype(np.int64),
                    1: chunk[keep, 1].astype(np.int64),
                    2: eff[keep],
                    3: var[keep],
                    4: chi[keep],
                    5: p[keep],
                }
            )
            df.to_csv(fout, sep=" ", header=False, index=False)
    return 0


def remma_epiAA_pair(pheno_file, bed_prefix, gmat_lst, var_com, snp_pair_file,
                     max_test_pair=50000, p_cut=1.0e-4, out_file="epiAA_pair"):
    return _remma_epi_pair("AA", pheno_file, bed_prefix, gmat_lst, var_com,
                           snp_pair_file, max_test_pair, p_cut, out_file)


def remma_epiAD_pair(pheno_file, bed_prefix, gmat_lst, var_com, snp_pair_file,
                     max_test_pair=50000, p_cut=1.0e-4, out_file="epiAD_pair"):
    return _remma_epi_pair("AD", pheno_file, bed_prefix, gmat_lst, var_com,
                           snp_pair_file, max_test_pair, p_cut, out_file)


def remma_epiDD_pair(pheno_file, bed_prefix, gmat_lst, var_com, snp_pair_file,
                     max_test_pair=50000, p_cut=1.0e-4, out_file="epiDD_pair"):
    return _remma_epi_pair("DD", pheno_file, bed_prefix, gmat_lst, var_com,
                           snp_pair_file, max_test_pair, p_cut, out_file)
