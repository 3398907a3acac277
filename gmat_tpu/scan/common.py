"""Shared score-test machinery for the REMMA engine.

Every REMMA test needs the same two projections of the phenotype under the
null random-SNP-BLUP model (reference remma_add.py:27-46, remma_epiAA.py:31-49):

    pymat  = Zᵀ P y          (n_id,)
    pvpmat = Zᵀ P Z          (n_id, n_id)   [uses the PVP = P identity]

with P = V⁻¹ − V⁻¹X(XᵀV⁻¹X)⁻¹XᵀV⁻¹ and V = Σ_i σ²_i Z G_i Zᵀ + σ²_e I.

Computed once per (model, variance) pair on device via Cholesky, then reused
by every scan.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gmat_tpu.core.linalg import (chol_inv_logdet, mixed_inv_psd,
                                  projection_pieces)
from gmat_tpu.io.pheno import DesignMatrices
from gmat_tpu.reml.wemai import _resolve_precision, build_zgzt_stack


@dataclass(frozen=True)
class ScorePieces:
    pymat: jnp.ndarray  # (n_id,)
    pvpmat: jnp.ndarray  # (n_id, n_id)


@partial(jax.jit, static_argnums=(5, 6))
def _pieces_kernel(var_com, y, xmat, zg_stack, rec_ids, n_col, mixed=False):
    n = y.shape[0]
    vmat = jnp.einsum("k,kij->ij", var_com[:-1], zg_stack)
    vmat = vmat + var_com[-1] * jnp.eye(n, dtype=vmat.dtype)
    # on TPU the f64 Cholesky is EMULATED at ~f32 accuracy (CLAUDE.md);
    # the mixed path (f32 MXU Cholesky + split-precision Newton, see
    # core/linalg.mixed_inv_psd) is both faster and closer to true f64
    vinv, _ = mixed_inv_psd(vmat) if mixed else chol_inv_logdet(vmat)
    pmat, _ = projection_pieces(vinv, xmat, mixed=mixed)
    py = pmat @ y
    pymat = jax.ops.segment_sum(py, rec_ids, num_segments=n_col)
    zp = jax.ops.segment_sum(pmat, rec_ids, num_segments=n_col)  # Zᵀ P
    pvpmat = jax.ops.segment_sum(zp.T, rec_ids, num_segments=n_col)
    return pymat, pvpmat


def score_pieces(dm: DesignMatrices, gmat_lst, var_com) -> ScorePieces:
    pymat, pvpmat = _pieces_kernel(
        jnp.asarray(np.asarray(var_com, dtype=np.float64)),
        jnp.asarray(dm.y),
        jnp.asarray(dm.xmat),
        build_zgzt_stack(dm, gmat_lst),
        jnp.asarray(dm.rec_ids),
        dm.n_col,
        _resolve_precision("auto"),
    )
    return ScorePieces(pymat=pymat, pvpmat=pvpmat)


def prepare_genotypes(bed_prefix: str, impute_seed: int = 0):
    """Read + (deterministically) impute genotypes; returns (geno, bim, fam)."""
    from gmat_tpu.io.bed import Bed, impute_geno

    bed = Bed(bed_prefix)
    geno = bed.read()
    if np.any(np.isnan(geno)):
        geno = impute_geno(geno, seed=impute_seed)
    return geno, bed.bim, bed.fam


_DEVICE_GENO_CACHE: dict = {}


def prepare_genotypes_device(bed_prefix: str, impute_seed: int = 0):
    """`prepare_genotypes` with a size-1 DEVICE-resident cache of the
    (n, m) genotype panel, keyed by (path, .bed mtime, seed).

    The approx pipelines run three stages against the same panel
    (calibrate -> screen -> exact re-test, reference
    remma_epiAA_approx.py:10-53) and each would otherwise re-upload it —
    ~70 s per upload at yeast scale through the ~13 MB/s tunneled device.
    Returns (geno_device (n, m) float64, num_snp)."""
    import os as _os

    key = (str(bed_prefix),
           _os.path.getmtime(str(bed_prefix) + ".bed"), impute_seed)
    if _DEVICE_GENO_CACHE.get("key") != key:
        geno, _, _ = prepare_genotypes(bed_prefix, impute_seed)
        _DEVICE_GENO_CACHE.clear()
        _DEVICE_GENO_CACHE.update(key=key, dev=jnp.asarray(geno))
    dev = _DEVICE_GENO_CACHE["dev"]
    return dev, dev.shape[1]
