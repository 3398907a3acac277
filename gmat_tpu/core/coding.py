"""Genotype codings and scale factors (jittable, device-side).

Semantics pinned to the reference:
- additive coding: freq p = sum(g)/2n, centered g - 2p, scale = sum(2p(1-p))
  (`/root/reference/gmat/gmatrix/gmatrix.py:53-58`, `remma/remma_add.py:54-57`)
- dominance coding: scale_vec = 2p(1-p); het-recode g in {0,1,2} -> {0,1,0}
  (implemented as g>1.5 -> 0), centered by scale_vec; scale = sum(s(1-s))
  (`gmatrix.py:116-122`, `remma/remma_dom.py:54-60`)

All functions are pure jnp and fuse into downstream GEMMs under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def allele_freq(geno):
    """Per-SNP allele frequency p = sum(g) / (2 * num_id).  geno: (n, m)."""
    return jnp.sum(geno, axis=0) / (2.0 * geno.shape[0])


def additive_scale(freq):
    """sum_j 2 p_j (1 - p_j)  — the additive GRM/SNP-BLUP denominator."""
    return jnp.sum(2.0 * freq * (1.0 - freq))


def dominance_scale(freq):
    """sum_j s_j (1 - s_j) with s_j = 2 p_j (1 - p_j)."""
    s = 2.0 * freq * (1.0 - freq)
    return jnp.sum(s * (1.0 - s))


def additive_code(geno, freq=None):
    """Centered additive coding M = g - 2p; returns (M, freq, scale)."""
    if freq is None:
        freq = allele_freq(geno)
    return geno - 2.0 * freq[None, :], freq, additive_scale(freq)


def dominance_code(geno, freq=None):
    """Centered dominance coding: het indicator minus 2p(1-p).

    Returns (D, freq, scale).  Matches the reference's in-place
    `snp_mat[snp_mat > 1.5] = 0; snp_mat -= scale_vec` (gmatrix.py:121-122).
    """
    if freq is None:
        freq = allele_freq(geno)
    s = 2.0 * freq * (1.0 - freq)
    het = jnp.where(geno > 1.5, 0.0, geno)
    return het - s[None, :], freq, dominance_scale(freq)
