"""Statistical helpers (device-side chi-square tail probabilities).

The reference calls scipy.stats.chi2.sf on host arrays
(e.g. remma_epiAA.py:77).  On device we use erfc for df=1 (exact identity,
more accurate in the far tail) and the regularized upper incomplete gamma
for general df.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfc, gammaincc


def chi2_sf(x, df: int = 1):
    """P[Chi2_df > x]; vectorized, float64-accurate under x64."""
    x = jnp.asarray(x)
    if df == 1:
        return erfc(jnp.sqrt(jnp.maximum(x, 0.0) / 2.0))
    return gammaincc(df / 2.0, jnp.maximum(x, 0.0) / 2.0)


def chi2_isf(p, df: int = 1):
    """Inverse survival (host scalar; used for p_cut -> effect thresholds,
    reference remma_epiAA_eff.py:72-73)."""
    from scipy.stats import chi2

    return float(chi2.isf(p, df))
