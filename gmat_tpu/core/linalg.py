"""Dense symmetric linear algebra helpers for the mixed-model core.

All Cholesky-based: on TPU `jnp.linalg.inv`'s LU path is slower and less
stable than a Cholesky solve for the SPD V / XᵀV⁻¹X matrices the REML loop
produces, and the log-determinant falls out of the factor for free (the
reference pays a separate slogdet + inv, uvlmm_varcom.py:47-48).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, cholesky


def chol_inv_logdet(a):
    """(A⁻¹, log|A|) for SPD A via one Cholesky factorization."""
    c = cholesky(a, lower=True)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(c)))
    inv = cho_solve((c, True), jnp.eye(a.shape[0], dtype=a.dtype))
    return inv, logdet


def projection_pieces(vinv, xmat):
    """P = V⁻¹ − V⁻¹X (XᵀV⁻¹X)⁻¹ XᵀV⁻¹ and log|XᵀV⁻¹X|.

    Matches the reference's P-matrix construction (uvlmm_varcom.py:50-55).
    """
    vx = vinv @ xmat
    xvx = xmat.T @ vx
    xvx_inv, ll_xvx = chol_inv_logdet(xvx)
    pmat = vinv - vx @ xvx_inv @ vx.T
    return pmat, ll_xvx


def sym_trace_product(a, b):
    """tr(A·B) for symmetric A, B — elementwise instead of a GEMM+diag.

    The reference computes np.trace(np.dot(P, ZGZᵀ)) (uvlmm_varcom.py:66),
    an O(n³) product for an O(n²) answer; ⟨A, B⟩_F is the TPU-friendly form.
    """
    return jnp.sum(a * b)
