"""Single-GRM REML via eigendecomposition — O(n^2) per iteration.

Parity: reference `uvlmm_varcom_eigen` (/root/reference/gmat/uvlmm/
uvlmm_varcom_eigen.py:5-78): rotate y and X by the GRM eigenvectors so
V becomes diagonal 1/(lam*sig2_g + sig2_e); AI-REML with the 0.02-step
EM-weight search.  Returns [var, eigvecs, eigvals] like the reference.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg as sla

from gmat_tpu import config  # noqa: F401

logger = logging.getLogger(__name__)


@jax.jit
def _eigen_step(var, lam, y, xmat):
    n = y.shape[0]
    vdiag = 1.0 / (lam * var[0] + var[1])  # V^-1 diagonal
    vx = vdiag[:, None] * xmat
    xvx_inv = jnp.linalg.inv(xmat.T @ vx)

    def project(v):
        return vdiag * (v - xmat @ (xvx_inv @ (vx.T @ v)))

    py = project(y)
    add_py = lam * py
    p_add_py = project(add_py)
    p_res_py = project(py)

    tr_vd = jnp.sum(vdiag * lam)
    tr_2d = jnp.sum((xmat.T @ (vdiag[:, None] * lam[:, None] * vx)) * xvx_inv)
    fd0 = 0.5 * (-tr_vd + tr_2d + jnp.dot(py, add_py))
    tr_vd = jnp.sum(vdiag)
    tr_2d = jnp.sum((xmat.T @ (vdiag[:, None] * vx)) * xvx_inv)
    fd1 = 0.5 * (-tr_vd + tr_2d + jnp.dot(py, py))
    fd = jnp.stack([fd0, fd1])

    ai = 0.5 * jnp.array(
        [
            [jnp.dot(add_py, p_add_py), jnp.dot(add_py, p_res_py)],
            [jnp.dot(add_py, p_res_py), jnp.dot(py, p_res_py)],
        ]
    )
    em = jnp.diag(n / (var * var))
    gammas = jnp.linspace(0.0, 1.0, 51)  # 0.02 grid (reference :62-63)

    def cand(g):
        return jnp.linalg.solve((1 - g) * ai + g * em, fd)

    deltas = jax.vmap(cand)(gammas)
    cands = var[None, :] + deltas
    ok = jnp.min(cands, axis=1) > 0
    idx = jnp.where(jnp.any(ok), jnp.argmax(ok), 50)
    delta = deltas[idx]
    var_new = var + delta
    cc = jnp.sqrt(jnp.sum(delta**2) / jnp.sum(var_new**2))
    return var_new, cc


def uvlmm_varcom_eigen(y, xmat, gmat, init=None, maxiter=100, cc=1.0e-8):
    eigval, eigvec = sla.eigh(np.asarray(gmat))
    y = np.asarray(y).reshape(-1)
    yr = eigvec.T @ y
    xr = eigvec.T @ np.asarray(xmat).reshape(len(y), -1)
    var = np.asarray(init, float) if init is not None else np.array(
        [np.var(yr) / 2] * 2
    )
    lam_d, y_d, x_d = jnp.asarray(eigval), jnp.asarray(yr), jnp.asarray(xr)
    for it in range(1, maxiter + 1):
        var_new, cc_val = _eigen_step(jnp.asarray(var), lam_d, y_d, x_d)
        var = np.asarray(var_new)
        logger.info("Round %d: cc %.3e vars %s", it, float(cc_val), var)
        if float(cc_val) < cc:
            break
    return [var, eigvec, eigval.reshape(-1, 1)]
