"""Henderson-MME REML variants (research-grade family of the reference).

Parity targets (/root/reference/gmat/uvlmm/uvlmm_varcom.py:170-464 and
uvlmm/varcom/em.py:8-166):
- `em_mme`      single-GRM-inverse EM (uvlmm_varcom.py:170-213)
- `pxem_mme`    parameter-expanded EM (:216-263)
- `ai_mme`      pure AI updates (:266-321)
- `emai_mme`    AI with 0.1-step EM-weight fallback (:324-389)
- `pxemai_mme`  PX-accelerated emai (:392-464)
- `em_mme_multi`  multi-GRM MME EM (varcom/em.py:8-77)
- `em_vmat`     V-based EM with AI-free diagonal update (varcom/em.py:80-166;
  the reference references an undefined `cc_gra` there — here it is a proper
  argument, documented deviation)

All share one MME core: C = [X Z]ᵀ[X Z]/sig2_e + blockdiag(G_k^-1/sig2_k),
inverted once per iteration on device.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from gmat_tpu import config  # noqa: F401

logger = logging.getLogger(__name__)


def _mme_setup(y, xmat, gmat_inv):
    y = jnp.asarray(np.asarray(y, float).reshape(-1))
    xmat = jnp.asarray(np.asarray(xmat, float).reshape(len(y), -1))
    g_inv = jnp.asarray(np.asarray(gmat_inv, float))
    p = xmat.shape[1]
    q = g_inv.shape[0]
    wmat = jnp.concatenate([xmat, jnp.eye(q, dtype=xmat.dtype)], axis=1)
    coef_pre = jnp.eye(p + q)
    coef_pre = coef_pre.at[:p, :p].set(xmat.T @ xmat)
    coef_pre = coef_pre.at[:p, p:].set(xmat.T)
    coef_pre = coef_pre.at[p:, :p].set(xmat)
    return y, xmat, g_inv, wmat, coef_pre, p, q


@jax.jit
def _mme_solve(var, y, xmat, g_inv, wmat, coef_pre):
    p = xmat.shape[1]
    coef = coef_pre / var[1]
    coef = coef.at[p:, p:].add(g_inv / var[0])
    coef_inv = jnp.linalg.inv(coef)
    eff = coef_inv @ (wmat.T @ y) / var[1]
    e_hat = y - xmat @ eff[:p] - eff[p:]
    return coef_inv, eff, e_hat


def _em_update(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n):
    u = eff[p:]
    v0 = (u @ (g_inv @ u) + jnp.sum(g_inv * coef_inv[p:, p:])) / q
    v1 = (jnp.dot(e_hat, e_hat)
          + jnp.sum((wmat @ coef_inv) * wmat)) / n
    return jnp.stack([v0, v1])


def _gamma_px(eff, e_hat, y, xmat, coef_inv, p):
    u = eff[p:]
    g1 = jnp.dot(u, y - xmat @ eff[:p]) - jnp.trace(xmat @ coef_inv[:p, p:])
    g2 = jnp.dot(u, u) + jnp.trace(coef_inv[p:, p:])
    return g1 / g2


def _fd_ai(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n):
    u = eff[p:]
    fd0 = q / var[0] - jnp.sum(coef_inv[p:, p:] * g_inv) / var[0] ** 2 \
        - u @ (g_inv @ u) / var[0] ** 2
    fd1 = n / var[1] - jnp.sum((coef_inv @ wmat.T) * wmat.T) / var[1] ** 2 \
        - jnp.dot(e_hat, e_hat) / var[1] ** 2
    fd = -0.5 * jnp.stack([fd0, fd1])
    h = jnp.stack([u / var[0], e_hat / var[1]], axis=1)
    qrq = (h.T @ h) / var[-1]
    left = (wmat.T @ h) / var[-1]
    ai = 0.5 * (qrq - left.T @ (coef_inv @ left))
    return fd, ai


def _loop(y, xmat, gmat_inv, init, maxiter, cc, update_fn):
    y, xmat, g_inv, wmat, coef_pre, p, q = _mme_setup(y, xmat, gmat_inv)
    n = y.shape[0]
    var = np.asarray(init, float) if init is not None else np.ones(2)
    cc_val = 1e30
    for it in range(1, maxiter + 1):
        coef_inv, eff, e_hat = _mme_solve(jnp.asarray(var), y, xmat, g_inv,
                                          wmat, coef_pre)
        var_new = np.asarray(
            update_fn(jnp.asarray(var), coef_inv, eff, e_hat, g_inv, wmat,
                      xmat, y, p, q, n)
        )
        delta = var_new - var
        cc_val = np.sqrt(np.sum(delta**2) / np.sum(var_new**2))
        var = var_new
        logger.info("Round %d: %s (cc %.3e)", it, var, cc_val)
        if cc_val < cc:
            logger.info("Variances converged.")
            break
    return var


def em_mme(y, xmat, gmat_inv, init=None, maxiter=100, cc=1.0e-8):
    def upd(var, coef_inv, eff, e_hat, g_inv, wmat, xmat_, y_, p, q, n):
        return _em_update(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n)

    return _loop(y, xmat, gmat_inv, init, maxiter, cc, upd)


def pxem_mme(y, xmat, gmat_inv, init=None, maxiter=100, cc=1.0e-8):
    def upd(var, coef_inv, eff, e_hat, g_inv, wmat, xmat_, y_, p, q, n):
        v = _em_update(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n)
        gamma = _gamma_px(eff, e_hat, y_, xmat_, coef_inv, p)
        return v.at[0].multiply(gamma * gamma)

    return _loop(y, xmat, gmat_inv, init, maxiter, cc, upd)


def ai_mme(y, xmat, gmat_inv, init=None, maxiter=100, cc=1.0e-8):
    def upd(var, coef_inv, eff, e_hat, g_inv, wmat, xmat_, y_, p, q, n):
        fd, ai = _fd_ai(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n)
        return var + jnp.linalg.solve(ai, fd)

    return _loop(y, xmat, gmat_inv, init, maxiter, cc, upd)


def _weighted_ai(var, fd, ai, em, grid):
    def cand(g):
        return jnp.linalg.solve((1 - g) * ai + g * em, fd)

    deltas = jax.vmap(cand)(grid)
    cands = var[None, :] + deltas
    ok = jnp.min(cands, axis=1) > 0
    idx = jnp.where(jnp.any(ok), jnp.argmax(ok), len(grid) - 1)
    return cands[idx]


def emai_mme(y, xmat, gmat_inv, init=None, maxiter=100, cc=1.0e-8):
    """AI with 0.1-step EM-weight fallback (reference :370-377 grid)."""
    # reference grid is literally j*0.1 for j in 0..50 — it runs PAST 1.0
    # (uvlmm_varcom.py:370-371); kept verbatim for parity
    grid = jnp.linspace(0.0, 5.0, 51)

    def upd(var, coef_inv, eff, e_hat, g_inv, wmat, xmat_, y_, p, q, n):
        fd, ai = _fd_ai(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n)
        em = jnp.diag(jnp.array([q, n]) / (var * var))
        return _weighted_ai(var, fd, ai, em, grid)

    return _loop(y, xmat, gmat_inv, init, maxiter, cc, upd)


def pxemai_mme(y, xmat, gmat_inv, init=None, maxiter=100, cc=1.0e-8):
    grid = jnp.linspace(0.0, 5.0, 51)  # same >1 quirk as emai_mme

    def upd(var, coef_inv, eff, e_hat, g_inv, wmat, xmat_, y_, p, q, n):
        fd, ai = _fd_ai(var, coef_inv, eff, e_hat, g_inv, wmat, p, q, n)
        em = jnp.diag(jnp.array([q, n]) / (var * var))

        def cand(g):
            return jnp.linalg.solve((1 - g) * ai + g * em, fd)

        deltas = jax.vmap(cand)(grid)
        cands = var[None, :] + deltas
        ok = jnp.min(cands, axis=1) > 0
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), len(grid) - 1)
        var_new = cands[idx]
        gamma_w = grid[idx]
        px = _gamma_px(eff, e_hat, y_, xmat_, coef_inv, p)
        # reference applies the PX rescale only when the EM weight > 0.001
        return jnp.where(gamma_w > 0.001,
                         var_new.at[0].multiply(px * px), var_new)

    return _loop(y, xmat, gmat_inv, init, maxiter, cc, upd)


def em_mme_multi(y, xmat, zmat_lst, gmat_inv_lst, init=None, maxiter=100,
                 cc_par=1.0e-8):
    """Multi-GRM MME EM (reference varcom/em.py:8-77).  zmat_lst entries are
    dense (n_rec, q_k) incidence matrices."""
    y = np.asarray(y, float).reshape(-1)
    xmat = np.asarray(xmat, float).reshape(len(y), -1)
    zs = [np.asarray(z.todense()) if hasattr(z, "todense") else np.asarray(z)
          for z in zmat_lst]
    xz = np.concatenate([xmat] + zs, axis=1)
    xz_d = jnp.asarray(xz)
    coef_null = xz_d.T @ xz_d
    rhs_null = xz_d.T @ jnp.asarray(y)
    p = xmat.shape[1]
    qs = [g.shape[0] for g in gmat_inv_lst]
    offs = np.concatenate([[p], p + np.cumsum(qs)])
    g_ds = [jnp.asarray(np.asarray(g, float)) for g in gmat_inv_lst]
    var = np.asarray(init, float) if init is not None else np.ones(len(qs) + 1)

    @jax.jit
    def step(var_):
        coef = coef_null / var_[-1]
        for k, g in enumerate(g_ds):
            a, b = int(offs[k]), int(offs[k + 1])
            coef = coef.at[a:b, a:b].add(g / var_[k])
        coef_inv = jnp.linalg.inv(coef)
        eff = coef_inv @ (rhs_null / var_[-1])
        e_hat = jnp.asarray(y) - xz_d @ eff
        v_res = (jnp.dot(e_hat, e_hat) + jnp.sum(coef_null * coef_inv)) / len(y)
        news = []
        for k, g in enumerate(g_ds):
            a, b = int(offs[k]), int(offs[k + 1])
            u = eff[a:b]
            news.append((jnp.sum(coef_inv[a:b, a:b] * g) + u @ (g @ u)) / qs[k])
        return jnp.stack(news + [v_res])

    cc_val = 1e30
    for it in range(1, maxiter + 1):
        var_new = np.asarray(step(jnp.asarray(var)))
        delta = var_new - var
        cc_val = np.sqrt(np.sum(delta**2) / np.sum(var_new**2))
        var = var_new
        logger.info("Round %d: %s (cc %.3e)", it, var, cc_val)
        if cc_val < cc_par:
            logger.info("Variances converged.")
            break
    return var


def em_vmat(y, xmat, zmat_lst, gmat_lst, init=None, maxiter=100,
            cc_par=1.0e-8, cc_gra=1.0e-6):
    """V-based diagonal-EM updates (reference varcom/em.py:80-166; the
    undefined-`cc_gra` bug there is fixed by taking it as a parameter)."""
    from gmat_tpu.core.linalg import chol_inv_logdet, projection_pieces

    y = np.asarray(y, float).reshape(-1)
    n = len(y)
    xmat_d = jnp.asarray(np.asarray(xmat, float).reshape(n, -1))
    zg = jnp.stack(
        [
            jnp.asarray(
                np.asarray(
                    z @ (z @ np.asarray(g)).T
                    if not hasattr(z, "dot")
                    else z.dot(z.dot(np.asarray(g)).T)
                )
            )
            for z, g in zip(zmat_lst, gmat_lst)
        ]
    )
    y_d = jnp.asarray(y)
    var = np.asarray(init, float) if init is not None else np.ones(len(gmat_lst) + 1)

    @jax.jit
    def step(var_):
        vmat = jnp.einsum("k,kij->ij", var_[:-1], zg)
        vmat = vmat + var_[-1] * jnp.eye(n)
        vinv, _ = chol_inv_logdet(vmat)
        pmat, _ = projection_pieces(vinv, xmat_d)
        py = pmat @ y_d
        tr_terms = jnp.einsum("ij,kij->k", pmat, zg)
        quad = jnp.einsum("i,kij,j->k", py, zg, py)
        fd = 0.5 * jnp.concatenate(
            [-tr_terms + quad,
             (-jnp.trace(pmat) + jnp.dot(py, py))[None]]
        )
        delta = (2.0 * var_ * var_ / n) * fd
        return var_ + delta, fd

    cc_par_val = cc_gra_val = 1e30
    for it in range(1, maxiter + 1):
        var_new, fd = step(jnp.asarray(var))
        var_new, fd = np.asarray(var_new), np.asarray(fd)
        delta = var_new - var
        cc_par_val = np.sqrt(np.sum(delta**2) / np.sum(var_new**2))
        cc_gra_val = np.sqrt(np.sum(fd**2))
        var = var_new
        logger.info("Round %d: %s (cc %.3e grad %.3e)", it, var, cc_par_val,
                    cc_gra_val)
        if cc_gra_val < cc_gra and cc_par_val < cc_par:
            logger.info("Variances converged.")
            break
    return var
