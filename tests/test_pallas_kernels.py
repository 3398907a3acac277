"""Pallas screen kernel vs the f64 oracle (interpret mode on the CPU mesh)."""
import numpy as np
import pytest

from gmat_tpu.scan.kernels import (
    TILE,
    extract_tile_hits,
    pallas_screen,
    pallas_screen_counts,
)


@pytest.fixture(scope="module")
def problem(rng):
    n, m = 96, 1100  # m deliberately not a TILE multiple
    geno = rng.choice([0.0, 1.0, 2.0], size=(n, m))
    freq = geno.sum(0) / (2 * n)
    mat = (geno - 2 * freq[None, :]).astype(np.float32)
    py = (rng.standard_normal(n) * 0.1).astype(np.float32)
    eff = (mat * py[:, None]).T @ mat
    return mat, py, eff


def test_counts_match_oracle(problem):
    import jax.numpy as jnp

    mat, py, eff = problem
    m = mat.shape[1]
    cut = np.quantile(np.abs(eff[np.triu_indices(m, 1)]), 0.995)
    counts = np.asarray(
        pallas_screen_counts(jnp.asarray(mat), jnp.asarray(py), cut,
                             interpret=True)
    )
    mask = (np.abs(eff) > cut) & (np.arange(m)[None, :] > np.arange(m)[:, None])
    m_pad = ((m + TILE - 1) // TILE) * TILE
    maskp = np.zeros((m_pad, m_pad), bool)
    maskp[:m, :m] = mask
    want = maskp.reshape(m_pad // TILE, TILE, m_pad // TILE, TILE).sum((1, 3))
    np.testing.assert_array_equal(counts, want)


def test_two_phase_hits_match_oracle(problem):
    mat, py, eff = problem
    m = mat.shape[1]
    cut = np.quantile(np.abs(eff[np.triu_indices(m, 1)]), 0.999)
    i0, i1, e = pallas_screen(mat, py, cut, interpret=True)
    want = {
        (a, b)
        for a, b in zip(*np.where(
            (np.abs(eff) > cut)
            & (np.arange(m)[None, :] > np.arange(m)[:, None])
        ))
    }
    assert set(zip(i0.tolist(), i1.tolist())) == want
    for a, b, ee in zip(i0[:20], i1[:20], e[:20]):
        assert abs(ee - eff[a, b]) < 1e-4 * max(1.0, abs(eff[a, b]))


def test_no_hits_and_padding_tiles(problem):
    mat, py, _ = problem
    i0, i1, e = pallas_screen(mat, py, 1e9, interpret=True)
    assert len(i0) == 0


def test_extraction_cap_retry(rng):
    """A keep-almost-everything cut overflows the 16384-hit tile capacity;
    the two-phase driver must re-extract with a larger cap instead of
    raising (same retry contract as scan/screen.py::_run_screen)."""
    n, m = 24, 700
    mat = rng.standard_normal((n, m)).astype(np.float32)
    py = rng.standard_normal(n).astype(np.float32) * 0.1
    i0, i1, e = pallas_screen(mat, py, 1e-7, interpret=True)
    eff = (mat * py[:, None]).T @ mat
    want = {
        (a, b)
        for a, b in zip(*np.where(
            (np.abs(eff) > 1e-7)
            & (np.arange(m)[None, :] > np.arange(m)[:, None])
        ))
    }
    assert len(want) > 16384  # the retry path is actually exercised
    assert set(zip(i0.tolist(), i1.tolist())) == want


@pytest.fixture(scope="module")
def exact_problem(rng):
    n, m = 64, 300  # m not a TJ multiple; n not 128-aligned
    geno = rng.choice([0.0, 1.0, 2.0], size=(n, m))
    freq = geno.sum(0) / (2 * n)
    mat = (geno - 2 * freq[None, :]).astype(np.float32)
    py = (rng.standard_normal(n) * 0.1).astype(np.float32)
    a = rng.standard_normal((n, n)).astype(np.float32) * 0.05
    pvp = (a @ a.T + np.eye(n, dtype=np.float32)).astype(np.float32)
    # f64 oracle for every ordered pair
    e = mat[:, :, None] * mat[:, None, :]  # (n, m, m)
    eff = np.einsum("n,nij->ij", py.astype(np.float64), e.astype(np.float64))
    pvpe = np.einsum("nk,kij->nij", pvp.astype(np.float64),
                     e.astype(np.float64))
    var = np.einsum("nij,nij->ij", e.astype(np.float64), pvpe)
    chi = eff * eff / var
    return mat, py, pvp, eff, var, chi


def _oracle_hits(chi, crit, mask_mode, slack=0.0):
    """Hit set at crit*(1 +/- slack): the kernel runs f32, the oracle f64,
    so pairs within f32 rounding of the threshold may legitimately flip."""
    m = chi.shape[0]
    ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    valid = (jj > ii) if mask_mode == "tri" else (jj != ii)
    with np.errstate(invalid="ignore"):
        mask = (chi > crit * (1.0 + slack)) & valid
    return {(a, b) for a, b in zip(ii[mask], jj[mask])}


def _assert_bracket(got, chi, crit, mask_mode):
    core = _oracle_hits(chi, crit, mask_mode, slack=1e-3)
    hull = _oracle_hits(chi, crit, mask_mode, slack=-1e-3)
    assert core <= got <= hull
    return core


@pytest.mark.parametrize("mask_mode", ["tri", "nodiag"])
def test_pallas_exact_fused_matches_oracle(exact_problem, mask_mode):
    from gmat_tpu.scan.kernels import pallas_exact_hits

    mat, py, pvp, eff, var, chi = exact_problem
    crit = float(np.nanquantile(
        chi[np.triu_indices(chi.shape[0], 1)], 0.98))
    i0, i1, e, v, c = pallas_exact_hits(mat, mat, py, pvp, crit,
                                        mask_mode=mask_mode, interpret=True)
    core = _assert_bracket(set(zip(i0.tolist(), i1.tolist())), chi, crit,
                           mask_mode)
    assert len(core) > 100
    np.testing.assert_allclose(e, eff[i0, i1], rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(v, var[i0, i1], rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(c, chi[i0, i1], rtol=4e-3, atol=1e-5)


def test_pallas_exact_cap_retry(exact_problem):
    """K=2 forces the doubling retry; the final hit set must be complete."""
    from gmat_tpu.scan.kernels import pallas_exact_hits

    mat, py, pvp, eff, var, chi = exact_problem
    crit = float(np.nanquantile(
        chi[np.triu_indices(chi.shape[0], 1)], 0.7))
    i0, i1, e, v, c = pallas_exact_hits(mat, mat, py, pvp, crit, K=2,
                                        interpret=True)
    core = _assert_bracket(set(zip(i0.tolist(), i1.tolist())), chi, crit,
                           "tri")
    assert len(core) > 2 * 300  # some row exceeded the K=2 capacity
