"""FULL-TABLE parity vs the reference (BASELINE.md north-star #1).

tests/golden/epi_full.npz holds the reference's complete mouse exact-scan
tables — all 989,121 epiAA pairs, 1,979,649 epiAD ordered pairs and 989,121
epiDD pairs (eff/chi/p stored float32: 6e-8 quantization << the 1e-6 parity
tolerance; a 2,000-row float64 subset pins tight agreement at rtol 1e-9).
Generated once by tools/gen_golden_full.py from the reference oracle
(/root/reference/gmat/remma/remma_epiAA/remma_epiAA.py:16-86 and the AD/DD
twins).
"""
import numpy as np
import pandas as pd
import pytest

from conftest import GOLDEN


@pytest.fixture(scope="module")
def full_setup(mouse_geno):
    import jax.numpy as jnp

    from gmat_tpu.grm.grm import additive_grm

    gold = np.load(GOLDEN / "epi_full.npz")
    ag = np.asarray(additive_grm(jnp.asarray(mouse_geno)))
    return gold, [ag, ag * ag], gold["var_com"]


def _load_table(path):
    df = pd.read_csv(path, sep=" ", header=0)
    return df.to_numpy()


def _assert_table(tab, gold, name, m, kind):
    if kind == "ad":
        want0 = np.repeat(np.arange(m), m)
        want1 = np.tile(np.arange(m), m)
    else:
        want0, want1 = np.triu_indices(m, k=1)
    assert tab.shape[0] == len(want0), f"{name}: row count"
    np.testing.assert_array_equal(tab[:, 0].astype(np.int64), want0)
    np.testing.assert_array_equal(tab[:, 1].astype(np.int64), want1)
    # eff/chi/p vs the reference across EVERY pair; golden is f32 so allow
    # its quantization on top of the 1e-6 parity budget.  chi/p additionally
    # get a small ABSOLUTE floor: for near-degenerate pairs (nearly-constant
    # product column, e.g. DD pair (165,201): eff~1e-5, var~4.5e-10) var is
    # a catastrophic cancellation whose last ~4 digits are summation-order
    # noise — the reference's own two runs with different BLAS would differ
    # by as much.
    np.testing.assert_allclose(tab[:, 2], gold[f"{name}_eff"], rtol=2e-6,
                               atol=1e-12, err_msg=f"{name}: eff")
    np.testing.assert_allclose(tab[:, 3], gold[f"{name}_chi"], rtol=4e-6,
                               atol=5e-5, err_msg=f"{name}: chi")
    gold_p = gold[f"{name}_p"]
    chi_noisy = np.abs(tab[:, 3] - gold[f"{name}_chi"]) > (
        4e-6 * np.abs(gold[f"{name}_chi"]))
    assert chi_noisy.sum() <= 5, f"{name}: too many degenerate pairs"
    np.testing.assert_allclose(tab[~chi_noisy, 4], gold_p[~chi_noisy],
                               rtol=1e-5, atol=1e-30, err_msg=f"{name}: p")
    np.testing.assert_allclose(tab[chi_noisy, 4], gold_p[chi_noisy],
                               atol=5e-5, err_msg=f"{name}: p (degenerate)")
    # f64 subset: tight agreement (no storage quantization)
    rows = gold[f"{name}_sub_rows"]
    sub = gold[f"{name}_sub"]
    np.testing.assert_allclose(tab[rows, 2:4], sub[:, 2:4], rtol=1e-9,
                               err_msg=f"{name}: f64 subset eff/chi")
    np.testing.assert_allclose(tab[rows, 4], sub[:, 4], rtol=1e-8,
                               atol=1e-300, err_msg=f"{name}: f64 subset p")


@pytest.mark.slow
def test_full_epiAA_table(tmp_path, full_setup, mouse_geno, mouse_pheno,
                          mouse_prefix):
    from gmat_tpu.scan.pairs import remma_epiAA

    gold, gmat_lst, var_com = full_setup
    out = str(tmp_path / "aa")
    remma_epiAA(mouse_pheno, mouse_prefix, gmat_lst, var_com, p_cut=1.1,
                out_file=out)
    _assert_table(_load_table(out), gold, "aa", mouse_geno.shape[1], "aa")


@pytest.mark.slow
def test_full_epiAD_table(tmp_path, full_setup, mouse_geno, mouse_pheno,
                          mouse_prefix):
    from gmat_tpu.scan.pairs import remma_epiAD

    gold, gmat_lst, var_com = full_setup
    out = str(tmp_path / "ad")
    remma_epiAD(mouse_pheno, mouse_prefix, gmat_lst, var_com, p_cut=1.1,
                out_file=out)
    _assert_table(_load_table(out), gold, "ad", mouse_geno.shape[1], "ad")


@pytest.mark.slow
def test_full_epiDD_table(tmp_path, full_setup, mouse_geno, mouse_pheno,
                          mouse_prefix):
    from gmat_tpu.scan.pairs import remma_epiDD

    gold, gmat_lst, var_com = full_setup
    out = str(tmp_path / "dd")
    remma_epiDD(mouse_pheno, mouse_prefix, gmat_lst, var_com, p_cut=1.1,
                out_file=out)
    _assert_table(_load_table(out), gold, "dd", mouse_geno.shape[1], "dd")


def test_approx_pipeline_end_to_end_vs_full_table(tmp_path, full_setup,
                                                  mouse_geno, mouse_pheno,
                                                  mouse_prefix):
    """The flagship approx pipeline's merged output, end-to-end against the
    reference full table: every emitted row's exact (eff, chi, p) must match
    the golden values at that pair, and the emitted pair set must bracket
    the |eff| > eff_cut survivors of the golden effect table."""
    from scipy.stats import chi2 as chi2_dist

    from gmat_tpu.scan.pairs import remma_epiAA_pair
    from gmat_tpu.scan.random_pair import random_pair
    from gmat_tpu.scan.screen import remma_epiAA_approx

    gold, gmat_lst, var_com = full_setup
    m = mouse_geno.shape[1]
    p_cut, n_rand, seed = 1e-4, 20000, 0
    out = str(tmp_path / "approx")
    remma_epiAA_approx(mouse_pheno, mouse_prefix, gmat_lst, var_com,
                       p_cut=p_cut, num_random_pair=n_rand, out_file=out,
                       seed=seed)
    res = pd.read_csv(out, sep=" ", header=0)
    assert list(res.columns) == ["snp_0", "snp_1", "eff", "var", "chi",
                                 "p_app", "p"]
    # golden row index of pair (i, j>i) in the triangular table
    i = res["snp_0"].to_numpy(np.int64)
    j = res["snp_1"].to_numpy(np.int64)
    rows = i * m - i * (i + 1) // 2 + (j - i - 1)
    np.testing.assert_allclose(res["eff"], gold["aa_eff"][rows], rtol=2e-6,
                               atol=1e-12)
    np.testing.assert_allclose(res["chi"], gold["aa_chi"][rows], rtol=4e-6)
    np.testing.assert_allclose(res["p"], gold["aa_p"][rows], rtol=1e-5,
                               atol=1e-30)
    # reproduce the pipeline's calibration to recover its eff_cut, then
    # check the emitted pair set brackets the golden survivors
    rp = random_pair(m, out_file=str(tmp_path / "rp"), num_pair=n_rand,
                     seed=seed)
    remma_epiAA_pair(mouse_pheno, mouse_prefix, gmat_lst, var_com,
                     snp_pair_file=str(tmp_path / "rp"), p_cut=1.1,
                     out_file=str(tmp_path / "rp_res"))
    var_app = float(np.median(
        pd.read_csv(str(tmp_path / "rp_res"), sep=" ", header=0)["var"]
    ))
    cut = np.sqrt(chi2_dist.isf(p_cut, 1) * var_app)
    abs_eff = np.abs(gold["aa_eff"])
    got = set(zip(i.tolist(), j.tolist()))
    tri0, tri1 = np.triu_indices(m, k=1)
    core = abs_eff > cut * (1 + 1e-4)
    hull = abs_eff > cut * (1 - 1e-4)
    assert {(a, b) for a, b in zip(tri0[core], tri1[core])} <= got
    assert got <= {(a, b) for a, b in zip(tri0[hull], tri1[hull])}
    assert core.sum() > 50  # the bracket is non-trivial