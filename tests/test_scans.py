"""REMMA single-SNP and epistasis scans vs reference golden fixtures."""
import numpy as np
import pytest

from gmat_tpu.grm.grm import additive_grm, dominance_grm
from gmat_tpu.scan.pairs import (
    balanced_anchor_split,
    remma_epiAA,
    remma_epiAA_pair,
    remma_epiAD,
    remma_epiDD,
)
from gmat_tpu.scan.single import remma_add, remma_dom

from conftest import GOLDEN


@pytest.fixture(scope="module")
def grms(mouse_geno):
    import jax.numpy as jnp

    g = jnp.asarray(mouse_geno)
    return np.asarray(additive_grm(g)), np.asarray(dominance_grm(g))


def test_remma_add_golden(tmp_path, mouse_pheno, mouse_prefix, grms):
    gold = np.load(GOLDEN / "remma_single.npz")
    ag, _ = grms
    res = remma_add(mouse_pheno, mouse_prefix, [ag, ag * ag],
                    gold["var_a_axa"], out_file=str(tmp_path / "add"))
    np.testing.assert_allclose(res["eff_val"], gold["add_eff"], rtol=1e-8)
    np.testing.assert_allclose(res["chi_val"], gold["add_chi"], rtol=1e-8)
    np.testing.assert_allclose(res["p_val"], gold["add_p"], rtol=1e-6, atol=1e-300)
    np.testing.assert_allclose(res["eff_val_to_fixed"], gold["add_eff_fixed"],
                               rtol=1e-8)
    # file written with reference header
    first = open(tmp_path / "add").readline().split()
    assert first[:5] == ["chro", "snp_ID", "pos", "allele1", "allele2"]


def test_remma_dom_golden(tmp_path, mouse_pheno, mouse_prefix, grms):
    gold = np.load(GOLDEN / "remma_single.npz")
    ag, dg = grms
    res = remma_dom(mouse_pheno, mouse_prefix, [ag, dg, ag * ag],
                    gold["var_a_d_axa"], out_file=str(tmp_path / "dom"))
    np.testing.assert_allclose(res["eff_val"], gold["dom_eff"], rtol=1e-8)
    np.testing.assert_allclose(res["p_val"], gold["dom_p"], rtol=1e-6, atol=1e-300)


def _load_scan(path):
    return np.loadtxt(path, skiprows=1)


@pytest.mark.parametrize("kind,fn", [("aa", remma_epiAA), ("ad", remma_epiAD),
                                     ("dd", remma_epiDD)])
def test_epi_scans_golden(tmp_path, mouse_pheno, mouse_prefix, grms, kind, fn):
    gold = np.load(GOLDEN / "epi_scans.npz")
    ag, _ = grms
    out = str(tmp_path / kind)
    fn(mouse_pheno, mouse_prefix, [ag, ag * ag], gold["var_com"],
       snp_lst_0=list(gold["anchors"]), p_cut=1.1, out_file=out)
    got = _load_scan(out)
    want = gold[kind]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got[:, 0], want[:, 0])  # snp_0
    np.testing.assert_array_equal(got[:, 1], want[:, 1])  # snp_1
    np.testing.assert_allclose(got[:, 2], want[:, 2], rtol=1e-7, atol=1e-12)  # eff
    np.testing.assert_allclose(got[:, 3], want[:, 3], rtol=1e-6, atol=1e-10)  # chi
    np.testing.assert_allclose(got[:, 4], want[:, 4], rtol=1e-5, atol=1e-12)  # p


def test_epiAA_pair_golden(tmp_path, mouse_pheno, mouse_prefix, grms):
    gold = np.load(GOLDEN / "epiAA_pairs.npz")
    ag, _ = grms
    pair_file = str(tmp_path / "pairs")
    np.savetxt(pair_file, gold["pairs"], fmt="%d", header="snp_0 snp_1",
               comments="")
    out = str(tmp_path / "res")
    remma_epiAA_pair(mouse_pheno, mouse_prefix, [ag, ag * ag],
                     gold["var_com"], pair_file, p_cut=1.1, out_file=out)
    got = _load_scan(out)
    want = gold["res"]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got[:, :2], want[:, :2])
    np.testing.assert_allclose(got[:, 2:], want[:, 2:], rtol=1e-6, atol=1e-12)


def test_balanced_split_covers_all_anchors():
    num_snp = 1407
    for n_parts in (2, 3, 5):
        all_anchors = sorted(
            sum((balanced_anchor_split(num_snp, n_parts, p)
                 for p in range(1, n_parts + 1)), [])
        )
        assert all_anchors == list(range(num_snp - 1))
        # balanced: each part's pair count within 15% of the mean
        counts = [
            sum(num_snp - 1 - i for i in balanced_anchor_split(num_snp, n_parts, p))
            for p in range(1, n_parts + 1)
        ]
        assert max(counts) / min(counts) < 1.2


def test_p_cut_filters(tmp_path, mouse_pheno, mouse_prefix, grms):
    gold = np.load(GOLDEN / "epi_scans.npz")
    ag, _ = grms
    out = str(tmp_path / "aa_cut")
    remma_epiAA(mouse_pheno, mouse_prefix, [ag, ag * ag], gold["var_com"],
                snp_lst_0=[0, 1, 2], p_cut=1e-3, out_file=out)
    got = _load_scan(out)
    if got.size:
        got = got.reshape(-1, 5)
        assert np.all(got[:, 4] < 1e-3)
