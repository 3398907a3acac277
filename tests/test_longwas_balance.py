"""Balanced longitudinal REML + GWAS vs reference golden fixtures."""
import shutil

import numpy as np
import pytest

from gmat_tpu.longwas.balance import balance_varcom
from gmat_tpu.longwas.legendre import leg_basis

from conftest import DATA, GOLDEN

ML = DATA / "mouse_long"
TPOINT = np.array(range(16)) + 1.0
TRAIT = list(range(2, 18))


@pytest.fixture(scope="module")
def kin_prefix(tmp_path_factory):
    from gmat_tpu.grm.grm import agmat

    tmp = tmp_path_factory.mktemp("ml")
    prefix = str(tmp / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(str(ML / ("plink" + ext)), prefix + ext)
    agmat(prefix, inv=True, out_fmt="id_id_val")
    return prefix


def test_leg_basis_orthonormal():
    # reference normalization: integral over [-1,1] of P_j^2 = 1
    t = np.linspace(0, 10, 2001)
    phi = leg_basis(t, 4)
    w = 2.0 / (len(t) - 1)  # d(tvec)
    gram = phi.T @ phi * w / 1.0
    np.testing.assert_allclose(np.diag(gram), np.ones(5), rtol=7e-3)


def test_leg_matches_reference_formula():
    # direct check of the printed formula for order 2 at specific points
    t = np.array([1.0, 2.0, 3.0])
    phi = leg_basis(t, 2)
    tv = 2 * (t - 1) / 2 - 1  # [-1, 0, 1]
    np.testing.assert_allclose(phi[:, 0], np.sqrt(0.5) * np.ones(3))
    np.testing.assert_allclose(phi[:, 1], np.sqrt(1.5) * tv)
    np.testing.assert_allclose(phi[:, 2], np.sqrt(2.5) * 0.5 * (3 * tv**2 - 1))


def test_balance_varcom_golden(tmp_path, kin_prefix):
    gold = np.load(GOLDEN / "longwas_balance_var.npz")
    res = balance_varcom(
        str(ML / "phe.balance.txt"), "ID", TPOINT, TRAIT,
        kin_prefix + ".agrm2", maxiter=5,
        prefix_outfile=str(tmp_path / "bvar"),
    )
    np.testing.assert_array_equal(res["vari"], gold["vari"])
    np.testing.assert_array_equal(res["varij"], gold["varij"])
    np.testing.assert_allclose(res["var_val"], gold["var_val"], rtol=1e-6,
                               atol=1e-10)
    # file written
    disk = np.loadtxt(str(tmp_path / "bvar") + ".var", skiprows=1)
    np.testing.assert_allclose(disk[:, 3], res["var_val"], rtol=1e-12)
