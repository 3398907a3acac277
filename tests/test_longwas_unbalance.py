"""Unbalanced longitudinal REML vs reference golden (150-id subset)."""
import shutil

import numpy as np
import pandas as pd
import pytest

from gmat_tpu.longwas.unbalance import unbalance_varcom

from conftest import DATA, GOLDEN

ML = DATA / "mouse_long"
N_SUB = 150


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    from gmat_tpu.grm.grm import agmat

    tmp = tmp_path_factory.mktemp("mlu")
    prefix = str(tmp / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(str(ML / ("plink" + ext)), prefix + ext)
    agmat(prefix, inv=True, out_fmt="id_id_val")
    fam = pd.read_csv(ML / "plink.fam", sep=r"\s+", header=None, dtype=str)
    sub_ids = set(fam[1][:N_SUB])
    for src, dst in ((prefix + ".agrm2", str(tmp / "kin.sub")),
                     (prefix + ".agiv2", str(tmp / "kininv.sub"))):
        with open(src) as fin, open(dst, "w") as fout:
            for line in fin:
                a = line.split()
                if a[0] in sub_ids and a[1] in sub_ids:
                    fout.write(line)
    df = pd.read_csv(ML / "phe.unbalance.txt", sep=r"\s+", header=0,
                     dtype={"ID": str})
    df = df[df["ID"].isin(sub_ids)]
    data_sub = str(tmp / "phe.unbalance.sub.txt")
    df.to_csv(data_sub, sep=" ", index=False)
    return data_sub, str(tmp / "kin.sub"), str(tmp / "kininv.sub"), tmp


def test_unbalance_varcom_golden(subset, tmp_path):
    data_sub, _, kininv, _ = subset
    gold = np.load(GOLDEN / "longwas_unbalance_var.npz")
    res = unbalance_varcom(data_sub, "ID", "weak", "trait", kininv,
                           maxiter=5, prefix_outfile=str(tmp_path / "uvar"))
    np.testing.assert_array_equal(res["vari"], gold["vari"])
    np.testing.assert_array_equal(res["varij"], gold["varij"])
    np.testing.assert_allclose(res["var_val"], gold["var_val"], rtol=1e-5,
                               atol=1e-8)


def _gold(which):
    g = np.load(GOLDEN / "longwas_unbalance_gwas.npz")
    return pd.DataFrame(g[which], columns=list(g[which + "_cols"]))


def test_unbalance_fixed_golden(subset, tmp_path):
    from gmat_tpu.longwas.unbalance_gwas import unbalance_longwas_fixed

    data_sub, kin, _, _ = subset
    gold_var = np.load(GOLDEN / "longwas_unbalance_var.npz")
    var_df = pd.DataFrame({"vari": gold_var["vari"], "varij": gold_var["varij"],
                           "varik": gold_var["varik"],
                           "var_val": gold_var["var_val"]})
    res = unbalance_longwas_fixed(data_sub, "ID", "weak", "trait",
                                  str(ML / "plink"), kin, var_df,
                                  snp_lst=list(range(30)),
                                  prefix_outfile=str(tmp_path / "ufix"))
    want = _gold("fixed")
    np.testing.assert_allclose(res["chi_val"], want["chi_val"], rtol=1e-6)
    np.testing.assert_allclose(res["p_val"], want["p_val"], rtol=1e-5, atol=1e-12)
    for col in ("eff0", "eff1", "eff2", "eff3"):
        np.testing.assert_allclose(res[col], want[col], rtol=1e-6, atol=1e-10,
                                   err_msg=col)
    np.testing.assert_allclose(res["p_min"], want["p_min"], rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(res["p_accum"], want["p_accum"], rtol=1e-5,
                               atol=1e-12)


def test_unbalance_trans_golden(subset, tmp_path):
    from gmat_tpu.longwas.unbalance_gwas import unbalance_longwas_trans

    data_sub, kin, _, _ = subset
    gold_var = np.load(GOLDEN / "longwas_unbalance_var.npz")
    var_df = pd.DataFrame({"vari": gold_var["vari"], "varij": gold_var["varij"],
                           "varik": gold_var["varik"],
                           "var_val": gold_var["var_val"]})
    res = unbalance_longwas_trans(data_sub, "ID", "weak", "trait",
                                  str(ML / "plink"), kin, var_df,
                                  snp_lst=list(range(30)),
                                  prefix_outfile=str(tmp_path / "utrans"))
    want = _gold("trans")
    np.testing.assert_allclose(res["chi_val"], want["chi_val"], rtol=1e-6)
    np.testing.assert_allclose(res["p_val"], want["p_val"], rtol=1e-5, atol=1e-12)
    for col in ("eff0", "eff1", "eff2", "eff3"):
        np.testing.assert_allclose(res[col], want[col], rtol=1e-6, atol=1e-10,
                                   err_msg=col)


@pytest.mark.slow
def test_unbalance_varcom_full_cohort_golden(subset, tmp_path):
    """FULL 1212-id cohort (19,392 records), 3 EM+AI rounds vs the
    reference oracle (VERDICT round-1 weak #4: the round-1 golden covered
    only a 150-id subset).  Golden from tools/gen_golden_unbalance_full.py."""
    _, _, _, tmp = subset
    gold = np.load(GOLDEN / "longwas_unbalance_var_full.npz")
    res = unbalance_varcom(str(ML / "phe.unbalance.txt"), "ID", "weak",
                           "trait", str(tmp / "plink.agiv2"),
                           maxiter=int(gold["maxiter"]),
                           prefix_outfile=str(tmp_path / "uvar_full"))
    np.testing.assert_array_equal(res["vari"], gold["vari"])
    np.testing.assert_array_equal(res["varij"], gold["varij"])
    np.testing.assert_allclose(res["var_val"], gold["var_val"], rtol=1e-5,
                               atol=1e-8)
