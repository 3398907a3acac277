"""Longwas permutation twins (VERDICT round-2 weak #3: previously untested).

Covers all four public entry points: seeded-shuffle determinism, the
reference's `<prefix>.<rep>` per-replicate file contract
(balance_longwas_fixed_permutation.py:251), and goldens produced by the
reference oracle with the SAME permutations injected
(tools/gen_golden_permutation.py)."""
import shutil

import numpy as np
import pandas as pd
import pytest

from conftest import DATA, GOLDEN

ML = DATA / "mouse_long"
TPOINT = np.array(range(16)) + 1.0
TRAIT = list(range(2, 18))
SNPS = list(range(30))
SEED = 42  # must match tools/gen_golden_permutation.py
N_SUB = 150


def _var_df(name):
    g = np.load(GOLDEN / name)
    return pd.DataFrame({"vari": g["vari"], "varij": g["varij"],
                         "varik": g["varik"], "var_val": g["var_val"]})


@pytest.fixture(scope="module")
def gold():
    return np.load(GOLDEN / "longwas_permutation.npz")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from gmat_tpu.grm.grm import agmat

    tmp = tmp_path_factory.mktemp("mlp")
    prefix = str(tmp / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(str(ML / ("plink" + ext)), prefix + ext)
    agmat(prefix, inv=True, out_fmt="id_id_val")
    fam = pd.read_csv(ML / "plink.fam", sep=r"\s+", header=None, dtype=str)
    sub_ids = set(fam[1][:N_SUB])
    kin_sub = str(tmp / "kin.sub")
    with open(prefix + ".agrm2") as fin, open(kin_sub, "w") as fout:
        for line in fin:
            a = line.split()
            if a[0] in sub_ids and a[1] in sub_ids:
                fout.write(line)
    df = pd.read_csv(ML / "phe.unbalance.txt", sep=r"\s+", header=0,
                     dtype={"ID": str})
    df = df[df["ID"].isin(sub_ids)]
    data_sub = str(tmp / "phe.unbalance.sub.txt")
    df.to_csv(data_sub, sep=" ", index=False)
    return prefix + ".agrm2", data_sub, kin_sub, tmp


def _check_reps(prefix, gold, key, cols, rtol):
    for rep in (0, 1):
        # reference per-replicate file contract: <prefix>.<rep>, no suffix
        f = f"{prefix}.{rep}"
        got = pd.read_csv(f, sep=r"\s+", header=0)
        want = pd.DataFrame(gold[f"{key}_{rep}"],
                            columns=list(gold[f"{key}_cols_{rep}"]))
        for col in cols:
            np.testing.assert_allclose(got[col], want[col], rtol=rtol,
                                       atol=1e-10,
                                       err_msg=f"{key} rep {rep} {col}")


def test_balance_trans_permutation_golden_and_determinism(setup, gold,
                                                          tmp_path):
    from gmat_tpu.longwas.balance_gwas import balance_longwas_trans_permutation

    kin_file, _, _, _ = setup
    var_df = _var_df("longwas_balance_var.npz")
    kw = dict(permutation_lst=[0, 1], snp_lst=SNPS, seed=SEED)
    balance_longwas_trans_permutation(
        str(ML / "phe.balance.txt"), "ID", TPOINT, TRAIT, kin_file,
        str(ML / "plink"), var_df,
        prefix_outfile=str(tmp_path / "btp"), **kw)
    _check_reps(str(tmp_path / "btp"), gold, "balance_trans",
                ("eff0", "eff1", "eff2", "eff3", "chi_val", "p_val",
                 "p_min", "p_accum"), 1e-4)
    # determinism: the same seed reproduces replicate 0 byte-for-byte
    balance_longwas_trans_permutation(
        str(ML / "phe.balance.txt"), "ID", TPOINT, TRAIT, kin_file,
        str(ML / "plink"), var_df, permutation_lst=[0], snp_lst=SNPS,
        seed=SEED, prefix_outfile=str(tmp_path / "btp2"))
    assert (tmp_path / "btp2.0").read_bytes() == \
        (tmp_path / "btp.0").read_bytes()


@pytest.mark.slow
def test_balance_fixed_permutation_golden(setup, gold, tmp_path):
    from gmat_tpu.longwas.balance_gwas import balance_longwas_fixed_permutation

    kin_file, _, _, _ = setup
    var_df = _var_df("longwas_balance_var.npz")
    balance_longwas_fixed_permutation(
        str(ML / "phe.balance.txt"), "ID", TPOINT, TRAIT, kin_file,
        str(ML / "plink"), var_df, permutation_lst=[0, 1], snp_lst=SNPS,
        seed=SEED, prefix_outfile=str(tmp_path / "bfp"))
    _check_reps(str(tmp_path / "bfp"), gold, "balance_fixed",
                ("eff0", "eff1", "eff2", "eff3", "chi_val", "p_val"), 1e-6)


def test_unbalance_fixed_permutation_golden(setup, gold, tmp_path):
    from gmat_tpu.longwas.unbalance_gwas import (
        unbalance_longwas_fixed_permutation,
    )

    _, data_sub, kin_sub, _ = setup
    var_df = _var_df("longwas_unbalance_var.npz")
    unbalance_longwas_fixed_permutation(
        data_sub, "ID", "weak", "trait", str(ML / "plink"), kin_sub,
        var_df, permutation_lst=[0, 1], snp_lst=SNPS, seed=SEED,
        prefix_outfile=str(tmp_path / "ufp"))
    _check_reps(str(tmp_path / "ufp"), gold, "unbalance_fixed",
                ("eff0", "eff1", "eff2", "eff3", "chi_val", "p_val",
                 "p_min", "p_accum"), 1e-5)


def test_unbalance_trans_permutation_golden(setup, gold, tmp_path):
    from gmat_tpu.longwas.unbalance_gwas import (
        unbalance_longwas_trans_permutation,
    )

    _, data_sub, kin_sub, _ = setup
    var_df = _var_df("longwas_unbalance_var.npz")
    unbalance_longwas_trans_permutation(
        data_sub, "ID", "weak", "trait", str(ML / "plink"), kin_sub,
        var_df, permutation_lst=[0, 1], snp_lst=SNPS, seed=SEED,
        prefix_outfile=str(tmp_path / "utp"))
    _check_reps(str(tmp_path / "utp"), gold, "unbalance_trans",
                ("eff0", "eff1", "eff2", "eff3", "chi_val", "p_val"), 1e-5)
