"""Pedigree tools, phenotype simulators, low-depth simulator, legacy API."""
import numpy as np
import pytest

from gmat_tpu.pedigree.pedigree import (
    ped_completeness,
    ped_correct,
    ped_recode,
    ped_sort,
    ped_trace,
)


@pytest.fixture
def ped_file(tmp_path):
    # g1: a,b  g2: c=a x b, d=a x 0   g3: e=c x d
    p = tmp_path / "ped"
    p.write_text(
        "a\t0\t0\nb\t0\t0\nc\ta\tb\nd\ta\t0\ne\tc\td\n"
    )
    return str(p)


def test_ped_trace(tmp_path, ped_file):
    idf = tmp_path / "ids"
    idf.write_text("e\n")
    n = ped_trace(str(idf), ped_file)
    assert n == 5  # e + c,d + a,b
    rows = dict(
        (line.split()[0], line.split()[1:])
        for line in open(str(idf) + ".trace")
    )
    assert rows["e"] == ["c", "d"]
    assert rows["a"] == ["0", "0"]


def test_ped_sort(ped_file):
    ped_sort(ped_file)
    order = [line.split()[0] for line in open(ped_file + ".sort")]
    assert order.index("c") > order.index("a")
    assert order.index("e") > order.index("c")
    assert order.index("e") > order.index("d")


def test_ped_recode(ped_file):
    ped_recode(ped_file)
    codes = dict(line.split() for line in open(ped_file + ".dct"))
    rec = [line.split() for line in open(ped_file + ".recode")]
    assert codes["a"] == "1"
    assert rec[4][0] == codes["e"]


def test_ped_correct(tmp_path):
    # x appears as sire twice and dam once -> dropped from dam column;
    # cycle: u's sire is w, w's sire is u
    p = tmp_path / "pedc"
    p.write_text(
        "k\tx\t0\nl\tx\t0\nm\t0\tx\nu\tw\t0\nw\tu\t0\n"
    )
    ped = ped_correct(str(p))
    assert ped["m"] == ["0", "0"]  # x removed from dam column
    # cycle broken somewhere
    assert ped["u"][0] == "0" or ped["w"][0] == "0"


def test_ped_completeness(ped_file):
    ped_completeness(ped_file, gen=2, cut=0.1)
    pec = dict(line.split() for line in open(ped_file + ".pec"))
    assert "e" in pec  # both parents known, grandparents partially
    assert float(pec["e"]) > 0.5
    prune = [line.split()[0] for line in open(ped_file + ".prune")]
    assert "e" in prune and "c" in prune


def test_simulators(tmp_path, mouse_prefix, rng):
    import shutil

    from gmat_tpu.pipeline.simulate import simu_epistasis, simu_epistasis_freq

    prefix = str(tmp_path / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(mouse_prefix + ext, prefix + ext)
    for name, n_col in (("add", 2), ("dom", 2), ("aa", 3), ("ad", 3),
                        ("dd", 3)):
        k = 10
        idx = rng.choice(1407, size=(k, n_col - 1), replace=False)
        eff = rng.standard_normal(k)
        np.savetxt(str(tmp_path / name),
                   np.column_stack([idx, eff]),
                   fmt=["%d"] * (n_col - 1) + ["%.6f"])
    args = [prefix] + [str(tmp_path / n) for n in ("add", "dom", "aa", "ad",
                                                   "dd")]
    res = simu_epistasis(*args, out_file=str(tmp_path / "sim"), seed=3)
    assert res.shape == (1304, 4)
    pheno = res.iloc[:, 3].to_numpy()
    resid = np.loadtxt(str(tmp_path / "sim.res"))
    # achieved variance decomposition close to target ratios (2:1:.5:.5:.5:1)
    total_var = np.var(pheno)
    assert total_var > np.var(resid)  # genetic signal present
    # deterministic given the seed
    res2 = simu_epistasis(*args, out_file=str(tmp_path / "sim2"), seed=3)
    np.testing.assert_allclose(res.iloc[:, 3], res2.iloc[:, 3])
    # freq-based variant runs and normalizes
    simu_epistasis_freq(*args, out_file=str(tmp_path / "simf"), seed=3)
    norm = np.loadtxt(str(tmp_path / "add") + ".norm")
    assert norm.shape == (10, 2)


def test_simu_lds():
    from gmat_tpu.omics.simu_lds import simu

    res = simu(1000, 2.0, 5)
    assert res.shape == (1000, 5)
    np.testing.assert_allclose(res.sum(axis=0), 2000)


def test_legacy_api(tmp_path, mouse_geno, mouse_pheno, mouse_prefix):
    import jax.numpy as jnp

    from gmat_tpu.grm.grm import additive_grm
    from gmat_tpu.io.pheno import design_matrix
    from gmat_tpu.scan.legacy import remma_add_cpu, remma_epiAA_select_cpu
    from gmat_tpu.scan.single import remma_add

    ag = np.asarray(additive_grm(jnp.asarray(mouse_geno)))
    var = np.array([0.06289206, 0.07641075, 0.08121168])
    dm = design_matrix(mouse_pheno, mouse_prefix)
    res_legacy = remma_add_cpu(dm.y, dm.xmat, dm.z_dense(), [ag, ag * ag],
                               var, mouse_prefix,
                               out_file=str(tmp_path / "l"))
    res_modern = remma_add(mouse_pheno, mouse_prefix, [ag, ag * ag], var,
                           out_file=str(tmp_path / "m"))
    np.testing.assert_allclose(res_legacy["p_val"], res_modern["p_val"],
                               rtol=1e-10)
    # rectangular select scan: anchors {0,1} x partners {5,6,7}
    remma_epiAA_select_cpu(dm.y, dm.xmat, dm.z_dense(), [ag, ag * ag], var,
                           mouse_prefix, snp_lst_0=[0, 1],
                           snp_lst_1=[5, 6, 7], p_cut=1.1,
                           out_file=str(tmp_path / "sel"))
    rows = np.loadtxt(str(tmp_path / "sel"), skiprows=1)
    assert rows.shape == (6, 6)


def test_remmax_pipeline(tmp_path, mouse_pheno, mouse_prefix):
    import shutil

    from gmat_tpu.pipeline.remmax import remmax

    prefix = str(tmp_path / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(mouse_prefix + ext, prefix + ext)
    out = str(tmp_path / "rx")
    res = remmax(mouse_pheno, prefix, out_prefix=out, scan="epiAA_approx",
                 p_cut=1e-4, num_random_pair=20000, maxiter=50)
    np.testing.assert_allclose(
        res.var_com, [0.06289206, 0.07641075, 0.08121168], rtol=1e-4
    )
    assert set(res.timings) == {"grm", "reml", "scan", "annotate"}
    rows = np.loadtxt(res.scan_file, skiprows=1, ndmin=2)
    assert rows.shape[1] == 7 and len(rows) > 0
    assert len(open(res.anno_file).readlines()) > 1
    # resume skips REML
    res2 = remmax(mouse_pheno, prefix, out_prefix=out, scan="add",
                  maxiter=50)
    assert res2.timings["reml"] == 0.0
