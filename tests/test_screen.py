"""Effect screen + approximate pipeline: the f32 MXU screen must find exactly
the pairs the exact f64 effect computation puts above threshold (away from
the float32 borderline), and the approx pipeline must reproduce the
reference's file contract."""
import numpy as np
import pytest

from gmat_tpu.core.coding import additive_code, dominance_code
from gmat_tpu.scan.random_pair import random_pair, random_pairAD
from gmat_tpu.scan.screen import (
    remma_epiAA_approx,
    remma_epiAA_eff,
    remma_epiAA_maf_approx,
    remma_epiAD_eff,
)
from gmat_tpu.grm.grm import additive_grm

from conftest import GOLDEN


@pytest.fixture(scope="module")
def setup(mouse_geno, mouse_pheno, mouse_prefix):
    import jax.numpy as jnp

    from gmat_tpu.io.pheno import design_matrix
    from gmat_tpu.scan.common import score_pieces

    gold = np.load(GOLDEN / "epi_scans.npz")
    ag = np.asarray(additive_grm(jnp.asarray(mouse_geno)))
    var_com = gold["var_com"]
    dm = design_matrix(mouse_pheno, mouse_prefix)
    pieces = score_pieces(dm, [ag, ag * ag], var_com)
    return ag, var_com, np.asarray(pieces.pymat)


def _eff_matrix(geno, py, code0, code1):
    import jax.numpy as jnp

    a = np.asarray(code0(jnp.asarray(geno))[0])
    b = np.asarray(code1(jnp.asarray(geno))[0])
    return (a * py[:, None]).T @ b  # (m, m) float64 oracle


def _read_hits(path):
    rows = np.loadtxt(path, skiprows=1, ndmin=2)
    return rows


def test_screen_AA_matches_oracle(tmp_path, mouse_geno, mouse_pheno,
                                  mouse_prefix, setup):
    ag, var_com, py = setup
    eff = _eff_matrix(mouse_geno, py, additive_code, additive_code)
    m = eff.shape[0]
    tri = np.triu_indices(m, k=1)
    abs_eff = np.abs(eff[tri])
    cut = np.quantile(abs_eff, 1 - 2e-4)  # ~200 expected hits
    var_app = cut * cut / 19.511420964657572  # chi2.isf(1e-5, 1)
    out = str(tmp_path / "eff")
    remma_epiAA_eff(mouse_pheno, mouse_prefix, [ag, ag * ag], var_com,
                    var_app=var_app, p_cut=1e-5, out_file=out)
    got = _read_hits(out)
    got_set = {(int(r[0]), int(r[1])) for r in got}
    margin = 1e-4 * cut
    want_core = {
        (int(i), int(j))
        for i, j in zip(*tri)
        if np.abs(eff[i, j]) > cut + margin
    }
    want_max = {
        (int(i), int(j))
        for i, j in zip(*tri)
        if np.abs(eff[i, j]) > cut - margin
    }
    assert want_core <= got_set <= want_max
    # eff values in the file match the f64 oracle to f32 screen accuracy
    for r in got[:50]:
        assert abs(r[2] - eff[int(r[0]), int(r[1])]) < 1e-3 * max(1.0, abs(r[2]))
    # appended approx columns: chi_app = eff^2/var_app
    chi_app = got[:, 2] ** 2 / var_app
    np.testing.assert_allclose(got[:, 3], chi_app, rtol=1e-4)


def test_screen_AD_orientations(tmp_path, mouse_geno, mouse_pheno,
                                mouse_prefix, setup):
    ag, var_com, py = setup
    eff = _eff_matrix(mouse_geno, py, additive_code, dominance_code)
    m = eff.shape[0]
    mask = np.zeros_like(eff, dtype=bool)
    iu = np.triu_indices(m, k=1)
    mask[iu] = True  # orientation 1: (i, j>i) = A_i x D_j
    mask[np.tril_indices(m, k=-1)] = True  # orientation 2 written flipped
    cut = np.quantile(np.abs(eff[mask]), 1 - 1e-4)
    var_app = cut * cut / 19.511420964657572
    out = str(tmp_path / "effAD")
    remma_epiAD_eff(mouse_pheno, mouse_prefix, [ag, ag * ag], var_com,
                    var_app=var_app, p_cut=1e-5, out_file=out)
    got = _read_hits(out)
    got_set = {(int(r[0]), int(r[1])) for r in got}
    margin = 1e-4 * cut
    want_core = {
        (i, j) for i in range(m) for j in range(m)
        if i != j and np.abs(eff[i, j]) > cut + margin
    }
    want_max = {
        (i, j) for i in range(m) for j in range(m)
        if i != j and np.abs(eff[i, j]) > cut - margin
    }
    assert want_core <= got_set <= want_max


def test_approx_pipeline(tmp_path, mouse_pheno, mouse_prefix, setup):
    ag, var_com, _ = setup
    out = str(tmp_path / "approx")
    remma_epiAA_approx(mouse_pheno, mouse_prefix, [ag, ag * ag], var_com,
                       p_cut=1e-4, num_random_pair=20000, out_file=out)
    with open(out) as f:
        header = f.readline().split()
    assert header == ["snp_0", "snp_1", "eff", "var", "chi", "p_app", "p"]
    rows = np.loadtxt(out, skiprows=1, ndmin=2)
    if rows.size:
        # exact chi = eff^2/var and p monotone with chi
        np.testing.assert_allclose(rows[:, 4], rows[:, 2] ** 2 / rows[:, 3],
                                   rtol=1e-6)
        assert np.all(rows[:, 6] <= 1.0)
    # golden epiAA top hits (p < 1e-4 among anchors 0..39) must be recovered
    gold = np.load(GOLDEN / "epi_scans.npz")["aa"]
    strong = gold[gold[:, 4] < 1e-6]
    got_pairs = {(int(r[0]), int(r[1])) for r in rows.reshape(-1, 7)}
    for r in strong:
        assert (int(r[0]), int(r[1])) in got_pairs


def test_maf_approx_pipeline(tmp_path, mouse_pheno, mouse_prefix, setup):
    ag, var_com, _ = setup
    out = str(tmp_path / "mafapprox")
    remma_epiAA_maf_approx(mouse_pheno, mouse_prefix, [ag, ag * ag], var_com,
                           p_cut=1e-4, num_random_pair=20000, out_file=out)
    import os

    assert os.path.exists(out + ".freq")
    assert os.path.exists(out + ".freq_denominator")
    rows = np.loadtxt(out, skiprows=1, ndmin=2)
    assert rows.shape[1] == 7 if rows.size else True


def test_random_pair_unique_and_seeded(tmp_path):
    p1 = random_pair(500, out_file=str(tmp_path / "rp1"), num_pair=3000,
                     num_each_pair=1000, seed=42)
    p2 = random_pair(500, out_file=str(tmp_path / "rp2"), num_pair=3000,
                     num_each_pair=1000, seed=42)
    np.testing.assert_array_equal(p1, p2)
    assert np.all(p1[:, 0] < p1[:, 1])
    assert len({(a, b) for a, b in p1}) == 3000
    pad = random_pairAD(500, out_file=str(tmp_path / "rpAD"), num_pair=3000,
                        num_each_pair=1000, seed=1)
    assert np.all(pad[:, 0] != pad[:, 1])
    with pytest.raises(ValueError):
        random_pair(10, num_pair=1000, num_each_pair=10)


def test_annotation(tmp_path, mouse_prefix, setup):
    from gmat_tpu.scan.annotation import annotation_snp_pos

    res = tmp_path / "res"
    res.write_text(
        "snp_0 snp_1 eff chi p_val\n"
        "0 1 1.0 10.0 1e-6\n"       # same chr, nearby -> filtered if dis big
        "0 1000 2.0 20.0 1e-8\n"
        "5 6 0.5 1.0 0.5\n"          # p too large
    )
    annotation_snp_pos(str(res), mouse_prefix, p_cut=1e-5, dis=0)
    lines = open(str(res) + ".anno").read().strip().split("\n")
    assert "snp0_chr" in lines[0]
    body = [l.split() for l in lines[1:]]
    kept = {(r[0], r[7]) for r in body}
    assert ("0", "1000") in kept
    assert all(p != "5" for p, _ in kept)
