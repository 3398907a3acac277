"""GRM construction vs an independent numpy oracle implementing the reference
formulas (gmatrix.py:53-66 additive, :116-127 dominance)."""
import numpy as np
import jax.numpy as jnp

from gmat_tpu.grm.grm import additive_grm, agmat, dgmat_as, dominance_grm, ginbreedcoef
from gmat_tpu.io.grm_io import read_grm_id_id_val, read_grm_mat, write_grm


def np_agrm(geno, small_val=0.001):
    n, m = geno.shape
    freq = geno.sum(axis=0) / (2 * n)
    scale = np.sum(2 * freq * (1 - freq))
    cen = geno - 2 * freq[None, :]
    kin = cen @ cen.T / scale
    d = np.diag(kin) * (1 + small_val)
    np.fill_diagonal(kin, d)
    return kin


def np_dgrm(geno, small_val=0.001):
    n, m = geno.shape
    freq = geno.sum(axis=0) / (2 * n)
    sv = 2 * freq * (1 - freq)
    scale = np.sum(sv * (1 - sv))
    g = geno.copy()
    g[g > 1.5] = 0.0
    cen = g - sv[None, :]
    kin = cen @ cen.T / scale
    d = np.diag(kin) * (1 + small_val)
    np.fill_diagonal(kin, d)
    return kin


def test_additive_grm_mouse(mouse_geno):
    got = np.asarray(additive_grm(jnp.asarray(mouse_geno)))
    want = np_agrm(mouse_geno)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    assert np.allclose(got, got.T)
    # PD after diagonal inflation
    w = np.linalg.eigvalsh(want)
    assert w.min() > 0


def test_dominance_grm_mouse(mouse_geno):
    got = np.asarray(dominance_grm(jnp.asarray(mouse_geno)))
    want = np_dgrm(mouse_geno)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_agmat_pipeline(tmp_path, mouse_prefix):
    import shutil

    prefix = str(tmp_path / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(mouse_prefix + ext, prefix + ext)
    kin, kin_inv = agmat(prefix, inv=True, out_fmt="mat")
    disk = read_grm_mat(prefix + ".agrm0")
    np.testing.assert_allclose(disk, kin, rtol=1e-8)
    np.testing.assert_allclose(kin @ kin_inv, np.eye(kin.shape[0]), atol=1e-6)
    dk, _ = dgmat_as(prefix, inv=False, out_fmt="mat")
    assert dk.shape == kin.shape


def test_grm_io_roundtrip(tmp_path, rng):
    a = rng.standard_normal((6, 6))
    a = a @ a.T
    ids = np.array([f"id{i}" for i in range(6)])
    p = str(tmp_path / "k.grm")
    write_grm(a, ids, p, "id_id_val")
    back = read_grm_id_id_val(p + "2", ids)
    np.testing.assert_allclose(back, a, rtol=1e-6)


def test_ginbreedcoef(tmp_path, mouse_prefix, mouse_geno):
    import shutil

    prefix = str(tmp_path / "plink")
    for ext in (".bed", ".bim", ".fam"):
        shutil.copy(mouse_prefix + ext, prefix + ext)
    df = ginbreedcoef(prefix)
    assert list(df.columns) == ["id", "homo_F", "grm_F1", "grm_F2"]
    # oracle for homo_F
    n, m = mouse_geno.shape
    homo = 1 - np.sum(np.abs(mouse_geno - 1.0) < 0.01, axis=1) / m
    np.testing.assert_allclose(df["homo_F"], homo, rtol=1e-10)
