"""PLINK .bed decode: native C++, numpy fallback, and on-device unpack must
all agree, and match hand-decoded bytes per the public PLINK spec."""
import numpy as np
import pytest

from gmat_tpu.io import bed as bed_mod
from gmat_tpu.io.bed import (
    Bed,
    _decode_numpy,
    impute_geno,
    read_bed_raw,
    read_plink,
    unpack_codes_device,
    write_bed,
)


def test_magic_and_shape(mouse_prefix):
    geno = read_plink(mouse_prefix)
    assert geno.shape == (1304, 1407)
    # mouse fixture has no missing genotypes on the tested path
    vals = np.unique(geno[~np.isnan(geno)])
    assert set(vals).issubset({0.0, 1.0, 2.0})


def test_native_matches_numpy(mouse_prefix):
    b = Bed(mouse_prefix)
    ref = _decode_numpy(mouse_prefix + ".bed", b.num_id, b.num_snp)
    if bed_mod._load_native() is None:
        pytest.skip("native library unavailable")
    nat = b.read()
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(nat))
    np.testing.assert_array_equal(ref[~np.isnan(ref)], nat[~np.isnan(nat)])


def test_native_f32(mouse_prefix):
    if bed_mod._load_native() is None:
        pytest.skip("native library unavailable")
    b = Bed(mouse_prefix)
    f64 = b.read(np.float64)
    f32 = b.read(np.float32)
    np.testing.assert_array_equal(f64.astype(np.float32), f32)


def test_device_unpack(mouse_prefix):
    import jax.numpy as jnp

    b = Bed(mouse_prefix)
    raw = read_bed_raw(mouse_prefix + ".bed", b.num_id, b.num_snp)
    dev = np.asarray(unpack_codes_device(jnp.asarray(raw), b.num_id))
    host = b.read()
    np.testing.assert_array_equal(np.isnan(host), np.isnan(dev))
    np.testing.assert_array_equal(host[~np.isnan(host)], dev[~np.isnan(dev)])


def test_hand_decoded_bytes(tmp_path):
    # One SNP, 5 individuals: codes 00,01,10,11,00 -> 0,NaN,1,2,0.
    # Byte 0 packs individuals 0-3 LSB-first: 0b11_10_01_00 = 0xE4; byte 1 = 0b00.
    path = tmp_path / "tiny.bed"
    path.write_bytes(b"\x6c\x1b\x01" + bytes([0xE4, 0x00]))
    geno = _decode_numpy(str(path), 5, 1)
    assert geno.shape == (5, 1)
    assert geno[0, 0] == 0.0 and np.isnan(geno[1, 0])
    assert geno[2, 0] == 1.0 and geno[3, 0] == 2.0 and geno[4, 0] == 0.0


def test_write_read_roundtrip(tmp_path, rng):
    geno = rng.choice([0.0, 1.0, 2.0, np.nan], size=(17, 9), p=[0.4, 0.3, 0.2, 0.1])
    prefix = str(tmp_path / "rt")
    write_bed(prefix, geno)
    back = Bed(prefix).read()
    np.testing.assert_array_equal(np.isnan(geno), np.isnan(back))
    np.testing.assert_array_equal(geno[~np.isnan(geno)], back[~np.isnan(back)])


def test_impute_geno_deterministic(rng):
    geno = rng.choice([0.0, 1.0, 2.0], size=(50, 6)).astype(float)
    geno[rng.random(geno.shape) < 0.2] = np.nan
    a = impute_geno(geno, seed=7)
    b = impute_geno(geno, seed=7)
    np.testing.assert_array_equal(a, b)
    assert not np.any(np.isnan(a))
    # non-missing entries untouched
    mask = ~np.isnan(geno)
    np.testing.assert_array_equal(a[mask], geno[mask])


def test_missing_genotype_pipeline(tmp_path, rng):
    """End-to-end GRM + REML + scan on data WITH missing genotypes (the mouse
    fixture has none, so the impute path needs its own exercise)."""
    import jax.numpy as jnp

    from gmat_tpu.grm.grm import agmat
    from gmat_tpu.io.pheno import design_matrix
    from gmat_tpu.reml.wemai import wemai_reml
    from gmat_tpu.scan.single import remma_add

    n, m = 80, 60
    geno = rng.choice([0.0, 1.0, 2.0], size=(n, m))
    geno[rng.random(geno.shape) < 0.05] = np.nan
    prefix = str(tmp_path / "miss")
    write_bed(prefix, geno)
    pheno = tmp_path / "pheno"
    with open(pheno, "w") as f:
        for i in range(n):
            f.write(f"f{i} i{i} 1 {rng.standard_normal():.4f}\n")
    kin, _ = agmat(prefix, out_fmt="mat")
    assert np.isfinite(kin).all()
    # deterministic across runs (seeded impute)
    kin2, _ = agmat(prefix, out_fmt="mat")
    np.testing.assert_array_equal(kin, kin2)
    dm = design_matrix(str(pheno), prefix)
    var = wemai_reml(dm, [kin], maxiter=30)
    assert np.isfinite(var).all() and (var > 0).all()
    res = remma_add(str(pheno), prefix, [kin], var,
                    out_file=str(tmp_path / "add"))
    assert np.isfinite(res["p_val"]).all()


def test_prepare_genotypes_device_packed_path(mouse_prefix):
    """The no-missing packed-upload fast path (raw 2-bit codes expanded
    on-device via the (code²+code)/6 map, _read_plink_bed.c:37) must match
    the host decode exactly; the cache must serve repeat calls."""
    from gmat_tpu.scan.common import (_DEVICE_GENO_CACHE,
                                      prepare_genotypes, prepare_genotypes_device)

    _DEVICE_GENO_CACHE.clear()
    dev, num_snp = prepare_genotypes_device(mouse_prefix)
    host, _, _ = prepare_genotypes(mouse_prefix)
    assert num_snp == host.shape[1]
    np.testing.assert_array_equal(np.asarray(dev), host)
    dev2, _ = prepare_genotypes_device(mouse_prefix)
    assert dev2 is dev


def test_prepare_genotypes_device_missing_fallback(tmp_path, rng):
    """Panels WITH missing genotypes take the seeded host-impute path."""
    from gmat_tpu.io.bed import write_bed
    from gmat_tpu.scan.common import (_DEVICE_GENO_CACHE,
                                      prepare_genotypes, prepare_genotypes_device)

    geno = rng.integers(0, 3, size=(25, 40)).astype(np.float64)
    geno[3, 7] = np.nan
    geno[0, 0] = np.nan
    prefix = str(tmp_path / "miss")
    write_bed(prefix, geno)
    _DEVICE_GENO_CACHE.clear()
    dev, _ = prepare_genotypes_device(prefix)
    host, _, _ = prepare_genotypes(prefix)
    np.testing.assert_array_equal(np.asarray(dev), host)
    assert not np.any(np.isnan(np.asarray(dev)))
    _DEVICE_GENO_CACHE.clear()


def test_coded_matrix_cache(mouse_prefix):
    """coded_matrix reuses one device coding per (panel, kind, dtype) and
    matches the direct coding."""
    from gmat_tpu.core.coding import additive_code, dominance_code
    from gmat_tpu.scan.common import coded_matrix, prepare_genotypes_device

    g, _ = prepare_genotypes_device(mouse_prefix)
    a1 = coded_matrix(g, "add")
    a2 = coded_matrix(g, "add")
    assert a1 is a2
    np.testing.assert_array_equal(np.asarray(a1),
                                  np.asarray(additive_code(g)[0]))
    d32 = coded_matrix(g, "dom", np.float32)
    assert d32.dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(d32), np.asarray(dominance_code(g)[0].astype(np.float32)))
    assert coded_matrix(g, "dom", np.float32) is d32
