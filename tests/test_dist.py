"""Multi-chip sharding vs single-chip results on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmat_tpu.dist.mesh import (
    interleaved_anchor_split,
    make_mesh,
    sharded_additive_grm,
    sharded_exact_scan_tile,
    sharded_screen_counts,
)
from gmat_tpu.grm.grm import additive_grm


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should expose 8 CPU devices"
    return make_mesh(8)


def test_sharded_grm_matches(mouse_geno, mesh):
    want = np.asarray(additive_grm(jnp.asarray(mouse_geno)))
    got = np.asarray(sharded_additive_grm(mouse_geno, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_sharded_grm_uneven_columns(rng, mesh):
    # m not divisible by 8 exercises the zero-padding path
    geno = rng.choice([0.0, 1.0, 2.0], size=(40, 37))
    want = np.asarray(additive_grm(jnp.asarray(geno)))
    got = np.asarray(sharded_additive_grm(geno, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_interleaved_split_covers():
    assign = interleaved_anchor_split(1407, 8)
    flat = sorted(set(assign.ravel().tolist()))
    assert flat == list(range(1406))
    # balance: triangular work per device within 2%
    loads = [sum(1406 - a for a in set(row.tolist())) for row in assign]
    assert max(loads) / min(loads) < 1.05


def test_sharded_screen_counts(rng, mesh):
    n, m = 64, 97
    geno = rng.choice([0.0, 1.0, 2.0], size=(n, m))
    freq = geno.sum(0) / (2 * n)
    mat = geno - 2 * freq[None, :]
    py = rng.standard_normal(n) * 0.1
    eff = (mat * py[:, None]).T @ mat
    cut = np.quantile(np.abs(eff[np.triu_indices(m, 1)]), 0.98)
    counts = sharded_screen_counts(mat, py, cut, mesh, tile=8)
    want = np.array(
        [np.sum(np.abs(eff[i, i + 1:]) > cut) for i in range(m - 1)]
    )
    np.testing.assert_array_equal(counts, want)


def test_sharded_exact_scan_tile(rng, mesh):
    n, m = 48, 64
    geno = rng.choice([0.0, 1.0, 2.0], size=(n, m))
    freq = geno.sum(0) / (2 * n)
    mat = geno - 2 * freq[None, :]
    py = rng.standard_normal(n) * 0.1
    a = rng.standard_normal((n, n))
    pvp = a @ a.T / n
    anchors = np.arange(16, dtype=np.int32)  # 2 per device
    p = np.asarray(sharded_exact_scan_tile(anchors, mat, py, pvp, mesh))
    assert p.shape == (16, m)
    # oracle for anchor 3
    e = mat[:, 3][:, None] * mat
    eff = e.T @ py
    var = np.sum(e * (pvp @ e), axis=0)
    from scipy.stats import chi2

    want = chi2.sf(eff * eff / var, 1)
    np.testing.assert_allclose(p[3], want, rtol=1e-8)


def test_sharded_dominance_grm(rng, mesh):
    from gmat_tpu.dist.mesh import sharded_dominance_grm
    from gmat_tpu.grm.grm import dominance_grm

    geno = rng.choice([0.0, 1.0, 2.0], size=(40, 37))
    want = np.asarray(dominance_grm(jnp.asarray(geno)))
    got = np.asarray(sharded_dominance_grm(geno, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_sharded_screen_hits(rng, mesh):
    from gmat_tpu.dist.mesh import sharded_screen_hits

    n, m = 64, 97
    geno = rng.choice([0.0, 1.0, 2.0], size=(n, m))
    freq = geno.sum(0) / (2 * n)
    mat = geno - 2 * freq[None, :]
    py = rng.standard_normal(n) * 0.1
    eff = (mat * py[:, None]).T @ mat
    cut = np.quantile(np.abs(eff[np.triu_indices(m, 1)]), 0.98)
    i0, i1, e = sharded_screen_hits(mat, py, cut, mesh, tile=8)
    want = {
        (a, b)
        for a, b in zip(*np.where(
            (np.abs(eff) > cut)
            & (np.arange(m)[None, :] > np.arange(m)[:, None])
        ))
    }
    assert set(zip(i0.tolist(), i1.tolist())) == want
    # byte-stable ordering
    assert np.all(np.lexsort((i1, i0)) == np.arange(len(i0)))
