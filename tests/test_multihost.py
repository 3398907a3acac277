"""True multi-process jax.distributed test (SURVEY §4 item 3): a 2-process
CPU cluster boots via `gmat_tpu.dist.initialize_multihost`, builds the
global mesh, and the sharded GRM over it matches the single-process result.

Runs in subprocesses because jax.distributed can only be initialized once
per process (the test runner already owns a single-process backend).
"""
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster_grm(tmp_path):
    import jax.numpy as jnp

    from gmat_tpu.grm.grm import additive_grm

    port = _free_port()
    out = str(tmp_path / "result.npz")
    worker = str(Path(__file__).parent / "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        log, _ = p.communicate(timeout=300)
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"
    got = np.load(out)
    assert got["ndev"] == 4  # 2 virtual devices x 2 processes
    want = np.asarray(additive_grm(jnp.asarray(got["geno"])))
    np.testing.assert_allclose(got["kin"], want, rtol=1e-10, atol=1e-12)

    # the sharded screen run on the 2-process mesh must match a local
    # single-process screen byte-for-byte (SURVEY §4 item 3: scans, not just
    # GRM, on a real jax.distributed cluster)
    from gmat_tpu.dist.mesh import make_mesh, sharded_screen_hits

    mesh1 = make_mesh(1)
    li, lj, le = sharded_screen_hits(got["mat"], got["py"], 1.0, mesh1,
                                     tile=16)
    assert len(li) > 0, "screen cut produced no hits; test is vacuous"
    np.testing.assert_array_equal(got["hits_i"], li)
    np.testing.assert_array_equal(got["hits_j"], lj)

    # the file-level PRODUCTION fused screen run on the 2-process cluster
    # must be byte-identical to the same call without a mesh (VERDICT r3
    # #5: multi-process coverage of the fused engine, not just the
    # two-phase sharded_screen_hits path)
    import pandas as pd

    from gmat_tpu.grm.grm import additive_grm
    from gmat_tpu.io.bed import write_bed
    from gmat_tpu.scan.screen import remma_epiAA_eff

    geno2 = got["geno2"]
    prefix = str(tmp_path / "plink")
    write_bed(prefix, geno2)
    fam = pd.read_csv(prefix + ".fam", sep=r"\s+", header=None, dtype=str)
    with open(tmp_path / "pheno", "w") as f:
        for (f0, i0), yv in zip(fam[[0, 1]].to_numpy(), got["yvec"]):
            f.write(f"{f0} {i0} 1 {yv:.8f}\n")
    ag = np.asarray(additive_grm(jnp.asarray(geno2)))
    eff_file = str(tmp_path / "epiAA_eff")
    remma_epiAA_eff(str(tmp_path / "pheno"), prefix, [ag], [0.5, 0.5],
                    var_app=float(got["var_app"]), p_cut=1e-5,
                    out_file=eff_file, mesh=None)
    local = Path(eff_file).read_bytes()
    assert len(local.splitlines()) > 10, "screen found no hits; vacuous"
    assert got["eff_table"].tobytes() == local
    np.testing.assert_array_equal(got["hits_e"], le)
