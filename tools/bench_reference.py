"""Measure the reference's C/OpenMP epiAA effect-screen throughput on this
host, producing the `vs_baseline` denominator for bench.py.

Builds the reference's own cffi extension (_remma_epi_eff_cpu.c) in a temp
dir and times `remma_epiAA_eff_cpu` on the mouse fixture's shape. Result is
stored in bench_baseline.json (pairs/s). Run once per machine:

    python tools/bench_reference.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parents[1]
REF = Path("/root/reference")


def build_ext(tmp: Path):
    import cffi

    ffi = cffi.FFI()
    sig = (
        "int remma_epiAA_eff_cpu(char *bed_file, long long num_id, "
        "long long num_snp, long long *snp_lst_0, long long len_snp_lst_0, "
        "double *pymat, double eff_cut, char* out_file);"
    )
    ffi.cdef(sig)
    ffi.set_source(
        "_ref_epi_kernel",
        sig,
        sources=[str(REF / "gmat/remma/_remma_epi_eff_cpu.c")],
        extra_compile_args=["-fopenmp", "-O3"],
        extra_link_args=["-fopenmp", "-lm"],
    )
    os.chdir(tmp)
    ffi.compile(verbose=False)
    sys.path.insert(0, str(tmp))
    import _ref_epi_kernel

    return _ref_epi_kernel


def main():
    sys.path.insert(0, str(ROOT))
    from gmat_tpu.io.bed import Bed

    bed_prefix = str(ROOT / "tests/data/plink")
    bed = Bed(bed_prefix)
    n, m = bed.num_id, bed.num_snp
    rng = np.random.default_rng(0)
    pymat = (rng.standard_normal(n) * 0.1).astype(np.float64)

    with tempfile.TemporaryDirectory() as td:
        mod = build_ext(Path(td))
        ffi, lib = mod.ffi, mod.lib
        snp_lst = np.arange(m - 1, dtype=np.longlong)
        out = os.path.join(td, "out")
        args = (
            ffi.new("char[]", bed_prefix.encode()),
            ffi.cast("long long", n),
            ffi.cast("long long", m),
            ffi.cast("long long *", snp_lst.ctypes.data),
            ffi.cast("long long", len(snp_lst)),
            ffi.cast("double *", pymat.ctypes.data),
            ffi.cast("double", 1.0e9),  # no hits: pure scan cost
            ffi.new("char[]", out.encode()),
        )
        lib.remma_epiAA_eff_cpu(*args)  # warm (page cache)
        t0 = time.perf_counter()
        lib.remma_epiAA_eff_cpu(*args)
        dt = time.perf_counter() - t0
    pairs = m * (m - 1) // 2
    res = {
        "host": os.uname().nodename,
        "nproc": os.cpu_count(),
        "workload": {"num_id": n, "num_snp": m, "pairs": pairs},
        "reference_epiAA_screen_pairs_per_s": pairs / dt,
        "seconds": dt,
    }
    (ROOT / "bench_baseline.json").write_text(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
