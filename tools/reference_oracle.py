"""Load the reference GMAT's pure-Python modules as golden oracles.

The reference at /root/reference can't be imported wholesale here (its cffi
extensions aren't built and pandas_plink isn't installed), so we pre-seed
sys.modules with the handful of leaf modules its pure-numpy algorithms need,
backed by our own PLINK decoder, then file-load the algorithm modules.

Used ONLY by tools/gen_golden.py to produce tests/golden/*.npz fixtures —
never imported by the framework itself.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference/gmat")


def _load(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns a namespace of reference modules with IO stubs installed."""
    if "gmat" in sys.modules and getattr(sys.modules["gmat"], "_oracle", False):
        return sys.modules["gmat"]

    from gmat_tpu.io.bed import impute_geno as _impute
    from gmat_tpu.io.bed import read_plink as _read

    import numpy as _np

    if not hasattr(_np, "int"):  # reference uses the removed np.int alias
        _np.int = int

    for name in ("gmat", "gmat.uvlmm", "gmat.process_plink", "gmat.remma",
                 "gmat.remma.remma_epiAA", "gmat.remma.remma_epiAD",
                 "gmat.remma.remma_epiDD", "gmat.gmatrix"):
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        sys.modules[name] = pkg
    sys.modules["gmat"]._oracle = True

    # IO stub: same contract as the reference process_plink module
    pp = types.ModuleType("gmat.process_plink.process_plink")
    pp.read_plink = lambda bed_file: _read(bed_file)
    pp.impute_geno = lambda snp_mat: _impute(snp_mat, seed=0)
    sys.modules["gmat.process_plink.process_plink"] = pp

    _load("gmat.uvlmm.design_matrix", REF / "uvlmm" / "design_matrix.py")
    ns = sys.modules["gmat"]
    ns.design_matrix = sys.modules["gmat.uvlmm.design_matrix"]
    ns.uvlmm_varcom = _load("gmat.uvlmm.uvlmm_varcom", REF / "uvlmm" / "uvlmm_varcom.py")
    ns.gmatrix = _load("gmat.gmatrix.gmatrix", REF / "gmatrix" / "gmatrix.py")
    ns.remma_add = _load("gmat.remma.remma_add", REF / "remma" / "remma_add.py")
    ns.remma_dom = _load("gmat.remma.remma_dom", REF / "remma" / "remma_dom.py")
    ns.remma_epiAA = _load(
        "gmat.remma.remma_epiAA.remma_epiAA", REF / "remma" / "remma_epiAA" / "remma_epiAA.py"
    )
    ns.remma_epiAA_pair = _load(
        "gmat.remma.remma_epiAA.remma_epiAA_pair",
        REF / "remma" / "remma_epiAA" / "remma_epiAA_pair.py",
    )
    ns.remma_epiAD = _load(
        "gmat.remma.remma_epiAD.remma_epiAD", REF / "remma" / "remma_epiAD" / "remma_epiAD.py"
    )
    ns.remma_epiDD = _load(
        "gmat.remma.remma_epiDD.remma_epiDD", REF / "remma" / "remma_epiDD" / "remma_epiDD.py"
    )

    # longwas: real package machinery with __path__ pointed at the reference
    # tree so the modules' relative imports resolve; plus compat shims for
    # the removed np.math alias and the absent patsy dependency.
    import importlib
    import math as _math

    if not hasattr(_np, "math"):
        _np.math = _math
    from scipy import linalg as _sla

    if not hasattr(_sla, "kron"):  # removed from scipy.linalg; reference uses it
        _sla.kron = _np.kron
    if "patsy" not in sys.modules:
        patsy_stub = types.ModuleType("patsy")

        def _no_patsy(*a, **k):
            raise RuntimeError("patsy stub: only fix=None supported in oracle")

        patsy_stub.dmatrix = _no_patsy
        sys.modules["patsy"] = patsy_stub
    for name, sub in (("gmat.longwas", ""), ("gmat.longwas.balance", "balance"),
                      ("gmat.longwas.unbalance", "unbalance")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [str(REF / "longwas" / sub)]
            sys.modules[name] = pkg
    sys.modules["gmat.uvlmm"].__path__ = [str(REF / "uvlmm")]
    pkg = types.ModuleType("gmat.uvlmm.varcom")
    pkg.__path__ = [str(REF / "uvlmm" / "varcom")]
    sys.modules["gmat.uvlmm.varcom"] = pkg
    ns.uvlmm_varcom_eigen = _load(
        "gmat.uvlmm.uvlmm_varcom_eigen", REF / "uvlmm" / "uvlmm_varcom_eigen.py"
    )
    ns.uvlmm_gwas = _load("gmat.uvlmm.uvlmm_gwas", REF / "uvlmm" / "uvlmm_gwas.py")
    from tqdm import tqdm as _tqdm

    ns.uvlmm_gwas.tdqm = _tqdm  # reference typo'd tqdm as tdqm (uvlmm_gwas.py:44)
    ns.varcom_em = _load("gmat.uvlmm.varcom.em", REF / "uvlmm" / "varcom" / "em.py")
    ns.varcom_em.cc_gra = 1.0e-6  # undefined global in the reference (em.py:160)
    ns.lm = _load("gmat.uvlmm.lm", REF / "uvlmm" / "lm.py")
    ns.balance_varcom = importlib.import_module(
        "gmat.longwas.balance.balance_varcom"
    )
    ns.balance_longwas_fixed = importlib.import_module(
        "gmat.longwas.balance.balance_longwas_fixed"
    )
    ns.balance_longwas_trans = importlib.import_module(
        "gmat.longwas.balance.balance_longwas_trans"
    )
    ns.unbalance_varcom = importlib.import_module(
        "gmat.longwas.unbalance.unbalance_varcom"
    )
    ns.unbalance_longwas_fixed = importlib.import_module(
        "gmat.longwas.unbalance.unbalance_longwas_fixed"
    )
    ns.unbalance_longwas_trans = importlib.import_module(
        "gmat.longwas.unbalance.unbalance_longwas_trans"
    )
    ns.balance_longwas_fixed_permutation = importlib.import_module(
        "gmat.longwas.balance.balance_longwas_fixed_permutation"
    )
    ns.balance_longwas_trans_permutation = importlib.import_module(
        "gmat.longwas.balance.balance_longwas_trans_permutation"
    )
    ns.unbalance_longwas_fixed_permutation = importlib.import_module(
        "gmat.longwas.unbalance.unbalance_longwas_fixed_permutation"
    )
    ns.unbalance_longwas_trans_permutation = importlib.import_module(
        "gmat.longwas.unbalance.unbalance_longwas_trans_permutation"
    )
    return ns
