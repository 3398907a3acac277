"""Variance-component partitions of the mouse phenotype.

Mirrors /root/reference/examples/uvlmm/uvlmm_varcom.py: partition the
phenotypic variance under progressively richer null models by weighted
EM+AI REML (reference uvlmm_varcom.py:8-104):

  A + AxA + e                       (the canonical epiAA null model)
  A + D + AxA + e
  A + D + AxA + AxD + DxD + e       (full 5-GRM partition)

The reference's yeast repeated-measure config (gmat_lst + identity for the
individual-specific residual) is exercised in tests/test_reml.py — the
yeast .bed is absent from the reference snapshot (SURVEY.md §6).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from _common import out_dir, stage_mouse  # noqa: E402

import numpy as np  # noqa: E402

from gmat_tpu import agmat, dgmat_as, wemai_multi_gmat  # noqa: E402

out = out_dir(__file__)
bed = stage_mouse(out)
pheno = str(out / "pheno")

ag, _ = agmat(bed, out_fmt="mat")
dg, _ = dgmat_as(bed, out_fmt="mat")

for name, gmat_lst in (
    ("A + AxA", [ag, ag * ag]),
    ("A + D + AxA", [ag, dg, ag * ag]),
    ("A + D + AxA + AxD + DxD", [ag, dg, ag * ag, ag * dg, dg * dg]),
):
    var = np.asarray(
        wemai_multi_gmat(pheno, bed, gmat_lst,
                         out_file=str(out / "var.txt"))
    ).ravel()
    total = var.sum()
    parts = " + ".join(f"{v / total:.3f}" for v in var)
    print(f"{name:28s} var = {np.round(var, 5)}  (ratios {parts})")
