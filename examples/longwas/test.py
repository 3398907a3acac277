"""Unbalanced random-regression variance components on mouse_long.

Mirrors /root/reference/examples/longwas/test.py — a scratch script that
hand-builds the Legendre fixed design (forder=3), the additive and
permanent-environment random-regression incidence lists (aorder=porder=3)
and calls the array-level `unbalance_varcom` (reference test.py:110-147).
All of that construction is what `gmat_tpu.longwas.unbalance_varcom`
does internally from the data file (reference unbalance_varcom.py:123-219),
so the mirror is the one-call form on the same inputs: agmat with inverse,
then REML on `phe.unbalance.txt` (ID/weak/trait columns).

A 150-id subset keeps this demo quick on CPU — drop the subsetting for the
full cohort (examples/longwas/unbalance_test.py runs the follow-on GWAS).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from _common import out_dir, stage_mouse_long  # noqa: E402

import pandas as pd  # noqa: E402

from gmat_tpu.grm.grm import agmat  # noqa: E402
from gmat_tpu.longwas.unbalance import unbalance_varcom  # noqa: E402

N_SUB = 150

out = out_dir(__file__)
bed = stage_mouse_long(out)

# reference test.py:47 — agmat(bed_file, inv=True, small_val=0.001)
agmat(bed, inv=True, small_val=0.001, out_fmt="id_id_val")

data_file = str(out / "phe.unbalance.txt")
df = pd.read_csv(data_file, sep=r"\s+", header=0)
ids = df["ID"].unique()[:N_SUB]
sub_file = str(out / "phe.unbalance.sub.txt")
df[df["ID"].isin(ids)].to_csv(sub_file, sep=" ", index=False)

# reference test.py:92,110-147: tpoint='weak', trait='trait',
# forder=aorder=porder=3, then unbalance_varcom(..., max_iter=100)
res = unbalance_varcom(
    sub_file, "ID", "weak", "trait", bed + ".agiv2",
    forder=3, aorder=3, porder=3, maxiter=10,
    prefix_outfile=str(out / "unbalance_test_varcom"),
)
print(res)
