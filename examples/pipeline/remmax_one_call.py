"""One-call REMMAX orchestration (no reference equivalent).

Runs the whole 4-step workflow — GRM, REML, scan, annotation — through
`gmat_tpu.pipeline.remmax.remmax()`, with stage artifacts on disk so a rerun
resumes from the finished stages (the reference's file-handoff
checkpoint/resume model, SURVEY.md §5, made explicit).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from _common import out_dir, stage_mouse  # noqa: E402

import numpy as np  # noqa: E402

from gmat_tpu.pipeline.remmax import remmax  # noqa: E402

out = out_dir(__file__)
bed = stage_mouse(out)
pheno = str(out / "pheno")

res = remmax(pheno, bed, out_prefix=str(out / "remmax"), model="a_axa",
             scan="epiAA_approx", p_cut=1e-4, num_random_pair=20000,
             dis=5_000_000)
print("variance components:", np.round(res.var_com, 5))
print("phase timings (s):", {k: round(v, 2) for k, v in res.timings.items()})

# second call resumes from the stage artifacts (var file already on disk)
res2 = remmax(pheno, bed, out_prefix=str(out / "remmax"), model="a_axa",
              scan="epiAA_approx", p_cut=1e-4, num_random_pair=20000,
              dis=5_000_000)
assert np.allclose(res.var_com, res2.var_com)
print("resume OK; outputs:",
      sorted(p.name for p in out.glob("remmax*"))[:8])
