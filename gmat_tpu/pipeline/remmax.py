"""One-call REMMAX orchestration: GRM -> REML -> scans -> annotation.

The reference's canonical workflow is four manual steps gluing files together
(/root/reference/README.md:94-119).  `remmax()` runs the same pipeline with
stage artifacts on disk (every stage restartable from its files, preserving
the reference's coarse checkpoint/resume model — SURVEY.md §5) and per-phase
wall-clock logging (the reference's timer/tqdm observability contract).
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from dataclasses import dataclass, field

import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def phase_timer(name: str, record: dict | None = None):
    """Wall/CPU timing around a pipeline phase (reference logs the same pair,
    e.g. gmatrix.py:61-69)."""
    t0, c0 = time.perf_counter(), time.process_time()
    yield
    dt, dc = time.perf_counter() - t0, time.process_time() - c0
    logger.info("%s: clock %.3fs, cpu %.3fs", name, dt, dc)
    if record is not None:
        record[name] = dt


@dataclass
class RemmaxResult:
    var_com: np.ndarray
    out_prefix: str
    timings: dict = field(default_factory=dict)

    @property
    def scan_file(self):
        return self.out_prefix + ".scan"

    @property
    def anno_file(self):
        return self.out_prefix + ".scan.anno"


def remmax(pheno_file: str, bed_prefix: str, out_prefix: str = "remmax",
           model: str = "a_axa", scan: str = "epiAA_approx",
           p_cut: float = 1.0e-5, num_random_pair: int = 100000,
           dis: float = 0.0, maxiter: int = 200, seed: int = 0,
           resume: bool = True) -> RemmaxResult:
    """Full pipeline.

    model: which GRMs enter the null model —
        'a_axa' [ag, ag*ag] | 'a_d_axa' [ag, dg, ag*ag] |
        'a_d_axa_axd_dxd' (5 GRM)
    scan: 'epiAA' | 'epiAD' | 'epiDD' exact scans, or the '*_approx' /
        '*_maf_approx' screen pipelines, or 'add' / 'dom' single-SNP tests.
    resume: reuse existing stage artifacts (<out>.var) when present.
    """
    import jax.numpy as jnp

    from gmat_tpu.grm.grm import additive_grm, dominance_grm
    from gmat_tpu.io.bed import read_plink
    from gmat_tpu.reml.wemai import wemai_multi_gmat
    from gmat_tpu.scan import pairs as pairs_mod
    from gmat_tpu.scan import screen as screen_mod
    from gmat_tpu.scan import single as single_mod
    from gmat_tpu.scan.annotation import annotation_snp_pos

    timings: dict = {}
    with phase_timer("grm", timings):
        geno = jnp.asarray(read_plink(bed_prefix))
        ag = np.asarray(additive_grm(geno))
        gmat_lst = {"ag": ag}
        if "d" in model.split("_"):
            gmat_lst["dg"] = np.asarray(dominance_grm(geno))
        specs = {
            "a_axa": ["ag", "ag*ag"],
            "a_d_axa": ["ag", "dg", "ag*ag"],
            "a_d_axa_axd_dxd": ["ag", "dg", "ag*ag", "ag*dg", "dg*dg"],
        }[model]
        mats = []
        for spec in specs:
            prod = None
            for term in spec.split("*"):
                prod = gmat_lst[term] if prod is None else prod * gmat_lst[term]
            mats.append(prod)

    var_file = out_prefix + ".var"
    if resume and os.path.exists(var_file):
        logger.info("resuming: reusing %s", var_file)
        var_com = np.loadtxt(var_file)
        timings["reml"] = 0.0
    else:
        with phase_timer("reml", timings):
            var_com = wemai_multi_gmat(pheno_file, bed_prefix, mats,
                                       maxiter=maxiter, out_file=var_file)

    scan_file = out_prefix + ".scan"
    with phase_timer("scan", timings):
        if scan in ("add", "dom"):
            fn = getattr(single_mod, f"remma_{scan}")
            fn(pheno_file, bed_prefix, mats, var_com, out_file=scan_file)
        elif scan.endswith("approx"):
            fn = getattr(screen_mod, f"remma_{scan}")
            fn(pheno_file, bed_prefix, mats, var_com, p_cut=p_cut,
               num_random_pair=num_random_pair, out_file=scan_file, seed=seed)
        else:
            fn = getattr(pairs_mod, f"remma_{scan}")
            fn(pheno_file, bed_prefix, mats, var_com, p_cut=p_cut,
               out_file=scan_file)

    with phase_timer("annotate", timings):
        if scan not in ("add", "dom"):
            annotation_snp_pos(scan_file, bed_prefix, p_cut=p_cut, dis=dis)

    with open(out_prefix + ".timings.json", "w") as f:
        json.dump(timings, f)
    return RemmaxResult(var_com=var_com, out_prefix=out_prefix,
                        timings=timings)
