"""Roofline observability: achieved-vs-peak logging and profiler hooks.

SURVEY.md §5 (tracing/profiling row) asks for more than wall-clock logs:
each hot phase should report how close it runs to the hardware ceiling, and
a jax.profiler trace should be one env var away.  The reference's only
observability is its "Running time: Clock time" prints
(/root/reference/gmat/remma/remma_epiAA/remma_epiAA.py:84-86); this module
is the TPU-native upgrade.

Peak calibration: the default 197 TF/s is the v5e bf16 MXU peak — the
compute mode of default-precision f32 matmuls on TPU (bf16-compute /
f32-accumulate; measured screen GEMMs reach 70-130 TF/s depending on
shape, see BASELINE.md).  Override with GMAT_TPU_PEAK_TFLOPS for other
chips or a CPU run.
"""
from __future__ import annotations

import contextlib
import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_PEAK_TFLOPS = 197.0


def peak_tflops() -> float:
    """Hardware GEMM ceiling used for utilization reporting."""
    return float(os.environ.get("GMAT_TPU_PEAK_TFLOPS",
                                _DEFAULT_PEAK_TFLOPS))


def log_phase(name: str, flops: float, seconds: float,
              items: float | None = None, unit: str = "pairs") -> float:
    """Log one phase's achieved TF/s against the peak; returns TF/s.

    `items`/`unit` adds the domain-rate (e.g. pairs/s) so the roofline line
    replaces, not duplicates, the wall-clock log.
    """
    tf = flops / max(seconds, 1e-12) / 1e12
    pct = 100.0 * tf / peak_tflops()
    extra = ""
    if items is not None:
        extra = " | %.3g %s/s" % (items / max(seconds, 1e-12), unit)
    logger.info("Roofline %s: %.2f TF/s (%.0f%% of %.0f TF/s peak), %.3f s%s",
                name, tf, pct, peak_tflops(), seconds, extra)
    return tf


@contextlib.contextmanager
def maybe_trace(label: str = "gmat"):
    """jax.profiler trace hook: set GMAT_TPU_TRACE_DIR=/path to capture a
    TensorBoard-loadable trace of whatever runs inside the context; no-op
    (zero overhead) otherwise."""
    trace_dir = os.environ.get("GMAT_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
    logger.info("jax.profiler trace written under %s/%s", trace_dir, label)
