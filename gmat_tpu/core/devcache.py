"""Identity-keyed device-array cache for big host arrays.

The multi-stage pipelines (remma_epi*_approx: calibrate -> screen ->
exact re-test, reference remma_epiAA_approx.py:10-53) pass the SAME host
GRM arrays to every stage, and each stage's jnp.asarray would re-upload
them — ~10 s per 139 MB GRM through the ~13 MB/s tunneled device, tripled
per pipeline.  `device_put_cached` keeps one device copy per live host
array, keyed by id() and guarded by a weakref so a recycled id can never
alias a different array (the entry self-evicts when the host array is
garbage-collected).

Mutating a cached array in place and re-passing it returns the STALE
device copy — the public pipelines never do that (GRMs are built once and
treated as immutable), and ad-hoc callers can simply pass a fresh array.
"""
from __future__ import annotations

import weakref

import jax.numpy as jnp
import numpy as np

_CACHE: dict = {}


def device_put_cached(arr):
    """jnp.asarray with a per-object device cache (numpy inputs only;
    device arrays and non-arrays pass straight through)."""
    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr)
    key = id(arr)
    ent = _CACHE.get(key)
    if ent is not None and ent[0]() is arr:
        return ent[1]
    dev = jnp.asarray(arr)
    try:
        ref = weakref.ref(arr, lambda _r, k=key: _CACHE.pop(k, None))
    except TypeError:  # some ndarray subclasses refuse weakrefs
        return dev
    _CACHE[key] = (ref, dev)
    return dev
