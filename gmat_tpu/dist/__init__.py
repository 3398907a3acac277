"""Device-mesh distribution layer (SURVEY.md §2.2, §5 'distributed backend').

`make_mesh()` builds a 1-D mesh over local devices; `initialize_multihost()`
boots `jax.distributed` and returns the global mesh.  Every file-level entry
point that sweeps SNPs or pairs accepts the mesh as `mesh=`.
"""
from gmat_tpu.dist.init import initialize_multihost
from gmat_tpu.dist.mesh import (
    interleaved_anchor_split,
    make_mesh,
    sharded_additive_grm,
    sharded_dominance_grm,
    sharded_exact_scan_tile,
    sharded_screen_counts,
    sharded_screen_hits,
)

__all__ = [
    "initialize_multihost",
    "interleaved_anchor_split",
    "make_mesh",
    "sharded_additive_grm",
    "sharded_dominance_grm",
    "sharded_exact_scan_tile",
    "sharded_screen_counts",
    "sharded_screen_hits",
]
