"""Effect-only epistasis screening and the approximate test pipelines.

Reference parity (the C/OpenMP kernel family and its drivers):
- `remma_epi{AA,AD,DD}_eff`  (/root/reference/gmat/remma/remma_epiAA/
  remma_epiAA_eff.py:20-96 and the C kernel _remma_epi_eff_cpu.c:91-137):
  screen |eff(i,j)| > eff_cut = sqrt(chi2_crit * var_app), write
  `snp_0 snp_1 eff` + appended `chi_app p_app` columns.
- `remma_epi*_maf_eff` (remma_epiAA_maf_eff.py:20-107, C :171-219):
  per-MAF-bin thresholds eff_cut[bin_i*10+bin_j]; bins = int(maf*20).
- `remma_epi*_approx` (remma_epiAA_approx.py:10-53): random-pair variance
  calibration (median) -> screen -> exact re-test -> merge approx+exact p.
- `remma_epi*_maf_approx` (remma_epiAA_maf_approx.py:11-90): per-bin *mean*
  variance calibration with global-mean fallback.
- AD orientation rule (C :233-247): anchors i scan j>i testing both
  (A_i, D_j) -> row (i, j) and (A_j, D_i) -> row (j, i).

TPU-first engine: the screen effect for a whole anchor tile is one GEMM,
    S = (A ⊙ py)ᵀ B     with A = anchor columns, B = all partner columns,
computed in float32 on the MXU (the screen is a threshold test; survivors are
re-tested exactly in float64 — mirroring the reference's own
screen-then-exact design, which tolerates screening error by construction).

Round-4 FUSED engine (the default): one dispatch both counts and extracts
— per (anchor-tile, partner-tile) visit, each UNROLLED extraction round
takes the max of every (row, 128-column block) cell of the score panel
simultaneously (up to n_blk hits per row per round, pure reduces — no
per-row gathers, no control flow: measured on this TPU a round costs
~0.1 ms while one lax.cond costs ~0.75 ms/visit), the candidate grid
compacts to per-row hit lists by prefix-rank masked reduces, and
small scatters assemble the global device buffer; big worklists split
into equal-shape chunks whose O(hits) fetches overlap the next chunk's
compute (the tunneled device moves ~13 MB/s, so fetch bytes would
otherwise bound the sweep), and the host fetches buffers[:total].
Visits denser than tier 1 (GMAT_TPU_RMAX rounds, 4x that per row)
re-dispatch once at (8 rounds, 64/row); denser still — or overflowing
the per-visit buffer — fall back to the legacy two-phase engine (kept in
full below: phase-1 counts + capacity-bucketed phase-2, plus a dense
raw-panel path for keep-everything cuts, which skip the fused engine
entirely).  The anchor/visit tiling is also the unit of multi-chip
sharding, and per-visit math is identical on every topology, so mesh
output is byte-identical.
Env knobs: GMAT_TPU_SCREEN=fused|two_phase, GMAT_TPU_RMAX,
GMAT_TPU_EXTRACT=topk|scatter (legacy phase-2), GMAT_TPU_ENGINE=pallas.
"""
from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gmat_tpu.core.roofline import log_phase, maybe_trace
from gmat_tpu.core.stats import chi2_isf
from gmat_tpu.scan.common import prepare_genotypes
from gmat_tpu.scan.pairs import balanced_anchor_split

logger = logging.getLogger(__name__)

# fused single-pass screen (round-4 engine) ---------------------------------
_FUSED_CAP = 1 << 22  # global hit-buffer slots (48 MB on-device)
_FUSED_BLK = 32  # lanes per bitmask group of the fused extraction (uint32)
# anchor panels past this take the identity/scale-in-visit path (the
# gather+scale copy peaks at 3x the panel; tests patch this down)
_GATHER_BYTES_MAX = 2 << 30


def _fused_tiers(tile: int, blk: int, n_work: int):
    """(rounds, krow, kcap_base) extraction tiers.

    Tier 1 (GMAT_TPU_RMAX rounds, 2x that per row, tile^2/2^15-slot
    visit buffers) serves typical screen cuts; the escalation tier
    (8, 64, 32k) serves hit-dense panels.  Beyond that the legacy two-phase engine
    takes the visit.  Every tier is fully UNROLLED — measured on this TPU,
    a lax.cond costs ~0.75 ms/visit and a while_loop + carried storage
    ~3 ms/visit, while one unrolled round is ~0.1 ms; kcap sizes the
    global-compaction scatter source (wc*kcap rows at ~90 ns/row), so
    lean tiers keep it small (tools/bench_fused_profile.py).

    SHORT worklists (<= 64 visits, no env override) start directly at a
    dense-capable (8, 16, 8192) tier: with few visits the scatter rows
    stay cheap anyway, and skipping a flag->escalate cascade saves a
    whole dispatch + fetch round trip (~0.3 s on the tunneled device —
    the round-3 yeast regression)."""
    env = os.environ.get("GMAT_TPU_RMAX")
    if env is None and n_work <= 64:
        tiers = [(min(8, blk), min(16, tile), 8192)]
    else:
        r1 = max(1, int(env or "2"))
        # kcap tile^2/2^15 (512 at the 4096 bench tile; was a flat 2048):
        # the global-compaction scatter's source is wc*kcap rows and XLA
        # TPU row-scatter degrades ~3.4 -> ~90 ns/row past ~1M rows; at
        # the production chunk (wc=520) 2048 put the source at 1.06M rows
        # (~40 ms/chunk measured, tools/bench_kcap.py) while 512 serves
        # typical screen cuts (denser visits escalate).  Per-visit hit
        # counts scale with the tile AREA, so the budget does too —
        # a flat 512 at tile 8192 would flag every visit of the same cut.
        # krow 4*r1: a 2*r1 variant measured SLOWER (the (tile, 4)
        # per-row lists mis-tile on the 8x128 register layout), so the
        # wider budget stays
        tiers = [(min(r1, blk), min(4 * r1, tile),
                  max(64, (tile * tile) >> 15))]
    # escalation budgets never below tier 1's: with GMAT_TPU_RMAX >= 9 a
    # fixed (8, 64) tier would re-dispatch visits it provably cannot serve
    # (max(bc) > r1 > 8) before falling to legacy (ADVICE r4 low)
    r1_, k1_ = tiers[0][0], tiers[0][1]
    big = (min(max(8, r1_), blk), min(max(64, k1_), tile), 32768)
    if tiers[0][:2] != big[:2]:
        tiers.append(big)
    return tiers


def _fused_visit(tp_row, a_gath, b_mat, anchors_padded, bins_anchor, t2_p,
                 mask_mode, tile, rounds, krow, flat_cut, m, py=None):
    """One (anchor-tile, partner-tile) visit of the fused screen.

    Computes the tile GEMM once and extracts its hits in the same program
    via BITMASK ENUMERATION over UNROLLED ROUNDS: the (tile, tile) score
    panel is viewed as (tile, n_blk, 32) lane groups whose hit patterns
    pack into uint32 bitmasks in ONE fused pass over the panel; each
    unrolled round then peels every group's lowest set bit with pure
    integer ops on the TINY (tile, n_blk) mask array (`b & -b`,
    population_count) and reads the corresponding score values with one
    masked reduce over the panel.  Round-4's max-based rounds re-read the
    panel ~3x per round (max, tie-broken arg, value select); this form
    touches it once per round plus once for the masks — the sweep was
    extraction-bound at ~1.4x the GEMM cost (VERDICT r4 #3).  `rounds` is
    a STATIC unroll count (a lax.cond costs ~0.75 ms/visit, a while_loop
    ~3 ms/visit — tools/bench_fused_profile.py); the driver escalates
    denser visits through `_fused_tiers` instead of looping.  The
    candidate grid (tile, n_blk, rounds) then compacts to per-row
    (tile, krow) hit lists by prefix-rank masked reduces — no gathers
    (per-row take_along_axis gathers measured ~2 ms/visit).

    Exactness: a visit is fully served iff max(bc) <= rounds (every hit
    reached by some round) AND max(rc) <= krow (per-row lists hold them);
    `flag` reports violations for the driver's escalation.  Matches the
    reference C kernel's extraction-at-scan-speed contract
    (_remma_epi_eff_cpu.c:69-77) and its unbounded hits-per-anchor
    (:125-137).  Returns (count, flag, a_idx (TA,), rc_cap (TA,),
    cols (TA, krow), vals (TA, krow)) — per-row hits ordered block-major,
    round-minor, ascending lane within a group (assembly lexsorts per
    tile, so enumeration order never reaches the output contract)."""
    dtype = a_gath.dtype
    t, pt = tp_row[0] * tile, tp_row[1] * tile
    a = jax.lax.dynamic_slice_in_dim(a_gath, t, tile, axis=1)
    if py is not None:
        # scale-in-visit path: a_gath is the RAW coded panel (identity
        # anchors skip the gather+scale copy, whose 3x-panel peak OOMs a
        # 16 GB chip at >=1M SNPs); one (n, tile) multiply per visit
        a = a * py[:, None]
    b = jax.lax.dynamic_slice_in_dim(b_mat, pt, tile, axis=1)
    s = a.T @ b  # (TA, TC) — the MXU GEMM
    a_idx = jax.lax.dynamic_slice_in_dim(anchors_padded, t, tile)
    jt = jnp.arange(tile, dtype=jnp.int32)
    j_ids = pt + jt
    if flat_cut:
        cuts = t2_p[0, 0]
    else:
        ba = jax.lax.dynamic_slice_in_dim(bins_anchor, t, tile)
        cuts = jax.nn.one_hot(ba, 11, dtype=dtype) @ (
            jax.lax.dynamic_slice_in_dim(t2_p, pt, tile, axis=1))
    if mask_mode == "tri":
        valid = j_ids[None, :] > a_idx[:, None]
    else:
        valid = j_ids[None, :] != a_idx[:, None]
    valid &= j_ids[None, :] < jnp.int32(m)
    # sentinel anchor ids (>= m) mark padding slots of the identity-anchor
    # path: their rows read real columns but belong to no anchor
    valid &= a_idx[:, None] < jnp.int32(m)
    hit = (jnp.abs(s) > cuts) & valid

    blk = _FUSED_BLK if tile % _FUSED_BLK == 0 else tile  # <=32 lanes/group
    n_blk = tile // blk
    hit3 = hit.reshape(tile, n_blk, blk)
    s3 = s.reshape(tile, n_blk, blk)
    iota_u = jnp.arange(blk, dtype=jnp.uint32)[None, None, :]
    # ONE fused pass over the panel packs every group's hit pattern into a
    # uint32; all counts and round lanes derive from this tiny array
    bmask = jnp.sum(hit3.astype(jnp.uint32) << iota_u, axis=2,
                    dtype=jnp.uint32)  # (TA, n_blk)
    bc = jax.lax.population_count(bmask).astype(jnp.int32)
    rc = jnp.sum(bc, axis=1, dtype=jnp.int32)  # (TA,) true per-row counts
    count = jnp.sum(rc, dtype=jnp.int32)  # pinned: x64 would promote
    flag = (jnp.max(bc) > rounds) | (jnp.max(rc) > krow)
    iota_b = jnp.arange(blk, dtype=jnp.int32)[None, None, :]
    colbase = pt + (jnp.arange(n_blk, dtype=jnp.int32) * blk)[None, :]

    # unrolled rounds: round r peels each group's lowest remaining set bit
    # (b & -b isolates it; population_count(lsb - 1) is its lane).  A
    # group with no r-th hit yields lane 32 -> `sel` empty, value 0, and a
    # column past the block that the acceptance mask below zeroes out.
    # Hit enumeration by set bits has no tie-breaking concerns at all
    # (exact-|s| duplicates occupy distinct lanes by construction).
    one = jnp.uint32(1)
    vs, cs = [], []
    b = bmask
    for r in range(rounds):
        lsb = b & (~b + one)
        lane = jax.lax.population_count(lsb - one).astype(jnp.int32)
        sel = iota_b == lane[:, :, None]
        vs.append(jnp.sum(jnp.where(sel, s3, 0), axis=2))
        cs.append(colbase + jnp.minimum(lane, blk - 1))
        if r + 1 < rounds:
            b = b & (b - one)
    # candidate grid -> per-row (krow,) hit lists, block-major round-minor:
    # accept = (round < bc), destination = prefix rank.  Each output slot k
    # holds AT MOST ONE candidate per row (prefix ranks are strictly
    # increasing over accepted candidates), so slot k is one masked sum
    # over the candidate axis — pure exact adds (f32 single value / int32
    # columns).  The round-4 one-hot MXU contraction this replaces
    # materialized a (tile, n_blk*rounds, krow) one-hot panel (67 MB at
    # the bench tier) and needed HIGHEST-precision bf16x3 passes for
    # integer-exact columns (ADVICE r4 high); XLA fuses the krow sibling
    # reduces below into one pass over the candidate grid instead.
    vals_c = jnp.stack(vs, axis=2).reshape(tile, n_blk * rounds)
    cols_c = jnp.stack(cs, axis=2).reshape(tile, n_blk * rounds)
    acc = (bc[:, :, None] > jnp.arange(rounds, dtype=jnp.int32)
           ).reshape(tile, n_blk * rounds)
    # prefix ranks via a lower-triangular-ones MXU dot: jnp.cumsum lowers
    # to a log-shift add chain over the (tile, n_blk*rounds) grid on TPU
    # while one (c, c) matmul rides the MXU; HIGHEST precision (bf16x3)
    # keeps the integer ranks (< 2^24) exact
    nc = n_blk * rounds
    tri = jnp.tril(jnp.ones((nc, nc), dtype))
    pos = jnp.einsum("rc,cd->rd", acc.astype(dtype), tri,
                     precision=jax.lax.Precision.HIGHEST
                     ).astype(jnp.int32) - 1
    pos = jnp.where(acc, pos, -1)
    vvals, vcols = [], []
    for k in range(krow):
        sel = pos == k
        vvals.append(jnp.sum(jnp.where(sel, vals_c, 0), axis=1))
        vcols.append(jnp.sum(jnp.where(sel, cols_c, 0), axis=1,
                             dtype=jnp.int32))
    vals = jnp.stack(vvals, axis=1)
    cols = jnp.stack(vcols, axis=1)
    rc_cap = jnp.minimum(rc, krow)
    return count, flag, a_idx, rc_cap, cols, vals


def _fused_map_and_compact(worklist, a_gath, b_mat, anchors_padded,
                           bins_anchor, t2_p, mask_mode, tile, flat_cut, m,
                           cap, rounds, krow, kcap, py=None):
    """lax.map of `_fused_visit` with per-visit (kcap, 3) buffers, then ONE
    global compaction scatter.  Both scatters have SMALL static sources —
    (tile*krow) rows per visit and (W*kcap) rows once — because the visit
    already compacted its candidate grid to per-row lists; XLA TPU scatter
    costs ~8 ns/row, so source size, not destination size, is the cost
    (a slot->source binary-search gather formulation measured ~1.2 ms/visit
    + 0.5 s/chunk at production kcap — tools/bench_fused_profile.py)."""
    dtype = a_gath.dtype
    rank = jnp.arange(krow, dtype=jnp.int32)[None, :]
    slot = jnp.arange(kcap, dtype=jnp.int32)

    def one(tp_row):
        count, flag, a_idx, rc_cap, cols, vals = _fused_visit(
            tp_row, a_gath, b_mat, anchors_padded, bins_anchor, t2_p,
            mask_mode, tile, rounds, krow, flat_cut, m, py)
        offs = jnp.cumsum(rc_cap, dtype=jnp.int32) - rc_cap
        lv = offs[-1] + rc_cap[-1]
        flag |= lv > kcap
        dest = jnp.where(rank < rc_cap[:, None], offs[:, None] + rank, kcap)
        dest = jnp.minimum(dest, kcap).ravel()
        rows = jnp.stack(
            [jnp.broadcast_to(a_idx[:, None], (tile, krow)).ravel()
             .astype(dtype),
             cols.ravel().astype(dtype), vals.ravel()], axis=1)
        buf = jnp.zeros((kcap + 1, 3), dtype).at[dest, :].set(
            rows, mode="drop")
        return count, flag, jnp.minimum(lv, kcap), buf[:kcap]

    counts, flags, lv, bufs = jax.lax.map(one, worklist)
    starts = jnp.cumsum(lv, dtype=jnp.int32) - lv
    total = starts[-1] + lv[-1]
    # GLOBAL-cap overflow: a visit whose slice would land past `cap` is
    # truncated by the scatter's drop mode — it must FLAG (and re-extract
    # via escalation/legacy) even though its own kcap budget held, and the
    # reported total clamps to the readable prefix
    flags = flags | (starts + lv > cap)
    total = jnp.minimum(total, cap)
    dest = jnp.where(slot[None, :] < lv[:, None],
                     starts[:, None] + slot[None, :], cap)
    dest = jnp.minimum(dest, cap).ravel()
    buf = jnp.zeros((cap + 1, 3), dtype).at[dest, :].set(
        bufs.reshape(-1, 3), mode="drop")
    return buf[:cap], total, counts, flags, lv


_HEAD_SIZES = (1 << 13, 1 << 15, 3 << 15, 1 << 17, 3 << 16, 1 << 18)


@partial(jax.jit, static_argnames=("mask_mode", "tile", "flat_cut", "m",
                                   "cap", "rounds", "krow", "kcap",
                                   "fetch_cap"))
def _fused_screen_scan(worklist, a_gath, b_mat, anchors_padded, bins_anchor,
                       t2_p, mask_mode, tile, flat_cut, m, cap, rounds, krow,
                       kcap, fetch_cap=0, py=None):
    """Fused single-pass screen: ONE dispatch sweeps the whole worklist and
    compacts every visit's hits into a shared global buffer on device.  The
    host then fetches O(hits) bytes instead of the per-tile fixed-capacity
    panels of the two-phase engine (the tunneled device moves ~13-27 MB/s
    device->host, so fetch bytes, not FLOPs, bound phase 2).  The driver
    splits big worklists into EQUAL-shape chunks dispatched back-to-back,
    so each chunk's fetch overlaps the next chunk's compute and this
    program compiles once.

    With fetch_cap == -1 STATIC head slices of the buffer at the
    `_HEAD_SIZES` tiers are returned IN-program; the host fetches the
    smallest head covering the actual hit count — one transfer, no extra
    dispatch.  A host-side [:total] slice is a NEW dispatch that queues
    behind every already-enqueued chunk (FIFO) and would serialize all
    fetches after all compute; heads are lazy on device, so the unfetched
    tiers cost only HBM."""
    buf, total, counts, flags, lv = _fused_map_and_compact(
        worklist, a_gath, b_mat, anchors_padded, bins_anchor, t2_p,
        mask_mode, tile, flat_cut, m, cap, rounds, krow, kcap, py)
    out = {"buf": buf, "total": total, "counts": counts, "flags": flags,
           "lv": lv}
    if fetch_cap == -1:
        out["heads"] = tuple(buf[:s] for s in _HEAD_SIZES if s < cap)
    return out


def _fused_screen_mesh(mesh, worklist, a_gath, b_mat, anchors_padded,
                       bins_anchor, t2_p, mask_mode, tile, flat_cut, m, cap,
                       rounds, krow, kcap, fetch_cap=0, py=None):
    """Fused screen over a device mesh: worklist rows sharded, everything
    else replicated; each device runs the same per-visit math into its own
    global buffer, so the merged (visit-keyed) output is byte-identical to
    single-device.  Worklist must be padded to a mesh-size multiple.

    With fetch_cap > 0 a STATIC per-device head slice of each buffer is
    returned IN-program (same contract as `_fused_screen_scan`): the
    driver's chunked dispatches then pipeline their fetches behind the
    next chunk's compute instead of issuing host-side [:total] slices that
    FIFO-queue behind every enqueued chunk (round-4 disabled chunking for
    meshes entirely — VERDICT r4 #6)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from gmat_tpu.dist.mesh import AXIS

    specs = (P(AXIS, None, None), P(AXIS), P(AXIS, None),
             P(AXIS, None), P(AXIS, None))
    if fetch_cap:
        specs = specs + (P(AXIS, None, None),)

    in_specs = (P(AXIS, None), P(None, None), P(None, None), P(None),
                P(None), P(None, None))
    if py is not None:
        in_specs = in_specs + (P(None),)

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=specs)
    def kernel(wl, ag, bm, ap, ba, tp, *py_arg):
        buf, total, counts, flags, lv = _fused_map_and_compact(
            wl, ag, bm, ap, ba, tp, mask_mode, tile, flat_cut, m, cap,
            rounds, krow, kcap, py_arg[0] if py_arg else None)
        outs = (buf[None], total[None], counts[None], flags[None], lv[None])
        if fetch_cap:
            return (buf[:fetch_cap][None],) + outs[1:] + (outs[0],)
        return outs

    extra = () if py is None else (py,)
    return kernel(worklist, a_gath, b_mat, anchors_padded, bins_anchor,
                  t2_p, *extra)


def _screen_slack() -> float:
    """Threshold slack compensating the screen GEMM's compute precision.

    On TPU the default-precision float32 matmul computes in bfloat16 with
    f32 accumulation (~2^-8 relative error), so a pair whose true |eff| sits
    just above the cut can read just below it.  A false negative is
    unrecoverable — the pair never reaches the exact re-test — while a false
    positive merely costs one exact re-test.  Lowering the effective cut by
    2^-6 (4x the bf16 epsilon: the effect GEMM and the one-hot threshold
    matmul each contribute up to ~2^-8 relative rounding) keeps the GEMM at
    full MXU speed and pushes the borderline band into the exact re-test
    instead.  On CPU the f32 GEMM is exact-precision and no slack is
    needed."""
    import jax

    return 2.0 ** -6 if jax.default_backend() == "tpu" else 0.0


def _screen_tile_body(tstart, anchors_padded, bins_anchor, a_gath, b_mat,
                      t2_p, chunk_counts, mask_mode, tile, cap, k_row=0,
                      flat_cut=False):
    """One anchor tile vs all partners -> compacted hits.

    a_gath: (n, n_tiles*TA) all anchor columns pre-scaled by pymat (sliced
    at tstart so batched calls reuse one gather); bins_anchor: (n_tiles*TA,)
    anchor MAF bins; b_mat: (n, m) partner-coded matrix; t2_p: (11, m)
    bin-pair thresholds expanded over partners; chunk_counts: (p_tiles,)
    phase-1 hit counts of THIS anchor tile against each partner tile.
    mask_mode: 'tri' keeps j > i (AA/DD); 'nodiag' keeps j != i (AD).
    Returns (count, idx0, idx1, eff) with fixed capacity `cap`.

    TPU notes (each measured on the yeast-scale stress shape):
    - per-pair cuts come from two small one-hot matmuls, not a (TA, m)
      table gather — under the package-global x64 mode that gather emits
      emulated int64 index math (seconds per tile);
    - compaction is a hand-rolled int32 prefix-sum + scatter rather than
      `jnp.nonzero` (int64 again: 10.5s -> 0.6s per tile).  Hits beyond
      `cap` are dropped by the scatter (`mode="drop"`); the driver sizes
      `cap` from the phase-1 counts, which upper-bound every tile;
    - the partner axis is CHUNKED at the phase-1 tile granularity with a
      lax.scan (a dense (tile, m) pass holds ~3 int32 copies of tile*m —
      measured HBM OOM at the 262144-SNP bench shape), and chunks whose
      phase-1 count is zero are lax.cond-SKIPPED, so extraction work is
      proportional to hot tile-pairs, not the panel width.
    """
    dtype = a_gath.dtype
    m = b_mat.shape[1]
    a_idx = jax.lax.dynamic_slice_in_dim(anchors_padded, tstart, tile)
    a_scaled = jax.lax.dynamic_slice_in_dim(a_gath, tstart, tile, axis=1)
    ba = jax.lax.dynamic_slice_in_dim(bins_anchor, tstart, tile)
    cut_onehot = jax.nn.one_hot(ba, 11, dtype=dtype)  # (TA, 11)
    chunk = min(tile, m)
    n_chunks = -(-m // chunk)
    if n_chunks * chunk != m:
        # pad partners; +inf thresholds make padded columns unhittable even
        # for keep-everything NEGATIVE cuts
        b_mat = jnp.pad(b_mat, ((0, 0), (0, n_chunks * chunk - m)))
        t2_p = jnp.pad(t2_p, ((0, 0), (0, n_chunks * chunk - m)),
                       constant_values=jnp.inf)
    jt = jnp.arange(chunk, dtype=jnp.int32)
    k_eff = min(k_row, chunk) if k_row else 0

    def hits_of(pc):
        pstart = pc * chunk
        b = jax.lax.dynamic_slice_in_dim(b_mat, pstart, chunk, axis=1)
        s = a_scaled.T @ b  # (TA, chunk) — the MXU GEMM
        if flat_cut:
            # non-MAF screens use one global threshold (the flagship approx
            # path): skip the one-hot matmuls and the (TA, chunk) cut panel
            cuts = t2_p[0, 0]
        else:
            cuts = cut_onehot @ jax.lax.dynamic_slice_in_dim(
                t2_p, pstart, chunk, axis=1)
        j_ids = (pstart + jt)[None, :]
        if mask_mode == "tri":
            valid = j_ids > a_idx[:, None]
        else:
            valid = j_ids != a_idx[:, None]
        if flat_cut:
            valid &= j_ids < jnp.int32(m)  # pad columns (see +inf pad below)
        return s, j_ids, (jnp.abs(s) > cuts) & valid

    def work_scatter(carry, pc):
        buf_i, buf_j, buf_e, total, max_rc = carry
        s, j_ids, hit = hits_of(pc)
        flat = hit.ravel()
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1 + total
        dest = jnp.where(flat, pos, cap)  # non-hits -> spare slot; the
        # clamp drops overflow hits (the caller's cap covers the phase-1
        # count so this never truncates real output)
        dest = jnp.minimum(dest, cap)
        buf_i = buf_i.at[dest].set(
            jnp.broadcast_to(a_idx[:, None], hit.shape).ravel(),
            mode="drop")
        buf_j = buf_j.at[dest].set(
            jnp.broadcast_to(j_ids, hit.shape).ravel(), mode="drop")
        buf_e = buf_e.at[dest].set(s.ravel(), mode="drop")
        return buf_i, buf_j, buf_e, pos[-1] + 1, max_rc

    def work_topk(carry, pc):
        # scatter-free candidate selection: a 16M-update scatter per chunk
        # is the slowest op XLA emits on TPU; per-row top-k keeps only
        # (TA, k) candidates so the scatter shrinks by chunk/k (128x at
        # the default tile).  Rows with > k hits are detected via max_rc
        # and the driver retries the tile with k doubled.
        buf_i, buf_j, buf_e, total, max_rc = carry
        s, j_ids, hit = hits_of(pc)
        # +1 ranks EVERY hit above every non-hit even when eff == 0
        # exactly (keep-all negative cuts, monomorphic SNPs)
        key = jnp.where(hit, jnp.abs(s) + 1, 0)
        _, kidx = jax.lax.top_k(key, k_eff)  # (TA, k)
        row_cnt = jnp.sum(hit, axis=1, dtype=jnp.int32)
        rc_cap = jnp.minimum(row_cnt, k_eff)
        offs = total + jnp.cumsum(rc_cap) - rc_cap  # exclusive, int32
        rank = jnp.arange(k_eff, dtype=jnp.int32)[None, :]
        dest = jnp.where(rank < rc_cap[:, None], offs[:, None] + rank, cap)
        dest = jnp.minimum(dest, cap).ravel()
        cols = (j_ids[0, 0] + kidx).ravel()  # pstart + in-chunk index
        buf_i = buf_i.at[dest].set(
            jnp.broadcast_to(a_idx[:, None], (tile, k_eff)).ravel(),
            mode="drop")
        buf_j = buf_j.at[dest].set(cols, mode="drop")
        buf_e = buf_e.at[dest].set(
            jnp.take_along_axis(s, kidx, axis=1).ravel(), mode="drop")
        return (buf_i, buf_j, buf_e,
                total + jnp.sum(row_cnt, dtype=jnp.int32),
                jnp.maximum(max_rc, jnp.max(row_cnt)))

    work = work_topk if k_eff else work_scatter

    def step(carry, pc):
        return jax.lax.cond(chunk_counts[pc] > 0, work,
                            lambda c, _: c, carry, pc), None

    # derive the init from tstart so it carries the same varying-axis type
    # as the body outputs when this runs inside shard_map (a plain zeros
    # init is replicated and lax.scan rejects the carry-type mismatch)
    zero = tstart * 0
    init = (jnp.zeros((cap + 1,), jnp.int32) + zero,
            jnp.zeros((cap + 1,), jnp.int32) + zero,
            jnp.zeros((cap + 1,), dtype) + zero.astype(dtype), zero, zero)
    (buf_i, buf_j, buf_e, count, max_rc), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32))
    return count, buf_i[:cap], buf_j[:cap], buf_e[:cap], max_rc


@partial(jax.jit, static_argnames=("mask_mode", "tile", "cap", "k_row",
                                   "flat_cut"))
def _screen_tiles_batch(tstarts, chunk_counts, anchors_padded, bins_anchor,
                        a_gath, b_mat, t2_p, mask_mode, tile, cap, k_row=0,
                        flat_cut=False):
    """Phase 2, ONE dispatch for a batch of hot anchor tiles: lax.map of
    `_screen_tile_body` over the (K,) tile starts (chunk_counts: (K,
    p_tiles) phase-1 counts).  Returns per-tile (counts (K,), idx0 (K, cap),
    idx1 (K, cap), eff (K, cap), max_row_count (K,))."""

    def one(args):
        tstart, cc = args
        return _screen_tile_body(tstart, anchors_padded, bins_anchor, a_gath,
                                 b_mat, t2_p, cc, mask_mode, tile, cap,
                                 k_row, flat_cut)

    return jax.lax.map(one, (tstarts, chunk_counts))


def _screen_tiles_mesh(mesh, tstarts, chunk_counts, anchors_padded,
                       bins_anchor, a_gath, b_mat, t2_p, mask_mode, tile,
                       cap, k_row=0, flat_cut=False):
    """Phase 2 over a device mesh: the hot-tile list is sharded over the
    mesh axis (anchors/partners/thresholds replicated); each device runs the
    SAME per-tile math as the single-device path, so the merged output is
    byte-identical to a single-device run.  `tstarts` must be padded to a
    multiple of the mesh size (the driver dedups repeated tiles)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from gmat_tpu.dist.mesh import AXIS

    # replicated outputs: multi-process hosts cannot fetch sharded arrays
    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS, None), P(None), P(None), P(None, None),
                  P(None, None), P(None, None)),
        out_specs=(P(AXIS), P(AXIS, None), P(AXIS, None), P(AXIS, None),
                   P(AXIS)),
    )
    def kernel(ts, cc, ap, ba, ag, bm, tp):
        def one(args):
            tstart, cc_row = args
            return _screen_tile_body(tstart, ap, ba, ag, bm, tp, cc_row,
                                     mask_mode, tile, cap, k_row, flat_cut)

        return jax.lax.map(one, (ts, cc))

    return kernel(tstarts, chunk_counts, anchors_padded, bins_anchor, a_gath,
                  b_mat, t2_p)


@jax.jit
def _gather_scale(a_mat, idx, py):
    """One up-front anchor gather + pymat scale (strided per-tile column
    gathers on TPU cost more than the extraction GEMM itself).

    Memory: XLA holds the input, the gather and the scaled product at
    once — 3x the anchor panel.  At >=1M-SNP full scans that peaks past
    a v5e's 15.75 GB HBM, so the fused driver detects identity anchor
    lists there and skips this copy entirely (scale-in-visit path); a
    chunked fori_loop variant was measured to double-buffer its carry
    and OOM identically."""
    return a_mat[:, idx] * py[:, None]


@partial(jax.jit, static_argnames=("tile", "chunk"))
def _screen_panel(tstart, pstart, a_gath, b_mat, tile, chunk):
    """One raw (tile, chunk) score panel for the DENSE extraction path."""
    a_scaled = jax.lax.dynamic_slice_in_dim(a_gath, tstart, tile, axis=1)
    b = jax.lax.dynamic_slice_in_dim(b_mat, pstart, chunk, axis=1)
    return a_scaled.T @ b


def _dense_extract(t, count_row, padded_all, a_gath, b_pad, bins_a, bins_b,
                   table, mask_mode, tile, chunk, m):
    """Keep-all/dense tiles: fetch raw score panels and threshold on host.

    When a tile keeps >~12.5% of its pairs (eff_cut=-999 keep-everything
    screens, scan/accel.py's default), on-device compaction allocates
    buffers the size of the panel anyway and the capacity-bucketed batch
    would hold ndev such buffers at once — measured HBM cliff at yeast
    scale (VERDICT round-2 weak #5).  Fetching the (tile, chunk) GEMM
    panels directly bounds memory at one panel per step; the threshold
    compare runs in float32 on host, identical to the device compare, so
    output stays byte-identical to the sparse path."""
    idx11 = np.arange(11)[:, None] * 10 + np.arange(11)[None, :]
    t2 = np.asarray(table)[idx11].astype(np.float32)
    i_ids = padded_all[t * tile:(t + 1) * tile]
    his, hjs, hes = [], [], []
    for pc in np.nonzero(count_row)[0]:
        pstart = int(pc) * chunk
        s = np.asarray(_screen_panel(t * tile, pstart, a_gath, b_pad,
                                     tile, chunk))
        j_ids = pstart + np.arange(chunk)
        cuts = t2[np.asarray(bins_a)[i_ids][:, None],
                  np.asarray(bins_b)[np.minimum(j_ids, m - 1)][None, :]]
        if mask_mode == "tri":
            valid = j_ids[None, :] > i_ids[:, None]
        else:
            valid = j_ids[None, :] != i_ids[:, None]
        valid &= j_ids[None, :] < m  # padded partner columns
        r, c = np.nonzero((np.abs(s) > cuts) & valid)
        his.append(i_ids[r].astype(np.int32))
        hjs.append((pstart + c).astype(np.int32))
        hes.append(s[r, c])
    if not his:
        z = np.empty(0, np.int32)
        return z, z, np.empty(0, np.float32)
    return np.concatenate(his), np.concatenate(hjs), np.concatenate(hes)


def _bin_table_11(table):
    """(11, 11) view of the flat bin-pair table (index = bin_i*10 + bin_j,
    reference layout incl. its (0,10)/(1,0) collision)."""
    idx = jnp.arange(11)[:, None] * 10 + jnp.arange(11)[None, :]
    return table[idx]


def _auto_tile(n_anchors: int, m: int | None = None) -> int:
    """MXU-efficient anchor-tile edge: the screen GEMM rate grows with tile
    size until ~4096 (measured 26.7 -> 32.1 G pairs/s going 2048 -> 4096 on
    the bench chip), so pick the largest power of two <= 4096 that does not
    overshoot the anchor count by more than the padding dedup can absorb.
    The extraction kernel flattens a (tile, m) hit mask with int32 indices,
    so tile*m must stay below 2^31."""
    t = 256
    while t < 4096 and t < n_anchors:
        t *= 2
    if m is not None:
        while t > 1 and t * m >= 2**31:
            t //= 2
    return t


def _tile_worklist(anchors: np.ndarray, m: int, mask_mode: str,
                   tile: int) -> np.ndarray:
    """Host-side (anchor-tile, partner-tile) work list.

    For triangular scans, partner tiles entirely left of a tile's smallest
    anchor contain no j > i pairs and are dropped — for a full scan this
    halves the GEMM work (the reference's C kernel gets the same effect from
    its j = i+1 loop start)."""
    n_tiles = len(anchors) // tile
    p_tiles = -(-m // tile)
    min_ids = anchors.reshape(n_tiles, tile).min(axis=1)
    work = [
        (t, pt)
        for t in range(n_tiles)
        for pt in range(p_tiles)
        if mask_mode != "tri" or (pt + 1) * tile - 1 > min_ids[t]
    ]
    return np.asarray(work, dtype=np.int32).reshape(-1, 2)


@partial(jax.jit, static_argnames=("mask_mode", "tile", "flat_cut"))
def _screen_counts_all(anchors_padded, a_mat, b_mat, py, bins_a, bins_b,
                       table, worklist, mask_mode, tile, flat_cut=False):
    """Phase 1: hit counts for every (anchor-tile, partner-tile) pair of the
    work list in ONE dispatch.

    On tunneled/remote devices each dispatch costs a full round trip, so the
    whole sweep is one lax.map returning a tiny per-pair count vector; only
    non-empty anchor tiles are revisited for extraction.

    TPU notes: anchor columns are gathered ONCE up front (per-tile column
    gathers are strided and slow), and per-pair thresholds come from the
    bin-pair table via one-hot matmuls (an 8M-element table gather per tile
    costs more than the screen GEMM itself).

    bins_a index the table rows (anchor side), bins_b the columns (partner
    side) — distinct for AD, where the reference bins the A side by MAF and
    the D side by heterozygote frequency (C kernel :330,337)."""
    dtype = a_mat.dtype
    m = b_mat.shape[1]
    m_pad = -(-m // tile) * tile
    if m_pad != m:
        # pad partners with zero columns: |s| = 0 is never > a cut >= 0 with
        # the strict comparison, so padding adds no hits.  (Keep-everything
        # NEGATIVE cuts count padding columns here, which only marks tiles
        # hot; phase-2 extraction runs on the unpadded partner matrix and
        # emits no padded pairs.)
        b_mat = jnp.pad(b_mat, ((0, 0), (0, m_pad - m)))
        bins_b = jnp.pad(bins_b, (0, m_pad - m))
    a_gath = a_mat[:, anchors_padded] * py[:, None]  # one gather + scale
    bins_anchor = bins_a[anchors_padded]
    t2 = _bin_table_11(table).astype(dtype)  # (11, 11)
    t2_p = t2 @ jax.nn.one_hot(bins_b, 11, dtype=dtype).T  # (11, m_pad)
    jt = jnp.arange(tile, dtype=jnp.int32)

    def pair_fn(tp):
        t, pt = tp[0], tp[1]
        a = jax.lax.dynamic_slice_in_dim(a_gath, t * tile, tile, axis=1)
        ids = jax.lax.dynamic_slice_in_dim(anchors_padded, t * tile, tile)
        ba = jax.lax.dynamic_slice_in_dim(bins_anchor, t * tile, tile)
        pstart = pt * tile
        b = jax.lax.dynamic_slice_in_dim(b_mat, pstart, tile, axis=1)
        s = a.T @ b
        if flat_cut:
            # one global threshold (non-MAF screens): scalar compare, no
            # one-hot matmuls, no (TA, tile) cut panel
            cuts = t2_p[0, 0]
        else:
            cuts = jax.nn.one_hot(ba, 11, dtype=dtype) @ (
                jax.lax.dynamic_slice_in_dim(t2_p, pstart, tile, axis=1))
        j_ids = (pstart + jt)[None, :]
        if mask_mode == "tri":
            valid = j_ids > ids[:, None]
        else:
            valid = j_ids != ids[:, None]
        if flat_cut:
            valid &= j_ids < jnp.int32(m)  # padded partner columns
        return jnp.sum((jnp.abs(s) > cuts) & valid)

    return jax.lax.map(pair_fn, worklist)


def _screen_counts_mesh(mesh, anchors_padded, a_mat, b_mat, py, bins_a,
                        bins_b, table, worklist, mask_mode, tile,
                        flat_cut=False):
    """Phase 1 over a device mesh: the (anchor-tile, partner-tile) worklist
    is sharded over the mesh axis, genotype codings/pymat/thresholds
    replicated — each device computes the SAME per-pair counts as
    `_screen_counts_all`, so the host-side hot-tile logic (and hence the
    final output) is byte-identical to single-device.  Worklist rows must be
    padded to a multiple of the mesh size (duplicated rows; the caller
    truncates the returned counts)."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from gmat_tpu.dist.mesh import AXIS

    dtype = a_mat.dtype
    m = b_mat.shape[1]
    m_pad = -(-m // tile) * tile
    if m_pad != m:
        b_mat = jnp.pad(b_mat, ((0, 0), (0, m_pad - m)))
        bins_b = jnp.pad(bins_b, (0, m_pad - m))
    a_gath = a_mat[:, anchors_padded] * py[:, None]
    bins_anchor = bins_a[anchors_padded]
    t2 = _bin_table_11(table).astype(dtype)
    t2_p = t2 @ jax.nn.one_hot(bins_b, 11, dtype=dtype).T  # (11, m_pad)
    jt = jnp.arange(tile, dtype=jnp.int32)

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(None), P(None, None), P(None),
                  P(None, None), P(None, None)),
        out_specs=P(AXIS),
    )
    def kernel(wl, ids_all, ag, ba_all, bm, tp):
        def pair_fn(tp_pair):
            t, pt = tp_pair[0], tp_pair[1]
            a = jax.lax.dynamic_slice_in_dim(ag, t * tile, tile, axis=1)
            ids = jax.lax.dynamic_slice_in_dim(ids_all, t * tile, tile)
            ba = jax.lax.dynamic_slice_in_dim(ba_all, t * tile, tile)
            pstart = pt * tile
            b = jax.lax.dynamic_slice_in_dim(bm, pstart, tile, axis=1)
            s = a.T @ b
            if flat_cut:
                cuts = tp[0, 0]
            else:
                cuts = jax.nn.one_hot(ba, 11, dtype=dtype) @ (
                    jax.lax.dynamic_slice_in_dim(tp, pstart, tile, axis=1)
                )
            j_ids = (pstart + jt)[None, :]
            if mask_mode == "tri":
                valid = j_ids > ids[:, None]
            else:
                valid = j_ids != ids[:, None]
            if flat_cut:
                valid &= j_ids < jnp.int32(m)
            return jnp.sum((jnp.abs(s) > cuts) & valid)

        return jax.lax.map(pair_fn, wl)

    return kernel(worklist, anchors_padded, a_gath, bins_anchor, b_mat, t2_p)


def _pad_rows_to(arr: np.ndarray, mult: int) -> np.ndarray:
    """Pad the leading axis to a multiple of `mult` by repeating the last
    row (duplicated work items; results for them are discarded)."""
    pad = (-len(arr)) % mult
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
    return arr


def _merge_tile_res(tile_res, t, cur):
    """Merge extraction results for one anchor tile: fused-served visits
    and legacy-re-extracted flagged visits are disjoint tile-pair sets, so
    concatenation is duplicate-free (assembly lexsorts per tile)."""
    prev = tile_res.get(t)
    if prev is not None:
        cur = tuple(np.concatenate([p, q]) for p, q in zip(prev, cur))
    tile_res[t] = cur


def _run_screen(*args, **kwargs):
    """`_run_screen_impl` under the optional jax.profiler trace hook
    (GMAT_TPU_TRACE_DIR; core/roofline.py)."""
    with maybe_trace("screen"):
        return _run_screen_impl(*args, **kwargs)


def _run_screen_impl(a_mat, b_mat, pymat, anchors, bins_a, bins_b, table,
                     mask_mode, tile, flip_output=False, mesh=None):
    """Two-phase host driver: one counts dispatch (phase 1), then batched
    extraction of the non-empty anchor tiles, grouped into capacity buckets
    sized from the phase-1 counts (phase 2) — so every tile fits its buffer
    on the first try and the whole phase is a handful of dispatches, not one
    per hot tile.  With `mesh`, both phases shard their work lists over the
    device mesh; the per-tile math is unchanged, so mesh output is
    byte-identical to single-device.  Returns (i, j, eff) arrays.  bins_a
    index the threshold table's rows at the anchor SNP, bins_b its columns
    at the partner SNP."""
    anchors = np.asarray(anchors, dtype=np.int32)
    n_tiles = -(-len(anchors) // tile)
    padded_all = np.pad(anchors, (0, n_tiles * tile - len(anchors)),
                        constant_values=anchors[-1])
    bins_a_d = jnp.asarray(bins_a, dtype=jnp.int32)
    bins_b_d = jnp.asarray(bins_b, dtype=jnp.int32)
    table = np.asarray(table) * (1.0 - _screen_slack())
    # non-MAF screens use ONE global threshold: the per-pair one-hot
    # threshold matmuls and cut panels are dead weight there (the flagship
    # approx pipelines all take this path)
    flat_cut = bool(np.ptp(table) == 0.0)
    table_d = jnp.asarray(table, dtype=a_mat.dtype)
    # Pallas engine: the flagship symmetric flat-cut full scans switch to
    # the fused Mosaic kernels when the capability probe passes
    # (GMAT_TPU_ENGINE overrides; kernels.engine_choice)
    from gmat_tpu.scan import kernels as _pk

    m_part = b_mat.shape[1]
    choice = _pk.engine_choice()
    if (choice != "xla" and mesh is None and mask_mode == "tri"
            and not flip_output and a_mat is b_mat and flat_cut
            and float(table.ravel()[0]) > 0
            and np.array_equal(anchors, np.arange(m_part - 1))):
        try:
            cut = float(table.ravel()[0])
            i0, i1, eff = _pk.pallas_screen(
                a_mat, pymat, cut, interpret=(choice == "pallas-interpret"))
            order = np.lexsort((i1, i0))
            logger.info("Screen engine: %s, %d hits", choice, len(i0))
            return (i0[order].astype(np.int64), i1[order].astype(np.int64),
                    eff[order])
        except _pk.PallasDenseError as exc:
            # too many hot tiles for the in-kernel extraction layout: the
            # XLA fused engine handles dense workloads; keep Pallas enabled
            logger.info("Pallas screen deferred to XLA engine: %s", exc)
        except Exception as exc:  # Mosaic compile/runtime failure
            logger.warning("Pallas screen failed (%r); XLA engine takes "
                           "over for this process", exc)
            _pk.disable_pallas()
    work = _tile_worklist(padded_all, b_mat.shape[1], mask_mode, tile)
    ndev = int(mesh.devices.size) if mesh is not None else 1
    clock_t0 = time.perf_counter()
    m_true = b_mat.shape[1]
    screen_mode = os.environ.get("GMAT_TPU_SCREEN", "fused")
    # keep-everything cuts (non-positive thresholds) hit every pair: no
    # per-row budget can serve them and the two-phase engine's dense
    # raw-panel path is the designed route; the fused float32 buffers also
    # cap exactly-representable SNP indices at 2^24 (ADVICE r3), so huge
    # panels stay on the int32 two-phase engine
    keep_all = bool(np.all(np.asarray(table) <= 0.0))
    use_fused = (screen_mode in ("fused", "fused-always")
                 and not keep_all and m_true < 2 ** 24
                 and (tile % _FUSED_BLK == 0 or tile <= 32))
    served = {}  # work index -> (bufs, start, count) from a fused tier
    remaining = None  # work indices needing legacy re-extraction
    if use_fused:
        # fused single pass: counts AND compacted hits in one dispatch;
        # visits denser than a tier's (rounds, krow) budget re-run in one
        # escalation dispatch (C-kernel parity: unbounded hits per anchor,
        # _remma_epi_eff_cpu.c:125-137); visits denser than the last tier
        # and kcap overflows re-extract via the legacy engine
        n_ptiles = -(-m_true // tile)
        # worklists pad to equal chunk shapes with sentinel visits of the
        # pair (0, n_ptiles): their partner slice start clamps (XLA
        # dynamic_slice semantics) onto real columns, but every one of
        # their j_ids is >= m, so the unconditional j < m mask in
        # _fused_visit makes them provably hitless — no sentinel zero
        # tile is materialized (that pad copied the whole (n, m) partner
        # panel: 5.5 GB at a 2^20-SNP panel)
        width = n_ptiles * tile
        if flat_cut:
            # the kernel reads ONE scalar of t2_p on this path: an (11, 1)
            # panel instead of (11, width) saves an 11.7 MB host->device
            # transfer PER CALL at the production shape (~0.9 s through
            # the ~13 MB/s tunnel — measured as the round-4 sweep gap)
            t2_p_f = jnp.full((11, 1), float(np.asarray(table).ravel()[0]),
                              dtype=a_mat.dtype)
        else:
            t2_p_f = jnp.asarray(
                np.asarray(table)[np.arange(11)[:, None] * 10
                                  + np.arange(11)[None, :]]
                [:, np.asarray(bins_b, dtype=np.int64)]
                .astype(np.dtype(a_mat.dtype)))
            t2_p_f = jnp.pad(t2_p_f, ((0, 0), (0, width - m_true)),
                             constant_values=jnp.inf)
        b_pad_d = (jnp.pad(b_mat, ((0, 0), (0, width - m_true)))
                   if width > m_true else b_mat)
        sentinel = np.array([[0, n_ptiles]], dtype=np.int32)
        a_w = n_tiles * tile
        a_bytes = a_mat.shape[0] * a_w * np.dtype(a_mat.dtype).itemsize
        ident = (a_bytes > _GATHER_BYTES_MAX
                 and np.array_equal(anchors,
                                    np.arange(len(anchors),
                                              dtype=anchors.dtype)))
        if ident:
            # identity anchors at a huge panel: the raw coded panel IS
            # the anchor panel, so skip the gather+scale copy (its
            # 3x-panel peak OOMs a 16 GB chip at >=1M SNPs); the pymat
            # scale moves into the visit and padding slots get sentinel
            # id m_true, whose rows the visit mask makes provably hitless
            # — exactly the semantics the duplicated-anchor pad + host
            # dedup produced
            ids = padded_all.copy()
            ids[len(anchors):] = m_true
            padded_d = jnp.asarray(ids)
            a_gath_f = (a_mat if a_w == a_mat.shape[1] else
                        jnp.pad(a_mat, ((0, 0), (0, a_w - a_mat.shape[1]))))
            py_vis = pymat
            logger.info("Fused screen: identity-anchor scale-in-visit path "
                        "(anchor panel %.1f GiB)", a_bytes / 2**30)
        else:
            padded_d = jnp.asarray(padded_all)
            a_gath_f = _gather_scale(a_mat, padded_d, pymat)
            py_vis = None
        bins_anchor_f = bins_a_d[padded_d]
        blk_w = _FUSED_BLK if tile % _FUSED_BLK == 0 else tile
        tiers = _fused_tiers(tile, blk_w, len(work))
        sub_idx = np.arange(len(work))
        pair_counts = np.zeros(len(work), np.int64)
        for tier, (rounds_i, krow_i, kcap_base) in enumerate(tiers):
            work_sub = work[sub_idx]
            # equal-shape chunks dispatched back-to-back: each chunk's
            # O(hits) fetch overlaps the next chunk's compute on the
            # async device queue, and the program compiles ONCE; short
            # worklists skip the extra round trips
            # 2-way chunking for mid-size (>=16 visit) sweeps measured
            # SLOWER than one dispatch (0.25 s vs 0.19 s at the yeast
            # shape): the extra round trips cost more than the overlap
            # buys below ~256 visits
            n_chunks = (8 if len(work_sub) >= 1024 * max(ndev, 1) else
                        4 if len(work_sub) >= 256 * max(ndev, 1) else 1)
            wc = -(-len(work_sub) // (n_chunks * ndev)) * ndev
            # kcap sizes BOTH the per-visit buffer and the global scatter's
            # source (wc*kcap rows at ~90 ns/row): 2048 measured as cheap
            # as 512 while 8192 doubled the whole sweep
            # (tools/bench_fused_profile.py).  Visits beyond kcap flag
            # onward (escalation tiers carry bigger bases, then legacy).
            kcap = 1 << int(np.ceil(np.log2(
                min(max(min(_FUSED_CAP // max(wc, 1), kcap_base),
                        64), tile * krow_i))))
            cap = min(_FUSED_CAP, wc * kcap)
            pad_n = n_chunks * wc - len(work_sub)
            wl_all = np.concatenate(
                [work_sub, np.repeat(sentinel, pad_n, axis=0)])
            args = (a_gath_f, b_pad_d, padded_d, bins_anchor_f, t2_p_f)
            # in-program head slices: each chunk's transfer pipelines
            # behind the next chunk's compute, and single dispatches skip
            # the [:total] slice's extra round trip; a head overflow
            # falls back to the full buffer
            fetch_cap = min(cap, 1 << 18) if n_chunks > 1 else 0
            outs = []
            for c in range(n_chunks):
                chunk = jnp.asarray(wl_all[c * wc:(c + 1) * wc])
                if mesh is not None:
                    outs.append(_fused_screen_mesh(
                        mesh, chunk, *args, mask_mode, tile, flat_cut,
                        m_true, cap, rounds_i, krow_i, kcap, fetch_cap,
                        py_vis))
                else:
                    outs.append(_fused_screen_scan(
                        chunk, *args, mask_mode, tile, flat_cut, m_true,
                        cap, rounds_i, krow_i, kcap, -1, py_vis))
            pc_parts, fl_parts, raw_parts, st_parts = [], [], [], []
            base = 0
            for out in outs:
                if mesh is not None:
                    # ONE round trip for the scalar/vector outputs
                    d_tot, pc_m, fl_m, d_lv = jax.device_get(
                        (out[1], out[2], out[3], out[4]))
                    pc_parts.append(np.asarray(pc_m).reshape(-1))
                    fl_parts.append(
                        np.asarray(fl_m).reshape(-1).astype(bool))
                    d_tot = np.asarray(d_tot)
                    d_lv = np.asarray(d_lv)
                    w_d = d_lv.shape[1]
                    # in-program heads cover all devices in one transfer;
                    # overflow falls back to per-device [:total] slices of
                    # the full buffer (out[5] when fetch_cap is set)
                    head = None
                    if fetch_cap and int(d_tot.max()) <= fetch_cap:
                        head = np.asarray(out[0])
                    full_idx = 5 if fetch_cap else 0
                    starts_c = np.zeros(wc, np.int64)
                    for d in range(ndev):
                        t_d = int(d_tot[d])
                        if head is not None:
                            raw_parts.append(head[d, :t_d])
                        else:
                            raw_parts.append(
                                np.asarray(out[full_idx][d, :t_d]))
                        local = d_lv[d]
                        starts_c[d * w_d:(d + 1) * w_d] = (
                            base + np.cumsum(local) - local)
                        base += t_d
                    st_parts.append(starts_c)
                else:
                    # ONE round trip for the scalars/vectors, then the
                    # smallest in-program head covering the hits
                    total, pc_c, fl_c, lv = jax.device_get(
                        (out["total"], out["counts"], out["flags"],
                         out["lv"]))
                    total = int(total)
                    pc_parts.append(pc_c)
                    fl_parts.append(fl_c.astype(bool))
                    raw = None
                    sizes = [s for s in _HEAD_SIZES if s < cap]
                    for s, h in zip(sizes, out.get("heads", ())):
                        if total <= s:
                            raw = np.asarray(h)[:total]
                            break
                    if raw is None:  # bigger than every head tier
                        raw = np.asarray(out["buf"][:total])
                    raw_parts.append(raw)
                    st_parts.append(base + np.cumsum(lv) - lv)
                    base += total
            raw = np.concatenate(raw_parts)
            pc_i = np.concatenate(pc_parts)[: len(work_sub)]
            flags_i = np.concatenate(fl_parts)[: len(work_sub)]
            starts = np.concatenate(st_parts)[: len(work_sub)]
            bufs_i = (raw[:, 0].astype(np.int64),
                      raw[:, 1].astype(np.int64), raw[:, 2])
            if tier == 0:
                pair_counts = pc_i  # tier 1 visits the full worklist
            for k, v in enumerate(sub_idx):
                if not flags_i[k] and pc_i[k] > 0:
                    served[int(v)] = (bufs_i, int(starts[k]), int(pc_i[k]))
            sub_idx = sub_idx[flags_i]
            if not len(sub_idx):
                break
            logger.info("Fused tier %d flagged %d visits", tier + 1,
                        len(sub_idx))
        remaining = sub_idx
    elif mesh is not None:
        pair_counts = np.asarray(
            _screen_counts_mesh(mesh, jnp.asarray(padded_all), a_mat, b_mat,
                                pymat, bins_a_d, bins_b_d, table_d,
                                jnp.asarray(_pad_rows_to(work, ndev)),
                                mask_mode, tile, flat_cut)
        )[: len(work)]
    else:
        pair_counts = np.asarray(
            _screen_counts_all(jnp.asarray(padded_all), a_mat, b_mat, pymat,
                               bins_a_d, bins_b_d, table_d, jnp.asarray(work),
                               mask_mode, tile, flat_cut)
        )
    # per-phase wall time + throughput: the reference's scan-timing log
    # contract (remma_epiAA_eff.py:81-83 "Running time: Clock time ...")
    dt = time.perf_counter() - clock_t0
    pairs_swept = len(work) * tile * tile
    logger.info(
        "Screen phase 1%s: %d tile pairs in %.3f s (%.3g pairs/s), "
        "%d raw hits", " (fused)" if use_fused else "", len(work), dt,
        pairs_swept / max(dt, 1e-9), int(pair_counts.sum()),
    )
    log_phase("screen/phase1", 2.0 * a_mat.shape[0] * pairs_swept, dt,
              items=pairs_swept)
    counts = np.zeros(n_tiles, dtype=np.int64)
    np.add.at(counts, work[:, 0], pair_counts)
    hot = np.nonzero(counts)[0]
    # dense (anchor-tile, partner-chunk) count grid: phase 2 lax.cond-skips
    # the GEMM + compaction of every zero chunk, so extraction cost tracks
    # hot tile-pairs, not the panel width
    chunk = min(tile, b_mat.shape[1])
    count_grid = np.zeros((n_tiles, -(-b_mat.shape[1] // chunk)), np.int32)
    count_grid[work[:, 0], work[:, 1]] = np.minimum(pair_counts, 2**31 - 1)
    tile_res = {}
    m_total = b_mat.shape[1]
    if use_fused and len(hot):
        # keep every fused-served visit's hits; only `remaining` visits (a
        # row overflowing even the tier-2 escalation budget) re-extract
        # below, at tile-pair granularity, via the legacy engine's count
        # grid
        pieces = {}
        legacy_grid = np.zeros_like(count_grid)
        rem_set = set(int(v) for v in remaining)
        for v in range(len(work)):
            t = int(work[v, 0])
            c = int(pair_counts[v])
            if c == 0:
                continue
            if v in rem_set:
                legacy_grid[t, work[v, 1]] = c
                continue
            pieces.setdefault(t, []).append(served[v])
        for t, sl in pieces.items():
            tile_res[t] = (
                np.concatenate([b[0][s:s + c] for b, s, c in sl]),
                np.concatenate([b[1][s:s + c] for b, s, c in sl]),
                np.concatenate([b[2][s:s + c] for b, s, c in sl]),
            )
        count_grid = legacy_grid
        # per-tile totals over the still-flagged visits only: they size the
        # legacy buckets and the dense-path decision below
        counts = np.zeros(n_tiles, dtype=np.int64)
        if len(remaining):
            np.add.at(counts, work[remaining, 0], pair_counts[remaining])
        hot = np.nonzero(counts)[0]
        logger.info("Fused screen served %d tiles fully; %d flagged visits "
                    "across %d tiles to legacy extraction",
                    len(pieces), len(rem_set), len(hot))
    # dense tiles (keep-everything cuts): direct panel fetch, host threshold
    dense = hot[counts[hot] > (tile * m_total) // 8]
    if len(dense):
        hot = hot[counts[hot] <= (tile * m_total) // 8]
        padded_d = jnp.asarray(padded_all)
        a_gath_dense = _gather_scale(a_mat, padded_d, pymat)
        b_pad = b_mat
        if count_grid.shape[1] * chunk != m_total:
            b_pad = jnp.pad(b_mat,
                            ((0, 0), (0, count_grid.shape[1] * chunk - m_total)))
        for t in dense:
            _merge_tile_res(tile_res, int(t), _dense_extract(
                int(t), count_grid[t], padded_all, a_gath_dense, b_pad,
                bins_a, bins_b, table, mask_mode, tile, chunk, m_total))
        logger.info("Screen dense path: %d tiles extracted via raw panels",
                    len(dense))
    if len(hot):
        # device-side precompute shared by every hot tile; one gather
        padded_d = jnp.asarray(padded_all)
        a_gath_all = _gather_scale(a_mat, padded_d, pymat)
        bins_anchor_d = bins_a_d[padded_d]
        idx11 = np.arange(11)[:, None] * 10 + np.arange(11)[None, :]
        t2_p_d = jnp.asarray(
            np.asarray(table)[idx11][:, np.asarray(bins_b, dtype=np.int64)]
            .astype(np.dtype(a_mat.dtype))
        )
        # bucket hot tiles by capacity: phase-1 counts upper-bound the
        # extraction count (they additionally include padded-partner hits
        # for negative keep-all cuts), so `cap` never overflows
        caps = np.maximum(4096, 1 << np.int64(np.ceil(np.log2(counts[hot]))))
        # collapse the capacity buckets into one dispatch when the padded
        # hit transfer stays small — each dispatch costs a full round trip
        # on tunneled backends (measured ~300 ms each at yeast scale)
        if len(hot) * int(caps.max()) * 12 < 64 << 20:
            caps[:] = caps.max()
        chunk_ = min(tile, b_mat.shape[1])
        mode = os.environ.get("GMAT_TPU_EXTRACT", "topk")
        for cap in np.unique(caps):
            bucket = hot[caps == cap]
            tstarts = (bucket * tile).astype(np.int32)
            ccs = count_grid[bucket]
            # per-row top-k candidate cap: the per-tile total `cap` bounds
            # every row; start at the average-density estimate and let the
            # overflow retry double it.  Dense screens (keep-all cuts) go
            # straight to the scatter path.
            k_row = max(8, 1 << int(np.ceil(np.log2(max(1, cap / tile)))))
            if mode == "scatter" or k_row >= chunk_:
                k_row = 0
            while True:
                if mesh is not None:
                    out = _screen_tiles_mesh(
                        mesh, jnp.asarray(_pad_rows_to(tstarts, ndev)),
                        jnp.asarray(_pad_rows_to(ccs, ndev)),
                        padded_d, bins_anchor_d, a_gath_all, b_mat, t2_p_d,
                        mask_mode, tile, int(cap), k_row, flat_cut)
                else:
                    out = _screen_tiles_batch(
                        jnp.asarray(tstarts), jnp.asarray(ccs),
                        padded_d, bins_anchor_d,
                        a_gath_all, b_mat, t2_p_d, mask_mode, tile,
                        int(cap), k_row, flat_cut)
                cnts, his, hjs, hes, max_rcs = (np.asarray(a) for a in out)
                mx = int(max_rcs.max()) if k_row else 0
                if not k_row or mx <= k_row:
                    break
                # some row had more hits than the candidate cap: double it
                # (one retry suffices: mx is the true densest row)
                k_row = 1 << (mx - 1).bit_length()
                if k_row >= chunk_:
                    k_row = 0  # denser than top-k pays for: scatter path
            for k, t in enumerate(bucket):
                c = int(cnts[k])
                assert c <= cap, "phase-1 count no longer bounds extraction"
                _merge_tile_res(tile_res, int(t),
                                (his[k, :c], hjs[k, :c], hes[k, :c]))
    out_i, out_j, out_e = [], [], []
    for t in sorted(tile_res):
        hi, hj, he = tile_res[int(t)]
        if len(hi) == 0:
            continue
        start = int(t) * tile
        batch = anchors[start:start + tile]
        # canonical (i, j) row order within the tile: the chunked extraction
        # scan emits hits chunk-major, not row-major.  Single fused int64
        # key: ~2x faster than np.lexsort on this host (i, j < 2^24 so the
        # key fits int64 exactly)
        order = np.argsort(hi * np.int64(m_total) + hj, kind="stable")
        hi, hj, he = hi[order], hj[order], he[order]
        if len(batch) < tile:  # drop hits from duplicated padding anchors
            keep = np.isin(hi, batch)
            # padding duplicates batch[-1]; dedupe exact duplicate rows
            hi, hj, he = hi[keep], hj[keep], he[keep]
            _, uniq = np.unique(np.stack([hi, hj]), axis=1, return_index=True)
            uniq = np.sort(uniq)
            hi, hj, he = hi[uniq], hj[uniq], he[uniq]
        if flip_output:
            hi, hj = hj, hi
        out_i.append(hi)
        out_j.append(hj)
        out_e.append(he)
    if len(hot):
        dt2 = time.perf_counter() - clock_t0 - dt
        logger.info("Screen phase 2: extracted %d hits from %d hot tiles "
                    "(%d dispatches) in %.3f s",
                    sum(len(h) for h in out_i), len(hot),
                    len(np.unique(caps)), dt2)
        hot_chunks = int(np.count_nonzero(count_grid[hot]))
        log_phase("screen/phase2", 2.0 * a_mat.shape[0] * hot_chunks
                  * tile * chunk, dt2, items=hot_chunks * tile * chunk)
    if not out_i:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0),)
    return (np.concatenate(out_i).astype(np.int64),
            np.concatenate(out_j).astype(np.int64),
            np.concatenate(out_e))


def _maf_bins(geno):
    """int(maf*20) bins (reference remma_epiAA_maf_approx.py:38-41; the AD
    variant calls this vector `freqA`, remma_epiAD_maf_approx.py:39-42)."""
    freq = 1.0 - np.sum(geno, axis=0) / (2.0 * geno.shape[0])
    freq = np.where(freq > 0.5, 1.0 - freq, freq)
    return freq, (freq * 20).astype(np.int64)


def _het_bins(geno):
    """int(het_freq*20) bins of the folded heterozygote frequency — the
    dominance-side bin variable (reference remma_epiDD_maf_approx.py:39-44;
    `freqD` in remma_epiAD_maf_approx.py:44-49)."""
    freq = np.sum(np.abs(geno - 1.0) < 0.001, axis=0) / geno.shape[0]
    freq = np.where(freq > 0.5, 1.0 - freq, freq)
    return freq, (freq * 20).astype(np.int64)


def _screen_engine(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                   snp_lst_0, eff_cut_table, bins_a, bins_b, out_file,
                   tile=None, screen_dtype=np.float32, maf=False, dm=None,
                   mesh=None):
    """Shared driver for the *_eff / *_maf_eff family.

    eff_cut_table: (111,) per-bin-pair |eff| thresholds (flat constant for the
    non-MAF variant); bins_a/bins_b: (m,) per-SNP bin indices for the anchor
    (table row) and partner (table column) side — equal except for AD, whose
    anchor side bins by MAF and partner side by heterozygote frequency, in
    BOTH orientations (C kernel _remma_epi_eff_cpu.c:330,337: the threshold
    index is always freqA[anchor]*10 + freqD[partner]).
    Writes `snp_0 snp_1 eff` rows.  Returns the hit arrays.  `dm` overrides
    the phenotype-file parse for the array-level (y, xmat, zmat) API.
    """
    from gmat_tpu.scan.common import (coded_matrix, design_matrix_cached,
                                      prepare_genotypes_device,
                                      score_pieces_cached)

    if dm is None:
        dm = design_matrix_cached(pheno_file, bed_prefix)
    t0 = time.perf_counter()
    pieces = score_pieces_cached(dm, gmat_lst, var_com)
    g, num_snp = prepare_genotypes_device(bed_prefix)
    # only materialize the coding(s) this kind needs: at yeast/bench scale an
    # unused (n, m) float32 coding matrix is ~1.4 GB of dead HBM + transfer
    a_full = coded_matrix(g, "add", screen_dtype) if kind != "DD" else None
    d_full = coded_matrix(g, "dom", screen_dtype) if kind != "AA" else None
    logger.info("Screen engine setup (pieces/geno/codings): %.3f s",
                time.perf_counter() - t0)
    py = pieces.pymat.astype(screen_dtype)
    bins_a = np.asarray(bins_a, dtype=np.int64)
    bins_b = np.asarray(bins_b, dtype=np.int64)
    table = np.asarray(eff_cut_table, dtype=screen_dtype)

    # AA/DD anchors stop at num_snp-2; the plain AD wrapper anchors over all
    # SNPs (reference remma_epiAD_eff.py:57) — the j>i mask empties the last
    # one — while the AD *maf* wrapper caps at num_snp-1 like AA
    # (remma_epiAD_maf_eff.py:61).
    hi_anchor = num_snp if (kind == "AD" and not maf) else num_snp - 1
    if snp_lst_0 is None:
        snp_lst_0 = range(hi_anchor)
    elif max(snp_lst_0) >= hi_anchor or min(snp_lst_0) < 0:
        raise ValueError("snp_lst_0 is out of range!")

    anchors = list(snp_lst_0)
    tile = tile or _auto_tile(len(anchors), num_snp)
    t0 = time.perf_counter()
    if kind == "AA":
        res = [_run_screen(a_full, a_full, py, anchors, bins_a, bins_b,
                           table, "tri", tile, mesh=mesh)]
    elif kind == "DD":
        res = [_run_screen(d_full, d_full, py, anchors, bins_a, bins_b,
                           table, "tri", tile, mesh=mesh)]
    else:  # AD: both orientations, j > i (C kernel :233-247); the threshold
        # is indexed freqA[anchor]*10 + freqD[partner] in both directions
        res = [
            _run_screen(a_full, d_full, py, anchors, bins_a, bins_b, table,
                        "tri", tile, mesh=mesh),
            _run_screen(d_full, a_full, py, anchors, bins_a, bins_b, table,
                        "tri", tile, flip_output=True, mesh=mesh),
        ]
    logger.info("Screen sweep(s) incl. assembly: %.3f s",
                time.perf_counter() - t0)
    idx0 = np.concatenate([r[0] for r in res])
    idx1 = np.concatenate([r[1] for r in res])
    eff = np.concatenate([r[2] for r in res])
    t0 = time.perf_counter()
    with open(out_file, "w") as f:
        f.write("snp_0 snp_1 eff\n")
        # pandas to_csv streams ~10x faster than np.savetxt (measured:
        # the savetxt loop alone cost ~2 s of the yeast screen stage);
        # %g float formatting matches savetxt's
        for s in range(0, len(idx0), 1 << 22):
            pd.DataFrame({0: idx0[s:s + (1 << 22)],
                          1: idx1[s:s + (1 << 22)],
                          2: eff[s:s + (1 << 22)]}).to_csv(
                f, sep=" ", header=False, index=False, float_format="%g")
    logger.info("Screen write: %d rows in %.3f s", len(idx0),
                time.perf_counter() - t0)
    return idx0, idx1, eff


def _append_approx_p(screen_file, out_file, bins_a, bins_b, freq_deno):
    """Append chi_app/p_app columns (reference remma_epiAA_eff.py:84-95,
    remma_epiAA_maf_eff.py per-bin variant).  The denominator is indexed
    bins_a[snp_0]*10 + bins_b[snp_1] on the WRITTEN row — for AD's flipped
    orientation this differs from the screening threshold index, replicating
    the reference (remma_epiAD_maf_eff.py:102 vs C kernel :337)."""
    from scipy.stats import chi2 as chi2_dist

    t0 = time.perf_counter()
    with open(screen_file) as fin, open(out_file, "w") as fout:
        head = fin.readline().strip()
        fout.write(head + " chi_app p_app\n")
        # vectorized over the whole table (a per-line scalar chi2.sf loop
        # measured seconds at yeast scale); str() formatting per row
        # matches the reference's line-by-line output exactly
        lines = fin.read().splitlines()
        if lines:
            toks = [line.split() for line in lines]
            i0 = np.array([int(t[0]) for t in toks], dtype=np.int64)
            i1 = np.array([int(t[1]) for t in toks], dtype=np.int64)
            eff = np.array([float(t[-1]) for t in toks])
            deno = np.asarray(freq_deno)[
                np.asarray(bins_a)[i0] * 10 + np.asarray(bins_b)[i1]]
            chi_app = eff * eff / deno
            p_app = chi2_dist.sf(chi_app, 1)
            fout.write("\n".join(
                " ".join(t + [str(c), str(p)])
                for t, c, p in zip(toks, chi_app, p_app)) + "\n")
    logger.info("Approx p append: %d rows in %.3f s", len(lines),
                time.perf_counter() - t0)


def _remma_epi_eff(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                   snp_lst_0=None, var_app=1.0, p_cut=1.0e-5,
                   out_file="epi_eff", dm=None, mesh=None):
    from gmat_tpu.io.bed import read_bim

    chi_cut = chi2_isf(p_cut, 1)
    table = np.full(111, np.sqrt(chi_cut * var_app))
    bins = np.zeros(len(read_bim(bed_prefix + ".bim")), dtype=np.int64)
    deno = np.full(111, var_app)
    tmp = out_file + ".temp"
    _screen_engine(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                   snp_lst_0, table, bins, bins, tmp, dm=dm, mesh=mesh)
    _append_approx_p(tmp, out_file, bins, bins, deno)
    os.remove(tmp)
    return 0


def _remma_epi_maf_eff(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                       snp_lst_0=None, bins_a=None, bins_b=None,
                       freq_deno=None, p_cut=1.0e-5, out_file="epi_maf_eff",
                       dm=None, mesh=None):
    from gmat_tpu.io.bed import read_bim

    chi_cut = chi2_isf(p_cut, 1)
    num_snp = len(read_bim(bed_prefix + ".bim"))
    if bins_a is None:
        bins_a = np.zeros(num_snp, dtype=np.int64)
    if bins_b is None:
        bins_b = np.zeros(num_snp, dtype=np.int64)
    if freq_deno is None:
        freq_deno = np.ones(111)
    table = np.sqrt(chi_cut * np.asarray(freq_deno))
    tmp = out_file + ".temp"
    _screen_engine(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                   snp_lst_0, table, bins_a, bins_b, tmp, maf=True, dm=dm,
                   mesh=mesh)
    _append_approx_p(tmp, out_file, bins_a, bins_b, np.asarray(freq_deno))
    os.remove(tmp)
    return 0


# public *_eff wrappers -------------------------------------------------------

def remma_epiAA_eff(pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0=None,
                    var_app=1.0, p_cut=1.0e-5, out_file="epiAA_eff",
                    mesh=None):
    return _remma_epi_eff("AA", pheno_file, bed_prefix, gmat_lst, var_com,
                          snp_lst_0, var_app, p_cut, out_file, mesh=mesh)


def remma_epiAD_eff(pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0=None,
                    var_app=1.0, p_cut=1.0e-5, out_file="epiAD_eff",
                    mesh=None):
    return _remma_epi_eff("AD", pheno_file, bed_prefix, gmat_lst, var_com,
                          snp_lst_0, var_app, p_cut, out_file, mesh=mesh)


def remma_epiDD_eff(pheno_file, bed_prefix, gmat_lst, var_com, snp_lst_0=None,
                    var_app=1.0, p_cut=1.0e-5, out_file="epiDD_eff",
                    mesh=None):
    return _remma_epi_eff("DD", pheno_file, bed_prefix, gmat_lst, var_com,
                          snp_lst_0, var_app, p_cut, out_file, mesh=mesh)


def remma_epiAA_maf_eff(pheno_file, bed_prefix, gmat_lst, var_com,
                        snp_lst_0=None, freq=None, freq_deno=None,
                        p_cut=1.0e-5, out_file="epiAA_maf_eff", mesh=None):
    """MAF-binned AA screen; `freq` = int(maf*20) bins for both SNPs
    (reference remma_epiAA_maf_eff.py:20)."""
    return _remma_epi_maf_eff("AA", pheno_file, bed_prefix, gmat_lst, var_com,
                              snp_lst_0, freq, freq, freq_deno, p_cut,
                              out_file, mesh=mesh)


def remma_epiAD_maf_eff(pheno_file, bed_prefix, gmat_lst, var_com,
                        snp_lst_0=None, freqA=None, freqD=None,
                        freq_deno=None, p_cut=1.0e-5,
                        out_file="epiAD_maf_eff", mesh=None):
    """Binned AD screen; `freqA` = int(maf*20) bins for the A-coded side,
    `freqD` = int(het_freq*20) bins for the D-coded side (reference
    remma_epiAD_maf_eff.py:110, C kernel :330,337)."""
    return _remma_epi_maf_eff("AD", pheno_file, bed_prefix, gmat_lst, var_com,
                              snp_lst_0, freqA, freqD, freq_deno, p_cut,
                              out_file, mesh=mesh)


def remma_epiDD_maf_eff(pheno_file, bed_prefix, gmat_lst, var_com,
                        snp_lst_0=None, freq=None, freq_deno=None,
                        p_cut=1.0e-5, out_file="epiDD_maf_eff", mesh=None):
    """Binned DD screen; `freq` = int(het_freq*20) heterozygote-frequency
    bins for both SNPs (reference remma_epiDD_maf_eff.py:20,
    remma_epiDD_maf_approx.py:39-44)."""
    return _remma_epi_maf_eff("DD", pheno_file, bed_prefix, gmat_lst, var_com,
                              snp_lst_0, freq, freq, freq_deno, p_cut,
                              out_file, mesh=mesh)


# approximate pipelines -------------------------------------------------------

def _pair_fn(kind):
    from gmat_tpu.scan import pairs as pairs_mod

    return getattr(pairs_mod, f"remma_epi{kind}_pair")


def _random_pair_fn(kind, num_snp, out_file, num_pair, seed):
    from gmat_tpu.scan.random_pair import random_pair, random_pairAD

    if kind == "AD":
        return random_pairAD(num_snp, out_file=out_file, num_pair=num_pair,
                             seed=seed)
    return random_pair(num_snp, out_file=out_file, num_pair=num_pair,
                       seed=seed)


def _merge_approx_exact(approx_file, exact_file, out_file):
    """Insert the approx p column before the exact p (reference
    remma_epiAA_approx.py:40-52)."""
    p_dct = {}
    with open(approx_file) as fin:
        for line in fin:
            arr = line.split()
            p_dct[" ".join(arr[:2])] = arr[-1]
    with open(exact_file) as fin, open(out_file, "w") as fout:
        for line in fin:
            arr = line.split()
            arr.insert(-1, p_dct[" ".join(arr[:2])])
            fout.write(" ".join(arr) + "\n")


#: per-stage wall-clock seconds of the most recent approx-pipeline run
#: (keys: prep, calibrate, screen, retest, merge, total) — the reference
#: pipeline has no internal timing at all (remma_epiAA_approx.py:10-53);
#: bench.py surfaces these as `extra.yeast_approx_stages`.
LAST_APPROX_STAGES: dict = {}


def _approx_prep(kind, pheno_file, bed_prefix, gmat_lst, var_com):
    """Warm every cross-stage cache (design parse, score pieces, device
    genotype panel, codings) and DRAIN the device queue, so the per-stage
    timers below measure each stage's own work rather than whatever prep
    the async dispatch queue billed to the first fetch."""
    from gmat_tpu.scan.pairs import _epi_setup

    mat0, mat1, pieces, _, _ = _epi_setup(pheno_file, bed_prefix, gmat_lst,
                                          var_com, kind)
    # scalar fetches force the enqueued uploads/codings to completion
    # (block_until_ready returns immediately on the tunneled backend)
    float(pieces.pymat[0])
    float(mat0[0, 0])
    float(mat1[0, 0])


def _remma_epi_approx(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                      p_cut=1.0e-5, num_random_pair=100000,
                      out_file="epi_approx", snp_lst_0=None, seed=0,
                      mesh=None):
    from gmat_tpu.io.bed import read_bim

    stages = {}
    t_all = time.perf_counter()
    t0 = time.perf_counter()
    _approx_prep(kind, pheno_file, bed_prefix, gmat_lst, var_com)
    stages["prep"] = time.perf_counter() - t0
    num_snp = len(read_bim(bed_prefix + ".bim"))
    logger.info("Random calibration: %d pairs", num_random_pair)
    rp = out_file + ".random_pair"
    _random_pair_fn(kind, num_snp, rp, num_random_pair, seed)
    pair_fn = _pair_fn(kind)
    # calibration AND exact re-test ride the mesh too: on a real pod the
    # 100k-pair calibration and the survivor re-test would otherwise
    # serialize onto one chip while only the screen stage shards
    t0 = time.perf_counter()
    pair_fn(pheno_file, bed_prefix, gmat_lst, var_com, snp_pair_file=rp,
            p_cut=1.1, out_file=out_file + ".random", mesh=mesh)
    res_df = pd.read_csv(out_file + ".random", header=0, sep=r"\s+")
    var_median = float(np.median(res_df["var"]))
    stages["calibrate"] = time.perf_counter() - t0
    os.remove(rp)
    os.remove(out_file + ".random")
    logger.info("Approximate effect variance (median): %g", var_median)
    t0 = time.perf_counter()
    _remma_epi_eff(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                   snp_lst_0=snp_lst_0, var_app=var_median, p_cut=p_cut,
                   out_file=out_file + ".approx_p", mesh=mesh)
    stages["screen"] = time.perf_counter() - t0
    logger.info("Exact re-test of survivors")
    t0 = time.perf_counter()
    pair_fn(pheno_file, bed_prefix, gmat_lst, var_com,
            snp_pair_file=out_file + ".approx_p", p_cut=1.1,
            out_file=out_file + ".exact_p", mesh=mesh)
    stages["retest"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _merge_approx_exact(out_file + ".approx_p", out_file + ".exact_p", out_file)
    stages["merge"] = time.perf_counter() - t0
    os.remove(out_file + ".approx_p")
    os.remove(out_file + ".exact_p")
    stages["total"] = time.perf_counter() - t_all
    LAST_APPROX_STAGES.clear()
    LAST_APPROX_STAGES.update(stages)
    logger.info("Approx pipeline stages (s): %s",
                {k: round(v, 3) for k, v in stages.items()})
    return 0


def _remma_epi_maf_approx(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                          p_cut=1.0e-5, num_random_pair=100000,
                          out_file="epi_maf_approx", snp_lst_0=None, seed=0,
                          mesh=None):
    from gmat_tpu.io.bed import read_bim

    stages = {}
    t_all = time.perf_counter()
    t0 = time.perf_counter()
    _approx_prep(kind, pheno_file, bed_prefix, gmat_lst, var_com)
    stages["prep"] = time.perf_counter() - t0
    num_snp = len(read_bim(bed_prefix + ".bim"))
    rp = out_file + ".random_pair"
    _random_pair_fn(kind, num_snp, rp, num_random_pair, seed)
    pair_fn = _pair_fn(kind)
    t0 = time.perf_counter()
    pair_fn(pheno_file, bed_prefix, gmat_lst, var_com, snp_pair_file=rp,
            p_cut=1.1, out_file=out_file + ".random", mesh=mesh)
    stages["calibrate"] = time.perf_counter() - t0
    os.remove(rp)
    geno, _, _ = prepare_genotypes(bed_prefix)
    # bin variables per scan kind (reference remma_epi{AA,AD,DD}_maf_approx):
    # AA bins both sides by MAF (.freq file); DD both sides by heterozygote
    # frequency (.heter); AD bins the A side by MAF (.maf) and the D side by
    # het frequency (.heter), with NO key symmetrization (ordered pairs).
    if kind == "AA":
        freq, bins_a = _maf_bins(geno)
        np.savetxt(out_file + ".freq", freq)
        bins_b, symmetric = bins_a, True
    elif kind == "DD":
        freq, bins_a = _het_bins(geno)
        np.savetxt(out_file + ".heter", freq)
        bins_b, symmetric = bins_a, True
    else:  # AD
        freq_a, bins_a = _maf_bins(geno)
        freq_d, bins_b = _het_bins(geno)
        np.savetxt(out_file + ".maf", freq_a)
        np.savetxt(out_file + ".heter", freq_d)
        symmetric = False
    # per-bin-pair mean variance with global-mean fallback (reference
    # remma_epiAA_maf_approx.py:43-70 — "median" in name, mean in math)
    res_df = pd.read_csv(out_file + ".random", header=0, sep=r"\s+")
    os.remove(out_file + ".random")
    b0 = bins_a[res_df["snp_0"].to_numpy(dtype=np.int64)]
    b1 = bins_b[res_df["snp_1"].to_numpy(dtype=np.int64)]
    v = res_df["var"].to_numpy()
    sums = np.zeros(111)
    counts = np.zeros(111)
    for bb0, bb1, vv in zip(b0, b1, v):
        keys = (bb0 * 10 + bb1, bb1 * 10 + bb0) if symmetric \
            else (bb0 * 10 + bb1,)
        for key in keys:
            sums[key] += vv
            counts[key] += 1
    global_mean = sums.sum() / counts.sum()
    # baseline ones(111); only present-bin pairs get calibrated values
    # (reference remma_epiAA_maf_approx.py:63-71)
    freq_deno = np.ones(111)
    with open(out_file + ".freq_denominator", "w") as fout:
        for k1 in np.unique(bins_a):
            for k2 in np.unique(bins_b):
                key = k1 * 10 + k2
                freq_deno[key] = (sums[key] / counts[key]) if counts[key] \
                    else global_mean
                fout.write(f"{k1} {k2} {freq_deno[key]}\n")
    maf_kwargs = (
        {"freqA": bins_a, "freqD": bins_b} if kind == "AD"
        else {"freq": bins_a}
    )
    _MAF_EFF = {"AA": remma_epiAA_maf_eff, "AD": remma_epiAD_maf_eff,
                "DD": remma_epiDD_maf_eff}
    t0 = time.perf_counter()
    _MAF_EFF[kind](pheno_file, bed_prefix, gmat_lst, var_com,
                   snp_lst_0=snp_lst_0, freq_deno=freq_deno, p_cut=p_cut,
                   out_file=out_file + ".approx_p", mesh=mesh, **maf_kwargs)
    stages["screen"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    pair_fn(pheno_file, bed_prefix, gmat_lst, var_com,
            snp_pair_file=out_file + ".approx_p", p_cut=1.1,
            out_file=out_file + ".exact_p", mesh=mesh)
    stages["retest"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _merge_approx_exact(out_file + ".approx_p", out_file + ".exact_p", out_file)
    stages["merge"] = time.perf_counter() - t0
    os.remove(out_file + ".approx_p")
    os.remove(out_file + ".exact_p")
    stages["total"] = time.perf_counter() - t_all
    LAST_APPROX_STAGES.clear()
    LAST_APPROX_STAGES.update(stages)
    logger.info("Approx pipeline stages (s): %s",
                {k: round(v, 3) for k, v in stages.items()})
    return 0


def remma_epiAA_approx(pheno_file, bed_prefix, gmat_lst, var_com,
                       p_cut=1.0e-5, num_random_pair=100000,
                       out_file="epiAA_approx", seed=0, mesh=None):
    """Flagship fast pipeline: calibrate -> screen -> exact re-test -> merge."""
    return _remma_epi_approx("AA", pheno_file, bed_prefix, gmat_lst, var_com,
                             p_cut, num_random_pair, out_file, seed=seed,
                             mesh=mesh)


def remma_epiAD_approx(pheno_file, bed_prefix, gmat_lst, var_com,
                       p_cut=1.0e-5, num_random_pair=100000,
                       out_file="epiAD_approx", seed=0, mesh=None):
    return _remma_epi_approx("AD", pheno_file, bed_prefix, gmat_lst, var_com,
                             p_cut, num_random_pair, out_file, seed=seed,
                             mesh=mesh)


def remma_epiDD_approx(pheno_file, bed_prefix, gmat_lst, var_com,
                       p_cut=1.0e-5, num_random_pair=100000,
                       out_file="epiDD_approx", seed=0, mesh=None):
    return _remma_epi_approx("DD", pheno_file, bed_prefix, gmat_lst, var_com,
                             p_cut, num_random_pair, out_file, seed=seed,
                             mesh=mesh)


def remma_epiAA_maf_approx(pheno_file, bed_prefix, gmat_lst, var_com,
                           p_cut=1.0e-5, num_random_pair=100000,
                           out_file="epiAA_maf_approx", seed=0, mesh=None):
    return _remma_epi_maf_approx("AA", pheno_file, bed_prefix, gmat_lst,
                                 var_com, p_cut, num_random_pair, out_file,
                                 seed=seed, mesh=mesh)


def remma_epiAD_maf_approx(pheno_file, bed_prefix, gmat_lst, var_com,
                           p_cut=1.0e-5, num_random_pair=100000,
                           out_file="epiAD_maf_approx", seed=0, mesh=None):
    return _remma_epi_maf_approx("AD", pheno_file, bed_prefix, gmat_lst,
                                 var_com, p_cut, num_random_pair, out_file,
                                 seed=seed, mesh=mesh)


def remma_epiDD_maf_approx(pheno_file, bed_prefix, gmat_lst, var_com,
                           p_cut=1.0e-5, num_random_pair=100000,
                           out_file="epiDD_maf_approx", seed=0, mesh=None):
    return _remma_epi_maf_approx("DD", pheno_file, bed_prefix, gmat_lst,
                                 var_com, p_cut, num_random_pair, out_file,
                                 seed=seed, mesh=mesh)


def _parallel_anchor_split(kind, bed_prefix, parallel, maf=False):
    """Balanced anchor split for a shard.

    Plain AD anchors range over all SNPs (reference remma_epiAD_eff.py:147
    caps part 1 at num_snp) but the AD *maf* split caps at num_snp-1 like
    AA/DD (remma_epiAD_maf_eff.py:158) — matching the maf engine's own
    hi_anchor validation."""
    from gmat_tpu.io.bed import read_bim

    num_snp = len(read_bim(bed_prefix + ".bim"))
    return balanced_anchor_split(num_snp, parallel[0], parallel[1],
                                 triangular=(kind != "AD" or maf))


def _remma_epi_eff_parallel(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                            parallel, var_app=1.0, p_cut=1.0e-5,
                            out_file="epi_eff_parallel"):
    snp_lst_0 = _parallel_anchor_split(kind, bed_prefix, parallel)
    return _remma_epi_eff(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                          snp_lst_0, var_app, p_cut,
                          f"{out_file}.{parallel[1]}")


def remma_epiAA_eff_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                             parallel, var_app=1.0, p_cut=1.0e-5,
                             out_file="epiAA_eff_parallel"):
    return _remma_epi_eff_parallel("AA", pheno_file, bed_prefix, gmat_lst,
                                   var_com, parallel, var_app, p_cut, out_file)


def remma_epiAD_eff_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                             parallel, var_app=1.0, p_cut=1.0e-5,
                             out_file="epiAD_eff_parallel"):
    return _remma_epi_eff_parallel("AD", pheno_file, bed_prefix, gmat_lst,
                                   var_com, parallel, var_app, p_cut, out_file)


def remma_epiDD_eff_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                             parallel, var_app=1.0, p_cut=1.0e-5,
                             out_file="epiDD_eff_parallel"):
    return _remma_epi_eff_parallel("DD", pheno_file, bed_prefix, gmat_lst,
                                   var_com, parallel, var_app, p_cut, out_file)


def _remma_epi_approx_parallel(kind, pheno_file, bed_prefix, gmat_lst,
                               var_com, parallel, p_cut, num_random_pair,
                               out_file, seed):
    """Per-shard approx pipeline: each shard calibrates on its own random
    pair sample, screens its balanced anchor split, and exact-retests —
    shard outputs `<out>.<i>` concatenate into the full table (reference
    remma_epiAA_approx.py:56-101, remma_epiAA_maf_approx.py:94-132)."""
    snp_lst_0 = _parallel_anchor_split(kind, bed_prefix, parallel)
    return _remma_epi_approx(
        kind, pheno_file, bed_prefix, gmat_lst, var_com, p_cut,
        num_random_pair, f"{out_file}.{parallel[1]}", snp_lst_0=snp_lst_0,
        seed=seed + parallel[1],
    )


def remma_epiAA_approx_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                parallel, p_cut=1.0e-5,
                                num_random_pair=100000,
                                out_file="epiAA_approx", seed=0):
    return _remma_epi_approx_parallel("AA", pheno_file, bed_prefix, gmat_lst,
                                      var_com, parallel, p_cut,
                                      num_random_pair, out_file, seed)


def remma_epiAD_approx_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                parallel, p_cut=1.0e-5,
                                num_random_pair=100000,
                                out_file="epiAD_approx", seed=0):
    return _remma_epi_approx_parallel("AD", pheno_file, bed_prefix, gmat_lst,
                                      var_com, parallel, p_cut,
                                      num_random_pair, out_file, seed)


def remma_epiDD_approx_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                parallel, p_cut=1.0e-5,
                                num_random_pair=100000,
                                out_file="epiDD_approx", seed=0):
    return _remma_epi_approx_parallel("DD", pheno_file, bed_prefix, gmat_lst,
                                      var_com, parallel, p_cut,
                                      num_random_pair, out_file, seed)


def _remma_epi_maf_eff_parallel(kind, pheno_file, bed_prefix, gmat_lst,
                                var_com, parallel, bins_a=None, bins_b=None,
                                freq_deno=None, p_cut=1.0e-5,
                                out_file="epi_maf_eff_parallel"):
    snp_lst_0 = _parallel_anchor_split(kind, bed_prefix, parallel, maf=True)
    return _remma_epi_maf_eff(kind, pheno_file, bed_prefix, gmat_lst, var_com,
                              snp_lst_0, bins_a, bins_b, freq_deno, p_cut,
                              f"{out_file}.{parallel[1]}")


def remma_epiAA_maf_eff_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                 parallel, freq=None, freq_deno=None,
                                 p_cut=1.0e-5,
                                 out_file="epiAA_maf_eff_parallel"):
    return _remma_epi_maf_eff_parallel("AA", pheno_file, bed_prefix, gmat_lst,
                                       var_com, parallel, freq, freq,
                                       freq_deno, p_cut, out_file)


def remma_epiAD_maf_eff_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                 parallel, freqA=None, freqD=None,
                                 freq_deno=None, p_cut=1.0e-5,
                                 out_file="epiAD_maf_eff_parallel"):
    """AD shard screen; `freqA`/`freqD` as in `remma_epiAD_maf_eff`
    (reference remma_epiAD_maf_eff.py:131)."""
    return _remma_epi_maf_eff_parallel("AD", pheno_file, bed_prefix, gmat_lst,
                                       var_com, parallel, freqA, freqD,
                                       freq_deno, p_cut, out_file)


def remma_epiDD_maf_eff_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                 parallel, freq=None, freq_deno=None,
                                 p_cut=1.0e-5,
                                 out_file="epiDD_maf_eff_parallel"):
    return _remma_epi_maf_eff_parallel("DD", pheno_file, bed_prefix, gmat_lst,
                                       var_com, parallel, freq, freq,
                                       freq_deno, p_cut, out_file)


def _remma_epi_maf_approx_parallel(kind, pheno_file, bed_prefix, gmat_lst,
                                   var_com, parallel, p_cut, num_random_pair,
                                   out_file, seed):
    snp_lst_0 = _parallel_anchor_split(kind, bed_prefix, parallel, maf=True)
    return _remma_epi_maf_approx(
        kind, pheno_file, bed_prefix, gmat_lst, var_com, p_cut,
        num_random_pair, f"{out_file}.{parallel[1]}", snp_lst_0=snp_lst_0,
        seed=seed + parallel[1],
    )


def remma_epiAA_maf_approx_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                    parallel, p_cut=1.0e-5,
                                    num_random_pair=100000,
                                    out_file="epiAA_maf_approx_parallel",
                                    seed=0):
    return _remma_epi_maf_approx_parallel("AA", pheno_file, bed_prefix,
                                          gmat_lst, var_com, parallel, p_cut,
                                          num_random_pair, out_file, seed)


def remma_epiAD_maf_approx_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                    parallel, p_cut=1.0e-5,
                                    num_random_pair=100000,
                                    out_file="epiAD_maf_approx_parallel",
                                    seed=0):
    return _remma_epi_maf_approx_parallel("AD", pheno_file, bed_prefix,
                                          gmat_lst, var_com, parallel, p_cut,
                                          num_random_pair, out_file, seed)


def remma_epiDD_maf_approx_parallel(pheno_file, bed_prefix, gmat_lst, var_com,
                                    parallel, p_cut=1.0e-5,
                                    num_random_pair=100000,
                                    out_file="epiDD_maf_approx_parallel",
                                    seed=0):
    return _remma_epi_maf_approx_parallel("DD", pheno_file, bed_prefix,
                                          gmat_lst, var_com, parallel, p_cut,
                                          num_random_pair, out_file, seed)
