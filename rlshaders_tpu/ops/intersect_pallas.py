"""Pallas TPU ray-triangle intersection: ordered cluster-culled brute force.

The TPU-native replacement for pointer-chasing BVH traversal (which is
latency-bound on TPU — measured 0.01 Mrays/s): triangles are sorted into
spatially-coherent clusters of TRI_BLOCK (using the SAH BVH's leaf order);
each RAY_BLOCK-ray block walks its PRECOMPACTED candidate clusters
FRONT-TO-BACK along its direction octant and runs a fully vectorized
Moller-Trumbore over the (RAY_BLOCK, TRI_BLOCK) pair tile per candidate.
This is the design SURVEY.md section 7 calls the hardest TPU piece ("BVH
traversal is divergent/pointer-chasing — needs a Pallas-friendly layout ...
warp-free SIMT-on-vector-lanes").

Round-3 layout (lab measurements recorded in docs/perf.md, "Round-3 trace
rewrite"):

* TRANSPOSED pair tile — rays along SUBLANES (axis 0), triangles along
  LANES (axis 1). Cluster geometry is stored as 16 consecutive sublane
  rows x TRI_BLOCK lanes (v0/e1/e2 xyz in rows 0..8) and ints as 8 rows
  (vis, orig, opaque), so one candidate slab load is a dense ~12 KB. The
  previous (TRI_BLOCK, 9) f32 + 3x(TRI_BLOCK, 1) int layout padded every
  minor dim to 128 lanes and read ~256 KB per candidate — the walk was
  load-bound at ~0.54 us/candidate; this layout runs at the ~0.16 us pure
  pair-test floor.
* FULL-TILE running state (t/orig/u/v as (R, TB) tiles, winner reduced
  across lanes ONCE per block) instead of per-candidate reductions; the
  front-to-back early-break watermark t_worst refreshes once per UNROLL
  candidates (stale-high between refreshes — conservative, correct).
* The prep/epilogue around the kernel avoids GATHERS entirely: on this
  backend a (M,3) gather costs ~19 ms per 262k rays while a multi-operand
  lax.sort and a scatter are ~free. Ray reordering is ONE 10-operand
  lax.sort (key + iota + 7 ray fields + exclude); un-permuting the outputs
  is a scatter-by-perm (zeros.at[perm].set), not a gather-by-argsort(perm).

Traversal order & termination (the wavefront equivalent of ordered BVH
traversal):
* at pack time, the clusters are sorted along each of the 8 direction-octant
  diagonals (host NumPy); a dense XLA prepass (_block_meta) computes EXACT
  per-ray slab culling against every cluster AABB, OR-reduces over the
  block, and compacts survivors into per-block front-to-back candidate
  lists — the kernel loop carries no slab test, no cross-lane any(), no
  lax.cond (that control latency dominated the round-2 kernel);
* direction-pure blocks EARLY-BREAK when the next candidate's minimum
  diagonal projection lies beyond the slowest ray's current best hit
  (projection along the unit octant diagonal is a lower bound on ray t);
* sky/miss lanes are clamped to the scene-box exit t before the walk so a
  single t=inf lane cannot disable its block's early break.

Falls back to interpreter mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pair-tile shape: rays along sublanes (mult of 8), triangles along lanes
# (mult of 128). Env knobs for calibration sweeps (tools/); defaults set by
# measurement on v5e.
import os as _os

RAY_BLOCK = int(_os.environ.get("RLS_RAY_BLOCK", "128"))
_STATS = _os.environ.get("RLS_TRACE_STATS", "0") == "1"
TRI_BLOCK = int(_os.environ.get("RLS_TRI_BLOCK", "128"))
# candidate clusters pair-tested per while_loop iteration; also the refresh
# period of the early-break watermark (t_worst / all-blocked check)
UNROLL = int(_os.environ.get("RLS_TRACE_UNROLL", "2"))
# ray-blocks per dense-prepass chunk: bounds the (chunk*RAY_BLOCK, C) slab
# intermediates (bust-scale scenes would otherwise materialize GBs)
META_CHUNK = int(_os.environ.get("RLS_META_CHUNK", "128"))
del _os
BIG = 1e30
INV_SQRT3 = 0.5773502691896258
GEO_ROWS = 16   # sublane rows per cluster geometry slab (9 used)
INT_ROWS = 8    # sublane rows per cluster int slab (3 used)
# Per-call ray cap: keeps Mosaic's compile-time scoped-vmem ACCOUNTING of the
# blocked ray/output buffers under the (raised, see rlshaders_tpu/__init__)
# limit when the kernel is embedded inside a fused jitted render stage.
# Larger batches chunk into sequential pallas_calls inside the same program.
MAX_RAYS_PER_CALL = 262144

# octant sign patterns, index = (sx>0)<<2 | (sy>0)<<1 | (sz>0)
_OCT_SIGNS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float32,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class PackedScene(NamedTuple):
    """Cluster-packed triangle SoA (device). Padded tris are degenerate.

    Triangles are grouped into clusters of TRI_BLOCK (leaf-order contiguous,
    hence spatially coherent). Geometry/int data is stored TRANSPOSED —
    GEO_ROWS/INT_ROWS sublane rows per cluster, triangles along lanes — so
    the kernel's per-candidate slab loads are dense (see module docstring).
    `oct_projid[o, c]` is the minimum projection of cluster c's AABB on
    octant o's unit diagonal — the front-to-back sort key the dense prepass
    uses directly."""

    geoT: jnp.ndarray     # (C*GEO_ROWS, TB) f32; rows 0..8 = v0/e1/e2 xyz
    intT: jnp.ndarray     # (C*INT_ROWS, TB) int32; rows = vis, orig, opaque
    cl_min: jnp.ndarray   # (C, 3) cluster AABBs, padded rows degenerate
    cl_max: jnp.ndarray   # (C, 3)
    oct_projid: jnp.ndarray  # (8, C) f32 min diagonal projection BY CLUSTER ID
    scene_lo: jnp.ndarray    # (3,) scene AABB (for ray-sort Morton keys)
    scene_hi: jnp.ndarray    # (3,)

    @property
    def n_clusters(self) -> int:
        return self.oct_projid.shape[1]


def pack(v0, e1, e2, visibility, opaque, order) -> PackedScene:
    """Pack triangles (host) into clusters following `order` (spatially
    coherent, e.g. the SAH BVH leaf order); precompute each cluster's
    conservative diagonal projection under all 8 direction octants."""
    v0 = np.asarray(v0, np.float32)[order]
    e1 = np.asarray(e1, np.float32)[order]
    e2 = np.asarray(e2, np.float32)[order]
    vis = np.asarray(visibility, np.int32)[order]
    opq = np.asarray(opaque).astype(np.int32)[order]
    t = v0.shape[0]
    c = (t + TRI_BLOCK - 1) // TRI_BLOCK
    # bucket the cluster count to a power of two: cluster-table shapes are
    # traced-operand shapes of every fused render program, so same-bucket
    # scenes share the ~650-750s TPU compile (docs/perf.md). The extra
    # clusters are all-padding: degenerate AABBs (min>max) fail the exact
    # cull and project to BIG, so the walk never visits them.
    import os as _os2
    if _os2.environ.get("RLS_CLUSTER_BUCKET", "1") == "1":
        c = max(4, 1 << int(np.ceil(np.log2(max(c, 1)))))
    pad = c * TRI_BLOCK - t

    def padv(a, val=0.0):
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=val)

    v0p, e1p, e2p = padv(v0), padv(e1), padv(e2)
    comp = np.concatenate([v0p, e1p, e2p], axis=1)  # (C*TB, 9)
    # transposed geometry slabs: (C, 9, TB) -> rows padded to GEO_ROWS
    geoT = np.zeros((c, GEO_ROWS, TRI_BLOCK), np.float32)
    geoT[:, :9, :] = comp.reshape(c, TRI_BLOCK, 9).transpose(0, 2, 1)
    intT = np.zeros((c, INT_ROWS, TRI_BLOCK), np.int32)
    intT[:, 0, :] = np.pad(vis, (0, pad)).reshape(c, TRI_BLOCK)
    intT[:, 1, :] = np.pad(
        np.asarray(order, np.int64), (0, pad), constant_values=-1
    ).astype(np.int32).reshape(c, TRI_BLOCK)
    intT[:, 2, :] = np.pad(opq, (0, pad)).reshape(c, TRI_BLOCK)

    p1 = v0p + e1p
    p2 = v0p + e2p
    tmin = np.minimum(np.minimum(v0p, p1), p2).reshape(c, TRI_BLOCK, 3)
    tmax = np.maximum(np.maximum(v0p, p1), p2).reshape(c, TRI_BLOCK, 3)
    mask = np.arange(c * TRI_BLOCK).reshape(c, TRI_BLOCK) < t
    big = np.where(mask[..., None], tmin, BIG)
    small = np.where(mask[..., None], tmax, -BIG)
    cl_min = big.min(axis=1)    # (C, 3)
    cl_max = small.max(axis=1)

    # per-octant minimum diagonal projection of every cluster AABB (the
    # corner matching the octant signs); degenerate (all-padding) clusters
    # project to BIG so they sort behind every candidate
    fcl_min = np.where(np.isfinite(cl_min), cl_min, 0.0)
    fcl_max = np.where(np.isfinite(cl_max), cl_max, 0.0)
    degenerate = cl_min[:, 0] > cl_max[:, 0]  # all-padding cluster
    oct_projid = np.empty((8, c), np.float32)
    for o in range(8):
        s = _OCT_SIGNS[o]
        corner = np.where(s[None, :] > 0, fcl_min, fcl_max)
        proj = (corner * s[None, :]).sum(axis=1) * INV_SQRT3
        oct_projid[o] = np.where(degenerate, BIG, proj)

    return PackedScene(
        geoT=jnp.asarray(geoT.reshape(c * GEO_ROWS, TRI_BLOCK)),
        intT=jnp.asarray(intT.reshape(c * INT_ROWS, TRI_BLOCK)),
        cl_min=jnp.asarray(cl_min),
        cl_max=jnp.asarray(cl_max),
        oct_projid=jnp.asarray(oct_projid),
        scene_lo=jnp.asarray(
            np.where(degenerate[:, None], np.inf, fcl_min).min(axis=0)
            .astype(np.float32)
        ),
        scene_hi=jnp.asarray(
            np.where(degenerate[:, None], -np.inf, fcl_max).max(axis=0)
            .astype(np.float32)
        ),
    )


def _inv(d):
    # near-zero components use a large sign-independent constant; the old
    # sign(d)*BIG+BIG form evaluated to 0 for tiny NEGATIVE components and
    # collapsed the slab interval
    safe = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    return jnp.where(jnp.abs(d) > 1e-12, 1.0 / safe, BIG)


def _block_meta(packed: "PackedScene", rays8, n_boxes: int):
    """Per-ray-block traversal metadata AND compacted candidate lists
    (dense XLA). rays8 is (nb, RAY_BLOCK, 8): ox oy oz dx dy dz tmax exbits.
      meta[:, 0] = candidate count: number of boxes ANY RAY in the block can
                   touch (0 for miss-all)
      meta[:, 1] = dominant direction octant id
      meta[:, 2] = 1.0 when every ray in the block shares that octant
                   (enables the diagonal-projection early break)
      meta[:, 3] = max diagonal projection of the ray origins.
    Also returns `cand` (nb, Cp) int32 — the surviving box ids in
    front-to-back octant order — and `cproj` (nb, Cp) f32, their minimum
    diagonal projections. The kernels walk ONLY these candidates with
    UNCONDITIONAL pair tests: culling is EXACT per-ray slab vs cluster here
    (full-width VPU work on fat 2-D arrays), so the kernel loop carries no
    slab test, no cross-lane any(), and no lax.cond. Block-interval frustum
    culling (the round-2 prepass) survived ~3.5x more clusters than
    per-ray-exact on coherent camera blocks and nearly everything on
    incoherent blocks. meta is (nb, 128) f32 so it rides an (8, 128) SMEM
    tile; cand/cproj ride (8, Cp) SMEM tiles per 8-block grid group."""
    nb = rays8.shape[0]
    d = rays8[:, :, 3:6]   # (nb, R, 3)
    o = rays8[:, :, 0:3]
    d_lo = d.min(axis=1)   # (nb, 3)
    d_hi = d.max(axis=1)
    o_lo = o.min(axis=1)
    o_hi = o.max(axis=1)

    cmin = packed.cl_min[:n_boxes]  # (C, 3)
    cmax = packed.cl_max[:n_boxes]

    def chunk_survive(rchunk):
        # exact per-ray slab vs every cluster, OR-reduced over the block's
        # rays; (G, R, C) intermediates stay fused into the reduce
        tmx = rchunk[:, :, 6]             # (G, R)
        tn = None
        tf = None
        for a in range(3):
            oc = rchunk[:, :, a]          # (G, R)
            inv = _inv(rchunk[:, :, 3 + a])
            t0 = (cmin[None, None, :, a] - oc[:, :, None]) * inv[:, :, None]
            t1 = (cmax[None, None, :, a] - oc[:, :, None]) * inv[:, :, None]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        ok = (
            (tf >= jnp.maximum(tn, 0.0))
            & (tn <= tmx[:, :, None])
            & (tmx[:, :, None] > 0.0)   # padding lanes carry t_max 0
        )
        return jnp.any(ok, axis=1)        # (G, C)

    if nb <= META_CHUNK:
        survive = chunk_survive(rays8)
    else:
        gpad = (-nb) % META_CHUNK
        rpad = jnp.pad(rays8, ((0, gpad), (0, 0), (0, 0)))
        groups = rpad.reshape(-1, META_CHUNK, RAY_BLOCK, 8)
        survive = jax.lax.map(chunk_survive, groups).reshape(
            -1, n_boxes)[:nb]

    # dominant octant from the direction sums; purity from the sign boxes
    d_sum = d.sum(axis=1)  # (nb, 3)
    bits = (d_sum > 0.0).astype(jnp.int32)
    oct_id = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
    pure = jnp.all((d_lo > 0.0) == (d_hi > 0.0), axis=1) & jnp.all(
        (d_lo > 0.0) == (bits > 0), axis=1
    )

    # compact the survivors into per-block front-to-back candidate lists:
    # sort directly on the f32 diagonal projection (pack-time per-id table,
    # one (8, C) row gather) with non-survivors pushed to BIG — 2 operands
    # and cproj IS the sorted key.
    projc = packed.oct_projid[oct_id]                       # (nb, C) row gather
    keyf = jnp.where(survive, projc, BIG)
    ids = jnp.broadcast_to(
        jnp.arange(n_boxes, dtype=jnp.int32)[None, :], keyf.shape)
    cproj, cand = jax.lax.sort((keyf, ids), dimension=1, num_keys=1)
    count = jnp.sum(survive, axis=1).astype(jnp.int32)      # (nb,)
    cp = ((n_boxes + 127) // 128) * 128
    cand = jnp.pad(cand, ((0, 0), (0, cp - n_boxes)))
    cproj = jnp.pad(cproj, ((0, 0), (0, cp - n_boxes)), constant_values=BIG)

    signs = jnp.asarray(_OCT_SIGNS)[oct_id]  # (nb, 3)
    proj_o = jnp.maximum(
        (o_lo * signs).sum(axis=1), (o_hi * signs).sum(axis=1)
    ) * INV_SQRT3

    meta = jnp.zeros((nb, 128), jnp.float32)
    meta = meta.at[:, 0].set(count.astype(jnp.float32))
    meta = meta.at[:, 1].set(oct_id.astype(jnp.float32))
    meta = meta.at[:, 2].set(pure.astype(jnp.float32))
    meta = meta.at[:, 3].set(proj_o)
    return meta, cand, cproj


def _ray_cols(rays_ref):
    """Per-ray (R, 1) columns from the (1, R, 8) transposed ray block."""
    ox = rays_ref[0, :, 0:1]
    oy = rays_ref[0, :, 1:2]
    oz = rays_ref[0, :, 2:3]
    dx = rays_ref[0, :, 3:4]
    dy = rays_ref[0, :, 4:5]
    dz = rays_ref[0, :, 5:6]
    tmax = rays_ref[0, :, 6:7]
    exclude = pltpu.bitcast(rays_ref[0, :, 7:8], jnp.int32)
    return ox, oy, oz, dx, dy, dz, tmax, exclude


def _pairs_mt(ox, oy, oz, dx, dy, dz, g):
    """Moller-Trumbore over the (R, TB) pair tile.

    Ray components are (R, 1) columns; g is the (GEO_ROWS, TB) transposed
    geometry slab whose rows broadcast down the sublanes. Returns
    (det, t, u, v), each (R, TB)."""
    v0x, v0y, v0z = g[0:1, :], g[1:2, :], g[2:3, :]
    e1x, e1y, e1z = g[3:4, :], g[4:5, :], g[5:6, :]
    e2x, e2y, e2z = g[6:7, :], g[7:8, :], g[8:9, :]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    return det, t, u, v


def _nearest_kernel(
    vismask_ref,  # (1, 1) SMEM int32
    cand_ref,     # (8, Cp) SMEM int32 per-block candidate lists (front-to-back)
    cproj_ref,    # (8, Cp) SMEM f32 candidate min diagonal projections
    meta_ref,     # (8, 128) SMEM f32 per-block meta (row = program_id % 8)
    rays_ref,     # (1, R, 8) VMEM f32 (col 7 = bitcast int32 exclude)
    geo_ref,      # (C*GEO_ROWS, TB) VMEM f32
    int_ref,      # (C*INT_ROWS, TB) VMEM int32
    t_out,        # (1, 1, R)
    tri_out,      # (1, 1, R) int32
    u_out,
    v_out,
    *,
    t_eps: float,
):
    """Branch-free ordered walk over the block's PRECOMPACTED candidates,
    front-to-back along the octant diagonal with an early break on the
    slowest lane's best t. Running state is the full (R, TB) tile (best t /
    orig / u / v per slot); the winner is reduced across lanes ONCE at the
    end, so the per-candidate body is pure pair-test + 4 selects. Walking
    past the candidate count (UNROLL padding) re-tests valid clusters —
    idempotent (strict t improvement required). The scene-exit t clamp in
    _intersect keeps miss lanes from poisoning the break."""
    ox, oy, oz, dx, dy, dz, tmax, exclude = _ray_cols(rays_ref)
    vism = vismask_ref[0, 0]

    row = pl.program_id(0) % 8
    bound = meta_ref[row, 0].astype(jnp.int32)
    pure = meta_ref[row, 2] > 0.5
    proj_o = meta_ref[row, 3]
    cap = cproj_ref.shape[1] - 1
    R = rays_ref.shape[1]

    t0 = jnp.minimum(tmax, BIG)                      # (R, 1)

    def cond(state):
        li, t_tile, orig_tile, u_tile, v_tile, t_worst = state
        # front-to-back: a pure-octant block stops at the first candidate
        # whose min diagonal projection lies beyond the slowest ray's best
        # hit (projection along the unit diagonal is a lower bound on ray t)
        more = li < bound
        not_past = jnp.logical_or(
            jnp.logical_not(pure),
            cproj_ref[row, jnp.minimum(li, cap)] - proj_o < t_worst,
        )
        return jnp.logical_and(more, not_past)

    def pair_test(ci, t_tile, orig_tile, u_tile, v_tile):
        g = geo_ref[pl.ds(ci * GEO_ROWS, GEO_ROWS), :]   # (16, TB)
        it = int_ref[pl.ds(ci * INT_ROWS, INT_ROWS), :]  # (8, TB)
        vis, orig = it[0:1, :], it[1:2, :]
        det, t, u, v = _pairs_mt(ox, oy, oz, dx, dy, dz, g)
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_eps)
            & ((vis & vism) != 0)
            & (orig != exclude)
        )
        tm = jnp.where(ok, t, BIG)
        better = tm < t_tile                             # strict: idempotent
        return (
            jnp.where(better, tm, t_tile),
            jnp.where(better, jnp.broadcast_to(orig, better.shape), orig_tile),
            jnp.where(better, u, u_tile),
            jnp.where(better, v, v_tile),
        )

    def cluster_step(state):
        li, t_tile, orig_tile, u_tile, v_tile, t_worst = state
        for k in range(UNROLL):
            ci = cand_ref[row, jnp.minimum(li + k, cap)]
            t_tile, orig_tile, u_tile, v_tile = pair_test(
                ci, t_tile, orig_tile, u_tile, v_tile)
        # watermark refresh once per UNROLL candidates (lane-reduce amortized)
        t_worst = jnp.max(jnp.min(t_tile, axis=1))
        return li + UNROLL, t_tile, orig_tile, u_tile, v_tile, t_worst

    TB = TRI_BLOCK
    init = (
        jnp.int32(0),
        jnp.broadcast_to(t0, (R, TB)),
        jnp.full((R, TB), -1, jnp.int32),
        jnp.zeros((R, TB), jnp.float32),
        jnp.zeros((R, TB), jnp.float32),
        jnp.max(t0),
    )
    li_end, t_tile, orig_tile, u_tile, v_tile, _ = jax.lax.while_loop(
        cond, cluster_step, init
    )

    # winner extraction, once per block: best t across slots, then the
    # matching slot's orig/u/v (orig ids are globally unique, so selecting
    # by orig can't mix two tie slots' attributes)
    t_best = jnp.min(t_tile, axis=1, keepdims=True)          # (R, 1)
    sel = (t_tile <= t_best) & (orig_tile >= 0)
    tri = jnp.max(jnp.where(sel, orig_tile, -1), axis=1, keepdims=True)
    win = sel & (orig_tile == tri)
    u_best = jnp.max(jnp.where(win, u_tile, -BIG), axis=1, keepdims=True)
    v_best = jnp.max(jnp.where(win, v_tile, -BIG), axis=1, keepdims=True)
    hit = tri >= 0
    t_out[0] = t_best.reshape(1, R)
    tri_out[0] = tri.reshape(1, R)
    if _STATS:
        # debug instrumentation: u carries the pair-test count, v the
        # candidate bound (RLS_TRACE_STATS=1; hit u/v are sacrificed)
        u_out[0] = jnp.broadcast_to(li_end.astype(jnp.float32), (1, R))
        v_out[0] = jnp.broadcast_to(bound.astype(jnp.float32), (1, R))
    else:
        u_out[0] = jnp.where(hit, u_best, 0.0).reshape(1, R)
        v_out[0] = jnp.where(hit, v_best, 0.0).reshape(1, R)


def _occluded_kernel(
    vismask_ref, cand_ref, cproj_ref, meta_ref,
    rays_ref, geo_ref, int_ref, blocked_out, *,
    t_eps: float,
):
    ox, oy, oz, dx, dy, dz, tmax, exclude = _ray_cols(rays_ref)
    vism = vismask_ref[0, 0]

    row = pl.program_id(0) % 8
    bound = meta_ref[row, 0].astype(jnp.int32)
    pure = meta_ref[row, 2] > 0.5
    proj_o = meta_ref[row, 3]
    t_stop = jnp.max(tmax)
    cap = cproj_ref.shape[1] - 1
    R = rays_ref.shape[1]
    TB = TRI_BLOCK

    def cond(state):
        li, bl_tile, all_blocked = state
        more = jnp.logical_and(li < bound, jnp.logical_not(all_blocked))
        not_past = jnp.logical_or(
            jnp.logical_not(pure),
            cproj_ref[row, jnp.minimum(li, cap)] - proj_o < t_stop,
        )
        return jnp.logical_and(more, not_past)

    def test(ci, bl_tile):
        g = geo_ref[pl.ds(ci * GEO_ROWS, GEO_ROWS), :]
        it = int_ref[pl.ds(ci * INT_ROWS, INT_ROWS), :]
        vis, orig, opq = it[0:1, :], it[1:2, :], it[2:3, :]
        det, t, u, v = _pairs_mt(ox, oy, oz, dx, dy, dz, g)
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_eps) & (t < tmax)
            & ((vis & vism) != 0)
            & (opq != 0)
            & (orig != exclude)
        )
        return bl_tile | ok.astype(jnp.int32)

    def cluster_step(state):
        li, bl_tile, all_blocked = state
        for k in range(UNROLL):
            ci = cand_ref[row, jnp.minimum(li + k, cap)]
            bl_tile = test(ci, bl_tile)
        # all-blocked check once per UNROLL candidates; rays with no
        # remaining segment count as done
        bl_row = jnp.max(bl_tile, axis=1, keepdims=True)     # (R, 1)
        done = (bl_row != 0) | (tmax <= t_eps)
        return li + UNROLL, bl_tile, jnp.all(done)

    init = (jnp.int32(0), jnp.zeros((R, TB), jnp.int32), jnp.asarray(False))
    _, bl_tile, _ = jax.lax.while_loop(cond, cluster_step, init)
    blocked_out[0] = jnp.max(bl_tile, axis=1, keepdims=True).reshape(1, R)


def _ray_sort_key(packed: "PackedScene", o, d):
    """Coherence key: direction octant (high bits) then a 12-bit Morton code
    of the origin within the scene AABB — groups secondary/shadow rays into
    direction-pure, spatially-tight RAY_BLOCK-ray blocks so the kernel's
    octant orders, frustum bounds and early breaks bite."""
    bits = (d > 0.0).astype(jnp.int32)
    octant = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
    ext = jnp.maximum(packed.scene_hi - packed.scene_lo, 1e-6)
    q = jnp.clip((o - packed.scene_lo) / ext, 0.0, 1.0)
    qi = (q * 15.999).astype(jnp.int32)  # 4 bits per axis
    morton = jnp.zeros_like(octant)
    for b in range(4):
        morton = (
            morton
            | (((qi[:, 0] >> b) & 1) << (3 * b + 2))
            | (((qi[:, 1] >> b) & 1) << (3 * b + 1))
            | (((qi[:, 2] >> b) & 1) << (3 * b + 0))
        )
    return (octant << 12) | morton


def _sort_rays(packed, o, d, t_max, exclude):
    """Reorder rays for block coherence with ONE multi-operand lax.sort —
    measured ~free on this backend, vs ~19 ms per 262k rays for
    argsort + 4 payload gathers (tools/prep_lab.py, docs/perf.md).

    DEAD rays (t_max ~ 0: zero-BSDF-weight shadow lanes, no-light-hit
    pickup lanes, padding) sort to a dedicated key ABOVE every live key, so
    they compact into all-dead blocks whose candidate count is 0 (the
    prepass culls t_max<=0 lanes) — instead of diluting live blocks where
    they'd still occupy sublanes for the full walk."""
    r = o.shape[0]
    key = _ray_sort_key(packed, o, d)
    key = jnp.where(t_max <= 1e-6, jnp.int32(0x7FFFFFF), key)
    iota = jnp.arange(r, dtype=jnp.int32)
    (_, perm, ox, oy, oz, dx, dy, dz, tmx, ex) = jax.lax.sort(
        (key, iota, o[:, 0], o[:, 1], o[:, 2],
         d[:, 0], d[:, 1], d[:, 2], t_max,
         jnp.asarray(exclude, jnp.int32)),
        num_keys=1,
    )
    return perm, ox, oy, oz, dx, dy, dz, tmx, ex


def _scene_exit_t(packed: "PackedScene", ox, oy, oz, dx, dy, dz):
    """Per-ray exit t of the (inflated) scene AABB: a ray cannot hit any
    triangle past its box exit, so clamping t_max here keeps sky/miss lanes
    from poisoning the kernel's t_worst early break with 1e30 (one such lane
    used to force its whole block to walk the full cluster window)."""
    lo = packed.scene_lo - 1e-3
    hi = packed.scene_hi + 1e-3
    tfar = None
    for a, (oa, da) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
        inv = _inv(da)
        ta = (lo[a] - oa) * inv
        tb = (hi[a] - oa) * inv
        m = jnp.maximum(ta, tb)
        tfar = m if tfar is None else jnp.minimum(tfar, m)
    tfar = jnp.minimum(tfar, BIG)
    # rays that miss the box entirely get exit <= 0 -> t_max ~0 (no hits)
    return jnp.maximum(tfar * (1.0 + 1e-4) + 1e-3, 0.0)


def _pad_rays8(ox, oy, oz, dx, dy, dz, t_max, exclude):
    """Build the (nb, RAY_BLOCK, 8) transposed ray-block array from sorted
    1-D components. Padded to 8 ray-blocks so per-block meta can ride SMEM
    in Mosaic-legal (8, 128) tiles."""
    r = ox.shape[0]
    rp = ((r + 8 * RAY_BLOCK - 1) // (8 * RAY_BLOCK)) * (8 * RAY_BLOCK)
    pad = rp - r

    def p(a, val=0.0):
        return jnp.pad(a, (0, pad), constant_values=val)

    exf = jax.lax.bitcast_convert_type(
        p(exclude, -1).astype(jnp.int32), jnp.float32)
    flat = jnp.stack(
        [p(ox), p(oy), p(oz), p(dx, 1.0), p(dy, 1.0), p(dz, 1.0),
         p(t_max), exf], axis=1)          # (RP, 8)
    nb = rp // RAY_BLOCK
    return flat.reshape(nb, RAY_BLOCK, 8), r, rp


def _unperm(perm, vals, r, dtype=None):
    """Un-permute kernel outputs with a SCATTER-by-perm (measured ~1.5 ms
    per 262k rays vs ~26 ms for gather-by-argsort(perm))."""
    flat = vals.reshape(-1)[:r]
    out = jnp.zeros((r,), flat.dtype if dtype is None else dtype)
    return out.at[perm].set(flat)


def intersect(
    packed: PackedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray | None = None,
    exclude_tri: jnp.ndarray | None = None,
    vis_mask: int = 0xFF,
    t_eps: float = 1e-4,
):
    """Nearest-hit query (chunked). Returns (t, tri, u, v)."""
    r = o.shape[0]
    if t_max is None:
        t_max = jnp.full((r,), BIG)
    if exclude_tri is None:
        exclude_tri = jnp.full((r,), -1, jnp.int32)
    if r <= MAX_RAYS_PER_CALL:
        return _intersect(packed, o, d, t_max, exclude_tri,
                          vis_mask=vis_mask, t_eps=t_eps)
    # big batches: lax.map over fixed-size chunks — ONE compiled chunk body
    # regardless of batch size (a python loop would inline a fresh kernel
    # instance per chunk and blow up compile time on the remote compiler)
    n_chunks = (r + MAX_RAYS_PER_CALL - 1) // MAX_RAYS_PER_CALL
    rp = n_chunks * MAX_RAYS_PER_CALL
    pad = rp - r
    oc = jnp.pad(o, ((0, pad), (0, 0))).reshape(n_chunks, -1, 3)
    dc = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        n_chunks, -1, 3)
    tc = jnp.pad(t_max, (0, pad)).reshape(n_chunks, -1)
    ec = jnp.pad(jnp.asarray(exclude_tri, jnp.int32), (0, pad),
                 constant_values=-1).reshape(n_chunks, -1)

    def body(chunk):
        co, cd, ct, ce = chunk
        return _intersect(packed, co, cd, ct, ce,
                          vis_mask=vis_mask, t_eps=t_eps)

    t, tri, u, v = jax.lax.map(body, (oc, dc, tc, ec))
    flat = lambda a: a.reshape(-1)[:r]
    return flat(t), flat(tri), flat(u), flat(v)


@partial(jax.jit, static_argnames=("vis_mask", "t_eps"))
def _intersect(packed, o, d, t_max, exclude_tri, vis_mask, t_eps):
    r = o.shape[0]
    perm, ox, oy, oz, dx, dy, dz, tmx, ex = _sort_rays(
        packed, o, d, t_max, exclude_tri)
    # clamp the kernel's t_best init to the scene-box exit so miss/sky lanes
    # can't poison the early break with 1e30; misses still REPORT the
    # caller's t_max (fixed up after the kernel)
    tmx = jnp.minimum(tmx, _scene_exit_t(packed, ox, oy, oz, dx, dy, dz))
    rays8, r0, rp = _pad_rays8(ox, oy, oz, dx, dy, dz, tmx, ex)
    n_blocks = rp // RAY_BLOCK
    c = packed.n_clusters
    meta, cand, cproj = _block_meta(packed, rays8, c)
    cp = cand.shape[1]

    kernel = partial(_nearest_kernel, t_eps=t_eps)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RAY_BLOCK, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, RAY_BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1, RAY_BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, RAY_BLOCK), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        jnp.full((1, 1), vis_mask, jnp.int32),
        cand,
        cproj,
        meta,
        rays8,
        packed.geoT,
        packed.intT,
    )
    t = _unperm(perm, t, r0)
    tri = _unperm(perm, tri, r0)
    u = _unperm(perm, u, r0)
    v = _unperm(perm, v, r0)
    # misses report the caller's t_max (the kernel's t carries the
    # scene-exit clamp used for traversal pruning)
    t = jnp.where(tri >= 0, t, jnp.minimum(t_max, BIG))
    return t, tri, u, v


def occluded(
    packed: PackedScene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    exclude_tri: jnp.ndarray | None = None,
    vis_mask: int = 0xFF,
    t_eps: float = 1e-4,
):
    """Any-hit (shadow) query, chunked."""
    r = o.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full((r,), -1, jnp.int32)
    if r <= MAX_RAYS_PER_CALL:
        return _occluded(packed, o, d, t_max, exclude_tri,
                         vis_mask=vis_mask, t_eps=t_eps)
    n_chunks = (r + MAX_RAYS_PER_CALL - 1) // MAX_RAYS_PER_CALL
    rp = n_chunks * MAX_RAYS_PER_CALL
    pad = rp - r
    oc = jnp.pad(o, ((0, pad), (0, 0))).reshape(n_chunks, -1, 3)
    dc = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        n_chunks, -1, 3)
    tc = jnp.pad(t_max, (0, pad)).reshape(n_chunks, -1)
    ec = jnp.pad(jnp.asarray(exclude_tri, jnp.int32), (0, pad),
                 constant_values=-1).reshape(n_chunks, -1)

    def body(chunk):
        co, cd, ct, ce = chunk
        return _occluded(packed, co, cd, ct, ce,
                         vis_mask=vis_mask, t_eps=t_eps)

    blocked = jax.lax.map(body, (oc, dc, tc, ec))
    return blocked.reshape(-1)[:r]


@partial(jax.jit, static_argnames=("vis_mask", "t_eps"))
def _occluded(packed, o, d, t_max, exclude_tri, vis_mask, t_eps):
    r = o.shape[0]
    perm, ox, oy, oz, dx, dy, dz, tmx, ex = _sort_rays(
        packed, o, d, t_max, exclude_tri)
    # nothing can occlude past the scene-box exit: clamping t_max here makes
    # the projection early-break fire for t=inf hemisphere (sky) shadow
    # rays — the frame's most expensive ray class (docs/perf.md) — and is
    # semantically free for the blocked/unblocked answer (any real occluder
    # lies before the box exit by definition)
    tmx = jnp.minimum(tmx, _scene_exit_t(packed, ox, oy, oz, dx, dy, dz))
    rays8, r0, rp = _pad_rays8(ox, oy, oz, dx, dy, dz, tmx, ex)
    n_blocks = rp // RAY_BLOCK
    c = packed.n_clusters
    meta, cand, cproj = _block_meta(packed, rays8, c)
    cp = cand.shape[1]

    kernel = partial(_occluded_kernel, t_eps=t_eps)
    (blocked,) = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RAY_BLOCK, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n_blocks, 1, RAY_BLOCK), jnp.int32)],
        interpret=_interpret(),
    )(
        jnp.full((1, 1), vis_mask, jnp.int32),
        cand,
        cproj,
        meta,
        rays8,
        packed.geoT,
        packed.intT,
    )
    return _unperm(perm, blocked, r0) != 0
