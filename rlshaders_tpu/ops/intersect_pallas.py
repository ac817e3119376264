"""Pallas TPU ray-triangle intersection: ordered cluster-culled brute force.

The TPU-native replacement for pointer-chasing BVH traversal (which is
latency-bound on TPU — measured 0.01 Mrays/s): triangles are sorted into
spatially-coherent clusters of TRI_BLOCK (using the SAH BVH's leaf order);
each 128-ray block walks the clusters FRONT-TO-BACK along its direction
octant, slab-tests each cluster's AABB and — only when some ray in the block
can still hit it — runs a fully vectorized Moller-Trumbore over the
(TRI_BLOCK, RAY_BLOCK) pair tile. This is the design SURVEY.md section 7
calls the hardest TPU piece ("BVH traversal is divergent/pointer-chasing —
needs a Pallas-friendly layout ... warp-free SIMT-on-vector-lanes").

Traversal order & termination (the wavefront equivalent of ordered BVH
traversal):
* at pack time, the clusters are sorted along each of the 8 direction-octant
  diagonals (host NumPy); the kernel picks the order of the block's dominant
  octant and walks it with a `while_loop`;
* the loop bound is per block: a dense XLA frustum pre-pass (interval slab
  of every cluster vs the block's origin-box x direction-box) finds the last
  cluster the bundle can touch in that order — sky/miss blocks run ZERO
  iterations;
* direction-pure blocks also EARLY-BREAK when the next cluster's minimum
  diagonal projection lies beyond the slowest ray's current best hit
  (projection along the unit octant diagonal is a lower bound on ray t).

Mosaic-friendly layout rules used here:
* everything is 2-D: triangles vary along SUBLANES (axis 0), rays along
  LANES (axis 1); per-ray state is (1, RAY_BLOCK), per-tri data (TB, 1).
* all triangle data is VMEM-resident SoA; cluster AABBs + octant tables live
  in SMEM; per-block meta rides an (8, 128) SMEM tile shared by 8 grid steps.
* a skipped cluster costs one scalar load + a slab test; the pair tile only
  runs behind a `lax.cond`.

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

# Pair-tile shape: rays along lanes, triangles along sublanes. The
# per-cluster while_loop iteration has a fixed ~us-scale latency (scalar
# control + SMEM loads + cond), so FATTER blocks amortize it; env knobs for
# calibration sweeps (tools/), defaults set by measurement on v5e.
import os as _os

RAY_BLOCK = int(_os.environ.get("RLS_RAY_BLOCK", "128"))
_STATS = _os.environ.get("RLS_TRACE_STATS", "0") == "1"
TRI_BLOCK = int(_os.environ.get("RLS_TRI_BLOCK", "128"))
# candidate clusters pair-tested per while_loop iteration: fatter iterations
# amortize the ~us-scale loop-control latency that dominated the round-2
# kernel (measured ~3us/iteration at ~0.7us of pair-test vector work)
UNROLL = int(_os.environ.get("RLS_TRACE_UNROLL", "2"))
# ray-blocks per dense-prepass chunk: bounds the (chunk*RAY_BLOCK, C) slab
# intermediates (bust-scale scenes would otherwise materialize GBs)
META_CHUNK = int(_os.environ.get("RLS_META_CHUNK", "128"))
del _os
BIG = 1e30
INV_SQRT3 = 0.5773502691896258
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
    hence spatially coherent); `oct_projid[o, c]` is the minimum projection
    of cluster c's AABB on octant o's unit diagonal — the front-to-back sort
    key the dense prepass uses directly (pack-time table so trace time pays
    a single (8, C) row gather, not a rank-table take_along_axis)."""

    comp: jnp.ndarray      # (C*TB, 9) f32: v0xyz, e1xyz, e2xyz columns
    vis: jnp.ndarray       # (C*TB, 1) int32 visibility bits (0 for padding)
    opaque: jnp.ndarray    # (C*TB, 1) int32 1/0
    orig: jnp.ndarray      # (C*TB, 1) int32 original triangle index (-1 pad)
    cl_min: jnp.ndarray    # (C, 3) cluster AABBs, padded rows degenerate
    cl_max: jnp.ndarray    # (C, 3)
    oct_projid: jnp.ndarray  # (8, C) f32 min diagonal projection BY CLUSTER ID
    scene_lo: jnp.ndarray   # (3,) scene AABB (for ray-sort Morton keys)
    scene_hi: jnp.ndarray   # (3,)

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
    pad = c * TRI_BLOCK - t

    def padv(a, val=0.0):
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=val)

    v0p, e1p, e2p = padv(v0), padv(e1), padv(e2)
    comp = np.concatenate([v0p, e1p, e2p], axis=1)  # (C*TB, 9)
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
        comp=jnp.asarray(comp),
        vis=jnp.asarray(np.pad(vis, (0, pad))[:, None]),
        opaque=jnp.asarray(np.pad(opq, (0, pad))[:, None]),
        orig=jnp.asarray(
            np.pad(np.asarray(order, np.int64), (0, pad),
                   constant_values=-1).astype(np.int32)[:, None]
        ),
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


def _pairs_mt(ox, oy, oz, dx, dy, dz, c):
    """Moller-Trumbore over the (TB, R) pair tile.

    Rays are (1, R); c is the (TB, 9) component slab; tri components are
    (TB, 1) columns. Returns (det, t, u, v), each (TB, R)."""
    v0x, v0y, v0z = c[:, 0:1], c[:, 1:2], c[:, 2:3]
    e1x, e1y, e1z = c[:, 3:4], c[:, 4:5], c[:, 5:6]
    e2x, e2y, e2z = c[:, 6:7], c[:, 7:8], c[:, 8:9]

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


def _inv(d):
    # near-zero components use a large sign-independent constant; the old
    # sign(d)*BIG+BIG form evaluated to 0 for tiny NEGATIVE components and
    # collapsed the slab interval
    safe = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    return jnp.where(jnp.abs(d) > 1e-12, 1.0 / safe, BIG)


def _block_meta(packed: "PackedScene", rays, n_boxes: int):
    """Per-ray-block traversal metadata AND compacted candidate lists
    (dense XLA):
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
    slab test, no cross-lane any(), and no lax.cond — the round-2 kernel
    spent ~3us/iteration on exactly that control latency while the pair
    test itself is ~0.7us of vector work. Block-interval frustum culling
    (the round-2 prepass) survived ~3.5x more clusters than per-ray-exact
    on coherent camera blocks and nearly everything on incoherent blocks.
    meta is (nb, 128) f32 so it rides an (8, 128) SMEM tile; cand/cproj ride
    (8, Cp) SMEM tiles per 8-block grid group."""
    nb = rays.shape[0]
    o = rays[:, 0:3, :]   # (nb, 3, R)
    d = rays[:, 3:6, :]
    d_lo = d.min(axis=2)
    d_hi = d.max(axis=2)
    o_lo = o.min(axis=2)
    o_hi = o.max(axis=2)

    cmin = packed.cl_min[:n_boxes]  # (C, 3)
    cmax = packed.cl_max[:n_boxes]

    def chunk_survive(rchunk):
        # exact per-ray slab vs every cluster, OR-reduced over the block's
        # rays; (G, R, C) intermediates stay fused into the reduce
        oc = rchunk[:, 0:3, :]            # (G, 3, R)
        dc = rchunk[:, 3:6, :]
        tmx = rchunk[:, 6, :]             # (G, R)
        inv = _inv(dc)
        tn = None
        tf = None
        for a in range(3):
            t0 = (cmin[None, None, :, a] - oc[:, a, :, None]) * inv[:, a, :, None]
            t1 = (cmax[None, None, :, a] - oc[:, a, :, None]) * inv[:, a, :, None]
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
        survive = chunk_survive(rays)
    else:
        gpad = (-nb) % META_CHUNK
        rpad = jnp.pad(rays, ((0, gpad), (0, 0), (0, 0)))
        groups = rpad.reshape(-1, META_CHUNK, 7, RAY_BLOCK)
        survive = jax.lax.map(chunk_survive, groups).reshape(
            -1, n_boxes)[:nb]

    # dominant octant from the direction sums; purity from the sign boxes
    d_sum = d.sum(axis=2)  # (nb, 3)
    bits = (d_sum > 0.0).astype(jnp.int32)
    oct_id = bits[:, 0] * 4 + bits[:, 1] * 2 + bits[:, 2]
    pure = jnp.all((d_lo > 0.0) == (d_hi > 0.0), axis=1) & jnp.all(
        (d_lo > 0.0) == (bits > 0), axis=1
    )

    # compact the survivors into per-block front-to-back candidate lists:
    # sort directly on the f32 diagonal projection (pack-time per-id table,
    # one (8, C) row gather) with non-survivors pushed to BIG — 2 operands
    # and cproj IS the sorted key. The earlier rank-keyed 3-operand form
    # paid an extra take_along_axis + rank gather + a third sort operand.
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


def _nearest_kernel(
    vismask_ref,  # (1, 1) SMEM int32
    cand_ref,     # (8, Cp) SMEM int32 per-block candidate lists (front-to-back)
    cproj_ref,    # (8, Cp) SMEM f32 candidate min diagonal projections
    meta_ref,     # (8, 128) SMEM f32 per-block meta (row = program_id % 8)
    rays_ref,     # (1, 7, RAY_BLOCK) VMEM
    ex_ref,       # (1, 1, RAY_BLOCK) VMEM int32
    comp_ref,     # (C*TB, 9) VMEM
    vis_ref,      # (C*TB, 1) VMEM int32
    orig_ref,     # (C*TB, 1) VMEM int32
    t_out,        # (1, 1, RAY_BLOCK)
    tri_out,      # (1, 1, RAY_BLOCK) int32
    u_out,
    v_out,
    *,
    n_clusters: int,
    t_eps: float,
):
    """Branch-free ordered walk over the block's PRECOMPACTED candidates,
    front-to-back along the octant diagonal with an early break on the
    slowest lane's best t. Culling happened in the dense prepass (exact
    per-ray slabs, _block_meta): every iteration here runs UNROLL
    unconditional (TB, R) pair tests — no in-kernel slab, no any(), no
    lax.cond; that control latency was the round-2 kernel's dominant cost
    (~3us/iter vs ~0.7us of pair-test work). Walking past the candidate
    count (UNROLL padding) re-tests valid clusters — idempotent for both
    queries. The scene-exit t clamp in _intersect keeps miss lanes from
    poisoning the break."""
    ox = rays_ref[0, 0:1, :]
    oy = rays_ref[0, 1:2, :]
    oz = rays_ref[0, 2:3, :]
    dx = rays_ref[0, 3:4, :]
    dy = rays_ref[0, 4:5, :]
    dz = rays_ref[0, 5:6, :]
    tmax = rays_ref[0, 6:7, :]
    exclude = ex_ref[0, 0:1, :]
    vism = vismask_ref[0, 0]

    row = pl.program_id(0) % 8
    bound = meta_ref[row, 0].astype(jnp.int32)
    pure = meta_ref[row, 2] > 0.5
    proj_o = meta_ref[row, 3]

    cap = cproj_ref.shape[1] - 1

    def cond(state):
        li, t_best, tri_best, u_best, v_best, t_worst = state
        # front-to-back: a pure-octant block stops at the first candidate
        # whose min diagonal projection lies beyond the slowest ray's best
        # hit (projection along the unit diagonal is a lower bound on ray t)
        more = li < bound
        not_past = jnp.logical_or(
            jnp.logical_not(pure),
            cproj_ref[row, jnp.minimum(li, cap)] - proj_o < t_worst,
        )
        return jnp.logical_and(more, not_past)

    def pair_test(ci, state):
        t_best, tri_best, u_best, v_best = state
        sl = pl.ds(ci * TRI_BLOCK, TRI_BLOCK)
        c = comp_ref[sl, :]
        det, t, u, v = _pairs_mt(ox, oy, oz, dx, dy, dz, c)
        vis = vis_ref[sl, :]
        orig = orig_ref[sl, :]
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_eps) & (t < t_best)
            & ((vis & vism) != 0)
            & (orig != exclude)
        )
        tm = jnp.where(ok, t, BIG)
        t_new = jnp.min(tm, axis=0, keepdims=True)          # (1, R)
        sel = tm == t_new                                    # (TB, R)
        better = t_new < t_best
        tri_new = jnp.max(jnp.where(sel, orig, -1), axis=0, keepdims=True)
        u_new = jnp.max(jnp.where(sel, u, -BIG), axis=0, keepdims=True)
        v_new = jnp.max(jnp.where(sel, v, -BIG), axis=0, keepdims=True)
        return (
            jnp.where(better, t_new, t_best),
            jnp.where(better, tri_new, tri_best),
            jnp.where(better, u_new, u_best),
            jnp.where(better, v_new, v_best),
        )

    def cluster_step(state):
        li, t_best, tri_best, u_best, v_best, t_worst = state
        s4 = (t_best, tri_best, u_best, v_best)
        for k in range(UNROLL):
            ci = cand_ref[row, jnp.minimum(li + k, cap)]
            s4 = pair_test(ci, s4)
        t_best, tri_best, u_best, v_best = s4
        return li + UNROLL, t_best, tri_best, u_best, v_best, jnp.max(t_best)

    t0 = jnp.minimum(tmax, BIG)
    init = (
        jnp.int32(0),
        t0,
        jnp.full((1, RAY_BLOCK), -1, jnp.int32),
        jnp.zeros((1, RAY_BLOCK), jnp.float32),
        jnp.zeros((1, RAY_BLOCK), jnp.float32),
        jnp.max(t0),
    )
    li_end, t_best, tri_best, u_best, v_best, _ = jax.lax.while_loop(
        cond, cluster_step, init
    )
    t_out[0] = t_best
    tri_out[0] = tri_best
    if _STATS:
        # debug instrumentation: u carries the pair-test count, v the
        # candidate bound (RLS_TRACE_STATS=1; hit u/v are sacrificed)
        u_out[0] = jnp.broadcast_to(
            li_end.astype(jnp.float32), (1, RAY_BLOCK)
        )
        v_out[0] = jnp.broadcast_to(
            bound.astype(jnp.float32), (1, RAY_BLOCK)
        )
    else:
        u_out[0] = u_best
        v_out[0] = v_best


def _occluded_kernel(
    vismask_ref, cand_ref, cproj_ref, meta_ref,
    rays_ref, ex_ref, comp_ref, vis_ref, orig_ref, opq_ref, blocked_out, *,
    n_clusters: int, t_eps: float,
):
    ox = rays_ref[0, 0:1, :]
    oy = rays_ref[0, 1:2, :]
    oz = rays_ref[0, 2:3, :]
    dx = rays_ref[0, 3:4, :]
    dy = rays_ref[0, 4:5, :]
    dz = rays_ref[0, 5:6, :]
    tmax = rays_ref[0, 6:7, :]
    exclude = ex_ref[0, 0:1, :]
    vism = vismask_ref[0, 0]

    row = pl.program_id(0) % 8
    bound = meta_ref[row, 0].astype(jnp.int32)
    pure = meta_ref[row, 2] > 0.5
    proj_o = meta_ref[row, 3]
    t_stop = jnp.max(tmax)

    cap = cproj_ref.shape[1] - 1

    def cond(state):
        li, blocked, all_blocked = state
        more = jnp.logical_and(li < bound, jnp.logical_not(all_blocked))
        not_past = jnp.logical_or(
            jnp.logical_not(pure),
            cproj_ref[row, jnp.minimum(li, cap)] - proj_o < t_stop,
        )
        return jnp.logical_and(more, not_past)

    def test(ci, blocked):
        sl = pl.ds(ci * TRI_BLOCK, TRI_BLOCK)
        c = comp_ref[sl, :]
        det, t, u, v = _pairs_mt(ox, oy, oz, dx, dy, dz, c)
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_eps) & (t < tmax)
            & ((vis_ref[sl, :] & vism) != 0)
            & (opq_ref[sl, :] != 0)
            & (orig_ref[sl, :] != exclude)
        )
        return blocked | jnp.any(ok, axis=0, keepdims=True).astype(jnp.int32)

    def cluster_step(state):
        li, blocked, all_blocked = state
        for k in range(UNROLL):
            ci = cand_ref[row, jnp.minimum(li + k, cap)]
            blocked = test(ci, blocked)
        # rays with no remaining segment count as done for the all-check
        done = (blocked != 0) | (tmax <= t_eps)
        return li + UNROLL, blocked, jnp.all(done)

    init = (jnp.int32(0), jnp.zeros((1, RAY_BLOCK), jnp.int32),
            jnp.asarray(False))
    _, blocked, _ = jax.lax.while_loop(cond, cluster_step, init)
    blocked_out[0] = blocked


def _ray_sort_key(packed: "PackedScene", o, d):
    """Coherence key: direction octant (high bits) then a 12-bit Morton code
    of the origin within the scene AABB — groups secondary/shadow rays into
    direction-pure, spatially-tight 128-ray blocks so the kernel's octant
    orders, frustum bounds and early breaks bite."""
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


def _pad_rays(o, d, t_max, exclude):
    r = o.shape[0]
    # pad to 8 ray-blocks so the per-block meta can ride SMEM in Mosaic-legal
    # (8, 128) tiles
    rp = ((r + 8 * RAY_BLOCK - 1) // (8 * RAY_BLOCK)) * (8 * RAY_BLOCK)
    pad = rp - r
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t_max = jnp.pad(t_max, (0, pad))
    # exclude ids travel as their own int32 buffer: float32 packing loses
    # triangle indices above 2^24 (silent self-intersection failures on
    # >16.7M-tri meshes)
    exclude = jnp.pad(
        jnp.asarray(exclude, jnp.int32), (0, pad), constant_values=-1
    )
    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_max]
    )  # (7, RP)
    # (n_blocks, 7, RAY_BLOCK): per-grid-step blocks so only one block's rays
    # and outputs ever live in VMEM (outputs as (1, RAY_BLOCK) rows would pin
    # the whole row-0 buffer on-chip)
    nb = rp // RAY_BLOCK
    rays = rays.reshape(7, nb, RAY_BLOCK).transpose(1, 0, 2)
    ex = exclude.reshape(nb, 1, RAY_BLOCK)
    return rays, ex, r, rp


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


def _scene_exit_t(packed: "PackedScene", o, d):
    """Per-ray exit t of the (inflated) scene AABB: a ray cannot hit any
    triangle past its box exit, so clamping t_max here keeps sky/miss lanes
    from poisoning the kernel's t_worst early break with 1e30 (one such lane
    used to force its whole 128-ray block to walk the full cluster window)."""
    lo = packed.scene_lo - 1e-3
    hi = packed.scene_hi + 1e-3
    safe = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / safe, BIG)
    ta = (lo - o) * inv
    tb = (hi - o) * inv
    tfar = jnp.minimum(jnp.maximum(ta, tb).min(axis=-1), BIG)
    # rays that miss the box entirely get exit <= 0 -> t_max ~0 (no hits)
    return jnp.maximum(tfar * (1.0 + 1e-4) + 1e-3, 0.0)


@partial(jax.jit, static_argnames=("vis_mask", "t_eps"))
def _intersect(packed, o, d, t_max, exclude_tri, vis_mask, t_eps):
    perm = jnp.argsort(_ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max_orig = t_max
    t_max, exclude_tri = t_max[perm], exclude_tri[perm]
    # clamp the kernel's t_best init to the scene-box exit so miss/sky lanes
    # can't poison the early break with 1e30; misses still REPORT the
    # caller's t_max (fixed up after the kernel)
    t_max = jnp.minimum(t_max, _scene_exit_t(packed, o, d))
    rays, ex, r0, rp = _pad_rays(o, d, t_max, exclude_tri)
    n_blocks = rp // RAY_BLOCK
    c = packed.n_clusters
    meta, cand, cproj = _block_meta(packed, rays, c)
    cp = cand.shape[1]

    kernel = partial(_nearest_kernel, n_clusters=c, t_eps=t_eps)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 7, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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
        rays,
        ex,
        packed.comp,
        packed.vis,
        packed.orig,
    )
    inv = jnp.argsort(perm)
    flat = lambda a: a.reshape(-1)[:r0][inv]
    t, tri, u, v = flat(t), flat(tri), flat(u), flat(v)
    # misses report the caller's t_max (the kernel's t carries the
    # scene-exit clamp used for traversal pruning)
    t = jnp.where(tri >= 0, t, jnp.minimum(t_max_orig, BIG))
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
    perm = jnp.argsort(_ray_sort_key(packed, o, d))
    o, d = o[perm], d[perm]
    t_max, exclude_tri = t_max[perm], exclude_tri[perm]
    # nothing can occlude past the scene-box exit: clamping t_max here makes
    # the projection early-break and the t_hi frustum cull fire for t=inf
    # hemisphere (sky) shadow rays — the frame's most expensive ray class
    # (docs/perf.md) — and is semantically free for the blocked/unblocked
    # answer (any real occluder lies before the box exit by definition)
    t_max = jnp.minimum(t_max, _scene_exit_t(packed, o, d))
    rays, ex, r0, rp = _pad_rays(o, d, t_max, exclude_tri)
    n_blocks = rp // RAY_BLOCK
    c = packed.n_clusters
    meta, cand, cproj = _block_meta(packed, rays, c)
    cp = cand.shape[1]

    kernel = partial(_occluded_kernel, n_clusters=c, t_eps=t_eps)
    (blocked,) = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, cp), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 7, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RAY_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
        rays,
        ex,
        packed.comp,
        packed.vis,
        packed.orig,
        packed.opaque,
    )
    return blocked.reshape(-1)[:r0][jnp.argsort(perm)] != 0
