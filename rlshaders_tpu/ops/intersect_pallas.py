"""Pallas TPU ray-triangle intersection: cluster-culled brute force.

The TPU-native replacement for pointer-chasing BVH traversal (which is
latency-bound on TPU — measured 0.01 Mrays/s): triangles are sorted into
spatially-coherent clusters of TRI_BLOCK (using the SAH BVH's leaf order);
each ray block slab-tests a cluster's AABB and — only when any ray in the
block can hit it — runs a fully vectorized Moller-Trumbore over the
(TRI_BLOCK, RAY_BLOCK) pair tile. This is the design SURVEY.md section 7
calls the hardest TPU piece ("BVH traversal is divergent/pointer-chasing —
needs a Pallas-friendly layout ... warp-free SIMT-on-vector-lanes").

Mosaic-friendly layout rules used here:
* everything is 2-D: triangles vary along SUBLANES (axis 0), rays along
  LANES (axis 1); per-ray state is (1, RAY_BLOCK), per-tri data (TB, 1).
* all triangle data is VMEM-resident SoA; cluster AABBs live in SMEM and
  are read as scalars inside the cluster loop.
* the cluster loop is a fori_loop with a lax.cond cull — a skipped cluster
  costs only the slab test.

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

RAY_BLOCK = 128
TRI_BLOCK = 128
BIG = 1e30
# Mosaic's scoped-vmem accounting rejects very large grids when the kernel is
# embedded in a fused jit; standalone dispatches (the staged integrator only
# calls these between jits) handle 1M rays fine.
MAX_RAYS_PER_CALL = 1048576


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class PackedScene(NamedTuple):
    """Cluster-packed triangle SoA (device). Padded tris are degenerate."""

    comp: jnp.ndarray      # (C*TB, 9) f32: v0xyz, e1xyz, e2xyz columns
    vis: jnp.ndarray       # (C*TB, 1) int32 visibility bits (0 for padding)
    opaque: jnp.ndarray    # (C*TB, 1) int32 1/0
    orig: jnp.ndarray      # (C*TB, 1) int32 original triangle index (-1 pad)
    cl_min: jnp.ndarray    # (C, 3)
    cl_max: jnp.ndarray    # (C, 3)

    @property
    def n_clusters(self) -> int:
        return self.cl_min.shape[0]


def pack(v0, e1, e2, visibility, opaque, order) -> PackedScene:
    """Pack triangles (host) into clusters following `order` (spatially
    coherent, e.g. the SAH BVH leaf order)."""
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
    return PackedScene(
        comp=jnp.asarray(comp),
        vis=jnp.asarray(np.pad(vis, (0, pad))[:, None]),
        opaque=jnp.asarray(np.pad(opq, (0, pad))[:, None]),
        orig=jnp.asarray(
            np.pad(np.asarray(order, np.int64), (0, pad), constant_values=-1)
            .astype(np.int32)[:, None]
        ),
        cl_min=jnp.asarray(big.min(axis=1)),
        cl_max=jnp.asarray(small.max(axis=1)),
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


def _slab(clmin_ref, clmax_ref, ci, ox, oy, oz, ix, iy, iz):
    """Cluster AABB slab test; bounds are SMEM scalars, rays (1, R)."""
    tx0 = (clmin_ref[ci, 0] - ox) * ix
    tx1 = (clmax_ref[ci, 0] - ox) * ix
    ty0 = (clmin_ref[ci, 1] - oy) * iy
    ty1 = (clmax_ref[ci, 1] - oy) * iy
    tz0 = (clmin_ref[ci, 2] - oz) * iz
    tz1 = (clmax_ref[ci, 2] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return tn, tf


def _inv(d):
    # near-zero components use a large sign-independent constant; the old
    # sign(d)*BIG+BIG form evaluated to 0 for tiny NEGATIVE components and
    # collapsed the slab interval
    safe = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    return jnp.where(jnp.abs(d) > 1e-12, 1.0 / safe, BIG)


def _nearest_kernel(
    vismask_ref,  # (1, 1) SMEM int32
    clmin_ref,    # (C, 3) SMEM
    clmax_ref,    # (C, 3) SMEM
    rays_ref,     # (7, RAY_BLOCK) VMEM
    ex_ref,       # (1, RAY_BLOCK) VMEM int32
    comp_ref,     # (C*TB, 9) VMEM
    vis_ref,      # (C*TB, 1) VMEM int32
    orig_ref,     # (C*TB, 1) VMEM int32
    t_out,        # (1, RAY_BLOCK)
    tri_out,      # (1, RAY_BLOCK) int32
    u_out,
    v_out,
    *,
    n_clusters: int,
    t_eps: float,
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
    ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)

    def cluster_step(ci, state):
        t_best, tri_best, u_best, v_best = state
        tn, tf = _slab(clmin_ref, clmax_ref, ci, ox, oy, oz, ix, iy, iz)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
        any_hit = jnp.any(box_hit)

        def test(state):
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

        return jax.lax.cond(any_hit, test, lambda s: s,
                            (t_best, tri_best, u_best, v_best))

    init = (
        jnp.minimum(tmax, BIG),
        jnp.full((1, RAY_BLOCK), -1, jnp.int32),
        jnp.zeros((1, RAY_BLOCK), jnp.float32),
        jnp.zeros((1, RAY_BLOCK), jnp.float32),
    )
    t_best, tri_best, u_best, v_best = jax.lax.fori_loop(
        0, n_clusters, cluster_step, init
    )
    t_out[0] = t_best
    tri_out[0] = tri_best
    u_out[0] = u_best
    v_out[0] = v_best


def _occluded_kernel(
    vismask_ref, clmin_ref, clmax_ref, rays_ref, ex_ref, comp_ref, vis_ref,
    orig_ref, opq_ref, blocked_out, *, n_clusters: int, t_eps: float,
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
    ix, iy, iz = _inv(dx), _inv(dy), _inv(dz)

    def cluster_step(ci, blocked):
        tn, tf = _slab(clmin_ref, clmax_ref, ci, ox, oy, oz, ix, iy, iz)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tmax) & (blocked == 0)
        any_hit = jnp.any(box_hit)

        def test(blocked):
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

        return jax.lax.cond(any_hit, test, lambda b: b, blocked)

    blocked = jax.lax.fori_loop(
        0, n_clusters, cluster_step, jnp.zeros((1, RAY_BLOCK), jnp.int32)
    )
    blocked_out[0] = blocked


def _pad_rays(o, d, t_max, exclude):
    r = o.shape[0]
    rp = ((r + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK
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
    outs = []
    for s in range(0, r, MAX_RAYS_PER_CALL):
        e = min(s + MAX_RAYS_PER_CALL, r)
        outs.append(_intersect(packed, o[s:e], d[s:e], t_max[s:e],
                               exclude_tri[s:e], vis_mask=vis_mask, t_eps=t_eps))
    return tuple(jnp.concatenate([x[i] for x in outs]) for i in range(4))


@partial(jax.jit, static_argnames=("vis_mask", "t_eps"))
def _intersect(packed, o, d, t_max, exclude_tri, vis_mask, t_eps):
    rays, ex, r0, rp = _pad_rays(o, d, t_max, exclude_tri)
    n_blocks = rp // RAY_BLOCK
    c = packed.n_clusters

    kernel = partial(_nearest_kernel, n_clusters=c, t_eps=t_eps)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        packed.cl_min,
        packed.cl_max,
        rays,
        ex,
        packed.comp,
        packed.vis,
        packed.orig,
    )
    flat = lambda a: a.reshape(-1)[:r0]
    return flat(t), flat(tri), flat(u), flat(v)


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
    outs = []
    for s in range(0, r, MAX_RAYS_PER_CALL):
        e = min(s + MAX_RAYS_PER_CALL, r)
        outs.append(_occluded(packed, o[s:e], d[s:e], t_max[s:e],
                              exclude_tri[s:e], vis_mask=vis_mask, t_eps=t_eps))
    return jnp.concatenate(outs)


@partial(jax.jit, static_argnames=("vis_mask", "t_eps"))
def _occluded(packed, o, d, t_max, exclude_tri, vis_mask, t_eps):
    rays, ex, r0, rp = _pad_rays(o, d, t_max, exclude_tri)
    n_blocks = rp // RAY_BLOCK
    c = packed.n_clusters

    kernel = partial(_occluded_kernel, n_clusters=c, t_eps=t_eps)
    (blocked,) = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        packed.cl_min,
        packed.cl_max,
        rays,
        ex,
        packed.comp,
        packed.vis,
        packed.orig,
        packed.opaque,
    )
    return blocked.reshape(-1)[:r0] != 0
