"""BVH construction (host) and wavefront traversal (device).

The reference delegated all ray casting to the Arnold host (`AiTrace`,
`AiTraceProbe`, SURVEY.md section 2.3); this module is the TPU-native
replacement. Design choices for TPU:

* **Threaded ("skip-link") BVH**: nodes stored in DFS order; an AABB hit on
  an inner node advances to `i+1`, a miss (or leaf completion) jumps to the
  node's precomputed `miss` link. Traversal is stackless — a single int of
  state per ray — so a whole wavefront of rays walks the tree in lockstep
  with fully vectorized gathers and no data-dependent shapes.
* **Binned SAH build** on the host (NumPy); scenes are rebuilt rarely, rays
  are traced constantly.
* Leaves hold up to `LEAF_SIZE` triangles; leaf tests are a static unrolled
  gather so the inner loop has no dynamic trip counts.

A faster C++ builder can be slotted in behind `build()` without touching the
traversal format.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
N_BINS = 16


class BVH(NamedTuple):
    """Flattened threaded BVH + reordered triangle arrays (device)."""

    bbox_min: jnp.ndarray   # (N, 3)
    bbox_max: jnp.ndarray   # (N, 3)
    first: jnp.ndarray      # (N,) leaf: first triangle; inner: -1
    count: jnp.ndarray      # (N,) leaf: triangle count; inner: 0
    miss: jnp.ndarray       # (N,) skip link (node index or N = done)
    tri_order: jnp.ndarray  # (T,) permutation into the original tri arrays


def build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> BVH:
    """Binned-SAH BVH over triangles given as (v0, v0+e1, v0+e2).

    Uses the native C++ builder (accel/csrc) when available; the NumPy code
    below is the behavioral reference and fallback."""
    from . import native

    if native.available():
        out = native.build_arrays(v0, e1, e2, LEAF_SIZE, N_BINS)
        if out is not None:
            bbox_min, bbox_max, first, count, miss, order = out
            return BVH(
                bbox_min=jnp.asarray(bbox_min),
                bbox_max=jnp.asarray(bbox_max),
                first=jnp.asarray(first),
                count=jnp.asarray(count),
                miss=jnp.asarray(miss),
                tri_order=jnp.asarray(order),
            )

    v0 = np.asarray(v0, np.float32)
    p1 = v0 + np.asarray(e1, np.float32)
    p2 = v0 + np.asarray(e2, np.float32)
    t = v0.shape[0]
    tmin = np.minimum(np.minimum(v0, p1), p2)
    tmax = np.maximum(np.maximum(v0, p1), p2)
    cent = (tmin + tmax) * 0.5

    order = np.arange(t)
    # node records: (lo, hi, parent_slot) built via explicit stack, DFS order
    bbox_min_l, bbox_max_l, first_l, count_l = [], [], [], []
    ranges: list[tuple[int, int]] = []

    def node_bbox(idx):
        return tmin[idx].min(0), tmax[idx].max(0)

    # First pass: build the tree in DFS order recording child structure.
    children: list[tuple[int, int]] = []  # (left, right) or (-1, -1) leaf
    stack = [(0, t)]
    spans = []
    while stack:
        lo, hi = stack.pop()
        idx = order[lo:hi]
        bmin, bmax = node_bbox(idx)
        me = len(bbox_min_l)
        bbox_min_l.append(bmin)
        bbox_max_l.append(bmax)
        spans.append((lo, hi))
        n = hi - lo
        if n <= LEAF_SIZE:
            first_l.append(lo)
            count_l.append(n)
            children.append((-1, -1))
            continue
        # binned SAH on the widest centroid axis
        c = cent[idx]
        cmin, cmax = c.min(0), c.max(0)
        axis = int(np.argmax(cmax - cmin))
        extent = cmax[axis] - cmin[axis]
        if extent < 1e-12:
            mid = lo + n // 2
        else:
            scale = N_BINS * (1.0 - 1e-6) / extent
            bins = ((c[:, axis] - cmin[axis]) * scale).astype(np.int32)
            best_cost, best_split = np.inf, None
            # prefix/suffix bin bounds
            counts = np.bincount(bins, minlength=N_BINS)
            bin_min = np.full((N_BINS, 3), np.inf, np.float32)
            bin_max = np.full((N_BINS, 3), -np.inf, np.float32)
            for b in range(N_BINS):
                sel = bins == b
                if counts[b]:
                    bin_min[b] = tmin[idx[sel]].min(0)
                    bin_max[b] = tmax[idx[sel]].max(0)
            lmin = np.minimum.accumulate(bin_min, 0)
            lmax = np.maximum.accumulate(bin_max, 0)
            rmin = np.minimum.accumulate(bin_min[::-1], 0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], 0)[::-1]
            lcnt = np.cumsum(counts)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            la = area(lmin, lmax)
            ra = area(rmin, rmax)
            for b in range(N_BINS - 1):
                nl = lcnt[b]
                nr = n - nl
                if nl == 0 or nr == 0:
                    continue
                cost = la[b] * nl + ra[b + 1] * nr
                if cost < best_cost:
                    best_cost, best_split = cost, b
            if best_split is None:
                mid = lo + n // 2
            else:
                sel = bins <= best_split
                left_idx = idx[sel]
                right_idx = idx[~sel]
                order[lo : lo + left_idx.size] = left_idx
                order[lo + left_idx.size : hi] = right_idx
                mid = lo + left_idx.size
        first_l.append(-1)
        count_l.append(0)
        children.append((None, None))  # fixed up by DFS order below
        # DFS order: left child is me+1; push right first so left pops first
        stack.append((mid, hi))
        stack.append((lo, mid))

    n_nodes = len(bbox_min_l)
    # Subtree sizes bottom-up over the DFS layout: an inner node's left child
    # is i+1, its right child is i+1+subtree[i+1].
    is_inner = np.asarray([c == (None, None) for c in children])
    subtree = np.ones(n_nodes, np.int64)
    for i in range(n_nodes - 1, -1, -1):
        if is_inner[i]:
            left = i + 1
            right = left + subtree[left]
            subtree[i] = 1 + subtree[left] + subtree[right]

    # miss links: next node after my subtree
    miss = np.arange(n_nodes, dtype=np.int64) + subtree

    return BVH(
        bbox_min=jnp.asarray(np.stack(bbox_min_l)),
        bbox_max=jnp.asarray(np.stack(bbox_max_l)),
        first=jnp.asarray(np.asarray(first_l, np.int32)),
        count=jnp.asarray(np.asarray(count_l, np.int32)),
        miss=jnp.asarray(miss.astype(np.int32)),
        tri_order=jnp.asarray(order.astype(np.int32)),
    )


class Hit(NamedTuple):
    """Per-ray nearest-hit record; tri = -1 means miss."""

    t: jnp.ndarray
    tri: jnp.ndarray     # index into the ORIGINAL triangle arrays
    u: jnp.ndarray       # barycentric of corner 1
    v: jnp.ndarray       # barycentric of corner 2


def _tri_test(v0, e1, e2, o, d, t_eps, t_best):
    """Vectorized Moller-Trumbore; returns (hit_mask, t, u, v)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_eps) & (t < t_best)
    )
    return ok, t, u, v


@partial(jax.jit, static_argnames=("t_eps", "vis_mask", "max_iters"))
def intersect(
    bvh: BVH,
    v0: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray | float = 1e30,
    t_eps: float = 1e-4,
    exclude_tri: jnp.ndarray | None = None,
    vis_mask: jnp.ndarray | None = None,
    tri_visibility: jnp.ndarray | None = None,
    max_iters: int | None = None,
) -> Hit:
    """Nearest-hit traversal for a wavefront of rays (R, 3).

    exclude_tri: per-ray triangle index to skip (self-intersection guard,
    the role of sg->fi in the reference, rlSss.h:210-211).
    vis_mask / tri_visibility: Arnold-style ray-visibility gating — a
    triangle is hit only if (tri_visibility & vis_mask) != 0.

    jit-wrapped (not just for speed): an EAGER top-level lax.while_loop is
    dispatched via apply_primitive and its standalone `jit_while` executable
    segfaults jax 0.9's persistent-cache deserialization on CPU; the same
    loop round-trips fine inside a pjit program (reproduced twice on fresh
    caches — see test_refraction_closure_vs_brute's history).
    """
    r = o.shape[0]
    n_nodes = bvh.bbox_min.shape[0]
    # near-zero components: use a LARGE constant (sign-independent) so the
    # slab test degenerates to +-huge; sign(d)*1e12+1e12 is 0 for tiny
    # NEGATIVE d, which silently collapsed the slab interval
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1.0), 1e12)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if exclude_tri is None:
        exclude_tri = jnp.full((r,), -1, jnp.int32)
    # triangles reordered once so leaf ranges are contiguous
    ov0 = v0[bvh.tri_order]
    oe1 = e1[bvh.tri_order]
    oe2 = e2[bvh.tri_order]
    if tri_visibility is not None and vis_mask is not None:
        ovis = tri_visibility[bvh.tri_order]
    else:
        ovis = None

    def cond(state):
        node, t_best, tri, uu, vv = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, t_best, tri, uu, vv = state
        nidx = jnp.minimum(node, n_nodes - 1)
        bmin = bvh.bbox_min[nidx]
        bmax = bvh.bbox_max[nidx]
        first = bvh.first[nidx]
        cnt = bvh.count[nidx]
        miss_link = bvh.miss[nidx]
        active = node < n_nodes

        # slab test
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best) & active

        is_leaf = first >= 0
        do_leaf = box_hit & is_leaf

        # unrolled leaf triangle tests
        for k in range(LEAF_SIZE):
            ti = jnp.minimum(first + k, ov0.shape[0] - 1)
            valid = do_leaf & (k < cnt)
            ok, t, u, v = _tri_test(ov0[ti], oe1[ti], oe2[ti], o, d, t_eps, t_best)
            orig = bvh.tri_order[ti]
            ok = ok & valid & (orig != exclude_tri)
            if ovis is not None:
                ok = ok & ((ovis[ti] & vis_mask) != 0)
            t_best = jnp.where(ok, t, t_best)
            tri = jnp.where(ok, orig, tri)
            uu = jnp.where(ok, u, uu)
            vv = jnp.where(ok, v, vv)

        next_node = jnp.where(box_hit & ~is_leaf, node + 1, miss_link)
        node = jnp.where(active, next_node, node)
        return node, t_best, tri, uu, vv

    init = (
        jnp.zeros((r,), jnp.int32),
        jnp.minimum(t_max, 1e30),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    node, t_best, tri, uu, vv = jax.lax.while_loop(cond, body, init)
    return Hit(t=t_best, tri=tri, u=uu, v=vv)


@partial(jax.jit, static_argnames=("t_eps", "vis_mask"))
def occluded(
    bvh: BVH,
    v0: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    t_eps: float = 1e-4,
    exclude_tri: jnp.ndarray | None = None,
    vis_mask: int | None = None,
    tri_visibility: jnp.ndarray | None = None,
    tri_opaque: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Any-hit (shadow) query: True where the segment [t_eps, t_max] is
    blocked by an opaque, shadow-visible triangle. jit-wrapped for the same
    persistent-cache reason as `intersect`."""
    r = o.shape[0]
    n_nodes = bvh.bbox_min.shape[0]
    # near-zero components: use a LARGE constant (sign-independent) so the
    # slab test degenerates to +-huge; sign(d)*1e12+1e12 is 0 for tiny
    # NEGATIVE d, which silently collapsed the slab interval
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1.0), 1e12)
    if exclude_tri is None:
        exclude_tri = jnp.full((r,), -1, jnp.int32)
    ov0 = v0[bvh.tri_order]
    oe1 = e1[bvh.tri_order]
    oe2 = e2[bvh.tri_order]
    ovis = tri_visibility[bvh.tri_order] if tri_visibility is not None else None
    oopq = tri_opaque[bvh.tri_order] if tri_opaque is not None else None

    def cond(state):
        node, blocked = state
        return jnp.any((node < n_nodes) & ~blocked)

    def body(state):
        node, blocked = state
        nidx = jnp.minimum(node, n_nodes - 1)
        bmin = bvh.bbox_min[nidx]
        bmax = bvh.bbox_max[nidx]
        first = bvh.first[nidx]
        cnt = bvh.count[nidx]
        miss_link = bvh.miss[nidx]
        active = (node < n_nodes) & ~blocked

        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_max) & active

        is_leaf = first >= 0
        do_leaf = box_hit & is_leaf
        for k in range(LEAF_SIZE):
            ti = jnp.minimum(first + k, ov0.shape[0] - 1)
            valid = do_leaf & (k < cnt)
            ok, t, _, _ = _tri_test(ov0[ti], oe1[ti], oe2[ti], o, d, t_eps, t_max)
            ok = ok & valid & (bvh.tri_order[ti] != exclude_tri)
            if ovis is not None:
                ok = ok & ((ovis[ti] & vis_mask) != 0)
            if oopq is not None:
                ok = ok & oopq[ti]
            blocked = blocked | ok

        next_node = jnp.where(box_hit & ~is_leaf, node + 1, miss_link)
        node = jnp.where(active, next_node, node)
        return node, blocked

    init = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool))
    _, blocked = jax.lax.while_loop(cond, body, init)
    return blocked
