"""Unified tracing interface: threaded-BVH on CPU, Pallas clusters on TPU.

The two backends implement identical query semantics (nearest hit with
ray-visibility gating + self-intersection exclusion; opaque any-hit for
shadows). The choice is made per-process from the JAX backend: the skip-link
BVH wins on CPU (scalar-friendly), the cluster-culled Pallas kernel wins on
TPU (vector-friendly, no gathers).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bvh as bvhmod
from ..ops import intersect_pallas as ip


class Accel(NamedTuple):
    tree: bvhmod.BVH
    packed: ip.PackedScene


def build(geometry, member: np.ndarray | None = None) -> Accel:
    """Build both tracing backends over the geometry (or a SUBSET of it,
    see build_trace_set). Hit.tri always reports ORIGINAL triangle ids."""
    v0 = np.asarray(geometry.v0)
    e1 = np.asarray(geometry.e1)
    e2 = np.asarray(geometry.e2)
    vis = np.asarray(geometry.visibility)
    # strip the geometry tables' inert bucket-padding tail (scene/build.py
    # pads per-tri tables to power-of-two shapes): the builders must not see
    # the padded rows — clustered at the origin they would poison the SAH
    # split quality and the cluster AABB culling. A row is padding iff it is
    # invisible AND edge-degenerate, which also never contributes if a real
    # scene somehow contains one.
    inert = (
        (vis == 0)
        & (np.abs(e1).max(axis=1) == 0.0)
        & (np.abs(e2).max(axis=1) == 0.0)
    )
    rev = inert[::-1]
    trail = int(np.argmax(~rev)) if (~rev).any() else len(rev)
    n_real = max(v0.shape[0] - trail, 1)
    idx = np.arange(n_real)
    if member is not None:
        idx = idx[np.asarray(member, bool)[:n_real]]
        if idx.size == 0:
            idx = np.zeros(1, np.int64)  # degenerate: one inert tri
    tree = bvhmod.build(v0[idx], e1[idx], e2[idx])
    # remap the builder's subset-local order back to original tri ids so
    # Hit.tri / exclude_tri stay in the global id space (pack and the CPU
    # traversal both gather geometry BY the order's ids at query time)
    tree = tree._replace(tri_order=idx[np.asarray(tree.tri_order)])
    packed = ip.pack(
        v0, e1, e2, vis,
        np.asarray(geometry.opaque),
        np.asarray(tree.tri_order),
    )
    return Accel(tree=tree, packed=packed)


def build_trace_set(geometry, set_bit: int, inclusive: bool) -> Accel:
    """Accel restricted to a trace set (Arnold AiShaderGlobalsSet/Unset
    TraceSet — the service the reference's probe confinement consumes,
    rlSss.h:213-218): `inclusive` keeps only members of the set, else
    skips them. Set membership lives in visibility bits 8.. (scene/build.py
    folds `trace_sets` names per mesh; `set_bit` is the set's index in
    scene.trace_set_names). Queries on the returned Accel behave exactly
    like the full-scene ones (original triangle ids, same vis gating) —
    trace-set filtering costs nothing in the hot kernels."""
    mem = (np.asarray(geometry.visibility) & (1 << (8 + set_bit))) != 0
    return build(geometry, member=mem if inclusive else ~mem)


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def nearest(accel: Accel, geometry, o, d, vis_mask: int, exclude_tri=None,
            t_eps: float = 1e-4, t_max=None) -> bvhmod.Hit:
    """t_max (optional, per-ray): hits beyond it are ignored; lanes with
    t_max <= 0 are DEAD and compact into skipped blocks on the Pallas path
    (Russian-roulette kills, ops/intersect_pallas._sort_rays)."""
    if use_pallas():
        t, tri, u, v = ip.intersect(
            accel.packed, o, d, t_max=t_max, exclude_tri=exclude_tri,
            vis_mask=vis_mask, t_eps=t_eps,
        )
        return bvhmod.Hit(t=t, tri=tri, u=u, v=v)
    return bvhmod.intersect(
        accel.tree, geometry.v0, geometry.e1, geometry.e2, o, d,
        t_max=(1e30 if t_max is None else t_max),
        exclude_tri=exclude_tri, vis_mask=vis_mask,
        tri_visibility=geometry.visibility, t_eps=t_eps,
    )


def occluded(accel: Accel, geometry, o, d, t_max, vis_mask: int,
             exclude_tri=None, t_eps: float = 1e-4) -> jnp.ndarray:
    if use_pallas():
        return ip.occluded(
            accel.packed, o, d, t_max, exclude_tri=exclude_tri,
            vis_mask=vis_mask, t_eps=t_eps,
        )
    return bvhmod.occluded(
        accel.tree, geometry.v0, geometry.e1, geometry.e2, o, d, t_max,
        exclude_tri=exclude_tri, vis_mask=vis_mask,
        tri_visibility=geometry.visibility, tri_opaque=geometry.opaque,
        t_eps=t_eps,
    )
