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


def build(geometry) -> Accel:
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
    tree = bvhmod.build(v0[:n_real], e1[:n_real], e2[:n_real])
    packed = ip.pack(
        v0[:n_real], e1[:n_real], e2[:n_real],
        vis[:n_real],
        np.asarray(geometry.opaque)[:n_real],
        np.asarray(tree.tri_order),
    )
    return Accel(tree=tree, packed=packed)


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def nearest(accel: Accel, geometry, o, d, vis_mask: int, exclude_tri=None,
            t_eps: float = 1e-4) -> bvhmod.Hit:
    if use_pallas():
        t, tri, u, v = ip.intersect(
            accel.packed, o, d, exclude_tri=exclude_tri, vis_mask=vis_mask,
            t_eps=t_eps,
        )
        return bvhmod.Hit(t=t, tri=tri, u=u, v=v)
    return bvhmod.intersect(
        accel.tree, geometry.v0, geometry.e1, geometry.e2, o, d,
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
