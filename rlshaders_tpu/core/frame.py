"""Orthonormal shading frames (batched).

Counterpart of the reference's `rls::CoordBasis` + `AiBuildLocalFramePolar`
usage (rlUtil.h:16-19, rlGgx.h:146, rlDisney.cpp:174). A frame is the tuple
(U, V, N); BSDF code mostly works in the local frame where N = +z, U = +x.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import vec3
from .vecmath import cross, dot, normalize


class Frame(NamedTuple):
    """Batched orthonormal basis; each field is (..., 3)."""

    u: jnp.ndarray
    v: jnp.ndarray
    n: jnp.ndarray


def build_frame_polar_v(n: "vec3.V3") -> Frame:
    """Channel-split build_frame_polar: Frame whose u/v/n are vec3.V3
    triples of (...,) channels (TPU-hot form; see core/vec3.py)."""
    x, y, z = n.x, n.y, n.z
    sin_theta = jnp.sqrt(jnp.maximum(x * x + y * y, 0.0))
    degenerate = sin_theta < 1e-6
    inv = jnp.where(degenerate, 0.0, 1.0 / jnp.maximum(sin_theta, 1e-12))
    cos_phi = jnp.where(degenerate, 1.0, x * inv)
    sin_phi = jnp.where(degenerate, 0.0, y * inv)
    u = vec3.normalize(vec3.V3(-sin_phi, cos_phi, jnp.zeros_like(z)))
    v = vec3.normalize(vec3.cross(n, u))
    return Frame(u=u, v=v, n=n)


def to_local_v(frame: Frame, w: "vec3.V3") -> "vec3.V3":
    """World -> local for V3 frames (x=U, y=V, z=N)."""
    return vec3.V3(
        vec3.dot(w, frame.u), vec3.dot(w, frame.v), vec3.dot(w, frame.n)
    )


def to_world_v(frame: Frame, w: "vec3.V3") -> "vec3.V3":
    """Local -> world for V3 frames."""
    return frame.u * w.x + frame.v * w.y + frame.n * w.z


def build_frame_polar(n: jnp.ndarray) -> Frame:
    """Deterministic ONB from a normal, polar-coordinate style.

    Matches AiBuildLocalFramePolar's tangent orientation: U points along the
    AZIMUTHAL direction (d n / d phi, z-up), V = N x U along the polar
    direction. Calibrated against golden 0008 (rlDisney anisotropic 1): the
    alpha_x axis (roughness/aspect, the WIDE lobe direction) must lie along
    the azimuth to reproduce the reference's horizontal highlight band; the
    U=theta choice renders it rotated 90 degrees. Stable fallback at the
    +-z poles.
    """
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    sin_theta = jnp.sqrt(jnp.maximum(x * x + y * y, 0.0))
    degenerate = sin_theta < 1e-6
    inv = jnp.where(degenerate, 0.0, 1.0 / jnp.maximum(sin_theta, 1e-12))
    cos_phi = jnp.where(degenerate, 1.0, x * inv)
    sin_phi = jnp.where(degenerate, 0.0, y * inv)
    # U = d n / d phi (normalized) = (-sin_phi, cos_phi, 0)
    u = jnp.stack([-sin_phi, cos_phi, jnp.zeros_like(z)], axis=-1)
    # V = N x U completes the right-handed frame (U x V = N)
    v = cross(n, u)
    return Frame(u=normalize(u), v=normalize(v), n=n)


def build_frame_from_tangent(n: jnp.ndarray, dpdu: jnp.ndarray) -> Frame:
    """Frame aligned with a surface tangent, as the SSS sampler builds it
    (rlSss.h:151-158): V = normalize(N x U0), U = V x N."""
    u0 = normalize(dpdu)
    v = normalize(cross(n, u0))
    u = cross(v, n)
    return Frame(u=u, v=v, n=n)


def to_local(frame: Frame, w: jnp.ndarray) -> jnp.ndarray:
    """World direction -> local frame coordinates (x=U, y=V, z=N)."""
    return jnp.stack([dot(w, frame.u), dot(w, frame.v), dot(w, frame.n)], axis=-1)


def to_world(frame: Frame, w: jnp.ndarray) -> jnp.ndarray:
    """Local (x, y, z) -> world: x*U + y*V + z*N (AiV3RotateToFrame)."""
    return (
        w[..., 0:1] * frame.u + w[..., 1:2] * frame.v + w[..., 2:3] * frame.n
    )
