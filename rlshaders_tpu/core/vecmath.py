"""Batched 3-vector / color math for SoA shading buffers.

TPU-native counterpart of the reference's math utilities (the `Ai*` vector
helpers consumed via rlUtil.h plus `rls::sphericalDirection`,
`rls::reflectDirection`, `rls::colorToLuminance`, `rls::concentricDiskSample`
at reference src/rlUtil.h:21-41, src/rlUtil.cpp:3-27).

All functions operate on arrays whose last axis is the xyz (or rgb) component
axis, broadcast over arbitrary leading batch dims. Everything is pure and
jit/vmap/shard_map friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7  # matches AI_EPSILON-scale guards in the reference
BIG = 1e30


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing component axis (keeps no dims)."""
    return jnp.sum(a * b, axis=-1)


def vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product keeping the trailing axis (for broadcasting)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def length2(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: returns v/|v|, or 0 for (near-)zero vectors."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jnp.where(n2 > eps, 1.0 / jnp.sqrt(jnp.maximum(n2, eps)), 0.0)


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(a - b)


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror direction about n, insensitive to n's sign.

    Matches the reference convention `2*|i.n|*n - i` (rlUtil.h:31-34): `i`
    points away from the surface (toward the viewer), the result points away
    too.
    """
    return 2.0 * jnp.abs(vdot(i, n)) * n - i


def spherical_direction(cos_theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Unit vector from (cos(theta), phi) with +z as the pole.

    Counterpart of rls::sphericalDirection (rlUtil.h:21-29).
    """
    cos_theta = jnp.asarray(cos_theta)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance, same weights as the reference (rlUtil.h:36-39)."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def concentric_disk_sample(rx: jnp.ndarray, ry: jnp.ndarray) -> jnp.ndarray:
    """Shirley–Chiu concentric square→disk map, degenerate-origin safe.

    Behavioural counterpart of rls::concentricDiskSample (rlUtil.cpp:3-27).
    Returns (..., 2) points on the unit disk.
    """
    ox = rx * 2.0 - 1.0
    oy = ry * 2.0 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    # Guard divisions; the degenerate (0,0) case is masked out at the end.
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    phi = jnp.where(
        use_x,
        (jnp.pi / 4.0) * (oy / safe_ox),
        (jnp.pi / 2.0) * (1.0 - 0.5 * ox / safe_oy),
    )
    degenerate = (ox == 0.0) & (oy == 0.0)
    x = jnp.where(degenerate, 0.0, r * jnp.cos(phi))
    y = jnp.where(degenerate, 0.0, r * jnp.sin(phi))
    return jnp.stack([x, y], axis=-1)


def cosine_sample_hemisphere(rx: jnp.ndarray, ry: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted local hemisphere direction via the concentric disk map.

    Mirrors DisneySampler::sampleDiffuseDirection (rlDisney.cpp:359-365) in a
    local +z frame; callers rotate into the world frame.
    """
    d = concentric_disk_sample(rx, ry)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def lerp(t, a, b):
    """a + t*(b-a); matches the reference's LERP(t, a, b) argument order."""
    return a + t * (b - a)


def linearstep(lo, hi, x):
    """Linear remap of x from [lo, hi] to [0, 1], clamped (macro LINEARSTEP)."""
    return jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)


def srgb_gamma_decode(x: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Power-law gamma decode used by Arnold's texture/light/shader_gamma."""
    return jnp.power(jnp.maximum(x, 0.0), gamma)
