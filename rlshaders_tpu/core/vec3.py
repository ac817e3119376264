"""Channel-split (structure-of-arrays) 3-vectors for TPU-shaped math.

Why this exists: on TPU, every fp32 value is tiled (8, 128) over its two
minormost dims. An `(M, 3)` direction/color array therefore pads its minor
dim 3 -> 128 (43x), and EVERY elementwise op at that shape runs 43x more VPU
tiles than needed. Measured on the fused render program this costs two
ORDERS OF MAGNITUDE (a representative GGX chain: 3.2 s AoS vs 16 ms
channel-split at M=663k; see tools/memprobe.py). The fix is the classic
structure-of-arrays transform: a vector is three independent `(M,)` arrays,
so all math stays rank-1 and pad-free.

`V3` is a NamedTuple (hence a pytree) with arithmetic operators, so BSDF
code reads the same as the AoS form: `normalize(wo + wi)`, `0.25 * f * gd`,
`wi.z` instead of `wi[..., 2]`. Scalars in expressions are plain `(M,)`
arrays (or python floats); `V3 * scalar`, `scalar * V3`, `V3 / scalar` all
broadcast per channel.

Boundary helpers `v3` / `V3.aos` convert from/to `(..., 3)` arrays at the
edges of the SoA region (Pallas ray packing, framebuffer splat, host I/O).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic (componentwise; scalars broadcast) --
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- conversions --
    def aos(self) -> jnp.ndarray:
        """(..., 3) array view of this vector (materializes AoS layout)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @property
    def shape(self):
        return jnp.shape(self.x)

    def astype(self, dt):
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))


def v3(a) -> V3:
    """(..., 3) array -> V3 of (...,) channels."""
    a = jnp.asarray(a)
    return V3(a[..., 0], a[..., 1], a[..., 2])


def vfull(val, like=None) -> V3:
    """Uniform vector; `like` gives the batch shape from an existing array."""
    if like is None:
        c = jnp.float32(val)
    else:
        c = jnp.full(jnp.shape(like), val, jnp.float32)
    return V3(c, c, c)


def splat(s) -> V3:
    """Scalar array -> grey vector (s, s, s)."""
    return V3(s, s, s)


def dot(a: V3, b: V3) -> jnp.ndarray:
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length(a: V3) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: V3, eps: float = 1e-20) -> V3:
    inv = lax.rsqrt(jnp.maximum(dot(a, a), eps))
    return V3(a.x * inv, a.y * inv, a.z * inv)


def reflect(w: V3, n: V3) -> V3:
    """Mirror w about n: 2(w.n)n - w (matches vecmath.reflect)."""
    k = 2.0 * dot(w, n)
    return V3(k * n.x - w.x, k * n.y - w.y, k * n.z - w.z)


def where(mask, a, b) -> V3:
    """Componentwise select; a/b may be V3 or scalar-like."""
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(
        jnp.where(mask, ax, bx),
        jnp.where(mask, ay, by),
        jnp.where(mask, az, bz),
    )


def lerp(a, b, t) -> V3:
    """a + (b - a) * t with V3 or scalar endpoints."""
    if not isinstance(a, V3):
        a = splat(jnp.asarray(a, jnp.float32))
    if not isinstance(b, V3):
        b = splat(jnp.asarray(b, jnp.float32))
    return a + (b - a) * t


def maxc(a: V3) -> jnp.ndarray:
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def vmax(a: V3, b) -> V3:
    """Componentwise maximum (b may be V3 or scalar-like)."""
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.maximum(a.x, bx), jnp.maximum(a.y, by), jnp.maximum(a.z, bz))


def vmin(a: V3, b) -> V3:
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.minimum(a.x, bx), jnp.minimum(a.y, by), jnp.minimum(a.z, bz))


def luminance(a: V3) -> jnp.ndarray:
    """Rec.709 luma (colorToLuminance, rlUtil.h:36-39)."""
    return 0.2126 * a.x + 0.7152 * a.y + 0.0722 * a.z


def clip(a: V3, lo, hi) -> V3:
    return V3(jnp.clip(a.x, lo, hi), jnp.clip(a.y, lo, hi), jnp.clip(a.z, lo, hi))


def tile(a: V3, k: int) -> V3:
    """Repeat the batch k times (column-major chunks: [a; a; ...])."""
    return V3(jnp.tile(a.x, k), jnp.tile(a.y, k), jnp.tile(a.z, k))


def ksum(a: V3, k: int) -> V3:
    """Sum k column-major chunks back down to the base batch: the reduce for
    flat (k*N,) grids laid out as [col0 | col1 | ...]."""
    n = a.x.shape[0] // k
    return V3(
        a.x.reshape(k, n).sum(0),
        a.y.reshape(k, n).sum(0),
        a.z.reshape(k, n).sum(0),
    )


def kmean(a: V3, k: int) -> V3:
    s = ksum(a, k)
    inv = 1.0 / k
    return V3(s.x * inv, s.y * inv, s.z * inv)
