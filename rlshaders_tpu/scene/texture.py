"""Texture loading and bilinear sampling.

Host-side decode (PIL) of the JPEG textures the testsuite uses
(grey_grid.jpg, SA_logo.jpg — reference testsuite/data/), with Arnold's
`texture_gamma` decode applied at load time (test_geo.ass:22). On-device
lookup is a batched bilinear gather over a zero-padded texture stack;
each texture keeps its NATIVE resolution (resampling would shift texels
against the goldens).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def load_image(path: str, gamma: float = 2.2) -> np.ndarray:
    """Decode an image file to linear (H, W, 3) float32."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    if gamma != 1.0:
        arr = np.power(arr, gamma)
    return arr


class TextureStack(NamedTuple):
    """All scene textures zero-padded onto one (N, H, W, 3) stack with their
    native sizes kept in (N, 2)."""

    data: jnp.ndarray   # (N, maxH, maxW, 3) float32
    sizes: jnp.ndarray  # (N, 2) int32 native (h, w)

    @staticmethod
    def build(images: list[np.ndarray]) -> "TextureStack":
        if not images:
            return TextureStack(
                data=jnp.zeros((1, 1, 1, 3), jnp.float32),
                sizes=jnp.ones((1, 2), jnp.int32),
            )
        max_h = max(im.shape[0] for im in images)
        max_w = max(im.shape[1] for im in images)
        stack = np.zeros((len(images), max_h, max_w, 3), np.float32)
        sizes = np.zeros((len(images), 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            stack[i, :h, :w] = im
            sizes[i] = (h, w)
        return TextureStack(data=jnp.asarray(stack), sizes=jnp.asarray(sizes))


def _cubic_weights(t):
    """Mitchell-Netravali (B=C=1/3) cubic kernel weights for the 4 taps
    around a sample at fractional position t in [0,1)."""
    b = c = 1.0 / 3.0
    def k(x):
        ax = jnp.abs(x)
        ax2 = ax * ax
        ax3 = ax2 * ax
        w1 = ((12 - 9 * b - 6 * c) * ax3 + (-18 + 12 * b + 6 * c) * ax2
              + (6 - 2 * b)) / 6.0
        w2 = ((-b - 6 * c) * ax3 + (6 * b + 30 * c) * ax2
              + (-12 * b - 48 * c) * ax + (8 * b + 24 * c)) / 6.0
        return jnp.where(ax < 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))
    return [k(t + 1.0), k(t), k(t - 1.0), k(t - 2.0)]


def sample_bicubic(stack: TextureStack, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Batched Mitchell bicubic lookup (Arnold's smart_bicubic analogue)."""
    tid = jnp.maximum(tex_id, 0)
    h = stack.sizes[tid, 0].astype(jnp.float32)
    w = stack.sizes[tid, 1].astype(jnp.float32)
    u = jnp.mod(uv[..., 0], 1.0) * w - 0.5
    v = (1.0 - jnp.mod(uv[..., 1], 1.0)) * h - 0.5
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = u - x0f
    fy = v - y0f
    hi = stack.sizes[tid, 0]
    wi = stack.sizes[tid, 1]
    wxs = _cubic_weights(fx)
    wys = _cubic_weights(fy)
    out = 0.0
    for dy in range(4):
        yy = jnp.mod(y0f.astype(jnp.int32) + (dy - 1), hi)
        row = 0.0
        for dx in range(4):
            xx = jnp.mod(x0f.astype(jnp.int32) + (dx - 1), wi)
            row = row + wxs[dx][..., None] * stack.data[tid, yy, xx]
        out = out + wys[dy][..., None] * row
    return jnp.where((tex_id >= 0)[..., None], out, 1.0)


def sample_bilinear(stack: TextureStack, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear lookup with wrap addressing at native resolution.

    tex_id: (...) int32 (negative = no texture, returns 1s)
    uv: (..., 2) with wrap; v goes up (image row 0 = v=1).
    """
    tid = jnp.maximum(tex_id, 0)
    h = stack.sizes[tid, 0].astype(jnp.float32)
    w = stack.sizes[tid, 1].astype(jnp.float32)
    u = jnp.mod(uv[..., 0], 1.0) * w - 0.5
    v = (1.0 - jnp.mod(uv[..., 1], 1.0)) * h - 0.5
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    fx = (u - x0f)[..., None]
    fy = (v - y0f)[..., None]
    hi = stack.sizes[tid, 0]
    wi = stack.sizes[tid, 1]
    x0 = jnp.mod(x0f.astype(jnp.int32), wi)
    y0 = jnp.mod(y0f.astype(jnp.int32), hi)
    x1 = jnp.mod(x0 + 1, wi)
    y1 = jnp.mod(y0 + 1, hi)
    c00 = stack.data[tid, y0, x0]
    c01 = stack.data[tid, y0, x1]
    c10 = stack.data[tid, y1, x0]
    c11 = stack.data[tid, y1, x1]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy
    return jnp.where((tex_id >= 0)[..., None], out, 1.0)
