"""Texture loading and filtered sampling (mipmapped smart-bicubic).

Host-side decode (PIL) of the JPEG textures the testsuite uses
(grey_grid.jpg, SA_logo.jpg — reference testsuite/data/), with Arnold's
`texture_gamma` decode applied at load time (test_geo.ass:22).

On-device lookup is the TPU equivalent of Arnold's `smart_bicubic` MayaFile
filter (test_geo.ass:566): a full mip pyramid built at load (2x box
reduction), per-sample LOD from the ray footprint, Mitchell bicubic taps on
the finer mip level blended trilinearly with a bilinear tap on the coarser
one. Level 0 keeps each texture's NATIVE resolution (resampling would shift
texels against the goldens). All levels of all textures live in one flat
(TOTAL, 3) array indexed through per-(texture, level) offset/size tables,
so lookups are plain XLA gathers with no per-texture control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import vec3
from ..core.vec3 import V3

MAX_LEVELS = 12


def load_image(path: str, gamma: float = 2.2) -> np.ndarray:
    """Decode an image file to linear (H, W, 3) float32."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    if gamma != 1.0:
        arr = np.power(arr, gamma)
    return arr


def _downsample2(im: np.ndarray) -> np.ndarray:
    """2x box reduction with odd-size handling (duplicate last row/col)."""
    h, w = im.shape[:2]
    if h % 2:
        im = np.concatenate([im, im[-1:]], axis=0)
        h += 1
    if w % 2:
        im = np.concatenate([im, im[:, -1:]], axis=1)
        w += 1
    return 0.25 * (
        im[0::2, 0::2] + im[1::2, 0::2] + im[0::2, 1::2] + im[1::2, 1::2]
    )


class TextureStack(NamedTuple):
    """All mip levels of all textures packed into one flat texel array.

    A tap is ONE (M, 3) row gather followed by channel slices (the slices
    fuse into the gather): measured faster than three rank-1 channel-plane
    gathers on v5e (gather op count dominates over the output padding)."""

    data: jnp.ndarray     # (TOTAL, 3) float32 texels, row-major per level
    offset: jnp.ndarray   # (N, L) int32 start of (tex, level) in data
    sizes: jnp.ndarray    # (N, L, 2) int32 (h, w) per level (clamped pyramid)
    n_levels: jnp.ndarray  # (N,) int32 number of real levels per texture

    @staticmethod
    def build(images: list[np.ndarray]) -> "TextureStack":
        if not images:
            return TextureStack(
                data=jnp.zeros((1, 3), jnp.float32),
                offset=jnp.zeros((1, MAX_LEVELS), jnp.int32),
                sizes=jnp.ones((1, MAX_LEVELS, 2), jnp.int32),
                n_levels=jnp.ones((1,), jnp.int32),
            )
        flat: list[np.ndarray] = []
        offs = np.zeros((len(images), MAX_LEVELS), np.int64)
        sizes = np.ones((len(images), MAX_LEVELS, 2), np.int64)
        n_levels = np.zeros((len(images),), np.int64)
        cursor = 0
        for i, im in enumerate(images):
            lv = im.astype(np.float32)
            lvl = 0
            while True:
                h, w = lv.shape[:2]
                offs[i, lvl] = cursor
                sizes[i, lvl] = (h, w)
                flat.append(lv.reshape(-1, 3))
                cursor += h * w
                lvl += 1
                if (h == 1 and w == 1) or lvl >= MAX_LEVELS:
                    break
                lv = _downsample2(lv)
            n_levels[i] = lvl
            # clamp the tail of the tables to the last real level so an
            # over-large LOD indexes valid data
            for l2 in range(lvl, MAX_LEVELS):
                offs[i, l2] = offs[i, lvl - 1]
                sizes[i, l2] = sizes[i, lvl - 1]
        return TextureStack(
            data=jnp.asarray(np.concatenate(flat, axis=0)),
            offset=jnp.asarray(offs, jnp.int32),
            sizes=jnp.asarray(sizes, jnp.int32),
            n_levels=jnp.asarray(n_levels, jnp.int32),
        )


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


def _fetch(stack: TextureStack, tid, lvl, y, x) -> V3:
    """Gather texels at integer (y, x) on `lvl` with wrap addressing: one
    (M, 3) row gather, then channel slices (which fuse into the gather)."""
    h = stack.sizes[tid, lvl, 0]
    w = stack.sizes[tid, lvl, 1]
    yy = jnp.mod(y, h)
    xx = jnp.mod(x, w)
    rows = stack.data[stack.offset[tid, lvl] + yy * w + xx]
    return V3(rows[..., 0], rows[..., 1], rows[..., 2])


_TEX_SHIFT = float(__import__("os").environ.get("RLS_TEX_SHIFT", "0.5"))


def _level_uv(stack: TextureStack, tid, lvl, uv):
    """Continuous texel coords on a level; returns (x0f, y0f, fx, fy).
    Texel centers sit at (i + RLS_TEX_SHIFT)/size (0.5 = OIIO/Arnold)."""
    h = stack.sizes[tid, lvl, 0].astype(jnp.float32)
    w = stack.sizes[tid, lvl, 1].astype(jnp.float32)
    u = jnp.mod(uv[..., 0], 1.0) * w - _TEX_SHIFT
    v = (1.0 - jnp.mod(uv[..., 1], 1.0)) * h - _TEX_SHIFT
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    return x0f, y0f, u - x0f, v - y0f


def _bicubic_level(stack: TextureStack, tid, lvl, uv) -> V3:
    """Mitchell bicubic on one mip level (16 taps), channel-split."""
    x0f, y0f, fx, fy = _level_uv(stack, tid, lvl, uv)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wxs = _cubic_weights(fx)
    wys = _cubic_weights(fy)
    out = V3(0.0, 0.0, 0.0)
    for dy in range(4):
        row = V3(0.0, 0.0, 0.0)
        for dx in range(4):
            row = row + _fetch(
                stack, tid, lvl, y0 + (dy - 1), x0 + (dx - 1)
            ) * wxs[dx]
        out = out + row * wys[dy]
    return out


def _bilinear_level(stack: TextureStack, tid, lvl, uv) -> V3:
    """Bilinear on one mip level (4 taps), channel-split."""
    x0f, y0f, fx, fy = _level_uv(stack, tid, lvl, uv)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    c00 = _fetch(stack, tid, lvl, y0, x0)
    c01 = _fetch(stack, tid, lvl, y0, x0 + 1)
    c10 = _fetch(stack, tid, lvl, y0 + 1, x0)
    c11 = _fetch(stack, tid, lvl, y0 + 1, x0 + 1)
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def compute_lod(stack: TextureStack, tex_id: jnp.ndarray,
                fp_uv: jnp.ndarray, bias: float = 0.0) -> jnp.ndarray:
    """Continuous mip level from a UV-space footprint (texels covered =
    fp_uv * native size; lod = log2 of that). `bias` (levels) is the
    texture-minification calibration knob against Arnold's smart_bicubic
    footprint (RLS_LOD_BIAS, threaded through RenderConf so sweeps
    retrace)."""
    tid = jnp.maximum(tex_id, 0)
    w = stack.sizes[tid, 0, 1].astype(jnp.float32)
    h = stack.sizes[tid, 0, 0].astype(jnp.float32)
    texels = fp_uv * jnp.maximum(h, w)
    lod = jnp.log2(jnp.maximum(texels, 1e-12)) + bias
    top = (stack.n_levels[tid] - 1).astype(jnp.float32)
    return jnp.clip(lod, 0.0, top)


def sample_smart_bicubic(stack: TextureStack, tex_id: jnp.ndarray,
                         uv: jnp.ndarray,
                         lod: jnp.ndarray | None = None) -> V3:
    """Arnold smart_bicubic analogue: Mitchell bicubic on the finer mip
    level, trilinear blend to a bilinear tap on the coarser one. `lod` is a
    continuous level (None = level 0, pure bicubic magnification).

    tex_id: (...) int32 (negative = no texture, returns 1s); uv wraps,
    v up (image row 0 = v=1)."""
    tid = jnp.maximum(tex_id, 0)
    if lod is None:
        out = _bicubic_level(stack, tid, 0, uv)
        return vec3.where(tex_id >= 0, out, 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, MAX_LEVELS - 1)
    frac = lod - l0.astype(jnp.float32)
    fine = _bicubic_level(stack, tid, l0, uv)
    coarse = _bilinear_level(stack, tid, l1, uv)
    out = fine * (1.0 - frac) + coarse * frac
    return vec3.where(tex_id >= 0, out, 1.0)


def sample_bicubic(stack: TextureStack, tex_id: jnp.ndarray,
                   uv: jnp.ndarray) -> V3:
    """Level-0 Mitchell bicubic lookup (magnification path)."""
    return sample_smart_bicubic(stack, tex_id, uv, None)


def sample_bilinear(stack: TextureStack, tex_id: jnp.ndarray,
                    uv: jnp.ndarray,
                    lod: jnp.ndarray | None = None) -> V3:
    """Bilinear lookup with wrap addressing (optionally trilinear-mip)."""
    tid = jnp.maximum(tex_id, 0)
    if lod is None:
        out = _bilinear_level(stack, tid, 0, uv)
        return vec3.where(tex_id >= 0, out, 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, MAX_LEVELS - 1)
    frac = lod - l0.astype(jnp.float32)
    fine = _bilinear_level(stack, tid, l0, uv)
    coarse = _bilinear_level(stack, tid, l1, uv)
    out = fine * (1.0 - frac) + coarse * frac
    return vec3.where(tex_id >= 0, out, 1.0)
