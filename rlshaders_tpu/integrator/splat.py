"""On-device gaussian pixel-filter splatting.

The Arnold gaussian_filter (testsuite/data/test_geo.ass:404-419) weights each
AA sample into its 3x3 pixel neighborhood with w = exp(-alpha*d^2) - floor,
truncated at the filter radius. This is the framebuffer-reduction stage
(SURVEY.md section 2.2): it runs jitted on device via scatter-adds so the
frame never round-trips to host NumPy, and it is the per-shard accumulation
the sharded renderer psums over the device mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Gaussian falloff exponent. Calibrated against the Arnold goldens: the
# masked RMSE of case 0004 improves monotonically 2.0 -> 1.0 and saturates
# there (sweep log in docs/perf.md's fidelity notes) — Arnold's
# gaussian_filter is softer than exp(-2 d^2).
ALPHA = 1.0


def filter_alpha() -> float:
    """Gaussian falloff exponent for the pixel filter; RLS_FILTER_ALPHA
    overrides for empirical matching against the reference's filter."""
    import os

    return float(os.environ.get("RLS_FILTER_ALPHA", str(ALPHA)))


@partial(jax.jit, static_argnames=("xres", "yres", "filter_width",
                                   "tile_rays", "alpha"))
def splat_accum(vals, pixel_full, sub_xy_full, start1, image, wsum,
                xres: int, yres: int, filter_width: float, tile_rays: int,
                alpha: float = ALPHA):
    """Slice this tile's pixel/sub_xy out of the frame arrays, splat, and
    accumulate into the running framebuffer — one dispatch per tile.

    `start1` is the tile offset as a (1,) int32 array — rank-0 jit params
    land in host memory S(6) and cost a per-use DMA on the axon backend
    (docs/perf.md)."""
    start = start1[0]
    pixel = jax.lax.dynamic_slice(pixel_full, (start,), (tile_rays,))
    sub_xy = jax.lax.dynamic_slice(sub_xy_full, (start, 0), (tile_rays, 2))
    img_t, ws_t = _splat(vals, pixel, sub_xy, xres, yres, filter_width, alpha)
    return image + img_t, wsum + ws_t


@partial(jax.jit, static_argnames=("xres", "yres", "filter_width", "alpha"))
def splat(vals, pixel, sub_xy, xres: int, yres: int, filter_width: float,
          alpha: float = ALPHA):
    return _splat(vals, pixel, sub_xy, xres, yres, filter_width, alpha)


def _splat(vals, pixel, sub_xy, xres: int, yres: int, filter_width: float,
           alpha: float = ALPHA):
    """Splat per-sample values into the framebuffer.

    vals: (N, C) sample payload (RGB + stacked AOV channels).
    pixel: (N,) flat pixel index (y*xres + x); -1 marks padding samples.
    sub_xy: (N, 2) subpixel position in [0,1)^2.

    Returns (image (n_pix, C) weighted sums, wsum (n_pix,)); divide by wsum
    to normalize. Out-of-frame neighbor taps and padding samples are dropped
    via out-of-range scatter indices (mode="drop").
    """
    n_pix = xres * yres
    radius = filter_width * 0.5
    gauss_floor = jnp.exp(-alpha * radius * radius)

    live = pixel >= 0
    px = jnp.maximum(pixel, 0) % xres
    py = jnp.maximum(pixel, 0) // xres
    sx = px.astype(jnp.float32) + sub_xy[:, 0]
    sy = py.astype(jnp.float32) + sub_xy[:, 1]

    image = jnp.zeros((n_pix, vals.shape[1]), vals.dtype)
    wsum = jnp.zeros((n_pix,), vals.dtype)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            nx = px + ox
            ny = py + oy
            valid = live & (nx >= 0) & (nx < xres) & (ny >= 0) & (ny < yres)
            dx = sx - (nx.astype(jnp.float32) + 0.5)
            dy = sy - (ny.astype(jnp.float32) + 0.5)
            d2 = dx * dx + dy * dy
            w = jnp.exp(-alpha * d2) - gauss_floor
            w = jnp.where((d2 <= radius * radius) & valid, w, 0.0)
            tgt = jnp.where(valid, ny * xres + nx, n_pix)  # n_pix -> dropped
            image = image.at[tgt].add(vals * w[:, None], mode="drop")
            wsum = wsum.at[tgt].add(w, mode="drop")
    return image, wsum


def pack_aovs(rgb, aovs: dict):
    """Stack RGB + AOVs (sorted by name) into one (N, C) payload; returns
    (vals, names) where names orders the AOV slices after the leading RGB."""
    names = sorted(aovs.keys())
    vals = jnp.concatenate([rgb] + [aovs[k] for k in names], axis=1)
    return vals, names


def unpack_aovs(image, names):
    """Split a packed (n_pix, C) framebuffer back into RGB + AOV planes."""
    out = {"RGBA": image[:, 0:3]}
    for i, name in enumerate(names):
        out[name] = image[:, 3 * (i + 1) : 3 * (i + 2)]
    return out
