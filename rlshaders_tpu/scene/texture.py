"""Texture loading and bilinear sampling.

Host-side decode (PIL) of the JPEG textures the testsuite uses
(grey_grid.jpg, SA_logo.jpg — reference testsuite/data/), with Arnold's
`texture_gamma` decode applied at load time (test_geo.ass:22). On-device
lookup is a batched bilinear gather over a padded texture stack.
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
    """All scene textures resampled onto one (N, S, S, 3) stack."""

    data: jnp.ndarray  # (N, S, S, 3) float32
    size: int

    @staticmethod
    def build(images: list[np.ndarray], size: int = 512) -> "TextureStack":
        if not images:
            return TextureStack(data=jnp.zeros((1, 1, 1, 3), jnp.float32), size=1)
        from PIL import Image

        stack = []
        for im in images:
            if im.shape[0] != size or im.shape[1] != size:
                pil = Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8))
                pil = pil.resize((size, size), Image.BILINEAR)
                im = (np.asarray(pil, np.float32) / 255.0) ** 1.0
            stack.append(im.astype(np.float32))
        return TextureStack(data=jnp.asarray(np.stack(stack)), size=size)


def sample_bilinear(stack: TextureStack, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear lookup with wrap addressing.

    tex_id: (...) int32 (negative = no texture, returns 1s)
    uv: (..., 2) in [0, 1] with wrap; v goes up (image row 0 = v=1).
    """
    s = stack.data.shape[1]
    u = jnp.mod(uv[..., 0], 1.0) * (s - 1)
    v = (1.0 - jnp.mod(uv[..., 1], 1.0)) * (s - 1)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, s - 1)
    y1 = jnp.minimum(y0 + 1, s - 1)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    tid = jnp.maximum(tex_id, 0)
    c00 = stack.data[tid, y0, x0]
    c01 = stack.data[tid, y0, x1]
    c10 = stack.data[tid, y1, x0]
    c11 = stack.data[tid, y1, x1]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy
    return jnp.where((tex_id >= 0)[..., None], out, 1.0)
