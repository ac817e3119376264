"""Sampling-pattern diagnostics: the reference's SampleWriter, batched.

The reference's only unit-level sampler validation was a manual EXR dump of
(a) BRDF radiance over a (theta, phi) hemisphere grid and (b) a green/red
scatter of importance-sampled directions, red marking below-horizon samples,
with the miss count logged (src/rlUtil.h:44-171, harness at
rlGgx.cpp:202-224). This module mechanizes both as batched JAX ops and also
feeds the automated chi^2 tests in tests/test_ggx.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..io import exr


def radiance_map(eval_fn, wo, width: int = 512, height: int = 256) -> np.ndarray:
    """Evaluate f(wo, wi)*cos over the upper hemisphere: rows = theta in
    [0, pi/2), cols = phi in [0, 2pi). eval_fn(wo, wi) -> (..., 3)."""
    theta = (jnp.arange(height) + 0.5) / height * (jnp.pi / 2)
    phi = (jnp.arange(width) + 0.5) / width * (2 * jnp.pi)
    t, p = jnp.meshgrid(theta, phi, indexing="ij")
    wi = jnp.stack(
        [jnp.sin(t) * jnp.cos(p), jnp.sin(t) * jnp.sin(p), jnp.cos(t)], axis=-1
    ).reshape(-1, 3)
    f = eval_fn(jnp.broadcast_to(wo, wi.shape), wi)
    return np.asarray(f).reshape(height, width, 3)


def sample_scatter(
    sample_fn, wo, count: int = 2500, width: int = 512, height: int = 256,
    seed: int = 0,
):
    """Importance-sample `count` directions and scatter them on the
    (theta, phi) grid: green = above horizon, red = below (the reference's
    'missing' samples). Returns (image, miss_count)."""
    u = jax.random.uniform(rng.stream(seed), (count, 2))
    wi = sample_fn(jnp.broadcast_to(wo, (count, 3)), u[:, 0], u[:, 1])
    wi = np.asarray(wi)
    ok = np.linalg.norm(wi, axis=-1) > 0.5
    theta = np.arccos(np.clip(wi[:, 2], -1, 1))
    phi = np.mod(np.arctan2(wi[:, 1], wi[:, 0]), 2 * np.pi)
    x = np.clip((phi / (2 * np.pi) * width).astype(int), 0, width - 1)
    y = np.clip((theta / (np.pi / 2) * height).astype(int), 0, height - 1)
    below = theta > np.pi / 2

    img = np.zeros((height, width, 3), np.float32)
    img[y[ok & ~below], x[ok & ~below], 1] = 1.0
    img[y[ok & below], x[ok & below], 0] = 1.0
    return img, int((ok & below).sum())


def write_pattern(path: str, eval_fn, sample_fn, wo, **kw):
    """Radiance map + sample scatter side by side to one EXR (the file the
    reference drops beside the beauty pass as rls_sampling_pattern.exr)."""
    rad = radiance_map(eval_fn, wo, **{k: v for k, v in kw.items() if k in ("width", "height")})
    scat, missing = sample_scatter(sample_fn, wo, **kw)
    exr.write_rgb(path, np.concatenate([rad, scat], axis=0))
    return missing
