"""Counter-based, shard-oblivious random streams for rendering.

The reference relies on the host renderer's per-pixel correlated sampler
(`AiSampler(n, 2)` / `AiSamplerIterator`, e.g. rlGgx.cpp:146-159). The
TPU-native equivalent is a stateless counter-based generator: every (pixel,
aa-sample, bounce, dimension) tuple maps to an independent uniform value via
threefry, so results are deterministic and independent of device sharding.

We also provide scrambled-stratified 2D sample grids: the k-th of n^2 samples
lands in stratum (k // n, k % n) with an in-stratum jitter, mirroring the
variance behaviour of the host's stratified sampler.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stream(seed: int | jnp.ndarray) -> jax.Array:
    """Root key for a render."""
    return jax.random.PRNGKey(seed)


def fold(key: jax.Array, *ids: int | jnp.ndarray) -> jax.Array:
    """Derive a subkey from static or traced integer identifiers."""
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def uniform2(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    """Uniform (..., 2) samples in [0, 1)."""
    return jax.random.uniform(key, shape + (2,), dtype=jnp.float32)


def stratified2(key: jax.Array, batch_shape: tuple[int, ...], n: int) -> jnp.ndarray:
    """Per-element stratified sample grids: returns (..., n*n, 2) in [0,1).

    Element [..., k, :] is jittered inside stratum (k % n, k // n) — the
    behavioural counterpart of Arnold's `AiSampler(n, 2)` which yields n^2
    stratified 2D samples per shading point.
    """
    count = n * n
    jitter = jax.random.uniform(key, batch_shape + (count, 2), dtype=jnp.float32)
    k = jnp.arange(count, dtype=jnp.float32)
    sx = jnp.mod(k, n)
    sy = jnp.floor(k / n)
    base = jnp.stack([sx, sy], axis=-1)  # (count, 2)
    return (base + jitter) / float(n)


def stratified2_flat(key: jax.Array, n: int, s: int) -> jnp.ndarray:
    """(s*s*n, 2) stratified samples in SAMPLE-MAJOR flat layout: row
    k*n + i is element i's jittered sample in stratum (k % s, k // s).

    The flat counterpart of stratified2 for the channel-split wavefront:
    chunk k (rows [k*n, (k+1)*n)) holds every element's k-th sample, so
    per-sample reductions are contiguous chunk sums (vec3.ksum).
    """
    count = s * s
    jitter = jax.random.uniform(key, (count, n, 2), dtype=jnp.float32)
    k = jnp.arange(count, dtype=jnp.float32)
    sx = jnp.mod(k, s)
    sy = jnp.floor(k / s)
    base = jnp.stack([sx, sy], axis=-1)[:, None, :]  # (count, 1, 2)
    return ((base + jitter) / float(s)).reshape(count * n, 2)
