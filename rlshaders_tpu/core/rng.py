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
import numpy as np


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


# ---------------------------------------------------------------------------
# Owen-scrambled Sobol (0,2)-sequence.
#
# The host renderer's samplers jointly stratify a pixel's WHOLE sample budget:
# with AA^2 camera samples each running an AiSampler(n, 2), the effective
# AA^2 * n^2 light/BSDF samples of one pixel behave as one stratified set (the
# documented "sample counts multiply" behaviour). Per-lane stratified grids
# that are independent across the AA samples of a pixel lose that joint
# stratification and measure ~2x the golden's grain at equal counts.
#
# The TPU-native equivalent: per (pixel, purpose), sample k of AA-lane a maps
# to global index j = a*n + k of an Owen-scrambled Sobol (0,2) sequence
# (hash-based nested uniform scrambling, Burley JCGT 2020 construction). The
# union over a pixel's lanes is a sequence prefix -> jointly stratified; each
# lane's block is itself a (0,m,2)-net whenever its count is a power of two.
# Everything is uint32 bit math on rank-1 arrays - no tables, no state.
# ---------------------------------------------------------------------------

def _sobol_dir2() -> np.ndarray:
    v = np.uint32(1 << 31)
    out = np.empty(32, np.uint32)
    for i in range(32):
        out[i] = v
        v ^= v >> np.uint32(1)
    return out


_DIR2 = _sobol_dir2()


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 integer hash (uint32 -> uint32)."""
    x = x.astype(jnp.uint32) if hasattr(x, "astype") else jnp.uint32(x)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _reverse32(x: jnp.ndarray) -> jnp.ndarray:
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _lk_permute(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras hash permutation: an Owen scramble in reversed-bit order."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def _owen(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Nested uniform (Owen) scramble of an MSB-first digit string."""
    return _reverse32(_lk_permute(_reverse32(x), seed))


def _sobol_d1(idx: jnp.ndarray, bits: int = 16) -> jnp.ndarray:
    """Second Sobol dimension (MSB-aligned uint32). `bits` bounds the index
    width; every caller here indexes within a pixel's sample budget
    (< 2^16)."""
    y = jnp.zeros_like(idx)
    for b in range(bits):
        y = y ^ (jnp.where((idx >> b) & 1, jnp.uint32(_DIR2[b]), jnp.uint32(0)))
    return y


def _to_unit(x: jnp.ndarray) -> jnp.ndarray:
    # keep 24 mantissa-exact bits; result in [0, 1)
    return (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def sobol2(idx: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Owen-scrambled Sobol (0,2) points: idx (N,) uint32-able global sample
    indices, seed (N,) per-stream scramble ids. Returns (N, 2) float32."""
    idx = idx.astype(jnp.uint32)
    sx = _hash_u32(seed)
    sy = _hash_u32(seed ^ jnp.uint32(0x9E3779B9))
    d0 = _owen(_reverse32(idx), sx)
    d1 = _owen(_sobol_d1(idx), sy)
    return jnp.stack([_to_unit(d0), _to_unit(d1)], axis=-1)


def _stream_seed(pix: jnp.ndarray, purpose, salt) -> jnp.ndarray:
    """Per-(pixel, purpose) scramble seed. `purpose` may be a Python int, a
    traced scalar, or an array (broadcasts against pix)."""
    return _hash_u32(
        pix.astype(jnp.uint32)
        ^ _hash_u32(jnp.asarray(purpose).astype(jnp.uint32))
        ^ jnp.asarray(salt).astype(jnp.uint32)
    )


def sobol2_flat(pix: jnp.ndarray, aa: jnp.ndarray, s_count: int,
                purpose: int, salt) -> jnp.ndarray:
    """(s_count*N, 2) per-pixel jointly-stratified samples, COLUMN-major like
    stratified2_flat: row c*N + i is lane i's c-th sample, with global
    sequence index aa[i]*s_count + c in lane i's (pixel, purpose) stream."""
    n = pix.shape[0]
    c = jnp.arange(s_count, dtype=jnp.uint32)
    idx = (
        aa.astype(jnp.uint32)[None, :] * jnp.uint32(s_count) + c[:, None]
    ).reshape(-1)
    seed = jnp.tile(_stream_seed(pix, purpose, jnp.uint32(salt)), s_count)
    return sobol2(idx, seed)


def sobol2_rep(pix: jnp.ndarray, aa: jnp.ndarray, s_count: int,
               purpose: int, salt) -> jnp.ndarray:
    """(N*s_count, 2) LANE-major variant: row i*s_count + c (matches
    jnp.repeat(x, s_count) batch layouts, e.g. the SSS probe stage)."""
    c = jnp.arange(s_count, dtype=jnp.uint32)
    idx = (
        aa.astype(jnp.uint32)[:, None] * jnp.uint32(s_count) + c[None, :]
    ).reshape(-1)
    seed = jnp.repeat(_stream_seed(pix, purpose, jnp.uint32(salt)), s_count)
    return sobol2(idx, seed)


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
