"""Oren–Nayar diffuse BRDF with cosine-weighted sampling — batched JAX.

TPU-native equivalent of the host renderer's built-in Oren-Nayar MIS trio
(`AiOrenNayarMISCreateData/Sample/BRDF/PDF`), which the reference consumes for
diffuse lobes (rlGgx.cpp:276-289, rlSss.h:175-181, 443-449). At roughness 0 it
reduces exactly to Lambert (1/pi), which is the configuration every testsuite
scene uses for the plugin shaders.

Local shading frame: normal = +z. `eval_*` return f*cos(theta_i) to match the
Arnold evalBrdf convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vecmath import cosine_sample_hemisphere

INV_PI = 1.0 / jnp.pi


class OrenNayarParams(NamedTuple):
    roughness: jnp.ndarray  # sigma in radians-free [0,1] parameterization


def make_params(roughness) -> OrenNayarParams:
    return OrenNayarParams(roughness=jnp.asarray(roughness, jnp.float32))


def eval_brdf(params: OrenNayarParams, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Scalar f*cos for the (albedo-free) Oren-Nayar lobe.

    Qualitative Oren-Nayar (Fujii single-term form): at sigma=0 -> Lambert.
    """
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    valid = (cos_i > 0.0) & (cos_o > 0.0)

    s2 = params.roughness * params.roughness
    a = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b = 0.45 * s2 / (s2 + 0.09)

    # cos(phi_i - phi_o) restricted to be >= 0
    sin_i2 = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin_o2 = jnp.maximum(0.0, 1.0 - cos_o * cos_o)
    sin_i = jnp.sqrt(sin_i2)
    sin_o = jnp.sqrt(sin_o2)
    cos_dphi = jnp.where(
        (sin_i > 1e-6) & (sin_o > 1e-6),
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
        / jnp.maximum(sin_i * sin_o, 1e-12),
        0.0,
    )
    cos_dphi = jnp.maximum(cos_dphi, 0.0)

    # sin(alpha) * tan(beta), alpha = max angle, beta = min angle
    sin_alpha = jnp.maximum(sin_i, sin_o)
    cos_beta = jnp.maximum(cos_i, cos_o)
    tan_beta = jnp.minimum(sin_i, sin_o) / jnp.maximum(cos_beta, 1e-6)

    f = INV_PI * (a + b * cos_dphi * sin_alpha * tan_beta)
    return jnp.where(valid, f * cos_i, 0.0)


def sample(params: OrenNayarParams, wo: jnp.ndarray, rx, ry) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample (local frame)."""
    del params, wo
    return cosine_sample_hemisphere(rx, ry)


def pdf(params: OrenNayarParams, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    del params, wo
    return jnp.maximum(wi[..., 2] * INV_PI, 0.0)
