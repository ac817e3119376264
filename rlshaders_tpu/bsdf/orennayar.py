"""Oren–Nayar diffuse BRDF with cosine-weighted sampling — batched JAX.

TPU-native equivalent of the host renderer's built-in Oren-Nayar MIS trio
(`AiOrenNayarMISCreateData/Sample/BRDF/PDF`), which the reference consumes for
diffuse lobes (rlGgx.cpp:276-289, rlSss.h:175-181, 443-449). At roughness 0 it
reduces exactly to Lambert (1/pi), which is the configuration every testsuite
scene uses for the plugin shaders.

Local shading frame: normal = +z. `eval_*` return f*cos(theta_i) to match the
Arnold evalBrdf convention. Directions are channel-split V3 triples (see
core/vec3.py); plain (..., 3) arrays are also accepted.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec3 import V3, v3
from ..core.vecmath import cosine_sample_hemisphere

INV_PI = 1.0 / jnp.pi
TWO_PI = 2.0 * jnp.pi


class OrenNayarParams(NamedTuple):
    roughness: jnp.ndarray  # sigma in radians-free [0,1] parameterization


def make_params(roughness) -> OrenNayarParams:
    return OrenNayarParams(roughness=jnp.asarray(roughness, jnp.float32))


import os as _os

# Oren-Nayar model variant. Default: the FULL ON'94 direct-illumination
# term (C1/C2/C3). The classic qualitative A/B model is 4.7-10% BRIGHTER
# at the shared scene's sigma=1 logo viewing geometry (numeric hemisphere
# integration, docs/fidelity.md r5) and the goldens sit ~4% BELOW the
# qualitative prediction there — Arnold-4's AiOrenNayarMISBRDF behaves as
# the full direct term. The two models are IDENTICAL at sigma=0 (Lambert),
# which is every other Oren-Nayar user in the testsuite (rlGgx diffuse,
# SSS fallback), so the switch only moves sigma>0 surfaces.
# RLS_ON_QUALITATIVE=1 restores the two-term model for ablation.
_QUALITATIVE = _os.environ.get("RLS_ON_QUALITATIVE", "0") == "1"


def eval_brdf(params: OrenNayarParams, wo, wi) -> jnp.ndarray:
    """Scalar f*cos for the (albedo-free) Oren-Nayar lobe.

    Full ON'94 direct term by default (see _QUALITATIVE above); sigma in
    the [0,1] slope parameterization; sigma=0 -> Lambert exactly.
    Exercised at sigma=1 by the shared scene's SA_logo and walls
    (diffuse_roughness 1).
    """
    if not isinstance(wo, V3):
        wo, wi = v3(wo), v3(wi)
    cos_i = wi.z
    cos_o = wo.z
    valid = (cos_i > 0.0) & (cos_o > 0.0)

    s2 = params.roughness * params.roughness
    a = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b = 0.45 * s2 / (s2 + 0.09)

    sin_i2 = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin_o2 = jnp.maximum(0.0, 1.0 - cos_o * cos_o)
    sin_i = jnp.sqrt(sin_i2)
    sin_o = jnp.sqrt(sin_o2)
    cos_dphi = jnp.where(
        (sin_i > 1e-6) & (sin_o > 1e-6),
        (wi.x * wo.x + wi.y * wo.y) / jnp.maximum(sin_i * sin_o, 1e-12),
        0.0,
    )
    cos_dphi = jnp.clip(cos_dphi, -1.0, 1.0)

    # alpha = max angle, beta = min angle
    sin_alpha = jnp.maximum(sin_i, sin_o)
    cos_beta = jnp.maximum(cos_i, cos_o)
    tan_beta = jnp.minimum(sin_i, sin_o) / jnp.maximum(cos_beta, 1e-6)

    if _QUALITATIVE:
        f = INV_PI * (a + b * jnp.maximum(cos_dphi, 0.0)
                      * sin_alpha * tan_beta)
        return jnp.where(valid, f * cos_i, 0.0)

    alpha = jnp.arccos(jnp.clip(jnp.minimum(cos_i, cos_o), -1.0, 1.0))
    beta = jnp.arccos(jnp.clip(jnp.maximum(cos_i, cos_o), -1.0, 1.0))
    # C2: the negative-cos_dphi branch subtracts (2 beta / pi)^3
    c2 = jnp.where(
        cos_dphi >= 0.0,
        b * sin_alpha,
        b * (sin_alpha - (2.0 * beta / jnp.pi) ** 3),
    )
    c3 = (0.125 * s2 / (s2 + 0.09)) * (4.0 * alpha * beta
                                       / (jnp.pi * jnp.pi)) ** 2
    tan_halfsum = jnp.tan(jnp.clip((alpha + beta) * 0.5, 0.0, 1.55))
    f = INV_PI * (
        a
        + c2 * cos_dphi * tan_beta
        + c3 * (1.0 - jnp.abs(cos_dphi)) * tan_halfsum
    )
    return jnp.where(valid, jnp.maximum(f, 0.0) * cos_i, 0.0)


def sample_v(params: OrenNayarParams, wo, rx, ry) -> V3:
    """Cosine-weighted hemisphere sample (local frame), channel-split.

    Same concentric (Shirley-Chiu) square->disk map as
    vecmath.cosine_sample_hemisphere so the stratification pattern is
    identical to the AoS path."""
    del params, wo
    ox = rx * 2.0 - 1.0
    oy = ry * 2.0 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
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
    return V3(x, y, jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y)))


def sample(params: OrenNayarParams, wo, rx, ry):
    """Cosine-weighted hemisphere sample (local frame)."""
    if isinstance(wo, V3):
        return sample_v(params, wo, rx, ry)
    del params, wo
    return cosine_sample_hemisphere(rx, ry)


def pdf(params: OrenNayarParams, wo, wi) -> jnp.ndarray:
    del params, wo
    z = wi.z if isinstance(wi, V3) else wi[..., 2]
    return jnp.maximum(z * INV_PI, 0.0)
