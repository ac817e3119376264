"""Beckmann (Cook-Torrance) microfacet lobe for the Arnold `standard` shader.

The reference plugin's own shaders are GGX (rlGgx.h), but the testsuite's
support geometry uses Arnold's `standard` shader whose default
`specular_brdf` is "cook_torrance" — a Beckmann-distribution microfacet
BRDF (Arnold 4 `AiCookTorranceMISBRDF`). GGX's longer tails visibly
mismatch the goldens' glossy reflections (the plinth in test_geo.ass:797),
so standard-material specular routes here.

All functions are channel-split (core/vec3.V3) and shape-polymorphic like
bsdf/ggx.py. Formulas: Walter et al. EGSR'07 Eq.25-29 (D, rational G1,
inverse-CDF NDF sampling).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vec3
from ..core.vec3 import V3

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi


def d_beckmann(m: V3, alpha) -> jnp.ndarray:
    """Isotropic Beckmann NDF (Walter Eq.25)."""
    cos2 = jnp.clip(m.z * m.z, 1e-12, 1.0)
    # -tan^2 / a^2 = (1 - 1/cos^2) / a^2
    a2 = jnp.maximum(alpha * alpha, 1e-12)
    d = jnp.exp((1.0 - 1.0 / cos2) / a2) / (jnp.pi * a2 * cos2 * cos2)
    return jnp.where(m.z > 0.0, d, 0.0)


def g1(w: V3, m: V3, alpha) -> jnp.ndarray:
    """Walter Eq.27 rational approximation of the Beckmann Smith G1."""
    wdotm = vec3.dot(w, m)
    same_side = wdotm * w.z > 0.0
    cosv = jnp.clip(jnp.abs(w.z), 1e-6, 1.0)
    tanv = jnp.sqrt(jnp.maximum(1.0 - cosv * cosv, 0.0)) / cosv
    a = 1.0 / jnp.maximum(alpha * tanv, 1e-9)
    g = jnp.where(
        a < 1.6,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a),
        1.0,
    )
    return jnp.where(same_side, g, 0.0)


def gd(wo: V3, wi: V3, alpha) -> jnp.ndarray:
    """D * G / (4 cos_o cos_i) — the non-Fresnel part of the Cook-Torrance
    BRDF, mirroring ggx.reflection_parts' `gd` slot."""
    h = vec3.normalize(wo + wi)
    denom = 4.0 * jnp.maximum(jnp.abs(wo.z) * jnp.abs(wi.z), 1e-9)
    return d_beckmann(h, alpha) * g1(wo, h, alpha) * g1(wi, h, alpha) / denom


def sample(wo: V3, alpha, rx, ry):
    """Sample wi by drawing a microfacet normal from the full NDF
    (Walter Eq.28-29) and mirror-reflecting wo about it."""
    a2 = jnp.maximum(alpha * alpha, 1e-12)
    tan2 = -a2 * jnp.log(jnp.maximum(1.0 - rx, 1e-12))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * ry
    m = V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)
    wi = m * (2.0 * vec3.dot(wo, m)) - wo
    return wi


def pdf(wo: V3, wi: V3, alpha) -> jnp.ndarray:
    """pdf of `sample` over wi: D(h)*|h.z| / (4 |wi.h|)."""
    h = vec3.normalize(wo + wi)
    idoth = jnp.maximum(jnp.abs(vec3.dot(wi, h)), 1e-9)
    return d_beckmann(h, alpha) * jnp.abs(h.z) / (4.0 * idoth)
