"""Light sampling with solid-angle PDFs for MIS.

TPU-native replacement for the Arnold light loop the reference consumes
(`AiLightsPrepare`/`AiLightsGetSample`/`AiEvaluateLightSample`, SURVEY.md
section 2.3). Supplies, per light type, an area/direction sampler and the
matching solid-angle pdf plus an analytic ray-hit test so direct lighting can
be MIS-combined with BSDF sampling (power/balance heuristic).

Quad lights emit single-sided along their geometric normal's backside the
way Arnold quad lights do; `quadratic` decay with `normalize on` is the
physical area-light falloff with radiance = power-normalized color (folded
into Scene.quad_lights.radiance at build time).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.frame import build_frame_polar, to_world
from ..core.vecmath import cosine_sample_hemisphere, dot, normalize

INV_PI = 1.0 / jnp.pi


class LightSample(NamedTuple):
    direction: jnp.ndarray  # (..., 3) unit, shading point -> light
    dist: jnp.ndarray       # (...,) distance to the light point
    radiance: jnp.ndarray   # (..., 3) emitted radiance toward the point
    pdf: jnp.ndarray        # (...,) solid-angle pdf (0 = invalid)


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Balance heuristic (the weight family AiEvaluateLightSample uses)."""
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-12)


# ---------------------------------------------------------------------------
# Quad lights
# ---------------------------------------------------------------------------

def sample_quad(verts, normal, area, radiance, p, u1, u2) -> LightSample:
    """Uniform-area sample of a (parallelogram) quad light.

    verts: (4, 3); p: (..., 3) shading points; u1/u2: (...,) uniforms.
    """
    q = verts[0] + u1[..., None] * (verts[1] - verts[0]) + u2[..., None] * (
        verts[3] - verts[0]
    )
    to_l = q - p
    dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l / dist[..., None]
    # emission side: Arnold quads emit along -normal (validated vs goldens)
    cos_l = dot(-wi, normal)
    visible = cos_l > 1e-6
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-12)
    return LightSample(
        direction=wi,
        dist=dist,
        radiance=jnp.where(visible[..., None], radiance, 0.0),
        pdf=jnp.where(visible, pdf, 0.0),
    )


def intersect_quad(verts, normal, p, wi):
    """Ray-quad hit for the BSDF-sampling MIS strategy.

    Returns (hit_mask, t). Parallelogram quads only (all testsuite quads are).
    """
    e1 = verts[1] - verts[0]
    e2 = verts[3] - verts[0]
    denom = dot(wi, normal)
    t = dot(verts[0] - p, normal) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    q = p + wi * t[..., None] - verts[0]
    # project onto the quad's edge basis
    len1 = jnp.maximum(dot(e1, e1), 1e-12)
    len2 = jnp.maximum(dot(e2, e2), 1e-12)
    a = dot(q, e1) / len1
    b = dot(q, e2) / len2
    hit = (
        (t > 1e-4)
        & (a >= 0.0) & (a <= 1.0)
        & (b >= 0.0) & (b <= 1.0)
        & (dot(-wi, normal) > 1e-6)  # emission side only
    )
    return hit, t


def pdf_quad(verts, normal, area, p, wi, t):
    """Solid-angle pdf of the area sampler for a direction hitting at t."""
    cos_l = jnp.abs(dot(-wi, normal))
    return (t * t) / jnp.maximum(cos_l * area, 1e-12)


# ---------------------------------------------------------------------------
# Disk lights
# ---------------------------------------------------------------------------

def sample_disk(center, u, v, normal, area, radiance, p, u1, u2) -> LightSample:
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    q = center + (r * jnp.cos(phi))[..., None] * u + (r * jnp.sin(phi))[..., None] * v
    to_l = q - p
    dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l / dist[..., None]
    cos_l = dot(-wi, normal)
    visible = cos_l > 1e-6
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * area, 1e-12)
    return LightSample(
        direction=wi,
        dist=dist,
        radiance=jnp.where(visible[..., None], radiance, 0.0),
        pdf=jnp.where(visible, pdf, 0.0),
    )


def intersect_disk(center, u, v, normal, p, wi):
    denom = dot(wi, normal)
    t = dot(center - p, normal) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    q = p + wi * t[..., None] - center
    len_u = jnp.maximum(dot(u, u), 1e-12)
    len_v = jnp.maximum(dot(v, v), 1e-12)
    a = dot(q, u) / len_u
    b = dot(q, v) / len_v
    hit = (t > 1e-4) & (a * a + b * b <= 1.0) & (dot(-wi, normal) > 1e-6)
    return hit, t


# ---------------------------------------------------------------------------
# Skydome (constant environment)
# ---------------------------------------------------------------------------

def sample_sky(radiance, n, u1, u2) -> LightSample:
    """Cosine-hemisphere sample about the shading normal n."""
    local = cosine_sample_hemisphere(u1, u2)
    frame = build_frame_polar(n)
    wi = to_world(frame, local)
    cos_t = jnp.maximum(local[..., 2], 0.0)
    pdf = cos_t * INV_PI
    return LightSample(
        direction=wi,
        dist=jnp.full(pdf.shape, 1e30),
        radiance=jnp.broadcast_to(radiance, wi.shape),
        pdf=jnp.maximum(pdf, 1e-9),
    )


def pdf_sky(n, wi) -> jnp.ndarray:
    return jnp.maximum(dot(n, wi), 0.0) * INV_PI


# ---------------------------------------------------------------------------
# Batched (lights-as-an-axis) samplers: one call covers every light x sample,
# so the compiled graph holds a single BSDF-eval and a single shadow query.
# ---------------------------------------------------------------------------

def sample_quads_batched(verts, normal, area, radiance, p, u) -> LightSample:
    """verts (L,4,3), p (N,3), u (N,L,S,2) -> LightSample fields (N,L,S,...)."""
    e1 = (verts[:, 1] - verts[:, 0])[None, :, None]      # (1,L,1,3)
    e2 = (verts[:, 3] - verts[:, 0])[None, :, None]
    q = verts[None, :, None, 0] + u[..., 0:1] * e1 + u[..., 1:2] * e2
    to_l = q - p[:, None, None, :]
    dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l / dist[..., None]
    cos_l = dot(-wi, normal[None, :, None])
    visible = cos_l > 1e-6
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * area[None, :, None], 1e-12)
    return LightSample(
        direction=wi,
        dist=dist,
        radiance=jnp.where(visible[..., None], radiance[None, :, None], 0.0),
        pdf=jnp.where(visible, pdf, 0.0),
    )


def sample_disks_batched(center, uax, vax, normal, area, radiance, p, u) -> LightSample:
    """center (L,3), p (N,3), u (N,L,S,2) -> (N,L,S,...)."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    q = (
        center[None, :, None]
        + (r * jnp.cos(phi))[..., None] * uax[None, :, None]
        + (r * jnp.sin(phi))[..., None] * vax[None, :, None]
    )
    to_l = q - p[:, None, None, :]
    dist2 = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l / dist[..., None]
    cos_l = dot(-wi, normal[None, :, None])
    visible = cos_l > 1e-6
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * area[None, :, None], 1e-12)
    return LightSample(
        direction=wi,
        dist=dist,
        radiance=jnp.where(visible[..., None], radiance[None, :, None], 0.0),
        pdf=jnp.where(visible, pdf, 0.0),
    )


def sample_sky_batched(radiance, nf, u) -> LightSample:
    """nf (N,3), u (N,1,S,2) -> (N,1,S,...) cosine samples about nf."""
    local = cosine_sample_hemisphere(u[..., 0], u[..., 1])
    frame = build_frame_polar(nf[:, None, None, :])
    wi = to_world(frame, local)
    cos_t = jnp.maximum(local[..., 2], 0.0)
    pdf = jnp.maximum(cos_t * INV_PI, 1e-9)
    return LightSample(
        direction=wi,
        dist=jnp.full(pdf.shape, 1e30),
        radiance=jnp.broadcast_to(radiance, wi.shape),
        pdf=pdf,
    )
