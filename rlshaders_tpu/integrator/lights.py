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

from ..core import vec3
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


# ---------------------------------------------------------------------------
# Channel-split FLAT samplers (the TPU-hot path): one light per call, the
# sample axis flattened into the batch as column-major chunks of (S*N,) —
# no rank-3 (N, L, S, 3) intermediates, which pad catastrophically on TPU
# (see core/vec3.py). The wavefront light grid concatenates these chunks.
# ---------------------------------------------------------------------------

class LightSampleV(NamedTuple):
    direction: "vec3.V3"    # unit, shading point -> light, (M,) channels
    dist: jnp.ndarray       # (M,)
    radiance: "vec3.V3"     # emitted radiance toward the point
    pdf: jnp.ndarray        # (M,) solid-angle pdf (0 = invalid)


def sample_quad_flat(verts_l, normal_l, area_l, radiance_l,
                     p: "vec3.V3", u) -> LightSampleV:
    """One quad light, flat batch. verts_l (4,3) traced slice; p V3 of
    (M,); u (M, 2) uniforms. Same math as sample_quad."""
    v0, e1, e2 = verts_l[0], verts_l[1] - verts_l[0], verts_l[3] - verts_l[0]
    u1, u2 = u[..., 0], u[..., 1]
    q = vec3.V3(
        v0[0] + u1 * e1[0] + u2 * e2[0],
        v0[1] + u1 * e1[1] + u2 * e2[1],
        v0[2] + u1 * e1[2] + u2 * e2[2],
    )
    to_l = q - p
    dist2 = jnp.maximum(vec3.dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l * (1.0 / dist)
    nl = vec3.V3(normal_l[0], normal_l[1], normal_l[2])
    cos_l = -vec3.dot(wi, nl)
    visible = cos_l > 1e-6
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * area_l, 1e-12)
    rad = vec3.V3(radiance_l[0], radiance_l[1], radiance_l[2])
    return LightSampleV(
        direction=wi,
        dist=dist,
        radiance=vec3.where(visible, rad * jnp.ones_like(dist), 0.0),
        pdf=jnp.where(visible, pdf, 0.0),
    )


def sample_disk_flat(center_l, uax_l, vax_l, normal_l, area_l, radiance_l,
                     p: "vec3.V3", u) -> LightSampleV:
    """One disk light, flat batch (math of sample_disk)."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    cu = r * jnp.cos(phi)
    cv = r * jnp.sin(phi)
    q = vec3.V3(
        center_l[0] + cu * uax_l[0] + cv * vax_l[0],
        center_l[1] + cu * uax_l[1] + cv * vax_l[1],
        center_l[2] + cu * uax_l[2] + cv * vax_l[2],
    )
    to_l = q - p
    dist2 = jnp.maximum(vec3.dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l * (1.0 / dist)
    nl = vec3.V3(normal_l[0], normal_l[1], normal_l[2])
    cos_l = -vec3.dot(wi, nl)
    visible = cos_l > 1e-6
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * area_l, 1e-12)
    rad = vec3.V3(radiance_l[0], radiance_l[1], radiance_l[2])
    return LightSampleV(
        direction=wi,
        dist=dist,
        radiance=vec3.where(visible, rad * jnp.ones_like(dist), 0.0),
        pdf=jnp.where(visible, pdf, 0.0),
    )


def sample_sky_flat(radiance, nf: "vec3.V3", u) -> LightSampleV:
    """Cosine-hemisphere sample about nf (V3 of (M,), pre-tiled); u (M,2)."""
    from ..bsdf.orennayar import sample_v
    from ..core.frame import build_frame_polar_v, to_world_v

    local = sample_v(None, None, u[..., 0], u[..., 1])
    frame = build_frame_polar_v(nf)
    wi = to_world_v(frame, local)
    cos_t = jnp.maximum(local.z, 0.0)
    pdf = jnp.maximum(cos_t * INV_PI, 1e-9)
    rad = vec3.V3(radiance[0], radiance[1], radiance[2])
    return LightSampleV(
        direction=wi,
        dist=jnp.full(pdf.shape, 1e30),
        radiance=rad * jnp.ones_like(pdf),
        pdf=pdf,
    )


def intersect_quad_flat(verts_l, normal_l, p: "vec3.V3", wi: "vec3.V3"):
    """Flat V3 ray-quad hit (math of intersect_quad). Returns (hit, t)."""
    v0 = vec3.V3(verts_l[0, 0], verts_l[0, 1], verts_l[0, 2])
    e1 = verts_l[1] - verts_l[0]
    e2 = verts_l[3] - verts_l[0]
    nl = vec3.V3(normal_l[0], normal_l[1], normal_l[2])
    denom = vec3.dot(wi, nl)
    t = vec3.dot(v0 - p, nl) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    q = p + wi * t - v0
    e1v = vec3.V3(e1[0], e1[1], e1[2])
    e2v = vec3.V3(e2[0], e2[1], e2[2])
    len1 = jnp.maximum(jnp.dot(e1, e1), 1e-12)
    len2 = jnp.maximum(jnp.dot(e2, e2), 1e-12)
    a = vec3.dot(q, e1v) / len1
    b = vec3.dot(q, e2v) / len2
    hit = (
        (t > 1e-4)
        & (a >= 0.0) & (a <= 1.0)
        & (b >= 0.0) & (b <= 1.0)
        & (-vec3.dot(wi, nl) > 1e-6)  # emission side only
    )
    return hit, t


def intersect_disk_flat(center_l, uax_l, vax_l, normal_l,
                        p: "vec3.V3", wi: "vec3.V3"):
    """Flat V3 ray-disk hit (math of intersect_disk). Returns (hit, t)."""
    c = vec3.V3(center_l[0], center_l[1], center_l[2])
    nl = vec3.V3(normal_l[0], normal_l[1], normal_l[2])
    denom = vec3.dot(wi, nl)
    t = vec3.dot(c - p, nl) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    q = p + wi * t - c
    uv_ = vec3.V3(uax_l[0], uax_l[1], uax_l[2])
    vv_ = vec3.V3(vax_l[0], vax_l[1], vax_l[2])
    len_u = jnp.maximum(jnp.dot(uax_l, uax_l), 1e-12)
    len_v = jnp.maximum(jnp.dot(vax_l, vax_l), 1e-12)
    a = vec3.dot(q, uv_) / len_u
    b = vec3.dot(q, vv_) / len_v
    hit = (t > 1e-4) & (a * a + b * b <= 1.0) & (-vec3.dot(wi, nl) > 1e-6)
    return hit, t


def pdf_sky_v(n: "vec3.V3", wi: "vec3.V3") -> jnp.ndarray:
    return jnp.maximum(vec3.dot(n, wi), 0.0) * INV_PI
