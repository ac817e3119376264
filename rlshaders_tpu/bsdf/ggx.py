"""GGX microfacet BRDF/BSDF with VNDF importance sampling — batched JAX.

TPU-native rebuild of the reference's sampling-kernel layer
(src/rlGgx.h:24-377, src/rlGgx.cpp:14-99):

* anisotropic GGX normal distribution (Burley SIGGRAPH'12 Eq.13),
* Smith G1 shadowing/masking (Walter EGSR'07 Eq.34),
* exact unpolarized dielectric Fresnel (Walter Eq.22) with TIR,
* visible-normal (VNDF) importance sampling (Heitz & d'Eon EGSR'14) via
  slope-space sampling with the rational-polynomial fit,
* plain-NDF sampling (Burley Eq.14) as the alternative kernel,
* reflection term (Walter Eq.20), refraction term (Walter Eq.21) and the
  BSDF sample weight (Walter Eq.41) for rough refraction.

Everything operates in the LOCAL shading frame: the normal is +z, tangent
(alpha_x axis) is +x. Directions point AWAY from the surface. All functions
are pure, broadcast over leading batch dims, and jit/vmap friendly — the
branchy scalar control flow of the reference becomes `jnp.where` masks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vecmath import dot, lerp, normalize, reflect, spherical_direction

# Matches Arnold's AI_EPSILON float tolerance; the slope-sampling degeneracy
# guards depend on this being coarse enough for float32.
EPS = 1e-4
TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi


class GGXParams(NamedTuple):
    """Per-shading-point GGX lobe parameters (each field broadcastable)."""

    spec_color: jnp.ndarray  # (..., 3)
    alpha_x: jnp.ndarray     # (...,)
    alpha_y: jnp.ndarray     # (...,)
    alpha_g: jnp.ndarray     # (...,) isotropic alpha for G1 (= roughness^2)
    ior_in: jnp.ndarray      # (...,) refraction index on the incident side
    ior_out: jnp.ndarray     # (...,) refraction index on the transmitted side


def make_params(
    spec_color: jnp.ndarray,
    roughness: jnp.ndarray,
    ior: jnp.ndarray,
    anisotropic: jnp.ndarray = 0.0,
    entering: jnp.ndarray = True,
) -> GGXParams:
    """Build lobe parameters the way the reference ctor does (rlGgx.h:130-156).

    roughness is remapped r->r^2; anisotropy splits alpha via
    aspect = sqrt(1 - 0.9*aniso); the in/out IORs swap when exiting a medium.
    """
    roughness = jnp.asarray(roughness, jnp.float32)
    anisotropic = jnp.asarray(anisotropic, jnp.float32)
    ior = jnp.maximum(jnp.asarray(ior, jnp.float32), 1e-4)
    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    r2 = roughness * roughness
    alpha_x = jnp.maximum(1e-4, r2 / aspect)
    alpha_y = jnp.maximum(1e-4, r2 * aspect)
    alpha_g = jnp.maximum(1e-5, r2)
    entering = jnp.asarray(entering)
    ior_in = jnp.where(entering, 1.0, ior)
    ior_out = jnp.where(entering, ior, 1.0)
    return GGXParams(
        spec_color=jnp.asarray(spec_color, jnp.float32),
        alpha_x=alpha_x,
        alpha_y=alpha_y,
        alpha_g=alpha_g,
        ior_in=ior_in,
        ior_out=ior_out,
    )


# ---------------------------------------------------------------------------
# Distribution / shadowing / Fresnel building blocks
# ---------------------------------------------------------------------------

def d_ggx_aniso(m: jnp.ndarray, alpha_x, alpha_y) -> jnp.ndarray:
    """Anisotropic GGX NDF in the local frame (Burley Eq.13; rlGgx.h:332-340)."""
    mx, my, mz = m[..., 0], m[..., 1], m[..., 2]
    t = (mx / alpha_x) ** 2 + (my / alpha_y) ** 2 + mz * mz
    denom = alpha_x * alpha_y * t * t
    return INV_PI / jnp.maximum(denom, 1e-20)


def smith_g1(w: jnp.ndarray, m: jnp.ndarray, alpha_g) -> jnp.ndarray:
    """Walter Eq.34 G1 with isotropic alpha (rlGgx.h:343-357).

    Zero when w is on the opposite side of the microfacet vs. the macro
    normal; note the reference deliberately uses the ISOTROPIC alpha
    (roughness^2) here even for anisotropic lobes.
    """
    wdotm = dot(w, m)
    wdotn = w[..., 2]
    same_side = wdotm * wdotn > 0.0
    cos2 = jnp.clip(wdotn * wdotn, 1e-12, 1.0)
    tan2 = 1.0 / cos2 - 1.0
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha_g * alpha_g * tan2))
    return jnp.where(same_side, g, 0.0)


def smith_g(wi: jnp.ndarray, wo: jnp.ndarray, m: jnp.ndarray, alpha_g) -> jnp.ndarray:
    return smith_g1(wi, m, alpha_g) * smith_g1(wo, m, alpha_g)


def smith_g1_aniso(w: jnp.ndarray, m: jnp.ndarray, alpha_x, alpha_y) -> jnp.ndarray:
    """Exact anisotropic Smith G1 for GGX (Heitz 2014, Eq.80-style):
    G1 = 2 / (1 + sqrt(1 + (alpha_x^2 wx^2 + alpha_y^2 wy^2) / wz^2)).

    Used for the SAMPLING pdf: the slope-space sampler draws from the true
    anisotropic VNDF, so the pdf must use the matching G1 — the reference
    reuses its isotropic G1 here (rlGgx.h:78), which mis-normalizes the pdf
    for anisotropic lobes at grazing angles; we fix that while keeping the
    reference's BRDF value itself unchanged.
    """
    wdotm = dot(w, m)
    wz = w[..., 2]
    same_side = wdotm * wz > 0.0
    a2 = (alpha_x * w[..., 0]) ** 2 + (alpha_y * w[..., 1]) ** 2
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 / jnp.maximum(wz * wz, 1e-12)))
    return jnp.where(same_side, g, 0.0)


def fresnel_dielectric(i: jnp.ndarray, m: jnp.ndarray, ior_in, ior_out) -> jnp.ndarray:
    """Unpolarized dielectric Fresnel, Walter Eq.22 form (rlGgx.h:249-270).

    Returns 1 on total internal reflection.
    """
    c = jnp.abs(dot(i, m))
    eta = ior_out / ior_in
    g_sqr = eta * eta - 1.0 + c * c
    tir = g_sqr < 0.0
    g = jnp.sqrt(jnp.maximum(g_sqr, 0.0))
    gmc = g - c
    gpc = g + c
    a = gmc / jnp.where(jnp.abs(gpc) < 1e-12, 1e-12, gpc)
    b_den = c * gmc + 1.0
    b = (c * gpc - 1.0) / jnp.where(jnp.abs(b_den) < 1e-12, 1e-12, b_den)
    f = 0.5 * a * a * (1.0 + b * b)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


# ---------------------------------------------------------------------------
# Slope-space VNDF sampling (Heitz & d'Eon EGSR'14, supplemental listing)
# ---------------------------------------------------------------------------

def _sample_slope_uniform(rx, ry):
    """Isotropic full-NDF slope sample used at normal incidence."""
    r = jnp.sqrt(rx / jnp.maximum(1.0 - rx, 1e-12))
    phi = TWO_PI * ry
    return r * jnp.cos(phi), r * jnp.sin(phi)


def sample_slope_tan(tan_theta, near_normal, rx, ry):
    """Sample slopes of the visible-normal distribution for a stretched view
    direction with polar tangent `tan_theta` (behavioural match of
    rlGgx.cpp:14-61, reparameterized to avoid the theta->tan round trip).

    Branchless: the near-normal and degenerate `A^2 ~ 1` paths fall back to
    the uniform slope sample via masks.
    """
    ux, uy = _sample_slope_uniform(rx, ry)

    b = jnp.maximum(tan_theta, 0.0)
    b2 = b * b
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + b2))

    a = 2.0 * rx / jnp.maximum(g1, 1e-12) - 1.0
    a2 = a * a
    degenerate = jnp.abs(a2 - 1.0) < EPS

    tmp = 1.0 / jnp.where(degenerate, 1.0, a2 - 1.0)
    disc = jnp.sqrt(jnp.maximum(0.0, b2 * tmp * tmp - (a2 - b2) * tmp))
    slope_x1 = b * tmp - disc
    slope_x2 = b * tmp + disc
    use_x1 = (a < 0.0) | (slope_x2 > 1.0 / jnp.maximum(b, 1e-12))
    slope_x = jnp.where(use_x1, slope_x1, slope_x2)

    # slope_y via the rational-polynomial fit of the inverse CDF
    flip = ry > 0.5
    sign = jnp.where(flip, 1.0, -1.0)
    ry2 = jnp.where(flip, 2.0 * (ry - 0.5), 2.0 * (0.5 - ry))
    z = (ry2 * (ry2 * (ry2 * 0.27385 - 0.73369) + 0.46341)) / (
        ry2 * (ry2 * (ry2 * 0.093073 + 0.309420) - 1.0) + 0.597999
    )
    slope_y = sign * z * jnp.sqrt(1.0 + slope_x * slope_x)

    fallback = near_normal | degenerate
    return (
        jnp.where(fallback, ux, slope_x),
        jnp.where(fallback, uy, slope_y),
    )


def sample_slope(theta, rx, ry):
    """Angle-parameterized wrapper kept for reference parity in tests."""
    tan_theta = jnp.tan(jnp.clip(theta, 0.0, jnp.pi / 2 - 1e-4))
    return sample_slope_tan(tan_theta, theta < EPS, rx, ry)


def sample_vndf(wo: jnp.ndarray, alpha_x, alpha_y, rx, ry) -> jnp.ndarray:
    """Sample a visible microfacet normal (local frame).

    Behavioural match of VNDFKernel::evalSample (rlGgx.cpp:63-99): stretch
    the view direction by (alpha_x, alpha_y), sample slopes, rotate and
    unstretch. The reference's (cos, phi) round trip through
    sphericalDirection is the identity, so all trig (atan2/acos/tan/sin/cos)
    is replaced by algebra on the stretched vector — ~6 fewer
    transcendentals per sample on the VPU.
    """
    v = jnp.stack(
        [wo[..., 0] * alpha_x, wo[..., 1] * alpha_y, wo[..., 2]], axis=-1
    )
    v = normalize(v)

    vz = jnp.clip(v[..., 2], -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - vz * vz))
    on_pole = vz >= 1.0 - EPS
    inv_sin = 1.0 / jnp.maximum(sin_t, 1e-12)
    cos_phi = jnp.where(on_pole, 1.0, v[..., 0] * inv_sin)
    sin_phi = jnp.where(on_pole, 0.0, v[..., 1] * inv_sin)
    tan_theta = sin_t / jnp.maximum(jnp.abs(vz), 1e-12)

    slope_x, slope_y = sample_slope_tan(tan_theta, on_pole, rx, ry)

    mx = -(cos_phi * slope_x - sin_phi * slope_y) * alpha_x
    my = -(sin_phi * slope_x + cos_phi * slope_y) * alpha_y
    m = jnp.stack([mx, my, jnp.ones_like(mx)], axis=-1)
    return normalize(m)


def vndf_pdf(params: GGXParams, wo: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """PDF of the VNDF reflection sample: D*G1 / (4 |wo.n|) (rlGgx.h:71-80).

    We add the chi+(m.n) sidedness term the reference formula omits: the
    sampler never produces below-horizon microfacet normals, and the BRDF is
    zero for the corresponding directions, so this only fixes the density of
    impossible directions (where the reference would report a tiny positive
    pdf and skew MIS weights at grazing angles).
    """
    idotn = jnp.abs(wo[..., 2])
    pdf = (
        d_ggx_aniso(m, params.alpha_x, params.alpha_y)
        * smith_g1_aniso(wo, m, params.alpha_x, params.alpha_y)
        / jnp.maximum(idotn, 1e-12)
        * 0.25
    )
    return jnp.where(m[..., 2] > 0.0, jnp.maximum(pdf, EPS), EPS)


def sample_ndf(alpha_x, alpha_y, rx, ry) -> jnp.ndarray:
    """Sample the full (non-visible) NDF, Burley Eq.14 (rlGgx.h:33-41)."""
    g = jnp.sqrt(rx / jnp.maximum(1.0 - rx, 1e-12))
    phi = TWO_PI * ry
    m = jnp.stack(
        [g * alpha_x * jnp.cos(phi), g * alpha_y * jnp.sin(phi), jnp.ones_like(phi)],
        axis=-1,
    )
    return normalize(m)


def ndf_pdf(params: GGXParams, wo: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Reflection PDF for plain-NDF sampling, Walter Eq.38 (rlGgx.h:44-50)."""
    idotm = jnp.abs(dot(wo, m))
    mdotn = jnp.abs(m[..., 2])
    return (
        d_ggx_aniso(m, params.alpha_x, params.alpha_y)
        * mdotn
        * 0.25
        / jnp.maximum(idotm, 1e-12)
    )


# ---------------------------------------------------------------------------
# Reflection / refraction lobes
# ---------------------------------------------------------------------------

def reflection_parts(params: GGXParams, wo: jnp.ndarray, wi: jnp.ndarray):
    """(fresnel, G*D/(4 |l.n||v.n|)) of Walter Eq.20 — split so callers can
    substitute other Fresnel models (the Arnold standard shader uses Schlick
    with artist F0 or no Fresnel at all)."""
    sign = jnp.sign(wo[..., 2])
    sign = jnp.where(sign == 0.0, 1.0, sign)
    hr = normalize(wo + wi) * sign[..., None]
    f = fresnel_dielectric(wo, hr, params.ior_in, params.ior_out)
    ldotn = jnp.abs(wi[..., 2])
    vdotn = jnp.abs(wo[..., 2])
    g = smith_g(wo, wi, hr, params.alpha_g)
    d = d_ggx_aniso(hr, params.alpha_x, params.alpha_y)
    return f, g * d * 0.25 / jnp.maximum(ldotn * vdotn, 1e-12)


def reflection_term(params: GGXParams, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Scalar reflection BRDF value, Walter Eq.20 (rlGgx.h:304-313)."""
    f, gd = reflection_parts(params, wo, wi)
    return f * gd


def refraction_term(params: GGXParams, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Scalar refraction BTDF value, Walter Eq.21 (rlGgx.h:316-328)."""
    ht = -normalize(params.ior_in[..., None] * wo + params.ior_out[..., None] * wi)
    f = 1.0 - fresnel_dielectric(wo, ht, params.ior_in, params.ior_out)
    odotn = jnp.abs(wi[..., 2])
    idotn = jnp.abs(wo[..., 2])
    odoth = dot(wi, ht)
    idoth = dot(wo, ht)
    denom = odotn * idotn * (params.ior_in * idoth + params.ior_out * odoth) ** 2
    g = smith_g(wo, wi, ht, params.alpha_g)
    d = d_ggx_aniso(ht, params.alpha_x, params.alpha_y)
    return (
        jnp.abs(odoth * idoth)
        * params.ior_out ** 2
        * f
        * g
        * d
        / jnp.maximum(denom, 1e-12)
    )


def bsdf_sample_weight(params: GGXParams, wo: jnp.ndarray, wi: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Importance-sampling weight for NDF-sampled BSDF paths, Walter Eq.41
    (rlGgx.h:294-301): G * |i.h| / (|i.n| |m.n|)."""
    idoth = dot(wo, m)
    mdotn = jnp.abs(m[..., 2])
    idotn = jnp.abs(wo[..., 2])
    g = smith_g(wo, wi, m, params.alpha_g)
    return g * jnp.abs(idoth / jnp.maximum(idotn * mdotn, 1e-12))


def refract_direction(m: jnp.ndarray, wo: jnp.ndarray, ior_in, ior_out):
    """Refract `wo` about microfacet normal `m` (Walter Eq.40).

    Returns (wi, tir_mask). `wo` points away from the surface; the result
    points into the transmitted hemisphere. On TIR the direction is invalid
    and `tir_mask` is True (callers mirror-reflect instead, matching
    integrateRefract's TIR branch at rlGgx.h:232-236).
    """
    eta = jnp.asarray(ior_in / ior_out)
    idotm = dot(wo, m)
    sign = jnp.sign(wo[..., 2])
    sign = jnp.where(sign == 0.0, 1.0, sign)
    cos2 = 1.0 - eta * eta * (1.0 - idotm * idotm)
    tir = cos2 < 0.0
    wi = (eta * idotm - sign * jnp.sqrt(jnp.maximum(cos2, 0.0)))[..., None] * m - eta[
        ..., None
    ] * wo
    return normalize(wi), tir


# ---------------------------------------------------------------------------
# High-level eval/sample/pdf triple (the Arnold MIS-callback contract,
# rlGgx.h:97-127, rebuilt as pure batched functions)
# ---------------------------------------------------------------------------

def sample(params: GGXParams, wo: jnp.ndarray, rx, ry):
    """Sample a reflected direction via VNDF. Returns (wi, fresnel_weight).

    fresnel_weight mirrors the running average the reference accumulates for
    energy layering (rlGgx.h:103-106, used by rlSkin at rlSkin.cpp:204).
    """
    m = sample_vndf(wo, params.alpha_x, params.alpha_y, rx, ry)
    wi = reflect(wo, m)
    fw = fresnel_dielectric(wi, m, params.ior_in, params.ior_out)
    return wi, fw


def eval_brdf(params: GGXParams, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Reflectance * cos(theta_i), the quantity the host integrator consumes
    (GgxSamplerT::evalBrdf -> evalReflectance, rlGgx.h:110-119, 158-165)."""
    valid = dot(wi, wi) > 1e-12
    refl = reflection_term(params, wo, wi) * wi[..., 2]
    f = params.spec_color * refl[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def pdf(params: GGXParams, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """PDF of `sample` for MIS (rlGgx.h:121-127)."""
    h = normalize(wo + wi)
    return vndf_pdf(params, wo, h)


def sample_refract(params: GGXParams, wo: jnp.ndarray, rx, ry):
    """One rough-refraction sample: returns (wi, weight, tir_mask).

    Matches integrateRefract's per-sample logic (rlGgx.h:228-243): draw a
    microfacet normal from the VNDF, refract (or mirror-reflect on TIR), and
    weight by Walter Eq.41.
    """
    m = sample_vndf(wo, params.alpha_x, params.alpha_y, rx, ry)
    wi_refr, tir = refract_direction(m, wo, params.ior_in, params.ior_out)
    wi_refl = reflect(wo, m)
    wi = jnp.where(tir[..., None], wi_refl, wi_refr)
    w = bsdf_sample_weight(params, wo, wi, m)
    return wi, w, tir


def fresnel_avg_normal(params: GGXParams) -> jnp.ndarray:
    """Fresnel at normal incidence: F0 = ((eta-1)/(eta+1))^2."""
    eta = params.ior_out / params.ior_in
    return ((eta - 1.0) / (eta + 1.0)) ** 2
