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
(alpha_x axis) is +x. Directions point AWAY from the surface.

Directions are channel-split `V3` triples of (...,) arrays (see
core/vec3.py: on TPU an (M, 3) array pads its minor dim 3 -> 128 and costs
~43x VPU time on every op; the SoA form is rank-1 and pad-free). Every
public function also accepts plain (..., 3) arrays for compatibility (the
property-test suite and non-hot callers) and then returns arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import vec3
from ..core.vec3 import V3, v3

# Matches Arnold's AI_EPSILON float tolerance; the slope-sampling degeneracy
# guards depend on this being coarse enough for float32.
EPS = 1e-4
TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi


class GGXParams(NamedTuple):
    """Per-shading-point GGX lobe parameters (each field broadcastable).

    spec_color may be an (..., 3) array (legacy AoS) or a V3; the eval core
    converts on use."""

    spec_color: object       # (..., 3) array or V3
    alpha_x: jnp.ndarray     # (...,)
    alpha_y: jnp.ndarray     # (...,)
    alpha_g: jnp.ndarray     # (...,) isotropic alpha for G1 (= roughness^2)
    ior_in: jnp.ndarray      # (...,) refraction index on the incident side
    ior_out: jnp.ndarray     # (...,) refraction index on the transmitted side


def _color_v3(c) -> V3:
    return c if isinstance(c, V3) else v3(jnp.asarray(c, jnp.float32))


def make_params(
    spec_color,
    roughness,
    ior,
    anisotropic=0.0,
    entering=True,
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
    if not isinstance(spec_color, V3):
        spec_color = jnp.asarray(spec_color, jnp.float32)
    return GGXParams(
        spec_color=spec_color,
        alpha_x=alpha_x,
        alpha_y=alpha_y,
        alpha_g=alpha_g,
        ior_in=ior_in,
        ior_out=ior_out,
    )


# ---------------------------------------------------------------------------
# Distribution / shadowing / Fresnel building blocks (V3 cores)
# ---------------------------------------------------------------------------

def d_ggx_aniso(m, alpha_x, alpha_y) -> jnp.ndarray:
    """Anisotropic GGX NDF in the local frame (Burley Eq.13; rlGgx.h:332-340)."""
    if not isinstance(m, V3):
        m = v3(m)
    t = (m.x / alpha_x) ** 2 + (m.y / alpha_y) ** 2 + m.z * m.z
    denom = alpha_x * alpha_y * t * t
    return INV_PI / jnp.maximum(denom, 1e-20)


def smith_g1(w, m, alpha_g) -> jnp.ndarray:
    """Walter Eq.34 G1 with isotropic alpha (rlGgx.h:343-357).

    Zero when w is on the opposite side of the microfacet vs. the macro
    normal; note the reference deliberately uses the ISOTROPIC alpha
    (roughness^2) here even for anisotropic lobes.
    """
    if not isinstance(w, V3):
        w, m = v3(w), v3(m)
    wdotm = vec3.dot(w, m)
    wdotn = w.z
    same_side = wdotm * wdotn > 0.0
    cos2 = jnp.clip(wdotn * wdotn, 1e-12, 1.0)
    tan2 = 1.0 / cos2 - 1.0
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha_g * alpha_g * tan2))
    return jnp.where(same_side, g, 0.0)


def smith_g(wi, wo, m, alpha_g) -> jnp.ndarray:
    return smith_g1(wi, m, alpha_g) * smith_g1(wo, m, alpha_g)


def smith_g1_aniso(w, m, alpha_x, alpha_y) -> jnp.ndarray:
    """Exact anisotropic Smith G1 for GGX (Heitz 2014, Eq.80-style):
    G1 = 2 / (1 + sqrt(1 + (alpha_x^2 wx^2 + alpha_y^2 wy^2) / wz^2)).

    Used for the SAMPLING pdf: the slope-space sampler draws from the true
    anisotropic VNDF, so the pdf must use the matching G1 — the reference
    reuses its isotropic G1 here (rlGgx.h:78), which mis-normalizes the pdf
    for anisotropic lobes at grazing angles; we fix that while keeping the
    reference's BRDF value itself unchanged.
    """
    if not isinstance(w, V3):
        w, m = v3(w), v3(m)
    wdotm = vec3.dot(w, m)
    same_side = wdotm * w.z > 0.0
    a2 = (alpha_x * w.x) ** 2 + (alpha_y * w.y) ** 2
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 / jnp.maximum(w.z * w.z, 1e-12)))
    return jnp.where(same_side, g, 0.0)


def fresnel_dielectric(i, m, ior_in, ior_out) -> jnp.ndarray:
    """Unpolarized dielectric Fresnel, Walter Eq.22 form (rlGgx.h:249-270).

    Returns 1 on total internal reflection.
    """
    if not isinstance(i, V3):
        i, m = v3(i), v3(m)
    c = jnp.abs(vec3.dot(i, m))
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


def sample_vndf(wo, alpha_x, alpha_y, rx, ry):
    """Sample a visible microfacet normal (local frame).

    Behavioural match of VNDFKernel::evalSample (rlGgx.cpp:63-99): stretch
    the view direction by (alpha_x, alpha_y), sample slopes, rotate and
    unstretch. The reference's (cos, phi) round trip through
    sphericalDirection is the identity, so all trig (atan2/acos/tan/sin/cos)
    is replaced by algebra on the stretched vector — ~6 fewer
    transcendentals per sample on the VPU.
    """
    aos = not isinstance(wo, V3)
    if aos:
        wo = v3(wo)
    v = vec3.normalize(V3(wo.x * alpha_x, wo.y * alpha_y, wo.z))

    vz = jnp.clip(v.z, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - vz * vz))
    on_pole = vz >= 1.0 - EPS
    inv_sin = 1.0 / jnp.maximum(sin_t, 1e-12)
    cos_phi = jnp.where(on_pole, 1.0, v.x * inv_sin)
    sin_phi = jnp.where(on_pole, 0.0, v.y * inv_sin)
    tan_theta = sin_t / jnp.maximum(jnp.abs(vz), 1e-12)

    slope_x, slope_y = sample_slope_tan(tan_theta, on_pole, rx, ry)

    mx = -(cos_phi * slope_x - sin_phi * slope_y) * alpha_x
    my = -(sin_phi * slope_x + cos_phi * slope_y) * alpha_y
    m = vec3.normalize(V3(mx, my, jnp.ones_like(mx)))
    return m.aos() if aos else m


def vndf_pdf(params: GGXParams, wo, m) -> jnp.ndarray:
    """PDF of the VNDF reflection sample: D*G1 / (4 |wo.n|) (rlGgx.h:71-80).

    We add the chi+(m.n) sidedness term the reference formula omits: the
    sampler never produces below-horizon microfacet normals, and the BRDF is
    zero for the corresponding directions, so this only fixes the density of
    impossible directions (where the reference would report a tiny positive
    pdf and skew MIS weights at grazing angles).
    """
    if not isinstance(wo, V3):
        wo, m = v3(wo), v3(m)
    idotn = jnp.abs(wo.z)
    pdf = (
        d_ggx_aniso(m, params.alpha_x, params.alpha_y)
        * smith_g1_aniso(wo, m, params.alpha_x, params.alpha_y)
        / jnp.maximum(idotn, 1e-12)
        * 0.25
    )
    return jnp.where(m.z > 0.0, jnp.maximum(pdf, EPS), EPS)


def sample_ndf(alpha_x, alpha_y, rx, ry):
    """Sample the full (non-visible) NDF, Burley Eq.14 (rlGgx.h:33-41).

    Returns an (..., 3) array (test/reference-parity helper, not hot)."""
    g = jnp.sqrt(rx / jnp.maximum(1.0 - rx, 1e-12))
    phi = TWO_PI * ry
    m = vec3.normalize(
        V3(g * alpha_x * jnp.cos(phi), g * alpha_y * jnp.sin(phi),
           jnp.ones_like(phi))
    )
    return m.aos()


def ndf_pdf(params: GGXParams, wo, m) -> jnp.ndarray:
    """Reflection PDF for plain-NDF sampling, Walter Eq.38 (rlGgx.h:44-50)."""
    if not isinstance(wo, V3):
        wo, m = v3(wo), v3(m)
    idotm = jnp.abs(vec3.dot(wo, m))
    mdotn = jnp.abs(m.z)
    return (
        d_ggx_aniso(m, params.alpha_x, params.alpha_y)
        * mdotn
        * 0.25
        / jnp.maximum(idotm, 1e-12)
    )


# ---------------------------------------------------------------------------
# Reflection / refraction lobes
# ---------------------------------------------------------------------------

def reflection_parts(params: GGXParams, wo, wi):
    """(fresnel, G*D/(4 |l.n||v.n|)) of Walter Eq.20 — split so callers can
    substitute other Fresnel models (the Arnold standard shader uses Schlick
    with artist F0 or no Fresnel at all)."""
    if not isinstance(wo, V3):
        wo, wi = v3(wo), v3(wi)
    sign = jnp.sign(wo.z)
    sign = jnp.where(sign == 0.0, 1.0, sign)
    hr = vec3.normalize(wo + wi) * sign
    f = fresnel_dielectric(wo, hr, params.ior_in, params.ior_out)
    ldotn = jnp.abs(wi.z)
    vdotn = jnp.abs(wo.z)
    g = smith_g(wo, wi, hr, params.alpha_g)
    d = d_ggx_aniso(hr, params.alpha_x, params.alpha_y)
    return f, g * d * 0.25 / jnp.maximum(ldotn * vdotn, 1e-12)


def reflection_term(params: GGXParams, wo, wi) -> jnp.ndarray:
    """Scalar reflection BRDF value, Walter Eq.20 (rlGgx.h:304-313)."""
    f, gd = reflection_parts(params, wo, wi)
    return f * gd


def refraction_term(params: GGXParams, wo, wi) -> jnp.ndarray:
    """Scalar refraction BTDF value, Walter Eq.21 (rlGgx.h:316-328)."""
    if not isinstance(wo, V3):
        wo, wi = v3(wo), v3(wi)
    ht = -vec3.normalize(wo * params.ior_in + wi * params.ior_out)
    f = 1.0 - fresnel_dielectric(wo, ht, params.ior_in, params.ior_out)
    odotn = jnp.abs(wi.z)
    idotn = jnp.abs(wo.z)
    odoth = vec3.dot(wi, ht)
    idoth = vec3.dot(wo, ht)
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


def bsdf_sample_weight(params: GGXParams, wo, wi, m) -> jnp.ndarray:
    """Importance-sampling weight for NDF-sampled BSDF paths, Walter Eq.41
    (rlGgx.h:294-301): G * |i.h| / (|i.n| |m.n|)."""
    if not isinstance(wo, V3):
        wo, wi, m = v3(wo), v3(wi), v3(m)
    idoth = vec3.dot(wo, m)
    mdotn = jnp.abs(m.z)
    idotn = jnp.abs(wo.z)
    g = smith_g(wo, wi, m, params.alpha_g)
    return g * jnp.abs(idoth / jnp.maximum(idotn * mdotn, 1e-12))


def refract_direction(m, wo, ior_in, ior_out):
    """Refract `wo` about microfacet normal `m` (Walter Eq.40).

    Returns (wi, tir_mask). `wo` points away from the surface; the result
    points into the transmitted hemisphere. On TIR the direction is invalid
    and `tir_mask` is True (callers mirror-reflect instead, matching
    integrateRefract's TIR branch at rlGgx.h:232-236).
    """
    aos = not isinstance(wo, V3)
    if aos:
        m, wo = v3(m), v3(wo)
    eta = jnp.asarray(ior_in / ior_out)
    idotm = vec3.dot(wo, m)
    sign = jnp.sign(wo.z)
    sign = jnp.where(sign == 0.0, 1.0, sign)
    cos2 = 1.0 - eta * eta * (1.0 - idotm * idotm)
    tir = cos2 < 0.0
    k = eta * idotm - sign * jnp.sqrt(jnp.maximum(cos2, 0.0))
    wi = vec3.normalize(m * k - wo * eta)
    return (wi.aos(), tir) if aos else (wi, tir)


# ---------------------------------------------------------------------------
# High-level eval/sample/pdf triple (the Arnold MIS-callback contract,
# rlGgx.h:97-127, rebuilt as pure batched functions)
# ---------------------------------------------------------------------------

def sample(params: GGXParams, wo, rx, ry):
    """Sample a reflected direction via VNDF. Returns (wi, fresnel_weight).

    fresnel_weight mirrors the running average the reference accumulates for
    energy layering (rlGgx.h:103-106, used by rlSkin at rlSkin.cpp:204).
    """
    aos = not isinstance(wo, V3)
    if aos:
        wo = v3(wo)
    m = sample_vndf(wo, params.alpha_x, params.alpha_y, rx, ry)
    wi = vec3.reflect(wo, m)
    fw = fresnel_dielectric(wi, m, params.ior_in, params.ior_out)
    return (wi.aos(), fw) if aos else (wi, fw)


_VDC16 = (0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875,
          0.0625, 0.5625, 0.3125, 0.8125, 0.1875, 0.6875, 0.4375,
          0.9375, 0.03125)


def avg_fresnel(params: GGXParams, wo: V3, n: int = 16) -> jnp.ndarray:
    """View-averaged dielectric Fresnel over VNDF draws: the deterministic
    limit of the reference's running average `getAvgReflectWeight()`
    (rlGgx.h:103-106, 181-184 — every MIS sample accumulates the exact
    Fresnel of its sampled half-vector; rlSkin consumes the mean for energy
    layering at rlSkin.cpp:204, 228, 238). A fixed Hammersley quadrature
    replaces the sample-count-dependent running mean."""
    acc = jnp.zeros_like(wo.z)
    for i in range(n):
        m = sample_vndf(
            wo, params.alpha_x, params.alpha_y, (i + 0.5) / n,
            _VDC16[i % len(_VDC16)],
        )
        wi = vec3.reflect(wo, m)
        acc = acc + fresnel_dielectric(wi, m, params.ior_in, params.ior_out)
    return acc / n


def eval_brdf(params: GGXParams, wo, wi):
    """Reflectance * cos(theta_i), the quantity the host integrator consumes
    (GgxSamplerT::evalBrdf -> evalReflectance, rlGgx.h:110-119, 158-165)."""
    aos = not isinstance(wo, V3)
    if aos:
        wo, wi = v3(wo), v3(wi)
    valid = vec3.dot(wi, wi) > 1e-12
    refl = reflection_term(params, wo, wi) * wi.z
    f = _color_v3(params.spec_color) * jnp.where(valid, refl, 0.0)
    return f.aos() if aos else f


def pdf(params: GGXParams, wo, wi) -> jnp.ndarray:
    """PDF of `sample` for MIS (rlGgx.h:121-127)."""
    if not isinstance(wo, V3):
        wo, wi = v3(wo), v3(wi)
    h = vec3.normalize(wo + wi)
    return vndf_pdf(params, wo, h)


def sample_refract(params: GGXParams, wo, rx, ry):
    """One rough-refraction sample: returns (wi, weight, tir_mask).

    Matches integrateRefract's per-sample logic (rlGgx.h:228-243): draw a
    microfacet normal from the VNDF, refract (or mirror-reflect on TIR), and
    weight by Walter Eq.41.
    """
    aos = not isinstance(wo, V3)
    if aos:
        wo = v3(wo)
    m = sample_vndf(wo, params.alpha_x, params.alpha_y, rx, ry)
    wi_refr, tir = refract_direction(m, wo, params.ior_in, params.ior_out)
    wi_refl = vec3.reflect(wo, m)
    wi = vec3.where(tir, wi_refl, wi_refr)
    w = bsdf_sample_weight(params, wo, wi, m)
    return (wi.aos(), w, tir) if aos else (wi, w, tir)


def fresnel_avg_normal(params: GGXParams) -> jnp.ndarray:
    """Fresnel at normal incidence: F0 = ((eta-1)/(eta+1))^2."""
    eta = params.ior_out / params.ior_in
    return ((eta - 1.0) / (eta + 1.0)) ** 2
