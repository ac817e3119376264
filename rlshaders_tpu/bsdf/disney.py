"""Disney principled BRDF (Burley SIGGRAPH'12) — batched JAX.

TPU-native rebuild of the reference's DisneySampler (src/rlDisney.cpp:105-602):

* diffuse with Schlick-Fresnel retro-reflection F90 and the Hanrahan-Krueger
  flat-subsurface lerp,
* GTR2 anisotropic specular with VNDF slope sampling, metallic/tint F0 remap,
* GTR1 clearcoat (fixed F0 0.04, roughness 0.25 in G) with inverse-CDF
  sampling,
* Schlick sheen, lobe-weighted mixture sampling and the matching MIS PDFs.

Local shading frame (+z = N, +x = tangent). Directions point away from the
surface. Functions return f*cos like the Arnold evalBrdf convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vecmath import (
    cosine_sample_hemisphere,
    dot,
    lerp,
    luminance,
    normalize,
    reflect,
    spherical_direction,
)
from .ggx import sample_slope

EPS = 1e-7
INV_PI = 1.0 / jnp.pi
TWO_PI = 2.0 * jnp.pi


class DisneyParams(NamedTuple):
    """Precomputed per-shading-point Disney parameters (ctor at
    rlDisney.cpp:155-192). All fields broadcast over batch dims."""

    base_color: jnp.ndarray      # (..., 3)
    roughness: jnp.ndarray       # (...,) raw artist roughness
    subsurface: jnp.ndarray
    metallic: jnp.ndarray
    sheen_color: jnp.ndarray     # (..., 3) premultiplied by sheen weight
    spec_f0: jnp.ndarray         # (..., 3)
    clearcoat: jnp.ndarray       # (...,) premultiplied by 0.25
    clearcoat_gloss: jnp.ndarray
    alpha_x: jnp.ndarray
    alpha_y: jnp.ndarray
    spec_roughness: jnp.ndarray  # roughness^2 used by smith G


def make_params(
    base_color,
    subsurface=0.0,
    metallic=0.0,
    specular=0.0,
    specular_tint=0.0,
    roughness=0.0,
    anisotropic=0.0,
    sheen=0.0,
    sheen_tint=0.0,
    clearcoat=0.0,
    clearcoat_gloss=0.0,
) -> DisneyParams:
    base_color = jnp.asarray(base_color, jnp.float32)
    roughness = jnp.asarray(roughness, jnp.float32)
    f = lambda x: jnp.asarray(x, jnp.float32)
    subsurface, metallic, specular_tint = f(subsurface), f(metallic), f(specular_tint)
    sheen, sheen_tint, anisotropic = f(sheen), f(sheen_tint), f(anisotropic)
    clearcoat, clearcoat_gloss = f(clearcoat), f(clearcoat_gloss)
    # Normal-incidence reflectance remap: specular in [0,1] -> F0 in [0,0.08]
    specular = f(specular) * 0.08

    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    r2 = roughness * roughness
    alpha_x = jnp.maximum(1e-2, r2 / aspect)
    alpha_y = jnp.maximum(1e-2, r2 * aspect)

    lum = luminance(base_color)
    white = jnp.ones_like(base_color)
    tint = jnp.where(lum[..., None] > 0.0, base_color / jnp.maximum(lum[..., None], 1e-12), white)
    metallic_color = specular[..., None] * lerp(specular_tint[..., None], white, tint)
    spec_f0 = lerp(metallic[..., None], metallic_color, base_color)
    sheen_color = lerp(sheen_tint[..., None], white, tint) * sheen[..., None]

    return DisneyParams(
        base_color=base_color,
        roughness=roughness,
        subsurface=subsurface,
        metallic=metallic,
        sheen_color=sheen_color,
        spec_f0=spec_f0,
        clearcoat=clearcoat * 0.25,
        clearcoat_gloss=clearcoat_gloss,
        alpha_x=alpha_x,
        alpha_y=alpha_y,
        spec_roughness=r2,
    )


# ---------------------------------------------------------------------------
# Lobe terms
# ---------------------------------------------------------------------------

def expand_sample_axis(params: DisneyParams) -> DisneyParams:
    """Insert a broadcast sample axis after the batch axis on every field
    (scalar fields pass through — they broadcast already)."""
    import jax

    def f(a):
        if a.ndim == 0:
            return a
        return jnp.expand_dims(a, 1)

    return jax.tree_util.tree_map(f, params)


def _schlick5(x):
    return jnp.clip(1.0 - x, 0.0, 1.0) ** 5


def d_gtr1(params: DisneyParams, mdotn2) -> jnp.ndarray:
    """Clearcoat GTR1 NDF; alpha in [0.1, 0.001] by gloss (rlDisney.cpp:545-551)."""
    alpha = lerp(params.clearcoat_gloss, 0.1, 0.001)
    a2 = alpha * alpha
    denom = jnp.log(a2) * (1.0 + (a2 - 1.0) * mdotn2)
    return (a2 - 1.0) * INV_PI / denom


def d_gtr2_aniso(params: DisneyParams, m, mdotn2) -> jnp.ndarray:
    hdotu, hdotv = m[..., 0], m[..., 1]
    t = (hdotu / params.alpha_x) ** 2 + (hdotv / params.alpha_y) ** 2 + mdotn2
    denom = params.alpha_x * params.alpha_y * t * t
    return INV_PI / jnp.maximum(denom, 1e-20)


def smith_g_over_2ndotv(ndotv, alpha_g) -> jnp.ndarray:
    """Walter's G1 divided by 2*NdotV (rlDisney.cpp:570-577)."""
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / jnp.maximum(ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), 1e-12)


def eval_diffuse(params: DisneyParams, wo, wi) -> jnp.ndarray:
    """Disney diffuse + HK flat subsurface, WITHOUT cos (rlDisney.cpp:199-236).
    Returns (..., 3)."""
    ldotn = wi[..., 2]
    vdotn = wo[..., 2]
    h = normalize(wi + wo)
    ldoth = dot(wi, h)
    # NOTE: the reference computes 'NdotH' as dot(viewDir, H) (rlDisney.cpp:210)
    # and early-outs on it; we keep that exact gate for parity.
    ndoth = dot(wo, h)
    valid = (ldotn > EPS) & (vdotn > EPS) & (ndoth > EPS) & (ldoth > EPS)

    ldoth2 = ldoth * ldoth
    fl = _schlick5(ldotn)
    fv = _schlick5(vdotn)
    f90 = 0.5 + 2.0 * params.roughness * ldoth2
    diffuse_factor = lerp(fl, 1.0, f90) * lerp(fv, 1.0, f90)

    fss90 = params.roughness * ldoth2
    fss = lerp(fl, 1.0, fss90) * lerp(fv, 1.0, fss90)
    ss_factor = 1.25 * (
        fss * (1.0 / jnp.maximum(ldotn + vdotn, 1e-12) - 0.5) + 0.5
    )

    factor = lerp(params.subsurface, diffuse_factor, ss_factor)
    f = params.base_color * INV_PI * factor[..., None] * (1.0 - params.metallic)[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def eval_specular(params: DisneyParams, wo, wi, with_clearcoat: bool = True) -> jnp.ndarray:
    """Combined GTR2-aniso + clearcoat + sheen, WITHOUT cos
    (rlDisney.cpp:318-356). Returns (..., 3). `with_clearcoat=False` is a
    static specialization that skips the GTR1 terms (valid when every
    shading point has clearcoat == 0)."""
    ldotn = wi[..., 2]
    vdotn = wo[..., 2]
    m = normalize(wi + wo)
    ldotm = dot(wi, m)
    ndotm = m[..., 2]
    valid = (ldotn > EPS) & (vdotn > EPS) & (ndotm > EPS) & (ldotm > EPS)

    ndotm2 = ndotm * ndotm
    ds = d_gtr2_aniso(params, m, ndotm2)
    fh = _schlick5(ldotm)
    white = jnp.ones_like(params.spec_f0)
    fs = lerp(fh[..., None], params.spec_f0, white)
    gs = smith_g_over_2ndotv(ldotn, params.spec_roughness) * smith_g_over_2ndotv(
        vdotn, params.spec_roughness
    )

    fsheen = fh[..., None] * params.sheen_color * (1.0 - params.metallic)[..., None]

    f = (ds * gs)[..., None] * fs + fsheen
    if with_clearcoat:
        clearcoat_f0 = 0.04
        clearcoat_rough = 0.25
        dr = d_gtr1(params, ndotm2)
        fr = lerp(fh, clearcoat_f0, 1.0)
        gr = smith_g_over_2ndotv(ldotn, clearcoat_rough) * smith_g_over_2ndotv(
            vdotn, clearcoat_rough
        )
        f = f + (params.clearcoat * dr * fr * gr)[..., None]
    return jnp.where(valid[..., None], f, 0.0)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def sample_diffuse(params: DisneyParams, wo, rx, ry) -> jnp.ndarray:
    del params, wo
    return cosine_sample_hemisphere(rx, ry)


def pdf_diffuse(params: DisneyParams, wo, wi) -> jnp.ndarray:
    del params, wo
    return jnp.maximum(1e-4, wi[..., 2] * INV_PI)


def _sample_gtr1(params: DisneyParams, rx, ry) -> jnp.ndarray:
    """GTR1 inverse-CDF sample (rlDisney.cpp:393-404). NOTE: the reference
    uses the RAW roughness^2 here (mRoughness is raw in that scope).

    pow(a2, 1-ry) is evaluated as exp((1-ry)*log(a2)) so the log is hoisted
    per shading point instead of per sample."""
    phi = TWO_PI * rx
    a2 = params.roughness * params.roughness
    degenerate = jnp.abs(a2 - 1.0) < 1e-6
    safe_a2 = jnp.where(degenerate, 0.5, a2)
    log_a2 = jnp.log(jnp.maximum(safe_a2, 1e-20))
    pow_term = jnp.exp((1.0 - ry) * log_a2)
    cos_t = jnp.where(
        degenerate,
        jnp.sqrt(jnp.maximum(1.0 - ry, 0.0)),
        jnp.sqrt(jnp.clip((1.0 - pow_term) / (1.0 - safe_a2), 0.0, 1.0)),
    )
    return spherical_direction(cos_t, phi)


def _sample_gtr2_aniso_vndf(params: DisneyParams, wo, rx, ry) -> jnp.ndarray:
    """GTR2 anisotropic visible-normal sample (rlDisney.cpp:467-502); the
    same trig-free slope-space machinery as the GGX kernel."""
    from .ggx import sample_vndf

    return sample_vndf(wo, params.alpha_x, params.alpha_y, rx, ry)


def sample_specular(params: DisneyParams, wo, rx, ry,
                    with_clearcoat: bool = True) -> jnp.ndarray:
    """Lobe-mixture specular sample (rlDisney.cpp:367-390): pick GTR2-aniso
    VNDF with weight 1/(clearcoat+1) else GTR1, reflect about the sampled
    normal. Returns the zero vector for below-horizon normals, matching the
    reference's rejection."""
    if not with_clearcoat:
        m = _sample_gtr2_aniso_vndf(params, wo, rx, ry)
        below = m[..., 2] < 0.0
        wi = reflect(wo, m)
        return jnp.where(below[..., None], 0.0, wi)
    gtr2_w = 1.0 / (params.clearcoat + 1.0)
    use_gtr2 = rx < gtr2_w
    rx2 = jnp.where(
        use_gtr2,
        rx / jnp.maximum(gtr2_w, 1e-12),
        (rx - gtr2_w) / jnp.maximum(1.0 - gtr2_w, 1e-12),
    )
    m2 = _sample_gtr2_aniso_vndf(params, wo, rx2, ry)
    m1 = _sample_gtr1(params, rx2, ry)
    m = jnp.where(use_gtr2[..., None], m2, m1)
    below = m[..., 2] < 0.0
    wi = reflect(wo, m)
    return jnp.where(below[..., None], 0.0, wi)


def pdf_specular(params: DisneyParams, wo, wi, with_clearcoat: bool = True) -> jnp.ndarray:
    """Mixture PDF matching sample_specular (role of rlDisney.cpp:520-543).

    The GTR2 branch uses the EXACT anisotropic Smith G1 so the pdf equals the
    slope-space sampler's true density (the reference approximates G1 with
    smithG_GGX evaluated at I.M, which mis-normalizes at grazing angles); the
    GTR1 branch is the half-vector-NDF Jacobian form, as in the reference.
    """
    from .ggx import smith_g1_aniso

    m = normalize(wi + wo)
    idotm = jnp.abs(dot(wi, m))
    mdotn = m[..., 2]
    mdotn2 = mdotn * mdotn
    vdotn = jnp.maximum(1e-4, wo[..., 2])
    p_gtr2 = (
        d_gtr2_aniso(params, m, mdotn2)
        * smith_g1_aniso(wo, m, params.alpha_x, params.alpha_y)
        / vdotn
    )
    if with_clearcoat:
        cc_w = params.clearcoat / (params.clearcoat + 1.0)
        p_gtr1 = d_gtr1(params, mdotn2) * jnp.abs(mdotn) / jnp.maximum(idotm, 1e-12)
        d_mix = lerp(cc_w, p_gtr2, p_gtr1)
    else:
        d_mix = p_gtr2
    return jnp.where(mdotn < 0.0, 0.0, d_mix * 0.25)


# f*cos wrappers (Arnold evalBrdf convention, rlDisney.cpp:120-137)

def eval_diffuse_cos(params: DisneyParams, wo, wi) -> jnp.ndarray:
    ndotl = wi[..., 2]
    return eval_diffuse(params, wo, wi) * ndotl[..., None]


def eval_specular_cos(params: DisneyParams, wo, wi, with_clearcoat: bool = True) -> jnp.ndarray:
    ndotl = wi[..., 2]
    return eval_specular(params, wo, wi, with_clearcoat) * ndotl[..., None]


def has_clearcoat(params: DisneyParams) -> bool:
    """Host-side check for the static clearcoat specialization.

    Contract: CONCRETE params only — deciding a compile-time specialization
    from traced values is a bug, so a tracer raises instead of silently
    picking a branch."""
    import jax
    import numpy as np

    if isinstance(params.clearcoat, jax.core.Tracer):
        raise TypeError(
            "has_clearcoat() requires concrete clearcoat values; under a "
            "trace, pass the clearcoat flag in explicitly as a static."
        )
    return bool(np.any(np.asarray(params.clearcoat) > 0.0))
