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

Directions/colors are channel-split V3 triples in the hot path (see
core/vec3.py for why: (M, 3) arrays pad 43x on TPU); every public function
also accepts plain (..., 3) arrays and then returns arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import vec3
from ..core.vec3 import V3, v3
from .ggx import sample_slope  # noqa: F401  (re-export for parity tests)

EPS = 1e-7
INV_PI = 1.0 / jnp.pi
TWO_PI = 2.0 * jnp.pi


def _c(col) -> V3:
    """Color field -> V3 (accepts legacy (..., 3) arrays)."""
    return col if isinstance(col, V3) else v3(jnp.asarray(col, jnp.float32))


class DisneyParams(NamedTuple):
    """Precomputed per-shading-point Disney parameters (ctor at
    rlDisney.cpp:155-192). All fields broadcast over batch dims; color
    fields may be (..., 3) arrays or V3 triples."""

    base_color: object           # (..., 3) or V3
    roughness: jnp.ndarray       # (...,) raw artist roughness
    subsurface: jnp.ndarray
    metallic: jnp.ndarray
    sheen_color: object          # (..., 3) or V3, premultiplied by sheen weight
    spec_f0: object              # (..., 3) or V3
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
    f = lambda x: jnp.asarray(x, jnp.float32)
    aos = not isinstance(base_color, V3)
    base = _c(base_color)
    roughness = f(roughness)
    subsurface, metallic, specular_tint = f(subsurface), f(metallic), f(specular_tint)
    sheen, sheen_tint, anisotropic = f(sheen), f(sheen_tint), f(anisotropic)
    clearcoat, clearcoat_gloss = f(clearcoat), f(clearcoat_gloss)
    # Normal-incidence reflectance remap: specular in [0,1] -> F0 in [0,0.08]
    specular = f(specular) * 0.08

    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    r2 = roughness * roughness
    alpha_x = jnp.maximum(1e-2, r2 / aspect)
    alpha_y = jnp.maximum(1e-2, r2 * aspect)

    lum = vec3.luminance(base)
    inv_lum = 1.0 / jnp.maximum(lum, 1e-12)
    tint = vec3.where(lum > 0.0, base * inv_lum, 1.0)
    # lerp(specular_tint, white, tint) then * specular
    metallic_color = (1.0 + (tint - 1.0) * specular_tint) * specular
    spec_f0 = metallic_color + (base - metallic_color) * metallic
    sheen_color = (1.0 + (tint - 1.0) * sheen_tint) * sheen

    if aos:
        base, spec_f0, sheen_color = base.aos(), spec_f0.aos(), sheen_color.aos()
    return DisneyParams(
        base_color=base,
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
    alpha = 0.1 + (0.001 - 0.1) * params.clearcoat_gloss
    a2 = alpha * alpha
    denom = jnp.log(a2) * (1.0 + (a2 - 1.0) * mdotn2)
    return (a2 - 1.0) * INV_PI / denom


def d_gtr2_aniso(params: DisneyParams, m, mdotn2) -> jnp.ndarray:
    if not isinstance(m, V3):
        m = v3(m)
    t = (m.x / params.alpha_x) ** 2 + (m.y / params.alpha_y) ** 2 + mdotn2
    denom = params.alpha_x * params.alpha_y * t * t
    return INV_PI / jnp.maximum(denom, 1e-20)


def smith_g_over_2ndotv(ndotv, alpha_g) -> jnp.ndarray:
    """Walter's G1 divided by 2*NdotV (rlDisney.cpp:570-577)."""
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / jnp.maximum(ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)), 1e-12)


def eval_diffuse(params: DisneyParams, wo, wi):
    """Disney diffuse + HK flat subsurface, WITHOUT cos (rlDisney.cpp:199-236)."""
    aos = not isinstance(wo, V3)
    if aos:
        wo, wi = v3(wo), v3(wi)
    ldotn = wi.z
    vdotn = wo.z
    h = vec3.normalize(wi + wo)
    ldoth = vec3.dot(wi, h)
    # NOTE: the reference computes 'NdotH' as dot(viewDir, H) (rlDisney.cpp:210)
    # and early-outs on it; we keep that exact gate for parity.
    ndoth = vec3.dot(wo, h)
    valid = (ldotn > EPS) & (vdotn > EPS) & (ndoth > EPS) & (ldoth > EPS)

    ldoth2 = ldoth * ldoth
    fl = _schlick5(ldotn)
    fv = _schlick5(vdotn)
    f90 = 0.5 + 2.0 * params.roughness * ldoth2
    diffuse_factor = (1.0 + (f90 - 1.0) * fl) * (1.0 + (f90 - 1.0) * fv)

    fss90 = params.roughness * ldoth2
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss_factor = 1.25 * (
        fss * (1.0 / jnp.maximum(ldotn + vdotn, 1e-12) - 0.5) + 0.5
    )

    factor = diffuse_factor + (ss_factor - diffuse_factor) * params.subsurface
    scale = jnp.where(valid, INV_PI * factor * (1.0 - params.metallic), 0.0)
    f = _c(params.base_color) * scale
    return f.aos() if aos else f


def eval_specular(params: DisneyParams, wo, wi, with_clearcoat: bool = True):
    """Combined GTR2-aniso + clearcoat + sheen, WITHOUT cos
    (rlDisney.cpp:318-356). `with_clearcoat=False` is a static
    specialization that skips the GTR1 terms (valid when every shading
    point has clearcoat == 0)."""
    aos = not isinstance(wo, V3)
    if aos:
        wo, wi = v3(wo), v3(wi)
    ldotn = wi.z
    vdotn = wo.z
    m = vec3.normalize(wi + wo)
    ldotm = vec3.dot(wi, m)
    ndotm = m.z
    valid = (ldotn > EPS) & (vdotn > EPS) & (ndotm > EPS) & (ldotm > EPS)

    ndotm2 = ndotm * ndotm
    ds = d_gtr2_aniso(params, m, ndotm2)
    fh = _schlick5(ldotm)
    spec_f0 = _c(params.spec_f0)
    fs = spec_f0 + (1.0 - spec_f0) * fh
    gs = smith_g_over_2ndotv(ldotn, params.spec_roughness) * smith_g_over_2ndotv(
        vdotn, params.spec_roughness
    )

    fsheen = _c(params.sheen_color) * (fh * (1.0 - params.metallic))

    f = fs * (ds * gs) + fsheen
    if with_clearcoat:
        clearcoat_f0 = 0.04
        clearcoat_rough = 0.25
        dr = d_gtr1(params, ndotm2)
        fr = clearcoat_f0 + (1.0 - clearcoat_f0) * fh
        gr = smith_g_over_2ndotv(ldotn, clearcoat_rough) * smith_g_over_2ndotv(
            vdotn, clearcoat_rough
        )
        f = f + params.clearcoat * dr * fr * gr
    f = vec3.where(valid, f, 0.0)
    return f.aos() if aos else f


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def sample_diffuse(params: DisneyParams, wo, rx, ry):
    from . import orennayar

    if isinstance(wo, V3):
        return orennayar.sample_v(None, None, rx, ry)
    from ..core.vecmath import cosine_sample_hemisphere

    del params, wo
    return cosine_sample_hemisphere(rx, ry)


def pdf_diffuse(params: DisneyParams, wo, wi) -> jnp.ndarray:
    del params, wo
    z = wi.z if isinstance(wi, V3) else wi[..., 2]
    return jnp.maximum(1e-4, z * INV_PI)


def _sample_gtr1(params: DisneyParams, rx, ry) -> V3:
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
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


def _sample_gtr2_aniso_vndf(params: DisneyParams, wo: V3, rx, ry) -> V3:
    """GTR2 anisotropic visible-normal sample (rlDisney.cpp:467-502); the
    same trig-free slope-space machinery as the GGX kernel."""
    from .ggx import sample_vndf

    return sample_vndf(wo, params.alpha_x, params.alpha_y, rx, ry)


def sample_specular(params: DisneyParams, wo, rx, ry,
                    with_clearcoat: bool = True):
    """Lobe-mixture specular sample (rlDisney.cpp:367-390): pick GTR2-aniso
    VNDF with weight 1/(clearcoat+1) else GTR1, reflect about the sampled
    normal. Returns the zero vector for below-horizon normals, matching the
    reference's rejection."""
    aos = not isinstance(wo, V3)
    if aos:
        wo = v3(wo)
    if not with_clearcoat:
        m = _sample_gtr2_aniso_vndf(params, wo, rx, ry)
        wi = vec3.where(m.z < 0.0, 0.0, vec3.reflect(wo, m))
        return wi.aos() if aos else wi
    gtr2_w = 1.0 / (params.clearcoat + 1.0)
    use_gtr2 = rx < gtr2_w
    rx2 = jnp.where(
        use_gtr2,
        rx / jnp.maximum(gtr2_w, 1e-12),
        (rx - gtr2_w) / jnp.maximum(1.0 - gtr2_w, 1e-12),
    )
    m2 = _sample_gtr2_aniso_vndf(params, wo, rx2, ry)
    m1 = _sample_gtr1(params, rx2, ry)
    m = vec3.where(use_gtr2, m2, m1)
    wi = vec3.where(m.z < 0.0, 0.0, vec3.reflect(wo, m))
    return wi.aos() if aos else wi


def pdf_specular(params: DisneyParams, wo, wi, with_clearcoat: bool = True) -> jnp.ndarray:
    """Mixture PDF matching sample_specular (role of rlDisney.cpp:520-543).

    The GTR2 branch uses the EXACT anisotropic Smith G1 so the pdf equals the
    slope-space sampler's true density (the reference approximates G1 with
    smithG_GGX evaluated at I.M, which mis-normalizes at grazing angles); the
    GTR1 branch is the half-vector-NDF Jacobian form, as in the reference.
    """
    from .ggx import smith_g1_aniso

    if not isinstance(wo, V3):
        wo, wi = v3(wo), v3(wi)
    m = vec3.normalize(wi + wo)
    idotm = jnp.abs(vec3.dot(wi, m))
    mdotn = m.z
    mdotn2 = mdotn * mdotn
    vdotn = jnp.maximum(1e-4, wo.z)
    p_gtr2 = (
        d_gtr2_aniso(params, m, mdotn2)
        * smith_g1_aniso(wo, m, params.alpha_x, params.alpha_y)
        / vdotn
    )
    if with_clearcoat:
        cc_w = params.clearcoat / (params.clearcoat + 1.0)
        p_gtr1 = d_gtr1(params, mdotn2) * jnp.abs(mdotn) / jnp.maximum(idotm, 1e-12)
        d_mix = p_gtr2 + (p_gtr1 - p_gtr2) * cc_w
    else:
        d_mix = p_gtr2
    return jnp.where(mdotn < 0.0, 0.0, d_mix * 0.25)


# f*cos wrappers (Arnold evalBrdf convention, rlDisney.cpp:120-137)

def eval_diffuse_cos(params: DisneyParams, wo, wi):
    if isinstance(wo, V3):
        return eval_diffuse(params, wo, wi) * wi.z
    ndotl = wi[..., 2]
    return eval_diffuse(params, wo, wi) * ndotl[..., None]


def eval_specular_cos(params: DisneyParams, wo, wi, with_clearcoat: bool = True):
    if isinstance(wo, V3):
        return eval_specular(params, wo, wi, with_clearcoat) * wi.z
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
