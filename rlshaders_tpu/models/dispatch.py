"""Batched surface-shader evaluation with material-type dispatch.

The TPU-native equivalent of the reference's shader nodes' `shader_evaluate`
(rlGgx.cpp:248-327, rlDisney.cpp:677-729, rlSkin.cpp:165-256) plus the
Arnold `standard` shader the support geometry uses (SURVEY.md section 2.4).

A wavefront of hits carries gathered per-hit material rows; every lobe
evaluator computes all material models and masks by type — material counts
are tiny (<=8 per scene) and the evaluations fuse into one kernel under XLA,
so masked evaluation beats gather/scatter regrouping on TPU.

Lobe contract (local frame, +z = forward-facing shading normal):
  diffuse:  f_cos (3,), pdf   — Oren-Nayar / Disney diffuse, cosine sampled
  specular: f_cos (3,), pdf   — GGX VNDF / Disney GTR mixture / skin 2-lobe
  refract:  sample-only       — GGX rough refraction (Walter Eq.41 weights)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bsdf import beckmann, disney, ggx, orennayar
from ..core import vec3
from ..core.vec3 import V3, v3
from ..core.vecmath import dot, normalize
from ..scene.build import (
    MAT_DISNEY,
    MAT_GGX,
    MAT_SKIN,
    MAT_STANDARD,
    Materials,
)
from ..scene.texture import (
    TextureStack,
    compute_lod,
    sample_bilinear,
    sample_smart_bicubic,
)


class MatG(NamedTuple):
    """Per-hit gathered material parameters + precomputed lobe params."""

    mtype: jnp.ndarray
    diffuse_color: jnp.ndarray    # (..., 3) full diffuse albedo (kd*color*tex)
    diffuse_roughness: jnp.ndarray
    spec_weight: jnp.ndarray      # (..., 3) specular lobe color multiplier
    spec_fresnel_mode: jnp.ndarray  # 0=dielectric ior, 1=Schlick ksn, 2=none
    spec_ksn: jnp.ndarray
    spec_dist: jnp.ndarray        # 0=GGX, 1=Beckmann (standard cook_torrance)
    ggx: ggx.GGXParams            # GGX lobe (rlGgx / standard / skin specular)
    ggx2: ggx.GGXParams           # skin sheen lobe
    spec2_weight: jnp.ndarray     # (..., 3) sheen lobe multiplier (skin)
    skin_spec_w: jnp.ndarray      # scalar specular_weight (rlSkin layering)
    skin_sheen_w: jnp.ndarray     # scalar sheen_weight (rlSkin layering)
    sheen_layer: jnp.ndarray      # 1 - avgFresnel(sheen)*sheen_weight; 1.0
                                  # until skin_layer_fields fills it per view
    dsy: disney.DisneyParams
    kt_color: jnp.ndarray         # (..., 3) transmission color (kt*color)
    opacity: jnp.ndarray          # (..., 3)
    emission: jnp.ndarray         # (..., 3)
    indirect_diffuse_scale: jnp.ndarray
    indirect_specular_scale: jnp.ndarray
    sss_color: jnp.ndarray
    sss_weight: jnp.ndarray
    sss_dist: jnp.ndarray
    cavity_fadeout: jnp.ndarray
    has_diffuse: jnp.ndarray      # bool masks
    has_spec: jnp.ndarray
    has_refract: jnp.ndarray


def _degamma(c: V3, gamma: float) -> V3:
    """texture_gamma decode applied AFTER filtering: textures are stored and
    filtered in STORAGE space (matching Arnold/.tx, whose mips and bicubic
    taps average pre-decode values), then linearized here. Filtering in
    linear space instead inflates every dark/bright texel mixture
    (E[x^g] > E[x]^g) — measured +0.03..0.04 luminance bias across the
    golden backdrop's digit texture at mip scale."""
    if gamma == 1.0:
        return c
    return V3(
        jnp.power(jnp.maximum(c.x, 0.0), gamma),
        jnp.power(jnp.maximum(c.y, 0.0), gamma),
        jnp.power(jnp.maximum(c.z, 0.0), gamma),
    )


def _proj_uv_scale_table(proj_inv: jnp.ndarray) -> jnp.ndarray:
    """Per-MATERIAL-TABLE UV-per-world scale of a planar projection:
    local = p @ P; uv = (local+1)/2, so duv/dp = |P column| / 2 (mean of
    the two uv axes). Computed on the tiny (T, 4, 4) table, then gathered
    per hit as a scalar — no (M, 4, 4) matrices in the batch."""
    c0 = jnp.linalg.norm(proj_inv[..., :3, 0], axis=-1)
    c1 = jnp.linalg.norm(proj_inv[..., :3, 1], axis=-1)
    return 0.25 * (c0 + c1)


def _proj_xy(proj_inv_table: jnp.ndarray, mat_id: jnp.ndarray, p: V3):
    """Channel-split planar projection: (local_x, local_y) of
    p @ inv(placement) via 8 scalar-entry gathers from the (T, 4, 4) table
    (the (M, 4, 4) gather + einsum pads 64x on TPU)."""
    def e(i, j):
        return proj_inv_table[:, i, j][mat_id]

    lx = p.x * e(0, 0) + p.y * e(1, 0) + p.z * e(2, 0) + e(3, 0)
    ly = p.x * e(0, 1) + p.y * e(1, 1) + p.z * e(2, 1) + e(3, 1)
    return lx, ly


def gather(
    mats: Materials,
    tex: TextureStack,
    mat_id: jnp.ndarray,
    uv: jnp.ndarray,
    entering: jnp.ndarray,
    p: jnp.ndarray | None = None,
    fp: jnp.ndarray | None = None,
    fp_uv: jnp.ndarray | None = None,
    lod_bias: float = 0.0,
    tex_gamma: float = 1.0,
    diffuse_ray: bool = False,
) -> MatG:
    """Gather material rows for a hit batch and precompute lobe parameters.

    `p` (world hit position) feeds planar texture projections (MayaProjection
    planar: uv from the placement-matrix local frame). `fp` / `fp_uv` are the
    ray-cone footprint (world / UV space) driving mip LOD selection — the
    Arnold smart_bicubic minification path.

    Returns a V3-form MatG: every color field is a channel-split V3
    (core/vec3.py), ready for the flat lobe evaluators. Unused (M, ...)
    gathers from the tree_map are dead-code-eliminated by XLA.
    """
    g = jax.tree_util.tree_map(lambda a: a[mat_id], mats)
    mtype = g.mtype
    pvv = None if p is None else (p if isinstance(p, V3) else v3(p))

    in_coverage = jnp.ones(mat_id.shape, bool)
    is_proj = jnp.zeros(mat_id.shape, bool)
    if p is not None:
        # planar projection: local = p @ inv(placement); uv = (local+1)/2;
        # outside the unit square: proj==2 (`wrap on`) tiles the image,
        # proj==1 yields the projection's defaultColor
        lx, ly = _proj_xy(mats.kd_proj_inv, mat_id, pvv)
        proj_uv = jnp.stack([(lx + 1.0) * 0.5, (ly + 1.0) * 0.5], axis=-1)
        is_proj = g.kd_proj >= 1
        wrap = g.kd_proj == 2
        uv = jnp.where(is_proj[..., None], proj_uv, uv)
        in_coverage = ~is_proj | wrap | (
            (jnp.abs(lx) <= 1.0) & (jnp.abs(ly) <= 1.0)
        )
    lod = None
    if fp_uv is not None:
        fpu = fp_uv
        if p is not None and fp is not None:
            kd_scale = _proj_uv_scale_table(mats.kd_proj_inv)[mat_id]
            fpu = jnp.where(is_proj, fp * kd_scale, fp_uv)
        lod = compute_lod(tex, g.kd_tex, fpu, lod_bias)
    tex_store = sample_smart_bicubic(tex, g.kd_tex, uv, lod)
    # Maya file-node `invert` applies in STORAGE space, BEFORE the
    # texture_gamma decode (measured against the goldens' logo glyph:
    # (1-c_s)^2.2 + offset = 1.736, not 2 - c_lin = 1.99; scene/build.py
    # kd_tex_invs). Inversion commutes with the storage-space filtering.
    inv = g.kd_tex_invs
    tex_store = vec3.where(inv, 1.0 - tex_store, tex_store)
    tex_raw = _degamma(tex_store, tex_gamma)
    # Maya file-node color balance: gain/offset in linear space after the
    # decode (the r2 backdrop calibration path, unchanged for invert-off).
    tex_color = tex_raw * v3(g.kd_tex_gain) + v3(g.kd_tex_offset)
    tex_color = vec3.where(in_coverage, tex_color, v3(g.kd_proj_default))
    tex_color = vec3.where(g.kd_tex >= 0, tex_color, 1.0)
    base_color = v3(g.kd_color) * tex_color

    is_disney = mtype == MAT_DISNEY
    is_skin = mtype == MAT_SKIN
    is_ggx = mtype == MAT_GGX
    is_standard = mtype == MAT_STANDARD

    # Diffuse lobe color:
    #  rlGgx/standard: Kd * Kd_color (reference rlGgx.cpp:278-279)
    #  disney: handled inside the Disney diffuse term (base_color there)
    #  skin: diffuse-ray fallback = sss_color * sss_weight (rlSss.h:172-186)
    diffuse_color = vec3.where(
        is_disney,
        1.0,
        vec3.where(
            is_skin,
            v3(g.sss_color) * g.sss_weight,
            base_color * g.kd,
        ),
    )

    ks = g.ks
    if p is not None:
        # scalar (Ks) texture input: Maya exposes LUMINANCE as the alpha of
        # alpha-less files; outside a projection's coverage alpha is 0
        klx, kly = _proj_xy(mats.ks_proj_inv, mat_id, pvv)
        kuv = jnp.where(
            (g.ks_proj >= 1)[..., None],
            jnp.stack([(klx + 1.0) * 0.5, (kly + 1.0) * 0.5], axis=-1),
            uv,
        )
        k_cov = (g.ks_proj != 1) | (
            (jnp.abs(klx) <= 1.0) & (jnp.abs(kly) <= 1.0)
        )
        k_lod = None
        if fp is not None:
            k_fpu = fp * _proj_uv_scale_table(mats.ks_proj_inv)[mat_id]
            if fp_uv is not None:
                k_fpu = jnp.where(g.ks_proj >= 1, k_fpu, fp_uv)
            k_lod = compute_lod(tex, g.ks_tex, k_fpu, lod_bias)
        k_rgb = _degamma(sample_smart_bicubic(tex, g.ks_tex, kuv, k_lod),
                         tex_gamma)
        k_alpha = jnp.clip(
            0.212671 * k_rgb.x + 0.71516 * k_rgb.y + 0.072169 * k_rgb.z,
            0.0, 1.0,
        )
        k_alpha = jnp.where(k_cov, k_alpha, 0.0)
        ks = jnp.where(g.ks_tex >= 0, g.ks * k_alpha, g.ks)

    spec_weight = vec3.where(
        is_skin,
        v3(g.skin_spec_color) * g.skin_spec_weight,
        v3(g.ks_color) * ks,
    )
    if diffuse_ray:
        # Arnold standard with enable_glossy_caustics off (the Arnold 4
        # default) kills the WHOLE specular response on diffuse rays — any
        # specular event on a diffuse path is a caustic. The rl* plugins
        # carry no such gate (rlGgx.cpp light loop runs on every ray type).
        spec_weight = vec3.where(
            is_standard & ~g.glossy_caustics, 0.0, spec_weight
        )
    spec2_weight = v3(g.skin_sheen_color) * g.skin_sheen_weight

    ggx_rough = jnp.where(is_skin, g.skin_spec_roughness, g.spec_roughness)
    # NOTE: ior < 1 is legal and used by the testsuite (case 0003 sets 0.47):
    # the dielectric Fresnel then hits TIR over most angles, i.e. a
    # near-mirror — the reference clamps only at 1e-4 (rlGgx.h:139)
    ggx_ior = jnp.where(is_skin, g.skin_spec_ior, jnp.maximum(g.ior, 1e-4))
    ggx_aniso = jnp.where(is_skin, 0.0, g.spec_aniso)
    ggx_p = ggx.make_params(_ones3(), ggx_rough, ggx_ior, ggx_aniso, entering)
    ggx2_p = ggx.make_params(
        _ones3(), g.skin_sheen_roughness, g.skin_sheen_ior, 0.0, entering
    )

    dsy_p = disney.make_params(
        base_color=base_color,
        subsurface=g.subsurface,
        metallic=g.metallic,
        specular=g.specular,
        specular_tint=g.specular_tint,
        roughness=g.spec_roughness,
        anisotropic=g.spec_aniso,
        sheen=g.sheen,
        sheen_tint=g.sheen_tint,
        clearcoat=g.clearcoat,
        clearcoat_gloss=g.clearcoat_gloss,
    )

    kt_color = v3(g.kt_color) * g.kt
    eps = 1e-5

    def _absmax(c: V3):
        return jnp.maximum(jnp.abs(c.x), jnp.maximum(jnp.abs(c.y), jnp.abs(c.z)))

    has_diffuse = _absmax(diffuse_color) > eps
    has_diffuse = has_diffuse | is_disney  # disney diffuse from base_color
    has_spec = (_absmax(spec_weight) > eps) | is_disney | (
        is_skin & (_absmax(spec2_weight) > eps)
    )
    has_refract = _absmax(kt_color) > eps

    return MatG(
        mtype=mtype,
        diffuse_color=diffuse_color,
        diffuse_roughness=g.diffuse_roughness,
        spec_weight=spec_weight,
        spec_fresnel_mode=g.spec_fresnel_mode,
        spec_ksn=g.spec_ksn,
        spec_dist=g.spec_dist,
        ggx=ggx_p,
        ggx2=ggx2_p,
        spec2_weight=spec2_weight,
        skin_spec_w=jnp.where(is_skin, g.skin_spec_weight, 0.0),
        skin_sheen_w=jnp.where(is_skin, g.skin_sheen_weight, 0.0),
        sheen_layer=jnp.ones_like(g.skin_spec_weight),
        dsy=dsy_p,
        kt_color=kt_color,
        opacity=v3(g.opacity),
        emission=v3(g.emission),
        indirect_diffuse_scale=g.indirect_diffuse_scale,
        indirect_specular_scale=g.indirect_specular_scale,
        sss_color=v3(g.sss_color),
        sss_weight=g.sss_weight,
        sss_dist=v3(g.sss_dist),
        cavity_fadeout=g.cavity_fadeout,
        has_diffuse=has_diffuse,
        has_spec=has_spec,
        has_refract=has_refract,
    )


def apply_bump(
    mats: Materials,
    tex: TextureStack,
    mat_id: jnp.ndarray,
    p: jnp.ndarray,
    ns: jnp.ndarray,
    fp: jnp.ndarray | None = None,
    eps_min: float = 5e-3,
    tex_gamma: float = 1.0,
) -> jnp.ndarray:
    """Perturb shading normals by a height map (the bump3d node): finite
    differences of the (projected) texture's luminance along two surface
    tangents. Returns the bumped normal; identity where no bump is bound.

    `fp` is the world-space ray-cone footprint at the hit: both the
    differencing step and the texture LOD are tied to it (Arnold's bump
    derivatives ride the dPdx/dPdy shading differentials), which band-limits
    the height field to the pixel scale — unfiltered full-res taps with a
    fixed tiny eps produce hard aliased embossing and, where the projection
    hits the surface at grazing angles (the cup rim in test_geo), large
    coherent dark patches the reference doesn't show.
    Channel-split throughout; `p`/`ns` are (N, 3) (trace-boundary arrays)."""
    from ..core.frame import build_frame_polar_v

    g = jax.tree_util.tree_map(lambda a: a[mat_id], mats)
    has = g.bump_tex >= 0

    if fp is None:
        eps = jnp.full(mat_id.shape, eps_min, jnp.float32)
    else:
        eps = jnp.maximum(fp, eps_min)
    scale = _proj_uv_scale_table(mats.bump_proj_inv)[mat_id]
    lod = compute_lod(tex, g.bump_tex, eps * scale)

    def height(q: V3):
        lx, ly = _proj_xy(mats.bump_proj_inv, mat_id, q)
        buv = jnp.stack([(lx + 1.0) * 0.5, (ly + 1.0) * 0.5], axis=-1)
        cov = (g.bump_proj == 2) | (
            (jnp.abs(lx) <= 1.0) & (jnp.abs(ly) <= 1.0)
        )
        rgb = _degamma(sample_bilinear(tex, g.bump_tex, buv, lod), tex_gamma)
        lum = 0.212671 * rgb.x + 0.71516 * rgb.y + 0.072169 * rgb.z
        return jnp.where(cov, lum, 0.5)

    nsv = v3(ns)
    pv = v3(p)
    frame = build_frame_polar_v(nsv)
    h0 = height(pv)
    gu = (height(pv + frame.u * eps) - h0) / eps
    gv = (height(pv + frame.v * eps) - h0) / eps
    bumped = vec3.normalize(
        nsv - (frame.u * gu + frame.v * gv) * g.bump_height
    )
    return vec3.where(has, bumped, nsv).aos()


# ---------------------------------------------------------------------------
# Channel-split (V3) material view — the hot-path representation.
#
# `gather` produces AoS (N, 3) color fields straight from the table gathers;
# `to_v` converts them ONCE per batch into V3 channel triples so every lobe
# evaluation below runs rank-1 and pad-free on TPU (see core/vec3.py), and
# `tile_v` repeats the batch per light-grid column / BSDF sample as flat
# column-major chunks.
# ---------------------------------------------------------------------------

_MATG_COLOR_FIELDS = (
    "diffuse_color", "spec_weight", "spec2_weight", "kt_color", "opacity",
    "emission", "sss_color", "sss_dist",
)


def skin_layer_fields(m: MatG, wo: V3) -> MatG:
    """Fill rlSkin's view-dependent Fresnel energy layering (rlSkin.cpp:
    204, 228, 231, 238):

        sheenFresnel    = avgF(sheen lobe)    * sheen_weight
        specularFresnel = avgF(specular lobe) * specular_weight
        specular       *= (1 - sheenFresnel)           -> m.sheen_layer
        sssWeight      *= 1 - specularFresnel*(1 - sheenFresnel)

    where avgF is the view-averaged sampled Fresnel (getAvgReflectWeight,
    rlGgx.h:181-184; here ggx.avg_fresnel's fixed quadrature). The layered
    sss weight also scales the skin diffuse-ray fallback color, which the
    reference gets by multiplying integrateScatter's fallback result by the
    layered sssWeight (rlSss.h:172-186 x rlSkin.cpp:245). Call once per
    shading point with the LOCAL view direction; non-skin lanes unchanged."""
    is_skin = m.mtype == MAT_SKIN
    sheen_fres = jnp.clip(ggx.avg_fresnel(m.ggx2, wo) * m.skin_sheen_w,
                          0.0, 1.0)
    spec_fres = jnp.clip(ggx.avg_fresnel(m.ggx, wo) * m.skin_spec_w,
                         0.0, 1.0)
    sss_layer = 1.0 - spec_fres * (1.0 - sheen_fres)
    return m._replace(
        sheen_layer=jnp.where(is_skin, 1.0 - sheen_fres, 1.0),
        sss_weight=jnp.where(is_skin, m.sss_weight * sss_layer,
                             m.sss_weight),
        diffuse_color=vec3.where(is_skin, m.diffuse_color * sss_layer,
                                 m.diffuse_color),
    )


def to_v(m: MatG) -> MatG:
    """AoS MatG -> V3-form MatG (color fields become V3 triples). `gather`
    already returns the V3 form; this remains for AoS-constructed MatG."""
    if isinstance(m.diffuse_color, V3):
        return m
    repl = {f: v3(getattr(m, f)) for f in _MATG_COLOR_FIELDS}
    repl["ggx"] = m.ggx._replace(spec_color=_ones3())
    repl["ggx2"] = m.ggx2._replace(spec_color=_ones3())
    repl["dsy"] = m.dsy._replace(
        base_color=v3(m.dsy.base_color),
        sheen_color=v3(m.dsy.sheen_color),
        spec_f0=v3(m.dsy.spec_f0),
    )
    return m._replace(**repl)


def _ones3() -> V3:
    one = jnp.float32(1.0)
    return V3(one, one, one)


def tile_v(m: MatG, k: int) -> MatG:
    """Repeat a V3-form MatG k times along the batch axis (column-major
    chunks, matching vec3.tile's layout)."""
    if k == 1:
        return m

    def f(a):
        if a is None or not hasattr(a, "ndim") or a.ndim == 0:
            return a
        return jnp.tile(a, (k,) + (1,) * (a.ndim - 1))

    return jax.tree_util.tree_map(f, m)


# ---------------------------------------------------------------------------
# Diffuse lobe (V3-native: wo/wi are vec3.V3, m is a to_v() MatG)
# ---------------------------------------------------------------------------

def eval_diffuse(m: MatG, wo: V3, wi: V3):
    """(f*cos V3, pdf) for the diffuse lobe in the local frame."""
    on = orennayar.make_params(m.diffuse_roughness)
    f_on = m.diffuse_color * orennayar.eval_brdf(on, wo, wi)
    f_dsy = disney.eval_diffuse_cos(m.dsy, wo, wi)
    f = vec3.where(m.mtype == MAT_DISNEY, f_dsy, f_on)
    pdf = jnp.maximum(wi.z, 0.0) / jnp.pi
    return vec3.where(m.has_diffuse, f, 0.0), jnp.maximum(pdf, 1e-9)


def sample_diffuse(m: MatG, wo: V3, rx, ry) -> V3:
    del m, wo
    return orennayar.sample_v(None, None, rx, ry)


# ---------------------------------------------------------------------------
# Specular lobe
# ---------------------------------------------------------------------------

def eval_specular(m: MatG, wo: V3, wi: V3):
    """(f*cos V3, pdf) for the specular lobe stack in the local frame.

    Fresnel mode follows the material: dielectric IOR (rlGgx, rlGgx.h:249),
    Schlick with artist F0=Ksn or no Fresnel (Arnold standard's
    specular_Fresnel/Ksn semantics).
    """
    f_diel, gd = ggx.reflection_parts(m.ggx, wo, wi)
    h = vec3.normalize(wo + wi)
    f_schlick = m.spec_ksn + (1.0 - m.spec_ksn) * jnp.clip(
        1.0 - jnp.abs(vec3.dot(wi, h)), 0.0, 1.0
    ) ** 5
    fres = jnp.where(
        m.spec_fresnel_mode == 0,
        f_diel,
        jnp.where(m.spec_fresnel_mode == 1, f_schlick, 1.0),
    )
    # standard's default specular_brdf is cook_torrance: swap the microfacet
    # D/G (and the matching sampling pdf) for Beckmann, keeping the Fresnel
    # mode selection above
    is_beck = m.spec_dist == 1
    gd = jnp.where(is_beck, beckmann.gd(wo, wi, m.ggx.alpha_g), gd)
    valid = vec3.dot(wi, wi) > 1e-12
    refl = jnp.where(valid, fres * gd * wi.z, 0.0)
    f_ggx = m.spec_weight * refl
    p_ggx = jnp.where(
        is_beck,
        beckmann.pdf(wo, wi, m.ggx.alpha_g),
        ggx.pdf(m.ggx, wo, wi),
    )

    f_dsy = disney.eval_specular_cos(m.dsy, wo, wi)
    p_dsy = disney.pdf_specular(m.dsy, wo, wi)

    # skin: sheen lobe layered over specular with Fresnel energy accounting
    # (rlSkin.cpp:204-238). The layering factor is the VIEW-AVERAGED sheen
    # Fresnel (reference getAvgReflectWeight, rlGgx.h:181-184) filled into
    # m.sheen_layer by skin_layer_fields once per shading point; it stays
    # 1.0 (no attenuation) for non-skin lanes.
    refl2 = jnp.where(valid, ggx.reflection_term(m.ggx2, wo, wi) * wi.z, 0.0)
    f_sheen = m.spec2_weight * refl2
    sheen_w = vec3.maxc(m.spec2_weight)
    f_skin = f_sheen + f_ggx * m.sheen_layer
    p_sheen = ggx.pdf(m.ggx2, wo, wi)
    has_sheen = sheen_w > 1e-5
    p_skin = jnp.where(has_sheen, 0.5 * (p_ggx + p_sheen), p_ggx)

    is_disney = m.mtype == MAT_DISNEY
    is_skin = m.mtype == MAT_SKIN
    f = vec3.where(is_disney, f_dsy, vec3.where(is_skin, f_skin, f_ggx))
    pdf = jnp.where(is_disney, p_dsy, jnp.where(is_skin, p_skin, p_ggx))
    return vec3.where(m.has_spec, f, 0.0), jnp.maximum(pdf, 1e-9)


def sample_specular(m: MatG, wo: V3, rx, ry) -> V3:
    wi_dsy = disney.sample_specular(m.dsy, wo, rx, ry)
    # skin: pick sheen or specular lobe 50/50 when sheen is present. Both
    # branches remap rx to [0,1) so each lobe sees the full slope CDF
    # (mirrors disney.sample_specular's mixture remap); without sheen the
    # raw rx feeds the specular lobe untouched.
    sheen_w = vec3.maxc(m.spec2_weight)
    has_sheen = sheen_w > 1e-5
    use_sheen = (rx < 0.5) & has_sheen
    rx_spec = jnp.where(has_sheen, (rx - 0.5) * 2.0, rx)
    wi_ggx, _ = ggx.sample(m.ggx, wo, rx_spec, ry)
    wi_beck = beckmann.sample(wo, m.ggx.alpha_g, rx_spec, ry)
    wi_ggx = vec3.where(m.spec_dist == 1, wi_beck, wi_ggx)
    rx_sheen = jnp.where(use_sheen, rx * 2.0, rx)
    wi_sheen, _ = ggx.sample(m.ggx2, wo, rx_sheen, ry)
    wi_skin = vec3.where(use_sheen, wi_sheen, wi_ggx)

    is_disney = m.mtype == MAT_DISNEY
    is_skin = m.mtype == MAT_SKIN
    return vec3.where(is_disney, wi_dsy, vec3.where(is_skin, wi_skin, wi_ggx))


# ---------------------------------------------------------------------------
# Refraction lobe (rlGgx only in practice)
# ---------------------------------------------------------------------------

def sample_refract(m: MatG, wo: V3, rx, ry):
    """(wi V3, weight V3) rough-refraction sample (integrateRefract
    per-sample logic, rlGgx.h:228-243)."""
    wi, w, _tir = ggx.sample_refract(m.ggx, wo, rx, ry)
    weight = m.kt_color * w
    return wi, vec3.where(m.has_refract, weight, 0.0)
