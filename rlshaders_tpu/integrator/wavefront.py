"""Wavefront path-tracing integrator (staged, fused).

The TPU-native inversion of the reference's recursive callback architecture
(SURVEY.md section 7). The frame is rendered as a small number of FUSED
compiled programs per ray generation:

    gen_shade   = trace (Pallas) + surface/material prepare + shadow
                  occlusion (Pallas) + direct-light MIS reduce
    lobe_family = BSDF spawn + trace (Pallas) + analytic light pickup
    spec_direct = 1-sample BSDF-strategy direct light + occlusion (Pallas)

Each is a MODULE-LEVEL jitted function taking the scene as a device-array
pytree argument (`DeviceScene`) plus a hashable `SceneStatic` — so compiled
programs contain no embedded scene constants (fast compiles), upload scene
data exactly once (one device_put per build), and are REUSED across tiles,
renders, and scenes of identical table shapes (the whole shared-scene
testsuite compiles once). Host code only orchestrates the generation tree
(depth-gated recursion, rlGgx.cpp:151-154 semantics).

Light transport replicates the reference estimator:
* camera hit: direct light MIS loop (rlGgx.cpp:285-295) + indirect
  diffuse/glossy splitting with GI_*_samples^2 rays (rlGgx.cpp:307-323) +
  rough refraction (integrateRefract, rlGgx.h:205-246).
* secondary hits: direct light + depth-gated continuation families for the
  `standard` host shader (Arnold recursion), direct-only for the reference
  plugin materials (their indirect is camera-only: rlGgx.cpp:307 gate).
* area lights are "virtual geometry": BSDF rays pick up quad/disk emission
  analytically, balance-heuristic MIS against the light sampler; the skydome
  is picked up at ray escape (the two-strategy MIS of AiEvaluateLightSample).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import trace as tracemod
from ..core import rng, vec3
from ..core.frame import (
    Frame,
    build_frame_polar,
    build_frame_polar_v,
    to_local,
    to_local_v,
    to_world,
    to_world_v,
)
from ..core.vec3 import V3, v3
from ..core.vecmath import dot, normalize
from ..models import dispatch
from ..scene.build import (
    MAT_DISNEY,
    MAT_SKIN,
    MAT_STANDARD,
    Scene,
    VIS_CAMERA,
    VIS_DIFFUSE,
    VIS_GLOSSY,
    VIS_REFRACTED,
    VIS_SHADOW,
)
from . import camera as cameramod
from . import lights as lightsmod

RAY_EPS = 1e-3

# Transparent-shadow march depth: baked into the jitted tile program at
# import time (see _shadow_transmission). Read once here so a later env
# change cannot silently diverge from the compiled program, and validated
# so a bad value fails at import, not at trace time.
try:
    _SHADOW_HITS = int(os.environ.get("RLS_SHADOW_HITS", "4"))
except ValueError as e:
    raise ValueError(
        "RLS_SHADOW_HITS must be an integer (transparent-shadow march "
        "depth); got %r" % os.environ.get("RLS_SHADOW_HITS")
    ) from e
if _SHADOW_HITS < 1:
    raise ValueError("RLS_SHADOW_HITS must be >= 1; got %d" % _SHADOW_HITS)


class DeviceScene(NamedTuple):
    """The traced-argument scene: every leaf is a device array. Passed to
    each fused stage so XLA programs carry no scene constants."""

    geometry: "object"     # scene.build.Geometry
    materials: "object"    # scene.build.Materials
    quad_lights: "object"  # scene.build.QuadLights
    disk_lights: "object"  # scene.build.DiskLights
    sky_radiance: jnp.ndarray  # (3,)
    textures: "object"     # scene.texture.TextureStack
    accel: "object"        # accel.trace.Accel (BVH arrays + Pallas packing)
    tex_aniso_alpha: jnp.ndarray  # (1,) grazing-inflation exponent of the
    #                        texture footprint: fp *= max(cos^-alpha,
    #                        1/(8 cos)). 0.5 = isotropic geometric mean of
    #                        the ellipse axes (legacy); 0 = minor-axis
    #                        filtering with anisotropy capped at 8 (Arnold's
    #                        smart_bicubic sees per-pixel derivatives, i.e.
    #                        anisotropic: the digit-outline ghosting in the
    #                        r4 converged diff is the geo-mean over-blur)
    lod_bias: jnp.ndarray  # (1,) texture-minification calibration (traced so
    #                        RLS_LOD_BIAS sweeps reuse the compiled program;
    #                        shape (1,) NOT () — rank-0 jit params land in
    #                        host memory S(6) and cost a per-use DMA on the
    #                        axon backend, docs/perf.md)
    mis_nb_light: jnp.ndarray  # (1,) scale on the BSDF-strategy count the
    #                        LIGHT-side MIS weight competes against
    #                        (probe: Arnold-4 may balance each light sample
    #                        against 1 BSDF sample, not GI_*_samples^2 —
    #                        an inconsistent-count MIS double-counts the
    #                        strategy-overlap region, a bias the goldens
    #                        would bake in). 1.0 = consistent (ours).
    mis_nl_pickup: jnp.ndarray  # (1,) scale on the light-sample count the
    #                        BSDF-side pickup weight competes against at
    #                        camera level (the dual mismatch). 1.0 = ours.
    mis_renorm: jnp.ndarray  # (1,) 0..1 blend toward Arnold-4 valid-sample
    #                        renormalization of the BSDF-strategy estimator:
    #                        the host zeroes below-hemisphere evalSample
    #                        directions (rlGgx.h evalBrdf's AI_V3_ZERO guard
    #                        exists because Arnold passes them) and the
    #                        hypothesis (docs/fidelity.md r4) is that it
    #                        divides by the VALID-sample count, gaining
    #                        energy exactly where VNDF misses are common
    #                        (grazing-Fresnel content). Traced so the
    #                        base/variant probe shares one compiled program.


class SceneStatic(NamedTuple):
    """Hashable compile-time scene/render facts (static jit argument)."""

    quad_valid: tuple
    disk_valid: tuple
    quad_samples: tuple
    disk_samples: tuple
    quad_w_d: tuple        # per light: affect_diffuse * diffuse_weight
    quad_w_s: tuple
    disk_w_d: tuple
    disk_w_s: tuple
    sky_exists: bool
    sky_samples: int
    sky_w_d: float
    sky_w_s: float
    has_refract: bool
    has_skin: bool         # any SSS lobe (rlSkin or standard Ksss)
    has_skin_mat: bool     # a true rlSkin material (SSS on secondary rays)
    has_bump: bool
    has_transparent: bool
    nb_d: int              # camera-level BSDF-strategy counts for MIS
    nb_g: int
    tex_gamma: float       # texture_gamma: decode applied AFTER filtering
    #                        (textures are stored/filtered in STORAGE space)

    @staticmethod
    def of(scene: Scene) -> "SceneStatic":
        ql, dl, sky, o = (scene.quad_lights, scene.disk_lights, scene.sky,
                          scene.options)
        qad = np.asarray(ql.affect_diffuse, np.float32)
        qas = np.asarray(ql.affect_specular, np.float32)
        qdw = np.asarray(ql.diffuse_weight, np.float32)
        qsw = np.asarray(ql.specular_weight, np.float32)
        dad = np.asarray(dl.affect_diffuse, np.float32)
        das = np.asarray(dl.affect_specular, np.float32)
        has_refract = bool(np.any(np.asarray(scene.materials.kt) > 1e-5))
        return SceneStatic(
            quad_valid=tuple(bool(x) for x in np.asarray(ql.valid)),
            disk_valid=tuple(bool(x) for x in np.asarray(dl.valid)),
            quad_samples=tuple(int(x) for x in np.asarray(ql.samples)),
            disk_samples=tuple(int(x) for x in np.asarray(dl.samples)),
            quad_w_d=tuple(float(a * b) for a, b in zip(qad, qdw)),
            quad_w_s=tuple(float(a * b) for a, b in zip(qas, qsw)),
            disk_w_d=tuple(float(x) for x in dad),
            disk_w_s=tuple(float(x) for x in das),
            sky_exists=bool(scene.sky.exists),
            sky_samples=int(scene.sky.samples),
            sky_w_d=float(scene.sky.affect_diffuse),
            sky_w_s=float(scene.sky.affect_specular),
            has_refract=has_refract,
            # any SSS lobe: rlSkin, or a standard shader with Ksss > 0
            has_skin=bool(
                np.any(np.asarray(scene.materials.mtype) == MAT_SKIN)
                or np.any(np.asarray(scene.materials.sss_weight) > 1e-5)
            ),
            has_skin_mat=bool(
                np.any(np.asarray(scene.materials.mtype) == MAT_SKIN)
            ),
            has_bump=bool(np.any(np.asarray(scene.materials.bump_tex) >= 0)),
            has_transparent=bool(
                has_refract
                or np.any(np.asarray(scene.materials.opacity) < 1.0 - 1e-5)
            ),
            nb_d=(o.gi_diffuse_samples ** 2 if o.gi_diffuse_depth > 0 else 0),
            nb_g=(o.gi_glossy_samples ** 2 if o.gi_glossy_depth > 0 else 0),
            tex_gamma=float(o.texture_gamma),
        )


def device_scene(scene: Scene, accel) -> DeviceScene:
    """One device_put of the full SoA scene pytree (single upload)."""
    sky_rad = scene.sky.radiance if scene.sky.exists else jnp.zeros(3)
    return jax.device_put(DeviceScene(
        geometry=scene.geometry,
        materials=scene.materials,
        quad_lights=scene.quad_lights,
        disk_lights=scene.disk_lights,
        sky_radiance=jnp.asarray(sky_rad, jnp.float32),
        textures=scene.textures,
        accel=accel,
        # -0.5 calibrated against the goldens: our ray-cone footprint is the
        # cone DIAMETER, one level wider than the per-pixel derivative
        # Arnold's smart_bicubic sees; backdrop RMSE improves monotonically
        # 0 -> -0.5 and saturates past -0.75 (sweep4 log).
        lod_bias=jnp.full(
            (1,), float(os.environ.get("RLS_LOD_BIAS", "-0.5")), jnp.float32
        ),
        tex_aniso_alpha=jnp.full(
            (1,), float(os.environ.get("RLS_TEX_ANISO_ALPHA", "0.5")),
            jnp.float32,
        ),
        # Default ON (r5): replicates the Arnold-host valid-sample
        # renormalization the goldens bake in — measured recovery ordered
        # exactly by each lobe's below-horizon VNDF miss share (gold
        # +1.7%, metal +1.0%, diffuse ball ~0), no region harmed; with the
        # dome shadow-visibility fix the specular balls land within +-0.4%
        # of the goldens (docs/fidelity.md r5). RLS_MIS_RENORM=0 ablates.
        mis_renorm=jnp.full(
            (1,), float(os.environ.get("RLS_MIS_RENORM", "1.0")), jnp.float32
        ),
        mis_nb_light=jnp.full(
            (1,), float(os.environ.get("RLS_MIS_NB_LIGHT", "1.0")),
            jnp.float32,
        ),
        mis_nl_pickup=jnp.full(
            (1,), float(os.environ.get("RLS_MIS_NL_PICKUP", "1.0")),
            jnp.float32,
        ),
    ))


class Surface(NamedTuple):
    p: jnp.ndarray
    ng: jnp.ndarray
    ns: jnp.ndarray
    nf: jnp.ndarray
    uv: jnp.ndarray
    mat_id: jnp.ndarray
    mesh_id: jnp.ndarray
    tri: jnp.ndarray
    entering: jnp.ndarray
    valid: jnp.ndarray
    fp: jnp.ndarray      # (N,) world-space footprint diameter at the hit
    fp_uv: jnp.ndarray   # (N,) footprint mapped through the tri's UV density


def _surface(sc: DeviceScene, t, tri_in, uu, vv, o, d,
             base_fp=None, spread=None, ff_shade=False) -> Surface:
    g = sc.geometry
    tri = jnp.maximum(tri_in, 0)
    valid = tri_in >= 0
    # gathers produce (N, 3) AoS rows; convert once to V3 channels and keep
    # ALL math rank-1 (pad-free) from there
    e1 = v3(g.e1[tri])
    e2 = v3(g.e2[tri])
    ov = v3(o)
    dv = v3(d)
    p = ov + dv * t
    ng_un = vec3.cross(e1, e2)
    ng = vec3.normalize(ng_un)
    w = 1.0 - uu - vv
    ns = vec3.normalize(
        v3(g.n0[tri]) * w + v3(g.n1[tri]) * uu + v3(g.n2[tri]) * vv
    )
    uv0, uv1, uv2 = g.uv0[tri], g.uv1[tri], g.uv2[tri]
    uv = w[..., None] * uv0 + uu[..., None] * uv1 + vv[..., None] * uv2
    entering = vec3.dot(ng, dv) < 0.0
    # Faceforward the shading normal by its OWN side (ns·d), not the
    # geometric side: on coarsely-tessellated curved meshes the per-facet
    # ng·d sign flips facet-to-facet across grazing zones while the smooth
    # ns does not — flipping nf with the facet turns shading on/off per AA
    # sample and shreds grazing highlights into ±highlight-amplitude grain
    # (measured on golden 0003/0008: masked RMSE 0.025→0.041 / 0.034→0.056
    # with geometric flipping; the reference's smooth anisotropic highlight
    # confirms the host flips by the shading normal). RLS_FACEFORWARD=geom
    # is kept as an A/B calibration knob (carried in RenderConf so variants
    # retrace). Do NOT nudge straddle normals into the view hemisphere
    # either: near-zero cosines in the specular weights speckle grazing
    # highlights with fireflies (0003: 0.025→0.041 with a 1e-3 nudge).
    if ff_shade:
        sign = jnp.where(vec3.dot(ns, dv) < 0.0, 1.0, -1.0)
    else:
        sign = jnp.where(entering, 1.0, -1.0)
    nf = ns * sign

    # Ray-cone footprint for texture LOD (Arnold tracks dPdx/dPdy ray
    # differentials through sg; a cone is the batched equivalent): the
    # world footprint grows linearly with distance, inflated at grazing
    # incidence by 1/sqrt|cos| (geometric mean of the anisotropic ellipse
    # axes, trading alias vs blur for an isotropic mip lookup).
    if base_fp is None:
        base_fp = jnp.zeros_like(t)
    if spread is None:
        spread = jnp.zeros_like(t)
    tc = jnp.where(valid, t, 0.0)
    cosg = jnp.maximum(jnp.abs(vec3.dot(ng, dv)), 0.05)
    alpha = sc.tex_aniso_alpha[0]
    inflate = jnp.maximum(cosg ** (-alpha), 1.0 / (8.0 * cosg))
    fp = (base_fp + spread * tc) * inflate
    # per-triangle UV density: texels-per-world from the uv/world area ratio
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    area_uv = jnp.abs(duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0])
    area_w = vec3.length(ng_un)
    uv_density = jnp.sqrt(area_uv / jnp.maximum(area_w, 1e-20))
    return Surface(
        p=p.aos(), ng=ng.aos(), ns=ns.aos(), nf=nf.aos(), uv=uv,
        mat_id=g.mat_id[tri], mesh_id=g.mesh_id[tri],
        tri=jnp.where(valid, tri_in, -1),
        entering=entering, valid=valid,
        fp=fp, fp_uv=fp * uv_density,
    )


class SampleCtx(NamedTuple):
    """Per-lane sampler addressing for the camera-level generation: the flat
    pixel id and AA-sample index of every lane, plus a per-render salt. The
    Owen-Sobol draws (core/rng.sobol2_flat) key on (pixel, purpose, salt) and
    index on (aa * count + k), so a pixel's whole AA^2 * n^2 budget for each
    integral is ONE jointly-stratified (0,2) sequence — the host sampler's
    'sample counts multiply' behaviour. None at secondary hits (whose lanes
    are sample-tiled and whose integrands differ per lane)."""

    pix: jnp.ndarray   # (N,) int32 flat pixel index
    aa: jnp.ndarray    # (N,) int32 AA-sample index in [0, n_sub)
    salt: jnp.ndarray  # () uint32


# purpose ids for the per-(pixel, purpose) sobol streams; light columns add
# their light index
P_QUAD = 101 << 8
P_DISK = 301 << 8
P_SKY = 501 << 8
P_DIFFUSE = 601 << 8
P_GLOSSY = 602 << 8
P_REFRACT = 603 << 8
P_SSS = 604 << 8


class LightGrid(NamedTuple):
    """The light-sample grid for one shading batch, FLAT channel-split form:
    K columns x N rays stored column-major (column c = rows [c*N, (c+1)*N))
    so every field is rank-1 per channel — no (N, K, 3) tensors, which pad
    ~43x on TPU (core/vec3.py)."""

    wi: V3                # (K*N,) channels, shading point -> light
    dist: jnp.ndarray     # (K*N,)
    rad: V3               # (K*N,) channels
    pdf: jnp.ndarray      # (K*N,)
    w_d: jnp.ndarray      # (K,) per-column diffuse weight (affect/ns)
    w_s: jnp.ndarray      # (K,)
    nl: jnp.ndarray       # (K,) sample counts for MIS
    is_sky: jnp.ndarray   # (K,) 1.0 for skydome columns (separate MIS
                          # accounting: the depth-exhausted fallback picks
                          # up quad/disk emission but has no sky strategy)


def _light_grid(sc: DeviceScene, static: SceneStatic, pv: V3, nfv: V3, key,
                camera_level, include_sky=True, ctx: SampleCtx = None
                ) -> LightGrid:
    """Build the flat light grid: one chunk of N rows per (light, sample)
    column, concatenated along axis 0 (column-major).

    include_sky=False drops the skydome column: for a CONSTANT dome the
    light strategy samples the same cosine pdf as the diffuse BSDF family,
    so when both lobe families spawn (camera level) the BSDF pickup at full
    MIS weight is the identical estimator — and the dome's hemisphere
    shadow rays (incoherent, unblocked, t=inf) are the most expensive rays
    in the frame."""
    n = pv.x.shape[0]
    dirs, dists, rads, pdfs = [], [], [], []
    col_w_d, col_w_s, col_nl, col_sky = [], [], [], []

    def add(ls, k, w_d, w_s, s, sky=0.0):
        dirs.append(ls.direction)
        dists.append(ls.dist)
        rads.append(ls.radiance)
        pdfs.append(ls.pdf)
        col_w_d.extend([w_d / s] * k)
        col_w_s.extend([w_s / s] * k)
        col_nl.extend([s] * k)
        col_sky.extend([sky] * k)

    ql = sc.quad_lights
    for li, valid in enumerate(static.quad_valid):
        if not valid:
            continue
        s_per = static.quad_samples[li] if camera_level else 1
        s = s_per * s_per
        if ctx is not None:
            u = rng.sobol2_flat(ctx.pix, ctx.aa, s, P_QUAD + li, ctx.salt)
        elif s > 1:
            u = rng.stratified2_flat(rng.fold(key, 101, li), n, s_per)
        else:
            u = rng.uniform2(rng.fold(key, 101, li), (n,))
        ls = lightsmod.sample_quad_flat(
            ql.verts[li], ql.normal[li], ql.area[li], ql.radiance[li],
            vec3.tile(pv, s), u,
        )
        add(ls, s, static.quad_w_d[li], static.quad_w_s[li], s)

    dl = sc.disk_lights
    for li, valid in enumerate(static.disk_valid):
        if not valid:
            continue
        s_per = static.disk_samples[li] if camera_level else 1
        s = s_per * s_per
        if ctx is not None:
            u = rng.sobol2_flat(ctx.pix, ctx.aa, s, P_DISK + li, ctx.salt)
        elif s > 1:
            u = rng.stratified2_flat(rng.fold(key, 301, li), n, s_per)
        else:
            u = rng.uniform2(rng.fold(key, 301, li), (n,))
        ls = lightsmod.sample_disk_flat(
            dl.center[li], dl.u[li], dl.v[li], dl.normal[li], dl.area[li],
            dl.radiance[li], vec3.tile(pv, s), u,
        )
        add(ls, s, static.disk_w_d[li], static.disk_w_s[li], s)

    if static.sky_exists and include_sky:
        s = max(static.sky_samples, 1) if camera_level else 1
        if ctx is not None:
            u = rng.sobol2_flat(ctx.pix, ctx.aa, s, P_SKY, ctx.salt)
        else:
            u = rng.uniform2(rng.fold(key, 501), (s * n,))
        ls = lightsmod.sample_sky_flat(sc.sky_radiance, vec3.tile(nfv, s), u)
        add(ls, s, static.sky_w_d, static.sky_w_s, s, sky=1.0)

    if not dirs:
        return None  # no light columns (e.g. sky-only scene, dome deduped)
    cat = jnp.concatenate
    return LightGrid(
        wi=V3(cat([d.x for d in dirs]), cat([d.y for d in dirs]),
              cat([d.z for d in dirs])),
        dist=cat(dists),
        rad=V3(cat([r.x for r in rads]), cat([r.y for r in rads]),
               cat([r.z for r in rads])),
        pdf=cat(pdfs),
        w_d=jnp.asarray(col_w_d, jnp.float32),
        w_s=jnp.asarray(col_w_s, jnp.float32),
        nl=jnp.asarray(col_nl, jnp.float32),
        is_sky=jnp.asarray(col_sky, jnp.float32),
    )


def _direct_eval(matv, frame, wo_local: V3, grid: LightGrid,
                 nb_diffuse, nb_glossy, sky_nb_d=None, sky_nb_g=None,
                 nb_scale=None):
    """Pre-shadow MIS-weighted per-column light contributions.

    Returns (contrib_d V3, contrib_s V3, live bool), all flat (N*k,):
    contrib_* already carry radiance * f * mis / pdf — everything EXCEPT the
    shadow transmission, which multiplies in afterwards. `live` marks
    columns with any nonzero contribution; the caller sets the shadow
    segment t_max to 0 for dead columns (below-horizon samples,
    facing-away lights, zero weights), which the trace prepass culls — the
    same skip-black-BRDF-before-the-shadow-ray optimization Arnold's
    AiEvaluateLightSample performs.

    nb_* are the BSDF-strategy sample counts competing in the MIS for the
    QUAD/DISK columns; sky_nb_* (default: same) are the counts for the SKY
    columns. They differ at depth-exhausted secondary hits: the 1-sample
    _spec_direct_t fallback picks up quad/disk emission (so quad columns
    keep nb=1) but has NO sky strategy — the sky column must then take FULL
    weight (sky_nb=0), otherwise its BSDF-weighted share (~half, the sky
    pdf matching the cosine lobe) is silently dropped at every GI bounce.
    """
    if sky_nb_d is None:
        sky_nb_d = nb_diffuse
    if sky_nb_g is None:
        sky_nb_g = nb_glossy
    n = wo_local.x.shape[0]
    k = grid.pdf.shape[0] // n
    frame_k = Frame(
        u=vec3.tile(frame.u, k), v=vec3.tile(frame.v, k),
        n=vec3.tile(frame.n, k),
    )
    wi_l = to_local_v(frame_k, grid.wi)
    matv_k = dispatch.tile_v(matv, k)
    wo_k = vec3.tile(wo_local, k)
    fd, pd = dispatch.eval_diffuse(matv_k, wo_k, wi_l)
    fs, ps = dispatch.eval_specular(matv_k, wo_k, wi_l)

    ok = grid.pdf > 0.0
    inv_pdf = jnp.where(ok, 1.0 / jnp.maximum(grid.pdf, 1e-12), 0.0)
    nl_r = jnp.repeat(grid.nl, n)
    w_d_r = jnp.repeat(grid.w_d, n)
    w_s_r = jnp.repeat(grid.w_s, n)
    # per-column effective BSDF-strategy counts (sky columns may differ);
    # a zero count makes mis_weight exactly 1 on live columns
    nbd_r = jnp.repeat(
        jnp.where(grid.is_sky > 0.5, float(sky_nb_d), float(nb_diffuse)), n
    )
    nbg_r = jnp.repeat(
        jnp.where(grid.is_sky > 0.5, float(sky_nb_g), float(nb_glossy)), n
    )
    if nb_scale is not None:  # MIS count-convention probe (sc.mis_nb_light)
        nbd_r = nbd_r * nb_scale
        nbg_r = nbg_r * nb_scale
    wl_d = lightsmod.mis_weight(nl_r * grid.pdf, nbd_r * pd)
    wl_s = lightsmod.mis_weight(nl_r * grid.pdf, nbg_r * ps)
    contrib_d = grid.rad * (inv_pdf * wl_d * w_d_r) * fd
    contrib_s = grid.rad * (inv_pdf * wl_s * w_s_r) * fs
    live = (contrib_d.x + contrib_d.y + contrib_d.z
            + contrib_s.x + contrib_s.y + contrib_s.z) > 0.0
    return contrib_d, contrib_s, live


def _light_pickup(sc, static, o: V3, d: V3, lobe_pdf, nb,
                  camera_level, lobe="specular"):
    """Analytic BSDF-ray emission pickup over the area lights (V3 flat).

    Returns (emission*fac*mis_weight V3, t_light) for the NEAREST light hit
    along each ray. The occlusion test is the CALLER's responsibility and
    must use SHADOW-ray semantics (a dedicated shadow segment to t_light):
    Arnold's BSDF-side light strategy shoots shadow rays, so geometry that
    is diffuse/glossy-visible but shadow-invisible (the shared scene's side
    walls, visibility 253, sitting IN FRONT of the side lights) must not
    kill the pickup — gating on the GI ray's own geometry hit silently
    dropped the whole BSDF-side MIS share of those lights (measured -14%
    on 0004's ball under the left light alone)."""
    zero = jnp.zeros_like(lobe_pdf)
    out = V3(zero, zero, zero)
    t_light = jnp.full_like(lobe_pdf, 1e30)
    ql = sc.quad_lights
    for li in range(len(static.quad_valid)):
        if not static.quad_valid[li]:
            continue
        fac = static.quad_w_d[li] if lobe == "diffuse" else static.quad_w_s[li]
        if fac == 0.0:
            continue
        nl = static.quad_samples[li] ** 2 if camera_level else 1
        if camera_level:  # MIS count-convention probe (sc.mis_nl_pickup)
            nl = nl * sc.mis_nl_pickup[0]
        hit, t = lightsmod.intersect_quad_flat(ql.verts[li], ql.normal[li], o, d)
        nlv = ql.normal[li]
        cos_l = jnp.abs(vec3.dot(d, V3(nlv[0], nlv[1], nlv[2])))
        p_l = (t * t) / jnp.maximum(cos_l * ql.area[li], 1e-12)
        w = lightsmod.mis_weight(nb * lobe_pdf, nl * p_l)
        rad = ql.radiance[li]
        take = hit & (t < t_light)
        out = vec3.where(take, V3(rad[0], rad[1], rad[2]) * (fac * w), out)
        t_light = jnp.where(take, t, t_light)
    dl = sc.disk_lights
    for li in range(len(static.disk_valid)):
        if not static.disk_valid[li]:
            continue
        fac = static.disk_w_d[li] if lobe == "diffuse" else static.disk_w_s[li]
        if fac == 0.0:
            continue
        nl = static.disk_samples[li] ** 2 if camera_level else 1
        if camera_level:
            nl = nl * sc.mis_nl_pickup[0]
        hit, t = lightsmod.intersect_disk_flat(
            dl.center[li], dl.u[li], dl.v[li], dl.normal[li], o, d
        )
        nlv = dl.normal[li]
        cos_l = jnp.abs(vec3.dot(d, V3(nlv[0], nlv[1], nlv[2])))
        p_l = (t * t) / jnp.maximum(cos_l * dl.area[li], 1e-12)
        w = lightsmod.mis_weight(nb * lobe_pdf, nl * p_l)
        rad = dl.radiance[li]
        take = hit & (t < t_light)
        out = vec3.where(take, V3(rad[0], rad[1], rad[2]) * (fac * w), out)
        t_light = jnp.where(take, t, t_light)
    return out, t_light


def _sky_pickup(sc, static, nf_at_origin: V3, d: V3, vis: V3, lobe_pdf, nb,
                lobe="specular", full_weight=False) -> V3:
    """Dome radiance picked up by BSDF-family directions.

    `vis` is the SHADOW-ray transmission along the family direction (V3;
    1 = dome fully visible). Arnold-4 light semantics: the dome's BSDF-side
    strategy is a shadow query, so shadow-INVISIBLE geometry — the shared
    scene's wall bounce-cards, visibility 253 — passes dome light even
    though the GI ray itself stops at the wall. Gating on the GI ray's miss
    instead (the pre-r5 behavior) silently dropped ALL dome energy in
    wall-covered directions: measured 38% of the 0001 ball's indirect and
    the flat -2% on every shared-scene Lambert region (tools/oracle_band.py,
    docs/fidelity.md r5). The r4 quad-pickup fix is the same semantic for
    area lights."""
    zero = jnp.zeros_like(lobe_pdf)
    if not static.sky_exists:
        return V3(zero, zero, zero)
    fac = static.sky_w_d if lobe == "diffuse" else static.sky_w_s
    if fac == 0.0:
        return V3(zero, zero, zero)
    if full_weight:
        # the generation's light grid skipped the sky column (constant-dome
        # dedup, see _light_grid): the BSDF strategy carries all the energy
        w = 1.0
    else:
        p_l = lightsmod.pdf_sky_v(nf_at_origin, d)
        w = lightsmod.mis_weight(nb * lobe_pdf, 1.0 * p_l)
    sky = sc.sky_radiance
    return V3(sky[0], sky[1], sky[2]) * vis * (fac * w)


def _quad_lobe_factor(static, li, lobe):
    """Per-light affect_{diffuse,specular} * weight factor for BSDF-sampled
    pickup, matching the light-sample strategy's LightGrid.w_d/w_s (Arnold
    light-weight semantics)."""
    return static.quad_w_d[li] if lobe == "diffuse" else static.quad_w_s[li]


def _disk_lobe_factor(static, li, lobe):
    return static.disk_w_d[li] if lobe == "diffuse" else static.disk_w_s[li]


def _shadow_transmission(sc: DeviceScene, static: SceneStatic, sh) -> V3:
    """Per-channel shadow transmission along the segments as a V3 of (N,)
    channels; 1 = fully visible. Ray arrays stay AoS (Pallas boundary).

    Scenes with transmissive/transparent materials (rlGgx Kt shadows,
    rlGgx.cpp:264-268: out_opacity = 1 - Kt*KtColor) march up to
    RLS_SHADOW_HITS (default 4) transparent hits multiplying each
    surface's RGB shadow transmission (colored Kt shadows stay colored);
    fully-opaque scenes keep the single any-hit query.

    DOCUMENTED DIVERGENCE from Arnold: the host's transparent-shadow chain
    is unbounded (it marches until opaque or the segment ends), ours is a
    static unroll of _SHADOW_HITS nearest queries — a scene with more
    than that many STACKED transparent surfaces between a shading point
    and a light darkens (the 5th+ surfaces count as opaque). The testsuite
    scenes max out at 2 (glass sphere front/back); raise RLS_SHADOW_HITS
    for deeper glass stacks (compile time scales with the unroll). The knob
    is read ONCE at module import (it is baked into the jitted tile
    program, not part of the jit cache key): set it before importing
    rlshaders_tpu, in a fresh process."""
    o, d, tmax, ex = sh
    if not static.has_transparent:
        blocked = tracemod.occluded(
            sc.accel, sc.geometry, o, d, tmax,
            vis_mask=VIS_SHADOW, exclude_tri=ex,
        )
        vis = (~blocked).astype(jnp.float32)
        return V3(vis, vis, vis)
    n_hits = _SHADOW_HITS
    mats = sc.materials
    one = jnp.ones(o.shape[0], jnp.float32)
    atten = V3(one, one, one)
    origin = o
    remaining = tmax
    exclude = ex
    for _ in range(n_hits):
        # t_max = remaining: the kernel's front-to-back early break stops
        # at the segment end, and lanes whose segment is exhausted (or was
        # dead on entry) carry t_max <= 0 and compact into skipped blocks —
        # march rounds 2..n are near-free for completed lanes.
        hit = tracemod.nearest(
            sc.accel, sc.geometry, origin, d,
            vis_mask=VIS_SHADOW, exclude_tri=exclude,
            t_max=jnp.maximum(remaining, 0.0),
        )
        ok = (hit.tri >= 0) & (hit.t < remaining)
        tri = jnp.maximum(hit.tri, 0)
        mid = sc.geometry.mat_id[tri]
        kt = v3(mats.kt_color[mid]) * mats.kt[mid]
        op = v3(mats.opacity[mid])
        # shadow transmission: Kt color for transmissive, else 1-opacity
        # (per-channel max, matching the AoS jnp.maximum semantics)
        trans = vec3.clip(vec3.vmax(kt, 1.0 - op), 0.0, 1.0)
        atten = atten * vec3.where(ok, trans, 1.0)
        step = jnp.where(ok, hit.t + 2 * RAY_EPS, remaining)
        origin = origin + d * step[..., None]
        # fully-attenuated lanes stop marching (their remaining -> 0 kills
        # the next round's trace via the dead-lane sort key)
        remaining = jnp.where(
            vec3.maxc(atten) > 1e-4, remaining - step, 0.0
        )
        exclude = jnp.where(ok, hit.tri, -1)
    return atten


# ---------------------------------------------------------------------------
# Fused stage programs (module-level jit: compiled once per table-shape class,
# shared across tiles, renders, TileRenderer instances and same-shape scenes)
# ---------------------------------------------------------------------------

def _tile_frame(frame: Frame, k: int) -> Frame:
    return Frame(
        u=vec3.tile(frame.u, k), v=vec3.tile(frame.v, k),
        n=vec3.tile(frame.n, k),
    )


def _spawn(sc, static, surf, pv, matv, frame, wo, key, lobe, nb,
           ctx: SampleCtx = None):
    """BSDF-sample nb rays per hit for one lobe; returns flat V3 rays +
    per-sample weights/pdfs in SAMPLE-MAJOR chunks (sample s = rows
    [s*N, (s+1)*N), matching vec3.tile/ksum)."""
    n = pv.x.shape[0]
    if ctx is not None:
        purpose = P_DIFFUSE if lobe == "diffuse" else P_GLOSSY
        u = rng.sobol2_flat(ctx.pix, ctx.aa, nb, purpose, ctx.salt)
    else:
        u = rng.stratified2_flat(key, n, int(np.sqrt(nb)))
    matv_b = dispatch.tile_v(matv, nb)
    wo_b = vec3.tile(wo, nb)
    if lobe == "diffuse":
        wi_l = dispatch.sample_diffuse(matv_b, wo_b, u[:, 0], u[:, 1])
        f, pdf = dispatch.eval_diffuse(matv_b, wo_b, wi_l)
        active = matv.has_diffuse
        if static.has_skin:
            active = active & (matv.mtype != MAT_SKIN)
    else:
        wi_l = dispatch.sample_specular(matv_b, wo_b, u[:, 0], u[:, 1])
        f, pdf = dispatch.eval_specular(matv_b, wo_b, wi_l)
        active = matv.has_spec
    frame_b = _tile_frame(frame, nb)
    wi_w = to_world_v(frame_b, wi_l)
    att = jnp.tile(active & surf.valid, nb) & (wo_b.z > 1e-4)
    ok = (
        att
        & (wi_l.z > 1e-5) & (pdf > 1e-9)
    )
    w = vec3.where(ok, f / jnp.maximum(pdf, 1e-9), 0.0)
    if nb > 1:
        # Arnold-4 valid-sample renormalization probe (sc.mis_renorm 0..1):
        # the host zeroes below-hemisphere evalSample directions and — per
        # the r4 fidelity hypothesis — divides the BSDF-strategy estimate
        # by the VALID count, not the drawn count. Blend the per-hit factor
        # nb/max(valid,1) in by mis_renorm so one compiled program serves
        # both semantics. nb==1 is a no-op (w is already 0 on invalid
        # lanes), so the secondary-hit families skip the bookkeeping.
        n_valid = ok.reshape(nb, n).sum(0).astype(jnp.float32)
        renorm = nb / jnp.maximum(n_valid, 1.0)
        scale = 1.0 + sc.mis_renorm[0] * (renorm - 1.0)
        w = w * jnp.tile(scale, nb)
    o = vec3.tile(pv, nb) + wi_w * RAY_EPS
    return o, wi_w, w, jnp.where(ok, pdf, 0.0), ok


def _spec_direct_t(sc, static, surf, pv, matv, frame, wo, key, lobes) -> V3:
    """Fused BSDF half of the secondary-hit direct lighting for `lobes`:
    one lobe sample per hit, analytic nearest-light emission, occlusion
    (Pallas) — the 1-sample fallback when a lobe's GI depth is exhausted."""
    n = pv.x.shape[0]
    zero = jnp.zeros((n,), jnp.float32)
    out = V3(zero, zero, zero)
    for i, lobe in enumerate(("specular", "diffuse")):
        if lobe not in lobes:
            continue
        u = rng.uniform2(rng.fold(key, 4242 + i), (n,))
        if lobe == "specular":
            wi_l = dispatch.sample_specular(matv, wo, u[:, 0], u[:, 1])
            f, pdf = dispatch.eval_specular(matv, wo, wi_l)
            active = matv.has_spec
        else:
            wi_l = dispatch.sample_diffuse(matv, wo, u[:, 0], u[:, 1])
            f, pdf = dispatch.eval_diffuse(matv, wo, wi_l)
            active = matv.has_diffuse
        wi_w = to_world_v(frame, wi_l)
        # wo.z > 1e-4 guards silhouette-grazing configs where the Disney
        # pdf's max(1e-4, VdotN) clamp (rlDisney.cpp:535) diverges from the
        # eval and f/pdf explodes (observed 7e4 fireflies)
        ok = (
            active & surf.valid & (wi_l.z > 1e-5) & (pdf > 1e-9)
            & (wo.z > 1e-4)
        )
        # analytic emission of the NEAREST light along the lobe sample,
        # MIS vs the 1-sample light strategy; keep its distance so the
        # shadow query stops at the light (side walls sit just behind the
        # side lights in the shared scene)
        emit = V3(zero, zero, zero)
        t_light = jnp.full((n,), 1e30)
        ql = sc.quad_lights
        for li in range(len(static.quad_valid)):
            if not static.quad_valid[li]:
                continue
            fac = _quad_lobe_factor(static, li, lobe)
            hq, tq = lightsmod.intersect_quad_flat(
                ql.verts[li], ql.normal[li], pv, wi_w
            )
            nlv = ql.normal[li]
            cos_l = jnp.abs(vec3.dot(wi_w, V3(nlv[0], nlv[1], nlv[2])))
            p_l = (tq * tq) / jnp.maximum(cos_l * ql.area[li], 1e-12)
            w_b = lightsmod.mis_weight(1.0 * pdf, 1.0 * p_l)
            take = hq & (tq < t_light)
            rad = ql.radiance[li]
            emit = vec3.where(
                take, V3(rad[0], rad[1], rad[2]) * (fac * w_b), emit
            )
            t_light = jnp.where(take, tq, t_light)
        dl = sc.disk_lights
        for li in range(len(static.disk_valid)):
            if not static.disk_valid[li]:
                continue
            fac = _disk_lobe_factor(static, li, lobe)
            hq, tq = lightsmod.intersect_disk_flat(
                dl.center[li], dl.u[li], dl.v[li], dl.normal[li], pv, wi_w
            )
            nlv = dl.normal[li]
            cos_l = jnp.abs(vec3.dot(wi_w, V3(nlv[0], nlv[1], nlv[2])))
            p_l = (tq * tq) / jnp.maximum(cos_l * dl.area[li], 1e-12)
            w_b = lightsmod.mis_weight(1.0 * pdf, 1.0 * p_l)
            take = hq & (tq < t_light)
            rad = dl.radiance[li]
            emit = vec3.where(
                take, V3(rad[0], rad[1], rad[2]) * (fac * w_b), emit
            )
            t_light = jnp.where(take, tq, t_light)
        w_over_pdf = vec3.where(ok, f / jnp.maximum(pdf, 1e-9), 0.0)
        any_emit = vec3.maxc(emit) > 0.0
        # Same normal+direction origin offset as _gen_shade_t/_family_t
        # (grazing-band false self-occlusion, ADVICE r4); 3*RAY_EPS t_max
        # margin so the segment ends in front of the light plane even when
        # the normal offset projects along the ray at grazing incidence.
        blocked = tracemod.occluded(
            sc.accel, sc.geometry,
            (pv + frame.n * RAY_EPS + wi_w * RAY_EPS).aos(), wi_w.aos(),
            jnp.where(t_light < 1e30, t_light - 3 * RAY_EPS, 0.0),
            vis_mask=VIS_SHADOW, exclude_tri=surf.tri,
        )
        lit = ok & any_emit & ~blocked
        out = out + vec3.where(lit, w_over_pdf * emit, 0.0)
    return out


class RenderConf(NamedTuple):
    """Hashable per-render configuration (static jit argument): the GI depth
    gates and sample splits from the options node (rlGgx.cpp:139-154) plus
    the pixel ray-cone spread."""

    gi_diffuse_depth: int
    gi_glossy_depth: int
    gi_refraction_depth: int
    gi_total_depth: int
    gi_sss_samples: int
    nb_d: int
    nb_g: int
    nb_r: int
    pix_spread: float
    n_sub: int  # AA samples per pixel (aa^2): the SampleCtx lane decode
    ff_shade: bool  # faceforward by ns·d instead of the geometric side
    use_sobol: bool  # per-pixel Owen-Sobol streams (RLS_SOBOL=0 ablates)
    rr_refr_start: int = 99  # Russian-roulette start depth on the
    #   refraction chain (SURVEY §7 integrator list; BASELINE config #2):
    #   at refraction depth >= this, each continuation survives with
    #   p = clamp(max-channel of its Eq.41*Kt weight, 0.05, 1) and is
    #   reweighted 1/p — unbiased early termination of deep glass chains.
    #   Default 99 = off: the reference has no RR and the golden gate
    #   compares equal-sample noise (env RLS_RR_START enables).


class SSSIn(NamedTuple):
    """Camera-hit fields the (host-compacted) SSS stage consumes."""

    p: jnp.ndarray
    ns: jnp.ndarray
    mesh_id: jnp.ndarray
    valid: jnp.ndarray
    sss_weight: jnp.ndarray
    sss_dist: jnp.ndarray
    sss_color: jnp.ndarray
    cavity_fadeout: jnp.ndarray
    cubic: jnp.ndarray  # standard-shader Ksss lanes use Arnold's cubic falloff
    pix: jnp.ndarray   # (N,) sampler addressing (SampleCtx of the tile)
    aa: jnp.ndarray    # (N,)
    salt: jnp.ndarray  # (1,) — kept non-rank-0 across the jit boundary
    #                    (S(6) host-memory placement, docs/perf.md)


# ---------------------------------------------------------------------------
# Generation-tree orchestration (pure traced functions; host-side recursion
# is unrolled statically by the depth gates). The WHOLE per-tile pipeline
# compiles into ONE program (_j_tile) — anything eager between stages costs
# a full dispatch round-trip on the tunneled TPU (~0.2s each).
# ---------------------------------------------------------------------------

def _gen_shade_t(sc, static, conf, o, d, key, vis, camera_level,
                 indirect_scaled, base_fp=None, spread=None, trace_pack=None,
                 ctx: SampleCtx = None, ray_lobe="camera", rr=(0, 0, 0, 0)):
    n = o.shape[0]
    if base_fp is None:
        base_fp = jnp.zeros((n,), jnp.float32)
    if spread is None:
        spread = jnp.full((n,), conf.pix_spread, jnp.float32)
    if trace_pack is None:
        hit = tracemod.nearest(sc.accel, sc.geometry, o, d, vis_mask=vis)
        trace_pack = (hit.t, hit.tri, hit.u, hit.v)
    t, tri, uu, vv = trace_pack

    surf = _surface(sc, t, tri, uu, vv, o, d, base_fp, spread,
                    ff_shade=conf.ff_shade)
    if static.has_bump:
        ns_b = dispatch.apply_bump(
            sc.materials, sc.textures, surf.mat_id, surf.p, surf.ns,
            fp=surf.fp, tex_gamma=static.tex_gamma,
        )
        sign = jnp.where(dot(ns_b, d) < 0.0, 1.0, -1.0)
        surf = surf._replace(ns=ns_b, nf=ns_b * sign[..., None])
    matg = dispatch.gather(
        sc.materials, sc.textures, surf.mat_id, surf.uv,
        surf.entering, surf.p, fp=surf.fp, fp_uv=surf.fp_uv,
        lod_bias=sc.lod_bias[0], tex_gamma=static.tex_gamma,
        diffuse_ray=(ray_lobe == "diffuse"),
    )
    matv = dispatch.to_v(matg)
    pv = v3(surf.p)
    nfv = v3(surf.nf)
    frame = build_frame_polar_v(nfv)
    wo = to_local_v(frame, -v3(d))
    if static.has_skin_mat:
        # rlSkin Fresnel energy layering (view-averaged): attenuates the
        # specular-under-sheen response, the BSSRDF weight, and the skin
        # diffuse-ray fallback (rlSkin.cpp:204-238)
        matv = matg = dispatch.skin_layer_fields(matv, wo)
    # constant-dome dedup: when both camera-level BSDF families spawn, the
    # sky column is redundant with the cosine-sampled diffuse family (same
    # pdf) — drop its (expensive) hemisphere shadow rays and give the
    # family's sky pickup full MIS weight
    sky_in_grid = not (camera_level and static.nb_d > 0 and static.nb_g > 0)
    grid = _light_grid(sc, static, pv, nfv, key, camera_level,
                       include_sky=sky_in_grid, ctx=ctx)
    if grid is not None:
        k = grid.pdf.shape[0] // n
        # At the camera level the BSDF strategies are the spawned indirect
        # ray families; at secondary hits both lobes MIS against the
        # 1-sample BSDF strategy (continuation family or spec_direct
        # fallback). The reference's AiEvaluateLightSample always runs both
        # strategies. The SKY column's BSDF-side strategy exists only where
        # a continuation family spawns (the depth-exhausted fallback covers
        # quad/disk emission but not the sky), so its MIS count is gated by
        # the same depth conditions _secondary_indirect_t applies.
        nb_d = static.nb_d if camera_level else 1
        nb_g = static.nb_g if camera_level else 1
        if camera_level:
            sky_nb_d, sky_nb_g = nb_d, nb_g
        else:
            rd_, rg_, _rrf_, rt_ = rr
            cont_d = (rd_ < conf.gi_diffuse_depth
                      and rt_ < conf.gi_total_depth)
            cont_g = (ray_lobe != "diffuse"
                      and rg_ < conf.gi_glossy_depth
                      and rt_ < conf.gi_total_depth)
            sky_nb_d = 1 if cont_d else 0
            sky_nb_g = 1 if cont_g else 0
        contrib_d, contrib_s, live = _direct_eval(
            matv, frame, wo, grid, nb_d, nb_g, sky_nb_d, sky_nb_g,
            nb_scale=(sc.mis_nb_light[0] if camera_level else None))
        # receive_shadows off (the shared scene's side walls,
        # test_geo.ass:214): the surface is lit as if unoccluded
        rcv = jnp.tile(sc.geometry.receive_shadows[jnp.maximum(tri, 0)], k)
        # shadow origins offset along the NORMAL as well as the ray: a
        # wi-only offset leaves grazing segments ~1e-5 above the surface,
        # where curved geometry (the sphere's grazing bands, the curved
        # backdrop) self-occludes falsely — measured 0.1-0.55% cos-weighted
        # per light on the 0004 ball (tools-r4 shadow_offset probe); the
        # host renderer offsets along Ng the same way
        sh_o = (vec3.tile(pv, k) + vec3.tile(nfv, k) * RAY_EPS
                + grid.wi * RAY_EPS).aos()
        sh_d = grid.wi.aos()
        # dead columns (zero pre-shadow contribution, or shadow-exempt
        # receivers) get t_max 0: the trace prepass culls them and the
        # dead-ray sort key compacts them into skipped blocks. 3*RAY_EPS
        # margin: the origin's normal offset can project up to RAY_EPS
        # along the ray at grazing incidence, so 2*RAY_EPS alone could let
        # the segment reach past the light plane (ADVICE r4).
        sh_t = jnp.where(live & rcv, grid.dist - 3 * RAY_EPS, 0.0)
        sh_ex = jnp.tile(surf.tri, k)
        shadowed = _shadow_transmission(sc, static, (sh_o, sh_d, sh_t, sh_ex))
        shadowed = vec3.where(rcv, shadowed, 1.0)
        diffuse = vec3.ksum(contrib_d * shadowed, k)
        specular = vec3.ksum(contrib_s * shadowed, k)
    else:
        zero = jnp.zeros_like(pv.x)
        diffuse = V3(zero, zero, zero)
        specular = V3(zero, zero, zero)
    if camera_level and static.has_skin:
        # skin diffuse at camera level is replaced by the SSS probe stage
        diffuse = vec3.where(matv.mtype == MAT_SKIN, 0.0, diffuse)
    if indirect_scaled:
        is_dsy = matv.mtype == MAT_DISNEY
        diffuse = vec3.where(
            is_dsy, diffuse * matv.indirect_diffuse_scale, diffuse
        )
        specular = vec3.where(
            is_dsy, specular * matv.indirect_specular_scale, specular
        )
    radiance = diffuse + specular + matv.emission
    valid = surf.valid
    return (
        surf, matg, matv, pv, nfv, frame, wo,
        vec3.where(valid, radiance, 0.0),
        vec3.where(valid, diffuse, 0.0),
        vec3.where(valid, specular, 0.0),
        (t, tri, uu, vv),
    )


def _family_t(sc, static, conf, surf, pv, nfv, matv, frame, wo, key, lobe,
              nb, cam_pickup, ctx: SampleCtx = None):
    """Spawn + trace + analytic light/sky pickup for one lobe family.
    Returns AoS ray arrays (trace boundary) + V3 weights/pickup."""
    oV, dV, w1, pdf1, ok1 = _spawn(sc, static, surf, pv, matv, frame, wo,
                                   key, lobe, nb, ctx=ctx)
    vis = VIS_DIFFUSE if lobe == "diffuse" else VIS_GLOSSY
    o1 = oV.aos()
    d1 = dV.aos()
    hit = tracemod.nearest(sc.accel, sc.geometry, o1, d1, vis_mask=vis)
    nf_rep = vec3.tile(nfv, nb)
    emit, t_light = _light_pickup(sc, static, oV, dV, pdf1, nb,
                                  cam_pickup, lobe=lobe)
    if sum(static.quad_valid) or sum(static.disk_valid):
        # Arnold's BSDF-side light strategy is a SHADOW query to the light
        # hit (shadow visibility + transparent shadows), NOT the GI ray's
        # geometry hit — shadow-invisible geometry in front of a light (the
        # shared scene's side walls) must not kill the emission. Lanes with
        # no light hit carry t_max 0 and are nearly free in the kernel.
        sh_t = jnp.where(t_light < 1e30, t_light - 3 * RAY_EPS, 0.0)
        ex = jnp.tile(surf.tri, nb)
        # normal+ray offset for the shadow segment (see _gen_shade_t); the
        # GI ray itself keeps the plain wi offset
        sh_o1 = (vec3.tile(pv, nb) + vec3.tile(nfv, nb) * RAY_EPS
                 + dV * RAY_EPS).aos()
        trans = _shadow_transmission(sc, static, (sh_o1, d1, sh_t, ex))
        rcv = jnp.tile(
            sc.geometry.receive_shadows[jnp.maximum(surf.tri, 0)], nb
        )
        trans = vec3.where(rcv, trans, 1.0)
        pick = emit * trans
    else:
        pick = emit
    sky_full = cam_pickup and static.nb_d > 0 and static.nb_g > 0
    sky_fac = static.sky_w_d if lobe == "diffuse" else static.sky_w_s
    if static.sky_exists and sky_fac != 0.0:
        # dome visibility along the family direction is a SHADOW query
        # (see _sky_pickup): miss lanes are trivially visible; lanes whose
        # nearest hit blocks shadow rays (shadow-visible AND opaque) are
        # trivially blocked; only lanes hitting shadow-invisible or
        # non-opaque geometry (the wall bounce-cards, the logo plane) need
        # the trace — all other lanes carry t_max 0 and compact away.
        miss = hit.tri < 0
        htc = jnp.maximum(hit.tri, 0)
        passes = ((sc.geometry.visibility[htc] & VIS_SHADOW) == 0) | (
            ~sc.geometry.opaque[htc].astype(bool))
        maybe = ~miss & passes
        sky_t = jnp.where(maybe, 1e12, 0.0)
        sky_o = (vec3.tile(pv, nb) + vec3.tile(nfv, nb) * RAY_EPS
                 + dV * RAY_EPS).aos()
        trans_sky = _shadow_transmission(
            sc, static, (sky_o, d1, sky_t, jnp.tile(surf.tri, nb)))
        sky_vis = vec3.where(miss, 1.0, vec3.where(maybe, trans_sky, 0.0))
    else:
        one = jnp.ones_like(pdf1)
        sky_vis = V3(one, one, one)
    pick = pick + _sky_pickup(sc, static, nf_rep, dV, sky_vis, pdf1,
                              nb, lobe=lobe, full_weight=sky_full)
    return o1, d1, w1, pick, (hit.t, hit.tri, hit.u, hit.v)


def _refr_t(sc, static, conf, surf, pv, matv, frame, wo, key, nb,
            ctx: SampleCtx = None, rrf: int = 0):
    """Rough-refraction spawn (Walter Eq.41 weights) + trace. Sample-major
    flat layout like _spawn. At refraction depth rrf >= conf.rr_refr_start,
    Russian roulette terminates low-weight continuations unbiasedly
    (survive with p = clamp(maxc(weight), 0.05, 1), reweight 1/p); killed
    lanes carry zero weight and a zero trace t_max so the trace kernel's
    dead-ray compaction skips them (ops/intersect_pallas._sort_rays)."""
    n = pv.x.shape[0]
    if ctx is not None:
        u = rng.sobol2_flat(ctx.pix, ctx.aa, nb, P_REFRACT, ctx.salt)
    else:
        u = rng.stratified2_flat(key, n, int(np.sqrt(nb)))
    matv_b = dispatch.tile_v(matv, nb)
    wo_b = vec3.tile(wo, nb)
    wi_l, wgt = dispatch.sample_refract(matv_b, wo_b, u[:, 0], u[:, 1])
    ok = jnp.tile(surf.valid & matv.has_refract, nb)
    t_max = None
    if rrf >= conf.rr_refr_start:
        p_surv = jnp.clip(vec3.maxc(wgt), 0.05, 1.0)
        u_rr = jax.random.uniform(rng.fold(key, 777), (n * nb,))
        survive = u_rr < p_surv
        wgt = wgt * jnp.where(survive, 1.0 / p_surv, 0.0)
        ok = ok & survive
        t_max = jnp.where(ok, 1e30, 0.0)
    frame_b = _tile_frame(frame, nb)
    wi_w = to_world_v(frame_b, wi_l)
    o1 = (vec3.tile(pv, nb) + wi_w * RAY_EPS).aos()
    d1 = wi_w.aos()
    hit = tracemod.nearest(sc.accel, sc.geometry, o1, d1,
                           vis_mask=VIS_REFRACTED, t_max=t_max)
    return (
        o1, d1, vec3.where(ok, wgt, 0.0), ok,
        (hit.t, hit.tri, hit.u, hit.v),
    )


def _lobe_family_full(sc, static, conf, surf, pv, nfv, matv, frame, wo, key,
                      lobe, nb, rr, indirect_scaled, cam_pickup=False,
                      scale=None, ctx: SampleCtx = None) -> V3:
    """Family + one-deeper recursion. At secondary hits the deeper surface
    radiance counts only for `standard`-shader materials: the reference
    plugins integrate indirect at CAMERA hits only (rlGgx.cpp:307-323
    `sg->Rt & AI_RAY_CAMERA`), while Arnold's own standard shader recurses
    to the GI_*_depth gates."""
    n = pv.x.shape[0]
    o1, d1, w1, pick, tp1 = _family_t(
        sc, static, conf, surf, pv, nfv, matv, frame, wo, key, lobe, nb,
        cam_pickup, ctx=ctx,
    )
    if lobe == "diffuse":
        spread1 = jnp.full((n * nb,), 1.0, jnp.float32)
    else:
        spread1 = jnp.tile(
            jnp.maximum(matv.ggx.alpha_g, conf.pix_spread), nb
        )
    _, sub_rgb, _, _ = _shade_generation_t(
        sc, static, conf, o1, d1, rng.fold(key, 7),
        VIS_DIFFUSE if lobe == "diffuse" else VIS_GLOSSY,
        camera_level=False, indirect_scaled=indirect_scaled,
        is_refraction=False, rr=rr, ray_lobe=lobe,
        base_fp=jnp.tile(surf.fp, nb), spread=spread1,
        trace_pack=tp1,
    )
    if cam_pickup:
        sub = pick + sub_rgb
    else:
        is_std = jnp.tile(matv.mtype == MAT_STANDARD, nb)
        sub = pick + vec3.where(is_std, sub_rgb, 0.0)
    out = vec3.kmean(w1 * sub, nb)
    if scale is not None:
        out = out * scale
    return out


def _secondary_indirect_t(sc, static, conf, surf, pv, nfv, matv, frame, wo,
                          key, ray_lobe, rr, indirect_scaled) -> V3:
    """Indirect + BSDF-direct at a secondary hit, honoring the GI depth
    gates (GI_diffuse/glossy_depth continuation, GI_total_depth cap;
    rlGgx.cpp:151-154). Depth-exhausted lobes keep the 1-sample pickup."""
    rd, rg, rrf, rt = rr
    zero = jnp.zeros_like(pv.x)
    out = V3(zero, zero, zero)
    fallback = []
    # glossy continuation never spawns from diffuse rays (the standard
    # shader's enable_glossy_caustics off, test_geo.ass)
    if (ray_lobe != "diffuse" and rg < conf.gi_glossy_depth
            and rt < conf.gi_total_depth):
        out = out + _lobe_family_full(
            sc, static, conf, surf, pv, nfv, matv, frame, wo,
            rng.fold(key, 62),
            "specular", 1, (rd, rg + 1, rrf, rt + 1), indirect_scaled,
        )
    else:
        fallback.append("specular")
    if rd < conf.gi_diffuse_depth and rt < conf.gi_total_depth:
        out = out + _lobe_family_full(
            sc, static, conf, surf, pv, nfv, matv, frame, wo,
            rng.fold(key, 61),
            "diffuse", 1, (rd + 1, rg, rrf, rt + 1), indirect_scaled,
        )
    else:
        fallback.append("diffuse")
    if fallback and (sum(static.quad_valid) or sum(static.disk_valid)):
        out = out + _spec_direct_t(
            sc, static, surf, pv, matv, frame, wo, key, tuple(fallback)
        )
    return out


def _shade_generation_t(sc, static, conf, o, d, key, vis, camera_level,
                        indirect_scaled, is_refraction, rr=(0, 0, 0, 0),
                        ray_lobe="camera", base_fp=None, spread=None,
                        trace_pack=None, ctx: SampleCtx = None):
    """Trace + fully shade one ray generation; returns (surf pack, rgb,
    aov_d, aov_s). `rr` = (Rr_diff, Rr_gloss, Rr_refr, Rr) recursion
    counters AT this hit (the shader-globals depth fields the reference
    gates on, rlGgx.cpp:151-154); recursion unrolls statically, bounded by
    the GI_*_depth options."""
    surf, matg, matv, pv, nfv, frame, wo, rgb, aov_d, aov_s, tp = (
        _gen_shade_t(
            sc, static, conf, o, d, key, vis, camera_level, indirect_scaled,
            base_fp, spread, trace_pack, ctx=ctx, ray_lobe=ray_lobe, rr=rr,
        )
    )
    tri = tp[1]
    if not camera_level:
        rgb = rgb + _secondary_indirect_t(
            sc, static, conf, surf, pv, nfv, matv, frame, wo, key, ray_lobe,
            rr, indirect_scaled,
        )
        # rlSkin evaluates the BSSRDF whenever the shader runs on a
        # non-diffuse ray (rlSss.h:170-199) — glossy/refraction re-entry
        # sees SSS too (1 probe sample deep here). Gated to true rlSkin
        # scenes: the standard shader's Ksss lobe is camera-only.
        if (static.has_skin_mat and ray_lobe in ("glossy", "refracted")
                and conf.gi_sss_samples > 0):
            from . import sss as sssmod

            is_sss = (matg.sss_weight > 1e-5) & surf.valid
            rgb = rgb + v3(sssmod.sss_eval(
                sc, static,
                sssmod.SSS_FIELDS(surf, matg, is_sss), rng.fold(key, 5),
                n_sss=1, gi_diffuse=conf.gi_diffuse_depth,
            ))
    if is_refraction and static.sky_exists:
        sky = sc.sky_radiance
        rgb = rgb + vec3.where(
            tri < 0, V3(sky[0], sky[1], sky[2]) * jnp.ones_like(rgb.x), 0.0
        )

    rd, rg, rrf, rt = rr
    if (rrf < conf.gi_refraction_depth and rt < conf.gi_total_depth
            and static.has_refract):
        o2, d2, wgt, ok, tp2 = _refr_t(
            sc, static, conf, surf, pv, matv, frame, wo, rng.fold(key, 900),
            1, rrf=rrf + 1,
        )
        sub_pack = _shade_generation_t(
            sc, static, conf, o2, d2, rng.fold(key, 33), VIS_REFRACTED,
            camera_level=False, indirect_scaled=indirect_scaled,
            is_refraction=True, rr=(rd, rg, rrf + 1, rt + 1),
            ray_lobe="refracted",
            base_fp=surf.fp,
            spread=jnp.maximum(matv.ggx.alpha_g, conf.pix_spread),
            trace_pack=tp2,
        )
        sub_rgb = sub_pack[1]
        rgb = rgb + vec3.where(ok, wgt * sub_rgb, 0.0)
    return (surf, matg, matv, pv, nfv, frame, wo), rgb, aov_d, aov_s


@partial(jax.jit, static_argnames=("static", "conf", "tile_rays"))
def _j_tile(sc, static, conf, origin_full, direction_full, pixel_full,
            start1, key, *, tile_rays):
    """ONE compiled program for a full tile: slice the tile's rays out of
    the frame arrays, then the whole generation tree (every trace, shadow
    batch, continuation and splice), minus the host-compacted camera-level
    SSS stage.

    `start1` is the tile offset as a (1,) int32 array — rank-0 jit params
    are placed in host memory (S(6)) and cost a per-use DMA on the axon
    backend (docs/perf.md), so the scalar is extracted on-device."""
    start = start1[0]
    origin = jax.lax.dynamic_slice(origin_full, (start, 0), (tile_rays, 3))
    direction = jax.lax.dynamic_slice(
        direction_full, (start, 0), (tile_rays, 3)
    )
    pixel = jax.lax.dynamic_slice(pixel_full, (start,), (tile_rays,))
    n0 = tile_rays
    # camera-level sampler addressing: the per-lane GLOBAL pixel id comes
    # from the frame's pixel array (correct under any tiling, including the
    # sharded path where start is shard-local); the AA index decodes from
    # the lane position since frame rays are pixel-major with conf.n_sub
    # consecutive AA lanes per pixel and tiles are n_sub-aligned. Padding
    # lanes carry pixel=-1 — their draws are never splatted.
    lane = start + jnp.arange(tile_rays, dtype=jnp.int32)
    ctx_full = SampleCtx(
        pix=pixel,
        aa=lane % conf.n_sub,
        salt=jax.random.bits(rng.fold(key, 3141), (), jnp.uint32),
    )
    ctx = ctx_full if conf.use_sobol else None
    pack, rgb, aov_dd, aov_ds = _shade_generation_t(
        sc, static, conf, origin, direction, rng.fold(key, 0), VIS_CAMERA,
        camera_level=True, indirect_scaled=False, is_refraction=False,
        # camera-level depth gates are the explicit families below
        rr=(99, 99, 99, 99), ray_lobe="camera", ctx=ctx,
    )
    surf0, matg0, matv0, pv0, nfv0, frame0, wo0 = pack
    if static.sky_exists:
        sky = sc.sky_radiance
        rgb = rgb + vec3.where(
            ~surf0.valid, V3(sky[0], sky[1], sky[2]) * jnp.ones_like(rgb.x),
            0.0,
        )
    aovs = {"direct_diffuse": aov_dd.aos(), "direct_specular": aov_ds.aos()}

    if conf.nb_d:
        scale = jnp.where(
            matv0.mtype == MAT_DISNEY, matv0.indirect_diffuse_scale, 1.0
        )
        c = _lobe_family_full(
            sc, static, conf, surf0, pv0, nfv0, matv0, frame0, wo0,
            rng.fold(key, 1),
            "diffuse", conf.nb_d, (1, 0, 0, 1), indirect_scaled=True,
            cam_pickup=True, scale=scale, ctx=ctx,
        )
        aovs["indirect_diffuse"] = c.aos()
        rgb = rgb + c
    else:
        aovs["indirect_diffuse"] = jnp.zeros((n0, 3))

    if conf.nb_g:
        scale = jnp.where(
            matv0.mtype == MAT_DISNEY, matv0.indirect_specular_scale, 1.0
        )
        c = _lobe_family_full(
            sc, static, conf, surf0, pv0, nfv0, matv0, frame0, wo0,
            rng.fold(key, 2),
            "specular", conf.nb_g, (0, 1, 0, 1), indirect_scaled=True,
            cam_pickup=True, scale=scale, ctx=ctx,
        )
        aovs["indirect_specular"] = c.aos()
        rgb = rgb + c
    else:
        aovs["indirect_specular"] = jnp.zeros((n0, 3))

    if conf.nb_r:
        o1, d1, wgt, ok, tp1 = _refr_t(
            sc, static, conf, surf0, pv0, matv0, frame0, wo0,
            rng.fold(key, 3), conf.nb_r, ctx=ctx, rrf=1,
        )
        _, sub_rgb, _, _ = _shade_generation_t(
            sc, static, conf, o1, d1, rng.fold(key, 13), VIS_REFRACTED,
            camera_level=False, indirect_scaled=False,
            is_refraction=True, rr=(0, 0, 1, 1), ray_lobe="refracted",
            base_fp=jnp.tile(surf0.fp, conf.nb_r),
            spread=jnp.tile(
                jnp.maximum(matv0.ggx.alpha_g, conf.pix_spread), conf.nb_r
            ),
            trace_pack=tp1,
        )
        c = vec3.kmean(vec3.where(ok, wgt, 0.0) * sub_rgb, conf.nb_r)
        aovs["refraction"] = c.aos()
        rgb = rgb + c
    else:
        aovs["refraction"] = jnp.zeros((n0, 3))
    aovs["sss"] = jnp.zeros((n0, 3))

    sss_in = SSSIn(
        p=surf0.p, ns=surf0.ns, mesh_id=surf0.mesh_id, valid=surf0.valid,
        sss_weight=matg0.sss_weight, sss_dist=matg0.sss_dist.aos(),
        sss_color=matg0.sss_color.aos(), cavity_fadeout=matg0.cavity_fadeout,
        cubic=matg0.mtype == dispatch.MAT_STANDARD,
        # salt crosses the program boundary into _j_sss as (1,), not rank-0:
        # scalar jit params land in host memory S(6) (docs/perf.md)
        pix=ctx_full.pix, aa=ctx_full.aa, salt=ctx_full.salt.reshape(1),
    )
    return rgb.aos(), aovs, sss_in


class TileRenderer:
    """Thin host wrapper over the single-program tile pipeline.

    The scene lives on device as one pytree (`DeviceScene`, a single
    device_put) passed as an argument; the compiled tile program is shared
    across tiles, renders, instances and same-shape scenes."""

    def __init__(self, scene: Scene, accel, aa_samples: int,
                 xres: int | None = None):
        self.scene = scene
        self.static = SceneStatic.of(scene)
        self.sc = device_scene(scene, accel)
        self.accel = accel
        self.aa = aa_samples
        o = scene.options
        nb_r = (
            o.gi_refraction_samples ** 2
            if (o.gi_refraction_depth > 0 and self.static.has_refract)
            else 0
        )
        # per-unit-distance angular footprint of one pixel (ray-cone spread
        # for texture LOD); AA samples share the pixel footprint like
        # Arnold's per-pixel ray differentials. Must track the ACTUAL render
        # width — a reduced-res render with the scene camera's width keeps
        # the footprint too small and Moire-aliases the textures.
        pix_spread = float(
            2.0 * np.tan(np.deg2rad(scene.camera.fov_deg) * 0.5)
            / max(xres or scene.camera.xres, 1)
        )
        self.conf = RenderConf(
            gi_diffuse_depth=o.gi_diffuse_depth,
            gi_glossy_depth=o.gi_glossy_depth,
            gi_refraction_depth=o.gi_refraction_depth,
            gi_total_depth=o.gi_total_depth,
            gi_sss_samples=o.gi_sss_samples,
            nb_d=self.static.nb_d,
            nb_g=self.static.nb_g,
            nb_r=nb_r,
            pix_spread=pix_spread,
            n_sub=aa_samples * aa_samples,
            ff_shade=os.environ.get("RLS_FACEFORWARD", "shade") == "shade",
            use_sobol=os.environ.get("RLS_SOBOL", "1") == "1",
            rr_refr_start=int(os.environ.get("RLS_RR_START", "99")),
        )
        self.nb_d, self.nb_g, self.nb_r = (
            self.conf.nb_d, self.conf.nb_g, self.conf.nb_r
        )
        self.pix_spread = pix_spread
        self.stats = {"nearest_rays": 0, "shadow_rays": 0, "traces": 0}
        # RLS_PROFILE=1: per-stage wall timing (blocking) accumulated into
        # stats as t_<stage>/n_<stage> — the SURVEY §5 profiling hook; pair
        # with cli `render --profile` for a jax.profiler trace.
        self.profile = os.environ.get("RLS_PROFILE", "0") == "1"

    def _run(self, name, fn, *args, **kwargs):
        """Invoke a stage; under RLS_PROFILE=1, block and accumulate wall
        time per stage name (compile time lands in the first call)."""
        if not self.profile:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        try:
            jax.block_until_ready(out)
        except Exception:
            pass  # tracing context: nothing to block on
        dt = time.perf_counter() - t0
        self.stats[f"t_{name}"] = self.stats.get(f"t_{name}", 0.0) + dt
        self.stats[f"n_{name}"] = self.stats.get(f"n_{name}", 0) + 1
        return out

    def _grid_k(self, camera_level: bool) -> int:
        """Light-grid column count (shadow rays per hit) for stats."""
        st = self.static
        k = 0
        for i, v in enumerate(st.quad_valid):
            if v:
                k += st.quad_samples[i] ** 2 if camera_level else 1
        for i, v in enumerate(st.disk_valid):
            if v:
                k += st.disk_samples[i] ** 2 if camera_level else 1
        if st.sky_exists:
            # camera-level grids drop the sky column when both BSDF
            # families spawn (constant-dome dedup in _gen_shade_t)
            if not (camera_level and st.nb_d > 0 and st.nb_g > 0):
                k += max(st.sky_samples, 1) if camera_level else 1
        return k

    def _estimate_tile_rays(self, n: int):
        """Host mirror of the generation tree for the ray counters (the
        compiled program cannot update python stats)."""
        conf = self.conf
        nearest = 0
        shadow = 0

        def gen(n_rays, camera_level, ray_lobe, rr):
            nonlocal nearest, shadow
            nearest += n_rays
            shadow += n_rays * self._grid_k(camera_level)
            rd, rg, rrf, rt = rr
            if not camera_level:
                fallback = 0
                if (ray_lobe != "diffuse" and rg < conf.gi_glossy_depth
                        and rt < conf.gi_total_depth):
                    nearest += n_rays
                    gen(n_rays, False, "glossy",
                        (rd, rg + 1, rrf, rt + 1))
                else:
                    fallback += 1
                if rd < conf.gi_diffuse_depth and rt < conf.gi_total_depth:
                    nearest += n_rays
                    gen(n_rays, False, "diffuse",
                        (rd + 1, rg, rrf, rt + 1))
                else:
                    fallback += 1
                shadow += n_rays * fallback
            if (rrf < conf.gi_refraction_depth and rt < conf.gi_total_depth
                    and self.static.has_refract):
                nearest += n_rays
                gen(n_rays, False, "refracted", (rd, rg, rrf + 1, rt + 1))

        gen(n, True, "camera", (99, 99, 99, 99))
        if conf.nb_d:
            nearest += n * conf.nb_d
            gen(n * conf.nb_d, False, "diffuse", (1, 0, 0, 1))
        if conf.nb_g:
            nearest += n * conf.nb_g
            gen(n * conf.nb_g, False, "glossy", (0, 1, 0, 1))
        if conf.nb_r:
            nearest += n * conf.nb_r
            gen(n * conf.nb_r, False, "refracted", (0, 0, 1, 1))
        self.stats["nearest_rays"] += nearest
        self.stats["shadow_rays"] += shadow
        self.stats["traces"] += 1

    def render_tile(self, rays: cameramod.CameraRays, key):
        return self.render_tile_at(
            rays.origin, rays.direction, rays.pixel, 0,
            rays.origin.shape[0], key,
        )

    def render_tile_at(self, origin_full, direction_full, pixel_full, start,
                       tile_rays, key):
        self._estimate_tile_rays(tile_rays)
        # (1,) not rank-0: scalar jit params live in host memory (S(6)) and
        # cost a per-use DMA on the axon backend (docs/perf.md)
        start1 = jnp.asarray(start, jnp.int32).reshape(1)
        rgb, aovs, sss_in = self._run(
            "tile", _j_tile,
            self.sc, self.static, self.conf, origin_full, direction_full,
            pixel_full, start1, key, tile_rays=tile_rays,
        )
        if self.static.has_skin and self.conf.gi_sss_samples > 0:
            from . import sss as sssmod

            c = self._run(
                "sss", sssmod.sss_stage, self, sss_in, rng.fold(key, 4)
            )
            aovs = dict(aovs)
            aovs["sss"] = c
            rgb = _j_add(rgb, c)
        return rgb, aovs


@jax.jit
def _j_add(a, b):
    return a + b


def render_progressive(
    scene,
    accel,
    passes: int,
    seed=0,
    tile_pixels=16384,
    aa_samples=None,
    xres=None,
    yres=None,
    flush_path=None,
    verbose=True,
):
    """Accumulate `passes` independently-seeded renders (spp chunking, the
    checkpoint/resume mechanism SURVEY section 5 calls for): after each pass
    the running average is optionally flushed to `flush_path`, so long
    renders always have a usable partial framebuffer on disk."""
    from ..io import exr as exrmod

    acc = None
    for p in range(passes):
        t0 = time.perf_counter()
        out = render(scene, accel, seed=seed + p * 7919,
                     tile_pixels=tile_pixels, aa_samples=aa_samples,
                     xres=xres, yres=yres)
        dt = time.perf_counter() - t0
        stats = out.pop("__stats__", {})
        if acc is None:
            acc = {k: v.astype(np.float64) for k, v in out.items()}
        else:
            for k in acc:
                acc[k] += out[k]
        if flush_path is not None:
            exrmod.write_rgb(flush_path, (acc["RGBA"] / (p + 1)).astype(np.float32))
        if verbose:
            # pass 1 includes jit compiles; later passes are steady-state,
            # so the per-pass split is the compile/runtime decomposition.
            print(f"[rls] pass {p + 1}/{passes} done in {dt:.1f}s", flush=True)
    result = {k: (v / passes).astype(np.float32) for k, v in acc.items()}
    result["__stats__"] = stats
    return result


def render(
    scene,
    accel,
    seed=0,
    tile_pixels=16384,
    aa_samples=None,
    xres=None,
    yres=None,
):
    """Render the frame; returns {"RGBA": (H,W,3), aov_name: (H,W,3), ...}.

    The gaussian pixel filter (Arnold gaussian_filter, width = filter_width)
    is applied by on-device 3x3 splatting (integrator/splat.py); the running
    framebuffer stays on device across tiles and transfers to host once.
    """
    from . import splat as splatmod

    opts = scene.options
    aa = aa_samples or opts.aa_samples
    xres = xres or opts.xres
    yres = yres or opts.yres
    n_pix = xres * yres
    n_sub = aa * aa

    key = rng.stream(opts.aa_seed + seed)
    cam_rays = cameramod.generate(
        scene.camera, rng.fold(key, 77), aa, opts.filter_width, xres, yres
    )

    tr = TileRenderer(scene, accel, aa, xres=xres)

    tile_rays = min(tile_pixels * n_sub, n_pix * n_sub)
    n_rays = n_pix * n_sub
    n_tiles = (n_rays + tile_rays - 1) // tile_rays
    cam_rays = _pad_frame_rays(cam_rays, n_tiles * tile_rays - n_rays)

    names = None
    image = None
    wsum = None
    for ti in range(n_tiles):
        start = ti * tile_rays
        rgb, aovs = tr.render_tile_at(
            cam_rays.origin, cam_rays.direction, cam_rays.pixel, start,
            tile_rays, rng.fold(key, 1000 + ti),
        )
        vals, names = splatmod.pack_aovs(rgb, aovs)
        if image is None:
            image = jnp.zeros((n_pix, vals.shape[1]), jnp.float32)
            wsum = jnp.zeros((n_pix,), jnp.float32)
        image, wsum = splatmod.splat_accum(
            vals, cam_rays.pixel, cam_rays.sub_xy,
            jnp.asarray([start], jnp.int32), image, wsum,
            xres, yres, float(opts.filter_width), tile_rays,
            alpha=splatmod.filter_alpha(),
        )

    norm = jnp.maximum(wsum, 1e-12)[:, None]
    planes = splatmod.unpack_aovs(image / norm, names)
    out = {
        name: np.asarray(p, np.float32).reshape(yres, xres, 3)
        for name, p in planes.items()
    }
    out["__stats__"] = dict(tr.stats)
    return out


@partial(jax.jit, static_argnames=("pad",))
def _pad_frame_rays(cam_rays, pad: int):
    """Pad the frame's ray arrays so every tile is exactly tile_rays long
    (padding samples carry pixel=-1 and are dropped by the splat)."""
    if pad == 0:
        return cam_rays
    return cameramod.CameraRays(
        origin=jnp.pad(cam_rays.origin, ((0, pad), (0, 0))),
        direction=jnp.pad(
            cam_rays.direction, ((0, pad), (0, 0)), constant_values=1.0
        ),
        pixel=jnp.pad(cam_rays.pixel, (0, pad), constant_values=-1),
        weight=jnp.pad(cam_rays.weight, (0, pad)),
        sub_xy=jnp.pad(cam_rays.sub_xy, ((0, pad), (0, 0))),
    )
