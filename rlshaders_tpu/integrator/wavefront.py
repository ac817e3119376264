"""Wavefront path-tracing integrator.

The TPU-native inversion of the reference's recursive callback architecture
(SURVEY.md section 7): SoA ray buffers, one fused shading stage per bounce
generation, all under jit. The light transport replicates the reference's
estimator structure:

* camera hit: direct light MIS loop (diffuse Oren-Nayar + specular lobes,
  rlGgx.cpp:285-295) + indirect diffuse/glossy splitting with GI_*_samples^2
  rays (AiBRDFIntegrate, rlGgx.cpp:307-323) + rough refraction
  (integrateRefract, rlGgx.h:205-246).
* secondary hits: direct light only (the plugin shaders integrate indirect
  lobes only on camera rays), refraction continues to GI_refraction_depth.
* area lights are "virtual geometry": BSDF-sampled rays pick up quad/disk
  emission analytically with balance-heuristic MIS against the light
  sampler; the skydome is picked up at ray escape the same way (this is
  exactly the two-strategy MIS AiEvaluateLightSample performs).

Generation sizes are static per scene config, so the whole frame compiles to
a fixed pipeline; the image is rendered in pixel tiles to bound memory.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import bvh as bvhmod
from ..core import rng
from ..core.frame import build_frame_polar, to_local, to_world
from ..core.vecmath import dot, normalize
from ..models import dispatch
from ..scene.build import (
    MAT_DISNEY,
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


class SceneStatic(NamedTuple):
    """Host-side (trace-time static) scene facts: which light slots are live,
    their sample counts, and whether any material refracts. Keeping these as
    Python values lets the tile function specialize the compiled pipeline."""

    quad_valid: tuple
    disk_valid: tuple
    quad_samples: tuple
    disk_samples: tuple
    has_refract: bool

    @staticmethod
    def of(scene: Scene) -> "SceneStatic":
        return SceneStatic(
            quad_valid=tuple(bool(x) for x in np.asarray(scene.quad_lights.valid)),
            disk_valid=tuple(bool(x) for x in np.asarray(scene.disk_lights.valid)),
            quad_samples=tuple(int(x) for x in np.asarray(scene.quad_lights.samples)),
            disk_samples=tuple(int(x) for x in np.asarray(scene.disk_lights.samples)),
            has_refract=bool(np.any(np.asarray(scene.materials.kt) > 1e-5)),
        )


class Surface(NamedTuple):
    p: jnp.ndarray        # (N, 3) hit position
    ng: jnp.ndarray       # geometric normal
    ns: jnp.ndarray       # interpolated shading normal
    nf: jnp.ndarray       # forward-facing shading normal
    uv: jnp.ndarray       # (N, 2)
    mat_id: jnp.ndarray
    mesh_id: jnp.ndarray
    tri: jnp.ndarray
    entering: jnp.ndarray
    valid: jnp.ndarray    # hit mask


def _surface(scene: Scene, hit: bvhmod.Hit, o, d) -> Surface:
    g = scene.geometry
    tri = jnp.maximum(hit.tri, 0)
    valid = hit.tri >= 0
    v0 = g.v0[tri]
    e1 = g.e1[tri]
    e2 = g.e2[tri]
    p = o + d * hit.t[..., None]
    ng = normalize(jnp.cross(e1, e2))
    w = 1.0 - hit.u - hit.v
    ns = normalize(
        w[..., None] * g.n0[tri] + hit.u[..., None] * g.n1[tri] + hit.v[..., None] * g.n2[tri]
    )
    uv = (
        w[..., None] * g.uv0[tri] + hit.u[..., None] * g.uv1[tri] + hit.v[..., None] * g.uv2[tri]
    )
    # align Ng with Ns side convention: Nf faces the incoming ray
    entering = dot(ng, d) < 0.0
    sign = jnp.where(dot(ns, d) < 0.0, 1.0, -1.0)
    nf = ns * sign[..., None]
    return Surface(
        p=p, ng=ng, ns=ns, nf=nf, uv=uv,
        mat_id=g.mat_id[tri], mesh_id=g.mesh_id[tri], tri=jnp.where(valid, hit.tri, -1),
        entering=entering, valid=valid,
    )


def _occluded(scene, bvh, p, wi, dist, exclude_tri):
    g = scene.geometry
    return bvhmod.occluded(
        bvh, g.v0, g.e1, g.e2,
        p + wi * RAY_EPS, wi, dist - 2 * RAY_EPS,
        exclude_tri=exclude_tri,
        vis_mask=VIS_SHADOW,
        tri_visibility=g.visibility,
        tri_opaque=g.opaque,
    )


def _direct_lighting(
    scene: Scene,
    static: SceneStatic,
    bvh: bvhmod.BVH,
    surf: Surface,
    matg: dispatch.MatG,
    frame,
    wo_local,
    key,
    camera_level: bool,
    nb_diffuse: int,
    nb_glossy: int,
):
    """Light-strategy direct lighting for one hit batch.

    Returns (diffuse_rgb, specular_rgb) already divided by sample counts and
    MIS-weighted against the BSDF strategies (the spawned indirect rays pick
    up the complementary weight).
    """
    n = surf.p.shape[0]
    diffuse = jnp.zeros((n, 3))
    specular = jnp.zeros((n, 3))

    ql = scene.quad_lights
    n_quads = int(ql.verts.shape[0])
    for li in range(n_quads):
        if not static.quad_valid[li]:
            continue
        ns = static.quad_samples[li] ** 2 if camera_level else 1
        k = rng.fold(key, 101 + li)
        u = rng.stratified2(k, (n,), int(np.sqrt(ns))) if ns > 1 else rng.uniform2(
            k, (n, 1)
        )
        d_acc = jnp.zeros((n, 3))
        s_acc = jnp.zeros((n, 3))
        for s in range(ns):
            ls = lightsmod.sample_quad(
                ql.verts[li], ql.normal[li], ql.area[li], ql.radiance[li],
                surf.p, u[:, s, 0], u[:, s, 1],
            )
            wi_l = to_local(frame, ls.direction)
            fd, pd = dispatch.eval_diffuse(matg, wo_local, wi_l)
            fs, ps = dispatch.eval_specular(matg, wo_local, wi_l)
            lit = (ls.pdf > 0.0) & ((fd[..., 0] + fs[..., 0] + fd[..., 1] + fs[..., 1] + fd[..., 2] + fs[..., 2]) != 0.0)
            shadowed = _occluded(scene, bvh, surf.p, ls.direction, ls.dist, surf.tri)
            vis = lit & ~shadowed
            inv_pdf = jnp.where(ls.pdf > 0, 1.0 / jnp.maximum(ls.pdf, 1e-12), 0.0)
            wl_d = lightsmod.mis_weight(ns * ls.pdf, nb_diffuse * pd)
            wl_s = lightsmod.mis_weight(ns * ls.pdf, nb_glossy * ps)
            contrib = ls.radiance * (vis * inv_pdf)[..., None]
            d_acc = d_acc + fd * contrib * wl_d[..., None]
            s_acc = s_acc + fs * contrib * wl_s[..., None]
        aff_d = ql.affect_diffuse[li] & True
        aff_s = ql.affect_specular[li] & True
        diffuse = diffuse + jnp.where(aff_d, 1.0, 0.0) * ql.diffuse_weight[li] * d_acc / ns
        specular = specular + jnp.where(aff_s, 1.0, 0.0) * ql.specular_weight[li] * s_acc / ns

    dl = scene.disk_lights
    n_disks = int(dl.center.shape[0])
    for li in range(n_disks):
        if not static.disk_valid[li]:
            continue
        ns = static.disk_samples[li] ** 2 if camera_level else 1
        k = rng.fold(key, 301 + li)
        u = rng.stratified2(k, (n,), int(np.sqrt(ns))) if ns > 1 else rng.uniform2(
            k, (n, 1)
        )
        d_acc = jnp.zeros((n, 3))
        s_acc = jnp.zeros((n, 3))
        for s in range(ns):
            ls = lightsmod.sample_disk(
                dl.center[li], dl.u[li], dl.v[li], dl.normal[li], dl.area[li],
                dl.radiance[li], surf.p, u[:, s, 0], u[:, s, 1],
            )
            wi_l = to_local(frame, ls.direction)
            fd, pd = dispatch.eval_diffuse(matg, wo_local, wi_l)
            fs, ps = dispatch.eval_specular(matg, wo_local, wi_l)
            shadowed = _occluded(scene, bvh, surf.p, ls.direction, ls.dist, surf.tri)
            vis = (ls.pdf > 0.0) & ~shadowed
            inv_pdf = jnp.where(ls.pdf > 0, 1.0 / jnp.maximum(ls.pdf, 1e-12), 0.0)
            wl_d = lightsmod.mis_weight(ns * ls.pdf, nb_diffuse * pd)
            wl_s = lightsmod.mis_weight(ns * ls.pdf, nb_glossy * ps)
            contrib = ls.radiance * (vis * inv_pdf)[..., None]
            d_acc = d_acc + fd * contrib * wl_d[..., None]
            s_acc = s_acc + fs * contrib * wl_s[..., None]
        diffuse = diffuse + jnp.where(dl.affect_diffuse[li], 1.0, 0.0) * d_acc / ns
        specular = specular + jnp.where(dl.affect_specular[li], 1.0, 0.0) * s_acc / ns

    if scene.sky.exists:
        ns = max(scene.sky.samples, 1) if camera_level else 1
        k = rng.fold(key, 501)
        u = rng.uniform2(k, (n, ns))
        d_acc = jnp.zeros((n, 3))
        s_acc = jnp.zeros((n, 3))
        for s in range(ns):
            ls = lightsmod.sample_sky(scene.sky.radiance, surf.nf, u[:, s, 0], u[:, s, 1])
            wi_l = to_local(frame, ls.direction)
            fd, pd = dispatch.eval_diffuse(matg, wo_local, wi_l)
            fs, ps = dispatch.eval_specular(matg, wo_local, wi_l)
            shadowed = _occluded(scene, bvh, surf.p, ls.direction, jnp.full((n,), 1e12), surf.tri)
            vis = (ls.pdf > 0.0) & ~shadowed
            inv_pdf = jnp.where(ls.pdf > 0, 1.0 / jnp.maximum(ls.pdf, 1e-12), 0.0)
            wl_d = lightsmod.mis_weight(ns * ls.pdf, nb_diffuse * pd)
            wl_s = lightsmod.mis_weight(ns * ls.pdf, nb_glossy * ps)
            contrib = ls.radiance * (vis * inv_pdf)[..., None]
            d_acc = d_acc + fd * contrib * wl_d[..., None]
            s_acc = s_acc + fs * contrib * wl_s[..., None]
        if scene.sky.affect_diffuse:
            diffuse = diffuse + d_acc / ns
        if scene.sky.affect_specular:
            specular = specular + s_acc / ns

    return diffuse, specular


def _light_pickup(scene: Scene, static: SceneStatic, o, d, scene_t, lobe_pdf, nb: int, camera_level: bool):
    """Emission picked up by BSDF-sampled rays hitting area lights (the BSDF
    half of the two-strategy MIS). Occlusion uses the scene hit distance."""
    n = o.shape[0]
    out = jnp.zeros((n, 3))
    ql = scene.quad_lights
    for li in range(int(ql.verts.shape[0])):
        if not static.quad_valid[li]:
            continue
        nl = static.quad_samples[li] ** 2 if camera_level else 1
        hit, t = lightsmod.intersect_quad(ql.verts[li], ql.normal[li], o, d)
        vis = hit & (t < scene_t)
        p_l = lightsmod.pdf_quad(ql.verts[li], ql.normal[li], ql.area[li], o, d, t)
        w = lightsmod.mis_weight(nb * lobe_pdf, nl * p_l)
        out = out + jnp.where(vis[..., None], ql.radiance[li] * w[..., None], 0.0)
    dl = scene.disk_lights
    for li in range(int(dl.center.shape[0])):
        if not static.disk_valid[li]:
            continue
        nl = static.disk_samples[li] ** 2 if camera_level else 1
        hit, t = lightsmod.intersect_disk(dl.center[li], dl.u[li], dl.v[li], dl.normal[li], o, d)
        vis = hit & (t < scene_t)
        cos_l = jnp.abs(dot(-d, dl.normal[li]))
        p_l = (t * t) / jnp.maximum(cos_l * dl.area[li], 1e-12)
        w = lightsmod.mis_weight(nb * lobe_pdf, nl * p_l)
        out = out + jnp.where(vis[..., None], dl.radiance[li] * w[..., None], 0.0)
    return out


def _sky_pickup(scene: Scene, nf_at_origin, d, miss, lobe_pdf, nb: int):
    """Skydome radiance for escaped BSDF rays, MIS'd vs the sky sampler."""
    if not scene.sky.exists:
        return jnp.zeros(d.shape)
    p_l = lightsmod.pdf_sky(nf_at_origin, d)
    w = lightsmod.mis_weight(nb * lobe_pdf, 1.0 * p_l)
    return jnp.where(miss[..., None], scene.sky.radiance * w[..., None], 0.0)


class ShadeOut(NamedTuple):
    radiance: jnp.ndarray         # (N, 3) emitted+direct at this hit
    aov_diffuse: jnp.ndarray
    aov_specular: jnp.ndarray


def _shade_direct(scene, static, bvh, surf, matg, frame, wo_local, key, camera_level,
                  nb_diffuse, nb_glossy, indirect_scaled):
    diffuse, specular = _direct_lighting(
        scene, static, bvh, surf, matg, frame, wo_local, key,
        camera_level, nb_diffuse, nb_glossy,
    )
    if indirect_scaled:
        # Disney applies indirect scales to its own direct light on secondary
        # rays (rlDisney.cpp:706-709)
        is_dsy = (matg.mtype == MAT_DISNEY)[..., None]
        diffuse = jnp.where(is_dsy, diffuse * matg.indirect_diffuse_scale[..., None], diffuse)
        specular = jnp.where(is_dsy, specular * matg.indirect_specular_scale[..., None], specular)
    radiance = diffuse + specular + matg.emission
    valid3 = surf.valid[..., None]
    return ShadeOut(
        radiance=jnp.where(valid3, radiance, 0.0),
        aov_diffuse=jnp.where(valid3, diffuse, 0.0),
        aov_specular=jnp.where(valid3, specular, 0.0),
    )


def _trace(scene, bvh, o, d, vis: int, exclude_tri=None):
    g = scene.geometry
    return bvhmod.intersect(
        bvh, g.v0, g.e1, g.e2, o + d * RAY_EPS, d,
        exclude_tri=exclude_tri,
        vis_mask=vis, tri_visibility=g.visibility,
    )


def render_tile(
    scene: Scene,
    static: SceneStatic,
    bvh: bvhmod.BVH,
    rays: cameramod.CameraRays,
    key,
    aa_samples: int,
):
    """Shade one tile of camera rays; returns per-RAY rgb + aov dict."""
    opts = scene.options
    n0 = rays.origin.shape[0]
    nb_d = opts.gi_diffuse_samples ** 2
    nb_g = opts.gi_glossy_samples ** 2
    nb_r = opts.gi_refraction_samples ** 2

    hit0 = _trace(scene, bvh, rays.origin, rays.direction, VIS_CAMERA)
    surf0 = _surface(scene, hit0, rays.origin, rays.direction)
    miss0 = ~surf0.valid

    # camera sees the skydome directly
    rgb = jnp.where(
        miss0[..., None],
        scene.sky.radiance if scene.sky.exists else jnp.zeros(3),
        0.0,
    ) * jnp.ones((n0, 3))

    matg0 = dispatch.gather(
        scene.materials, scene.textures, surf0.mat_id, surf0.uv, surf0.entering,
        surf0.p,
    )
    frame0 = build_frame_polar(surf0.nf)
    wo0 = to_local(frame0, -rays.direction)

    k0 = rng.fold(key, 0)
    sh0 = _shade_direct(
        scene, static, bvh, surf0, matg0, frame0, wo0, k0, True, nb_d, nb_g, False
    )
    rgb = rgb + jnp.where(surf0.valid[..., None], sh0.radiance, 0.0)
    aovs = {
        "direct_diffuse": sh0.aov_diffuse,
        "direct_specular": sh0.aov_specular,
    }

    # ---------------- indirect generation 1 ----------------
    def spawn_lobe(sample_fn, eval_fn, nb, lobe_key, active_mask):
        """Spawn nb rays per camera hit for one lobe. Returns flat arrays
        (n0*nb) of (o, d, weight, pdf, valid)."""
        u = rng.stratified2(lobe_key, (n0,), int(np.sqrt(nb)))
        os_, ds_, ws_, ps_ = [], [], [], []
        for s in range(nb):
            wi_l = sample_fn(matg0, wo0, u[:, s, 0], u[:, s, 1])
            f, pdf = eval_fn(matg0, wo0, wi_l)
            wi_w = to_world(frame0, wi_l)
            ok = active_mask & surf0.valid & (wi_l[..., 2] > 1e-5) & (pdf > 1e-9)
            w = jnp.where(ok[..., None], f / pdf[..., None], 0.0)
            os_.append(surf0.p)
            ds_.append(wi_w)
            ws_.append(w)
            ps_.append(jnp.where(ok, pdf, 0.0))
        return (
            jnp.concatenate(os_), jnp.concatenate(ds_),
            jnp.concatenate(ws_), jnp.concatenate(ps_),
        )

    total_indirect = {"indirect_diffuse": jnp.zeros((n0, 3)),
                      "indirect_specular": jnp.zeros((n0, 3)),
                      "refraction": jnp.zeros((n0, 3))}

    any_diffuse = opts.gi_diffuse_depth > 0
    any_glossy = opts.gi_glossy_depth > 0
    has_refract_mat = static.has_refract

    def shade_secondary(o, d, weight, lobe_pdf, nb, vis_flag, kind_key, depth,
                        refr_left, is_refraction=False):
        """Trace one generation of indirect rays; returns (n_rays, 3) rgb."""
        nr = o.shape[0]
        hit = _trace(scene, bvh, o, d, vis_flag)
        surf = _surface(scene, hit, o + d * RAY_EPS, d)
        active = jnp.max(jnp.abs(weight), axis=-1) > 0.0

        if is_refraction:
            # refraction rays don't see area lights (AiTrace misses them)
            # and pick up the background at FULL weight (AiTraceBackground,
            # rlGgx.h:238-240)
            out = jnp.where(
                (~surf.valid)[..., None],
                scene.sky.radiance if scene.sky.exists else jnp.zeros(3),
                0.0,
            ) * jnp.ones((nr, 3))
        else:
            out = _light_pickup(scene, static, o, d, jnp.where(surf.valid, hit.t, 1e30),
                                lobe_pdf, nb, True)
            # spawn layout is sample-major: ray i came from camera hit i % n0
            nf0 = jnp.tile(surf0.nf, (nr // n0, 1)) if nr != n0 else surf0.nf
            out = out + _sky_pickup(scene, nf0, d, ~surf.valid, lobe_pdf, nb)

        matg = dispatch.gather(scene.materials, scene.textures, surf.mat_id,
                               surf.uv, surf.entering, surf.p)
        frame = build_frame_polar(surf.nf)
        wo = to_local(frame, -d)
        kk = rng.fold(kind_key, depth)
        sh = _shade_direct(scene, static, bvh, surf, matg, frame, wo, kk, False, 1, 1, True)
        out = out + jnp.where(surf.valid[..., None], sh.radiance, 0.0)

        # refraction continues through glass at secondary hits (1 sample)
        if refr_left > 0 and has_refract_mat:
            u = rng.uniform2(rng.fold(kind_key, 900 + depth), (nr, 1))[:, 0]
            wi_l, wgt = dispatch.sample_refract(matg, wo, u[..., 0], u[..., 1])
            ok = surf.valid & matg.has_refract & (jnp.max(jnp.abs(wgt), -1) > 0)
            wi_w = to_world(frame, wi_l)
            sub = shade_secondary(
                surf.p, wi_w, jnp.where(ok[..., None], wgt, 0.0),
                jnp.zeros(nr), 1, VIS_REFRACTED, rng.fold(kind_key, 33), depth + 1,
                refr_left - 1, is_refraction=True,
            )
            out = out + jnp.where(ok[..., None], wgt * sub, 0.0)
        return jnp.where(active[..., None], out, 0.0)

    if any_diffuse:
        o1, d1, w1, p1 = spawn_lobe(
            dispatch.sample_diffuse, dispatch.eval_diffuse, nb_d,
            rng.fold(key, 1), matg0.has_diffuse,
        )
        sub = shade_secondary(o1, d1, w1, p1, nb_d, VIS_DIFFUSE, rng.fold(key, 11), 1,
                              opts.gi_refraction_depth - 1)
        contrib = (w1 * sub).reshape(nb_d, n0, 3).sum(0) / nb_d
        scale = jnp.where((matg0.mtype == MAT_DISNEY), matg0.indirect_diffuse_scale, 1.0)
        contrib = contrib * scale[..., None]
        total_indirect["indirect_diffuse"] = contrib
        rgb = rgb + contrib

    if any_glossy:
        o1, d1, w1, p1 = spawn_lobe(
            dispatch.sample_specular, dispatch.eval_specular, nb_g,
            rng.fold(key, 2), matg0.has_spec,
        )
        sub = shade_secondary(o1, d1, w1, p1, nb_g, VIS_GLOSSY, rng.fold(key, 12), 1,
                              opts.gi_refraction_depth - 1)
        contrib = (w1 * sub).reshape(nb_g, n0, 3).sum(0) / nb_g
        scale = jnp.where((matg0.mtype == MAT_DISNEY), matg0.indirect_specular_scale, 1.0)
        contrib = contrib * scale[..., None]
        total_indirect["indirect_specular"] = contrib
        rgb = rgb + contrib

    if has_refract_mat and opts.gi_refraction_depth > 0:
        u = rng.stratified2(rng.fold(key, 3), (n0,), opts.gi_refraction_samples)
        acc = jnp.zeros((n0, 3))
        for s in range(nb_r):
            wi_l, wgt = dispatch.sample_refract(matg0, wo0, u[:, s, 0], u[:, s, 1])
            ok = surf0.valid & matg0.has_refract
            wi_w = to_world(frame0, wi_l)
            sub = shade_secondary(
                surf0.p, wi_w, jnp.where(ok[..., None], wgt, 0.0),
                jnp.zeros(n0), 1, VIS_REFRACTED, rng.fold(key, 13 + s), 1,
                opts.gi_refraction_depth - 1, is_refraction=True,
            )
            acc = acc + jnp.where(ok[..., None], wgt * sub, 0.0)
        contrib = acc / nb_r
        total_indirect["refraction"] = contrib
        rgb = rgb + contrib

    aovs.update(total_indirect)
    return rgb, aovs


def render(
    scene: Scene,
    bvh: bvhmod.BVH,
    seed: int = 0,
    tile_pixels: int = 16384,
    aa_samples: int | None = None,
    xres: int | None = None,
    yres: int | None = None,
) -> dict[str, np.ndarray]:
    """Render the frame; returns {"RGBA": (H,W,3), aov_name: (H,W,3), ...}."""
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

    static = SceneStatic.of(scene)
    tile_fn = jax.jit(partial(render_tile, scene, static, bvh, aa_samples=aa))

    image = np.zeros((n_pix, 3), np.float32)
    aov_images: dict[str, np.ndarray] = {}
    tile_rays = tile_pixels * n_sub
    n_rays = n_pix * n_sub
    for start in range(0, n_rays, tile_rays):
        end = min(start + tile_rays, n_rays)
        sl = slice(start, end)
        sub_rays = cameramod.CameraRays(
            origin=cam_rays.origin[sl],
            direction=cam_rays.direction[sl],
            pixel=cam_rays.pixel[sl],
            weight=cam_rays.weight[sl],
        )
        if end - start < tile_rays:  # pad to static shape
            pad = tile_rays - (end - start)
            sub_rays = cameramod.CameraRays(
                origin=jnp.pad(sub_rays.origin, ((0, pad), (0, 0))),
                direction=jnp.pad(
                    sub_rays.direction, ((0, pad), (0, 0)), constant_values=1.0
                ),
                pixel=jnp.pad(sub_rays.pixel, (0, pad), constant_values=-1),
                weight=jnp.pad(sub_rays.weight, (0, pad)),
            )
        rgb, aovs = tile_fn(sub_rays, rng.fold(key, 1000 + start))
        rgb = np.asarray(rgb)[: end - start]
        w = np.asarray(sub_rays.weight)[: end - start, None]
        pix = np.asarray(sub_rays.pixel)[: end - start]
        np.add.at(image, pix, rgb * w)
        for name, a in aovs.items():
            img = aov_images.setdefault(name, np.zeros((n_pix, 3), np.float32))
            np.add.at(img, pix, np.asarray(a)[: end - start] * w)

    image /= n_sub
    out = {"RGBA": image.reshape(yres, xres, 3)}
    for name, img in aov_images.items():
        out[name] = (img / n_sub).reshape(yres, xres, 3)
    return out
