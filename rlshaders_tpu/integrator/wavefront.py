"""Wavefront path-tracing integrator (staged).

The TPU-native inversion of the reference's recursive callback architecture
(SURVEY.md section 7). The frame is rendered as a pipeline of fused stages:

    trace -> shade_camera(prepare + light grid) -> occlude -> reduce+spawn
          -> per lobe family: trace -> pickup+light grid -> occlude -> reduce
          -> refraction chain to GI_refraction_depth

Each ray-tracing step is the Pallas cluster kernel (its own compiled
program); everything between two traces is one jitted stage. Intermediate
SoA buffers never leave the device. This staging keeps each compiled graph
small (seconds to compile) while XLA still fuses all shading math.

Light transport replicates the reference estimator:
* camera hit: direct light MIS loop (rlGgx.cpp:285-295) + indirect
  diffuse/glossy splitting with GI_*_samples^2 rays (rlGgx.cpp:307-323) +
  rough refraction (integrateRefract, rlGgx.h:205-246).
* secondary hits: direct light only; refraction continues to depth.
* area lights are "virtual geometry": BSDF rays pick up quad/disk emission
  analytically, balance-heuristic MIS against the light sampler; the skydome
  is picked up at ray escape (the two-strategy MIS of AiEvaluateLightSample).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import trace as tracemod
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
    quad_valid: tuple
    disk_valid: tuple
    quad_samples: tuple
    disk_samples: tuple
    has_refract: bool
    has_skin: bool
    has_bump: bool
    has_transparent: bool

    @staticmethod
    def of(scene: Scene) -> "SceneStatic":
        from ..scene.build import MAT_SKIN as _SKIN

        return SceneStatic(
            quad_valid=tuple(bool(x) for x in np.asarray(scene.quad_lights.valid)),
            disk_valid=tuple(bool(x) for x in np.asarray(scene.disk_lights.valid)),
            quad_samples=tuple(int(x) for x in np.asarray(scene.quad_lights.samples)),
            disk_samples=tuple(int(x) for x in np.asarray(scene.disk_lights.samples)),
            has_refract=bool(np.any(np.asarray(scene.materials.kt) > 1e-5)),
            has_skin=bool(np.any(np.asarray(scene.materials.mtype) == _SKIN)),
            has_bump=bool(np.any(np.asarray(scene.materials.bump_tex) >= 0)),
            has_transparent=bool(
                np.any(np.asarray(scene.materials.kt) > 1e-5)
                or np.any(np.asarray(scene.materials.opacity) < 1.0 - 1e-5)
            ),
        )


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


def _surface(scene: Scene, t, tri_in, uu, vv, o, d) -> Surface:
    g = scene.geometry
    tri = jnp.maximum(tri_in, 0)
    valid = tri_in >= 0
    e1 = g.e1[tri]
    e2 = g.e2[tri]
    p = o + d * t[..., None]
    ng = normalize(jnp.cross(e1, e2))
    w = 1.0 - uu - vv
    ns = normalize(
        w[..., None] * g.n0[tri] + uu[..., None] * g.n1[tri] + vv[..., None] * g.n2[tri]
    )
    uv = (
        w[..., None] * g.uv0[tri] + uu[..., None] * g.uv1[tri] + vv[..., None] * g.uv2[tri]
    )
    entering = dot(ng, d) < 0.0
    sign = jnp.where(dot(ns, d) < 0.0, 1.0, -1.0)
    nf = ns * sign[..., None]
    return Surface(
        p=p, ng=ng, ns=ns, nf=nf, uv=uv,
        mat_id=g.mat_id[tri], mesh_id=g.mesh_id[tri],
        tri=jnp.where(valid, tri_in, -1),
        entering=entering, valid=valid,
    )


def _expand(matg):
    return jax.tree_util.tree_map(lambda a: jnp.expand_dims(a, 1), matg)


class LightGrid(NamedTuple):
    """The (N, K) grid of light samples for one shading batch."""

    wi: jnp.ndarray       # (N, K, 3)
    dist: jnp.ndarray     # (N, K)
    rad: jnp.ndarray      # (N, K, 3)
    pdf: jnp.ndarray      # (N, K)
    w_d: jnp.ndarray      # (K,) per-column diffuse weight (affect/ns)
    w_s: jnp.ndarray      # (K,)
    nl: jnp.ndarray       # (K,) sample counts for MIS


def _light_grid(scene, static, surf, key, camera_level) -> LightGrid:
    n = surf.p.shape[0]
    dirs, dists, rads, pdfs = [], [], [], []
    col_w_d, col_w_s, col_nl = [], [], []

    ql = scene.quad_lights
    if sum(static.quad_valid):
        lsel = [i for i, v in enumerate(static.quad_valid) if v]
        s_per = max(static.quad_samples[i] for i in lsel) if camera_level else 1
        s = s_per * s_per if camera_level else 1
        u = (
            rng.stratified2(rng.fold(key, 101), (n, len(lsel)), s_per)
            if s > 1
            else rng.uniform2(rng.fold(key, 101), (n, len(lsel), 1))
        )
        idx = jnp.asarray(lsel)
        ls = lightsmod.sample_quads_batched(
            ql.verts[idx], ql.normal[idx], ql.area[idx], ql.radiance[idx],
            surf.p, u,
        )
        k = len(lsel) * s
        dirs.append(ls.direction.reshape(n, k, 3))
        dists.append(ls.dist.reshape(n, k))
        rads.append(ls.radiance.reshape(n, k, 3))
        pdfs.append(ls.pdf.reshape(n, k))
        for i in lsel:
            aff_d = float(np.asarray(ql.affect_diffuse)[i]) * float(
                np.asarray(ql.diffuse_weight)[i]
            )
            aff_s = float(np.asarray(ql.affect_specular)[i]) * float(
                np.asarray(ql.specular_weight)[i]
            )
            col_w_d += [aff_d / s] * s
            col_w_s += [aff_s / s] * s
            col_nl += [s] * s

    dl = scene.disk_lights
    if sum(static.disk_valid):
        lsel = [i for i, v in enumerate(static.disk_valid) if v]
        s_per = max(static.disk_samples[i] for i in lsel) if camera_level else 1
        s = s_per * s_per if camera_level else 1
        u = (
            rng.stratified2(rng.fold(key, 301), (n, len(lsel)), s_per)
            if s > 1
            else rng.uniform2(rng.fold(key, 301), (n, len(lsel), 1))
        )
        idx = jnp.asarray(lsel)
        ls = lightsmod.sample_disks_batched(
            dl.center[idx], dl.u[idx], dl.v[idx], dl.normal[idx], dl.area[idx],
            dl.radiance[idx], surf.p, u,
        )
        k = len(lsel) * s
        dirs.append(ls.direction.reshape(n, k, 3))
        dists.append(ls.dist.reshape(n, k))
        rads.append(ls.radiance.reshape(n, k, 3))
        pdfs.append(ls.pdf.reshape(n, k))
        for i in lsel:
            col_w_d += [float(np.asarray(dl.affect_diffuse)[i]) / s] * s
            col_w_s += [float(np.asarray(dl.affect_specular)[i]) / s] * s
            col_nl += [s] * s

    if scene.sky.exists:
        s = max(scene.sky.samples, 1) if camera_level else 1
        u = rng.uniform2(rng.fold(key, 501), (n, 1, s))
        ls = lightsmod.sample_sky_batched(scene.sky.radiance, surf.nf, u)
        dirs.append(ls.direction.reshape(n, s, 3))
        dists.append(ls.dist.reshape(n, s))
        rads.append(ls.radiance.reshape(n, s, 3))
        pdfs.append(ls.pdf.reshape(n, s))
        col_w_d += [float(scene.sky.affect_diffuse) / s] * s
        col_w_s += [float(scene.sky.affect_specular) / s] * s
        col_nl += [s] * s

    return LightGrid(
        wi=jnp.concatenate(dirs, axis=1),
        dist=jnp.concatenate(dists, axis=1),
        rad=jnp.concatenate(rads, axis=1),
        pdf=jnp.concatenate(pdfs, axis=1),
        w_d=jnp.asarray(col_w_d, jnp.float32),
        w_s=jnp.asarray(col_w_s, jnp.float32),
        nl=jnp.asarray(col_nl, jnp.float32),
    )


def _direct_reduce(matg, frame, wo_local, grid: LightGrid, transmission,
                   nb_diffuse, nb_glossy):
    """MIS-weighted reduction of the light grid -> (diffuse, specular).

    nb_* are the BSDF-strategy sample counts competing in the MIS. At
    secondary hits no BSDF rays are spawned, so callers pass 0 and the light
    strategy takes full weight — otherwise the BSDF-weighted share of the
    energy would be silently dropped.
    """
    frame_b = jax.tree_util.tree_map(lambda a: a[:, None, :], frame)
    wi_l = to_local(frame_b, grid.wi)
    matg_b = _expand(matg)
    wo_b = wo_local[:, None, :]
    fd, pd = dispatch.eval_diffuse(matg_b, wo_b, wi_l)
    fs, ps = dispatch.eval_specular(matg_b, wo_b, wi_l)

    live = grid.pdf > 0.0
    # transmission is per-channel (N, K, 3): colored Kt shadows (reference
    # out_opacity = 1 - Kt*KtColor, rlGgx.cpp:264-268) attenuate per RGB.
    inv_pdf = jnp.where(
        live[..., None],
        transmission / jnp.maximum(grid.pdf, 1e-12)[..., None],
        0.0,
    )
    wl_d = (
        lightsmod.mis_weight(grid.nl * grid.pdf, nb_diffuse * pd)
        if nb_diffuse > 0 else jnp.ones_like(pd)
    )
    wl_s = (
        lightsmod.mis_weight(grid.nl * grid.pdf, nb_glossy * ps)
        if nb_glossy > 0 else jnp.ones_like(ps)
    )
    diffuse = jnp.sum(grid.rad * inv_pdf * (wl_d * grid.w_d)[..., None] * fd, axis=1)
    specular = jnp.sum(grid.rad * inv_pdf * (wl_s * grid.w_s)[..., None] * fs, axis=1)
    return diffuse, specular


def _quad_lobe_factor(ql, li, lobe):
    """Per-light affect_{diffuse,specular} * {diffuse,specular}_weight factor
    for BSDF-sampled pickup, matching the factors the light-sample strategy
    applies through LightGrid.w_d/w_s (Arnold light-weight semantics)."""
    if lobe == "diffuse":
        return float(np.asarray(ql.affect_diffuse)[li]) * float(
            np.asarray(ql.diffuse_weight)[li]
        )
    return float(np.asarray(ql.affect_specular)[li]) * float(
        np.asarray(ql.specular_weight)[li]
    )


def _disk_lobe_factor(dl, li, lobe):
    if lobe == "diffuse":
        return float(np.asarray(dl.affect_diffuse)[li])
    return float(np.asarray(dl.affect_specular)[li])


def _light_pickup(scene, static, o, d, scene_t, lobe_pdf, nb, camera_level,
                  lobe="specular"):
    n = o.shape[0]
    out = jnp.zeros((n, 3))
    ql = scene.quad_lights
    for li in range(int(ql.verts.shape[0])):
        if not static.quad_valid[li]:
            continue
        fac = _quad_lobe_factor(ql, li, lobe)
        if fac == 0.0:
            continue
        nl = static.quad_samples[li] ** 2 if camera_level else 1
        hit, t = lightsmod.intersect_quad(ql.verts[li], ql.normal[li], o, d)
        vis = hit & (t < scene_t)
        p_l = lightsmod.pdf_quad(ql.verts[li], ql.normal[li], ql.area[li], o, d, t)
        w = lightsmod.mis_weight(nb * lobe_pdf, nl * p_l)
        out = out + jnp.where(
            vis[..., None], ql.radiance[li] * (fac * w)[..., None], 0.0
        )
    dl = scene.disk_lights
    for li in range(int(dl.center.shape[0])):
        if not static.disk_valid[li]:
            continue
        fac = _disk_lobe_factor(dl, li, lobe)
        if fac == 0.0:
            continue
        nl = static.disk_samples[li] ** 2 if camera_level else 1
        hit, t = lightsmod.intersect_disk(
            dl.center[li], dl.u[li], dl.v[li], dl.normal[li], o, d
        )
        vis = hit & (t < scene_t)
        cos_l = jnp.abs(dot(-d, dl.normal[li]))
        p_l = (t * t) / jnp.maximum(cos_l * dl.area[li], 1e-12)
        w = lightsmod.mis_weight(nb * lobe_pdf, nl * p_l)
        out = out + jnp.where(
            vis[..., None], dl.radiance[li] * (fac * w)[..., None], 0.0
        )
    return out


def _sky_pickup(scene, nf_at_origin, d, miss, lobe_pdf, nb, lobe="specular"):
    if not scene.sky.exists:
        return jnp.zeros(d.shape)
    fac = float(
        scene.sky.affect_diffuse if lobe == "diffuse" else scene.sky.affect_specular
    )
    if fac == 0.0:
        return jnp.zeros(d.shape)
    p_l = lightsmod.pdf_sky(nf_at_origin, d)
    w = lightsmod.mis_weight(nb * lobe_pdf, 1.0 * p_l)
    return jnp.where(miss[..., None], scene.sky.radiance * (fac * w)[..., None], 0.0)


class TileRenderer:
    """Per-(scene, tile-size) staged pipeline with separately jitted stages.

    Pallas trace kernels dispatch between stages; all buffers stay on device.
    """

    def __init__(self, scene: Scene, accel, aa_samples: int):
        self.scene = scene
        self.static = SceneStatic.of(scene)
        self.accel = accel
        self.aa = aa_samples
        o = scene.options
        self.nb_d = o.gi_diffuse_samples ** 2 if o.gi_diffuse_depth > 0 else 0
        self.nb_g = o.gi_glossy_samples ** 2 if o.gi_glossy_depth > 0 else 0
        self.nb_r = (
            o.gi_refraction_samples ** 2
            if (o.gi_refraction_depth > 0 and self.static.has_refract)
            else 0
        )

        self.stats = {"nearest_rays": 0, "shadow_rays": 0, "traces": 0}
        self._j_prepare = jax.jit(self._prepare, static_argnames=("camera_level",))
        self._j_reduce_direct = jax.jit(
            self._reduce_direct, static_argnames=("camera_level", "indirect_scaled")
        )
        self._j_spawn = jax.jit(self._spawn, static_argnames=("lobe", "nb"))
        self._j_pickup = jax.jit(self._pickup, static_argnames=("nb", "lobe"))
        self._j_refr_spawn = jax.jit(self._refr_spawn, static_argnames=("nb",))
        self._j_spec_bsdf = jax.jit(self._spec_bsdf_direct, static_argnames=("lobe",))

    # ----- stages (pure functions of device arrays + static flags) -----

    def _prepare(self, t, tri, uu, vv, o, d, key, camera_level):
        """Post-trace: surface, materials, shading frame, light-sample grid
        and the flattened shadow rays for the occlusion kernel."""
        surf = _surface(self.scene, t, tri, uu, vv, o, d)
        if self.static.has_bump:
            ns_b = dispatch.apply_bump(
                self.scene.materials, self.scene.textures, surf.mat_id,
                surf.p, surf.ns,
            )
            sign = jnp.where(dot(ns_b, d) < 0.0, 1.0, -1.0)
            surf = surf._replace(ns=ns_b, nf=ns_b * sign[..., None])
        matg = dispatch.gather(
            self.scene.materials, self.scene.textures, surf.mat_id, surf.uv,
            surf.entering, surf.p,
        )
        frame = build_frame_polar(surf.nf)
        wo = to_local(frame, -d)
        grid = _light_grid(self.scene, self.static, surf, key, camera_level)
        n, k = grid.pdf.shape
        sh_o = jnp.broadcast_to(surf.p[:, None, :], (n, k, 3)).reshape(-1, 3)
        sh_d = grid.wi.reshape(-1, 3)
        sh_t = grid.dist.reshape(-1)
        sh_ex = jnp.broadcast_to(surf.tri[:, None], (n, k)).reshape(-1)
        return surf, matg, frame, wo, grid, (sh_o + sh_d * RAY_EPS, sh_d,
                                             sh_t - 2 * RAY_EPS, sh_ex)

    def _reduce_direct(self, surf, matg, frame, wo, grid, shadowed,
                       camera_level, indirect_scaled):
        # At the camera level the BSDF strategies are the spawned indirect
        # ray families. At secondary hits BOTH lobes MIS against the 1-sample
        # BSDF strategy added in _lobe_bsdf_direct: without it, a sharp lobe
        # crossing a big light (specular) or a hit point adjacent to a light
        # (diffuse: the shared scene's walls sit ~0.3 units behind the side
        # lights, making the area pdf explode) is an unbounded-variance
        # firefly factory. The reference's AiEvaluateLightSample always runs
        # both strategies.
        nb_d = self.nb_d if camera_level else 1
        nb_g = self.nb_g if camera_level else 1
        n = surf.p.shape[0]
        shadowed = shadowed.reshape(n, -1, 3)
        diffuse, specular = _direct_reduce(
            matg, frame, wo, grid, shadowed, nb_d, nb_g
        )
        if camera_level and self.static.has_skin:
            # skin diffuse at camera level is replaced by the SSS probe stage
            from ..scene.build import MAT_SKIN as _SKIN

            diffuse = jnp.where((matg.mtype == _SKIN)[..., None], 0.0, diffuse)
        if indirect_scaled:
            is_dsy = (matg.mtype == MAT_DISNEY)[..., None]
            diffuse = jnp.where(
                is_dsy, diffuse * matg.indirect_diffuse_scale[..., None], diffuse
            )
            specular = jnp.where(
                is_dsy, specular * matg.indirect_specular_scale[..., None], specular
            )
        radiance = diffuse + specular + matg.emission
        valid3 = surf.valid[..., None]
        return (
            jnp.where(valid3, radiance, 0.0),
            jnp.where(valid3, diffuse, 0.0),
            jnp.where(valid3, specular, 0.0),
        )

    def _spawn(self, surf, matg, frame, wo, key, lobe, nb):
        """BSDF-sample nb rays per hit for one lobe; returns flat rays +
        per-sample weights/pdfs (ray-major layout)."""
        n = surf.p.shape[0]
        u = rng.stratified2(key, (n,), int(np.sqrt(nb)))
        matg_b = _expand(matg)
        wo_b = wo[:, None, :]
        if lobe == "diffuse":
            wi_l = dispatch.sample_diffuse(matg_b, wo_b, u[..., 0], u[..., 1])
            f, pdf = dispatch.eval_diffuse(matg_b, wo_b, wi_l)
            active = matg.has_diffuse
            if self.static.has_skin:
                from ..scene.build import MAT_SKIN as _SKIN

                active = active & (matg.mtype != _SKIN)
        else:
            wi_l = dispatch.sample_specular(matg_b, wo_b, u[..., 0], u[..., 1])
            f, pdf = dispatch.eval_specular(matg_b, wo_b, wi_l)
            active = matg.has_spec
        frame_b = jax.tree_util.tree_map(lambda a: a[:, None, :], frame)
        wi_w = to_world(frame_b, wi_l)
        ok = (
            active[:, None] & surf.valid[:, None]
            & (wi_l[..., 2] > 1e-5) & (pdf > 1e-9)
            & (wo[..., 2:3] > 1e-4)  # grazing-config guard (see _spec_bsdf_direct)
        )
        w = jnp.where(ok[..., None], f / pdf[..., None], 0.0)
        o_flat = jnp.repeat(surf.p, nb, axis=0)
        d_flat = wi_w.reshape(-1, 3)
        return o_flat + d_flat * RAY_EPS, d_flat, w, jnp.where(ok, pdf, 0.0), ok

    def _refr_spawn(self, surf, matg, frame, wo, key, nb):
        n = surf.p.shape[0]
        u = rng.stratified2(key, (n,), int(np.sqrt(nb)))
        matg_b = _expand(matg)
        wo_b = wo[:, None, :]
        wi_l, wgt = dispatch.sample_refract(matg_b, wo_b, u[..., 0], u[..., 1])
        ok = surf.valid[:, None] & matg.has_refract[:, None]
        ok = jnp.broadcast_to(ok, wi_l.shape[:2])
        frame_b = jax.tree_util.tree_map(lambda a: a[:, None, :], frame)
        wi_w = to_world(frame_b, wi_l)
        o_flat = jnp.repeat(surf.p, nb, axis=0)
        d_flat = wi_w.reshape(-1, 3)
        return (
            o_flat + d_flat * RAY_EPS, d_flat,
            jnp.where(ok[..., None], wgt, 0.0), ok,
        )

    def _spec_bsdf_direct(self, surf, matg, frame, wo, key, lobe="specular"):
        """One lobe sample per hit; returns (shadow rays, payload) for the
        BSDF half of the secondary direct-light MIS."""
        n = surf.p.shape[0]
        u = rng.uniform2(key, (n, 1))[:, 0]
        matg_b = _expand(matg)
        wo_b = wo[:, None, :]
        if lobe == "specular":
            wi_l = dispatch.sample_specular(matg_b, wo_b, u[..., 0:1], u[..., 1:2])
            f, pdf = dispatch.eval_specular(matg_b, wo_b, wi_l)
            active = matg.has_spec
        else:
            wi_l = dispatch.sample_diffuse(matg_b, wo_b, u[..., 0:1], u[..., 1:2])
            f, pdf = dispatch.eval_diffuse(matg_b, wo_b, wi_l)
            active = matg.has_diffuse
        wi_l = wi_l[:, 0]
        f = f[:, 0]
        pdf = pdf[:, 0]
        frame1 = frame
        wi_w = to_world(frame1, wi_l)
        # wo.z > 1e-4 guards silhouette-grazing configs where the Disney pdf's
        # max(1e-4, VdotN) clamp (rlDisney.cpp:535) diverges from the eval and
        # f/pdf explodes (observed 7e4 fireflies)
        ok = (
            active & surf.valid & (wi_l[..., 2] > 1e-5) & (pdf > 1e-9)
            & (wo[..., 2] > 1e-4)
        )
        # analytic emission of the NEAREST light along the lobe sample,
        # MIS vs the 1-sample light strategy; keep its distance so the
        # shadow query stops at the light (side walls sit just behind the
        # side lights in the shared scene)
        scene = self.scene
        static = self.static
        emit = jnp.zeros((n, 3))
        t_light = jnp.full((n,), 1e30)
        ql = scene.quad_lights
        for li in range(int(ql.verts.shape[0])):
            if not static.quad_valid[li]:
                continue
            fac = _quad_lobe_factor(ql, li, lobe)
            hq, tq = lightsmod.intersect_quad(ql.verts[li], ql.normal[li], surf.p, wi_w)
            p_l = lightsmod.pdf_quad(ql.verts[li], ql.normal[li], ql.area[li],
                                     surf.p, wi_w, tq)
            w_b = lightsmod.mis_weight(1.0 * pdf, 1.0 * p_l)
            take = hq & (tq < t_light)
            emit = jnp.where(
                take[..., None], ql.radiance[li] * (fac * w_b)[..., None], emit
            )
            t_light = jnp.where(take, tq, t_light)
        dl = scene.disk_lights
        for li in range(int(dl.center.shape[0])):
            if not static.disk_valid[li]:
                continue
            fac = _disk_lobe_factor(dl, li, lobe)
            hq, tq = lightsmod.intersect_disk(
                dl.center[li], dl.u[li], dl.v[li], dl.normal[li], surf.p, wi_w
            )
            cos_l = jnp.abs(dot(-wi_w, dl.normal[li]))
            p_l = (tq * tq) / jnp.maximum(cos_l * dl.area[li], 1e-12)
            w_b = lightsmod.mis_weight(1.0 * pdf, 1.0 * p_l)
            take = hq & (tq < t_light)
            emit = jnp.where(
                take[..., None], dl.radiance[li] * (fac * w_b)[..., None], emit
            )
            t_light = jnp.where(take, tq, t_light)
        w_over_pdf = jnp.where(ok[..., None], f / pdf[..., None], 0.0)
        return (surf.p + wi_w * RAY_EPS, wi_w, ok, t_light), w_over_pdf, emit

    def _pickup(self, o, d, t, tri, lobe_pdf, nf0_rep, nb, lobe):
        """Area-light + skydome pickup for BSDF-sampled rays."""
        scene_t = jnp.where(tri >= 0, t, 1e30)
        out = _light_pickup(self.scene, self.static, o, d, scene_t, lobe_pdf,
                            nb, True, lobe=lobe)
        out = out + _sky_pickup(self.scene, nf0_rep, d, tri < 0, lobe_pdf, nb,
                                lobe=lobe)
        return out

    # ----- host orchestration -----

    def _spec_direct_secondary(self, surf, matg, frame, wo, key):
        """BSDF half of the secondary-hit direct lighting, both lobes."""
        if not (sum(self.static.quad_valid) or sum(self.static.disk_valid)):
            return jnp.zeros_like(surf.p)
        out = jnp.zeros_like(surf.p)
        for i, lobe in enumerate(("specular", "diffuse")):
            (o, d, ok, t_light), w_over_pdf, emit = self._j_spec_bsdf(
                surf, matg, frame, wo, rng.fold(key, 4242 + i), lobe=lobe
            )
            any_emit = jnp.max(emit, axis=-1) > 0.0
            blocked = tracemod.occluded(
                self.accel, self.scene.geometry, o, d,
                jnp.where(t_light < 1e30, t_light - 2 * RAY_EPS, 0.0),
                vis_mask=VIS_SHADOW, exclude_tri=surf.tri,
            )
            lit = ok & any_emit & ~blocked
            out = out + jnp.where(lit[..., None], w_over_pdf * emit, 0.0)
        return out

    def _trace(self, o, d, vis, exclude=None):
        self.stats["nearest_rays"] += int(o.shape[0])
        self.stats["traces"] += 1
        hit = tracemod.nearest(self.accel, self.scene.geometry, o, d,
                               vis_mask=vis, exclude_tri=exclude)
        return hit.t, hit.tri, hit.u, hit.v

    def _shadow(self, sh):
        """Per-channel shadow transmission along the segments, (N, 3);
        1 = fully visible.

        Scenes with transmissive/transparent materials (rlGgx Kt shadows,
        rlGgx.cpp:264-268: out_opacity = 1 - Kt*KtColor) march up to 4
        transparent hits multiplying each surface's RGB shadow transmission
        (colored Kt shadows stay colored); fully-opaque scenes keep the
        single any-hit query."""
        o, d, tmax, ex = sh
        self.stats["shadow_rays"] += int(o.shape[0])
        if not self.static.has_transparent:
            blocked = tracemod.occluded(
                self.accel, self.scene.geometry, o, d, tmax,
                vis_mask=VIS_SHADOW, exclude_tri=ex,
            )
            return jnp.broadcast_to(
                (~blocked).astype(jnp.float32)[..., None], (o.shape[0], 3)
            )
        mats = self.scene.materials
        atten = jnp.ones((o.shape[0], 3), jnp.float32)
        origin = o
        remaining = tmax
        exclude = ex
        for _ in range(4):
            hit = tracemod.nearest(
                self.accel, self.scene.geometry, origin, d,
                vis_mask=VIS_SHADOW, exclude_tri=exclude,
            )
            ok = (hit.tri >= 0) & (hit.t < remaining)
            tri = jnp.maximum(hit.tri, 0)
            mid = self.scene.geometry.mat_id[tri]
            kt = mats.kt[mid][..., None] * mats.kt_color[mid]
            op = mats.opacity[mid]
            # shadow transmission: Kt color for transmissive, else 1-opacity
            trans = jnp.clip(jnp.maximum(kt, 1.0 - op), 0.0, 1.0)
            atten = atten * jnp.where(ok[..., None], trans, 1.0)
            step = jnp.where(ok, hit.t + 2 * RAY_EPS, remaining)
            origin = origin + d * step[..., None]
            remaining = remaining - step
            exclude = jnp.where(ok, hit.tri, -1)
            # early out handled by masking; atten==0 lanes waste work only
        return atten

    def shade_generation(self, o, d, key, vis, camera_level, indirect_scaled,
                         refr_left, is_refraction):
        """Trace + fully shade one ray generation; returns (surf pack, rgb,
        aov_d, aov_s). Recurses host-side for the refraction chain."""
        t, tri, uu, vv = self._trace(o, d, vis)
        surf, matg, frame, wo, grid, sh = self._j_prepare(
            t, tri, uu, vv, o, d, key, camera_level=camera_level
        )
        shadowed = self._shadow(sh)
        rgb, aov_d, aov_s = self._j_reduce_direct(
            surf, matg, frame, wo, grid, shadowed,
            camera_level=camera_level, indirect_scaled=indirect_scaled,
        )
        if not camera_level:
            rgb = rgb + self._spec_direct_secondary(surf, matg, frame, wo, key)
        if is_refraction:
            miss_rgb = jnp.where(
                (tri < 0)[..., None],
                self.scene.sky.radiance if self.scene.sky.exists else jnp.zeros(3),
                0.0,
            )
            rgb = rgb + miss_rgb

        if refr_left > 0 and self.static.has_refract:
            o2, d2, wgt, ok = self._j_refr_spawn(
                surf, matg, frame, wo, rng.fold(key, 900), 1
            )
            sub_pack = self.shade_generation(
                o2, d2, rng.fold(key, 33), VIS_REFRACTED,
                camera_level=False, indirect_scaled=indirect_scaled,
                refr_left=refr_left - 1, is_refraction=True,
            )
            sub_rgb = sub_pack[1]
            n = surf.p.shape[0]
            add = (wgt * sub_rgb.reshape(n, 1, 3))[:, 0, :]
            rgb = rgb + jnp.where(ok[:, 0][..., None], add, 0.0)
        return (surf, matg, frame, wo), rgb, aov_d, aov_s

    def render_tile(self, rays: cameramod.CameraRays, key):
        scene = self.scene
        opts = scene.options
        n0 = rays.origin.shape[0]

        (surf0, matg0, frame0, wo0), rgb, aov_dd, aov_ds = self.shade_generation(
            rays.origin, rays.direction, rng.fold(key, 0), VIS_CAMERA,
            camera_level=True, indirect_scaled=False,
            refr_left=0, is_refraction=False,
        )
        # camera sees the skydome directly
        if scene.sky.exists:
            rgb = rgb + jnp.where(
                (~surf0.valid)[..., None], scene.sky.radiance, 0.0
            )
        aovs = {"direct_diffuse": aov_dd, "direct_specular": aov_ds}

        def indirect_family(lobe, nb, vis, lkey, scale):
            o1, d1, w1, pdf1, ok1 = self._j_spawn(
                surf0, matg0, frame0, wo0, lkey, lobe=lobe, nb=nb
            )
            t1, tri1, u1, v1 = self._trace(o1, d1, vis)
            nf0_rep = jnp.repeat(surf0.nf, nb, axis=0)
            pick = self._j_pickup(
                o1, d1, t1, tri1, pdf1.reshape(-1), nf0_rep, nb=nb, lobe=lobe
            )
            _, sub_rgb, _, _ = self.shade_generation_from_trace(
                t1, tri1, u1, v1, o1, d1, rng.fold(lkey, 7),
                indirect_scaled=True,
                refr_left=opts.gi_refraction_depth - 1,
            )
            sub = pick + sub_rgb
            return (w1 * sub.reshape(n0, nb, 3)).mean(axis=1) * scale[..., None]

        if self.nb_d:
            scale = jnp.where(
                matg0.mtype == MAT_DISNEY, matg0.indirect_diffuse_scale, 1.0
            )
            c = indirect_family("diffuse", self.nb_d, VIS_DIFFUSE,
                                rng.fold(key, 1), scale)
            aovs["indirect_diffuse"] = c
            rgb = rgb + c
        else:
            aovs["indirect_diffuse"] = jnp.zeros((n0, 3))

        if self.nb_g:
            scale = jnp.where(
                matg0.mtype == MAT_DISNEY, matg0.indirect_specular_scale, 1.0
            )
            c = indirect_family("specular", self.nb_g, VIS_GLOSSY,
                                rng.fold(key, 2), scale)
            aovs["indirect_specular"] = c
            rgb = rgb + c
        else:
            aovs["indirect_specular"] = jnp.zeros((n0, 3))

        if self.nb_r:
            o1, d1, wgt, ok = self._j_refr_spawn(
                surf0, matg0, frame0, wo0, rng.fold(key, 3), self.nb_r
            )
            _, sub_rgb, _, _ = self.shade_generation(
                o1, d1, rng.fold(key, 13), VIS_REFRACTED,
                camera_level=False, indirect_scaled=False,
                refr_left=opts.gi_refraction_depth - 1, is_refraction=True,
            )
            c = (
                jnp.where(ok[..., None], wgt, 0.0)
                * sub_rgb.reshape(n0, self.nb_r, 3)
            ).mean(1)
            aovs["refraction"] = c
            rgb = rgb + c
        else:
            aovs["refraction"] = jnp.zeros((n0, 3))

        if self.static.has_skin and opts.gi_sss_samples > 0:
            from . import sss as sssmod

            c = sssmod.sss_stage(self, surf0, matg0, rng.fold(key, 4))
            aovs["sss"] = c
            rgb = rgb + c
        else:
            aovs["sss"] = jnp.zeros((n0, 3))

        return rgb, aovs

    def shade_generation_from_trace(self, t, tri, uu, vv, o, d, key,
                                    indirect_scaled, refr_left):
        """Like shade_generation but reuses an existing trace result."""
        surf, matg, frame, wo, grid, sh = self._j_prepare(
            t, tri, uu, vv, o, d, key, camera_level=False
        )
        shadowed = self._shadow(sh)
        rgb, aov_d, aov_s = self._j_reduce_direct(
            surf, matg, frame, wo, grid, shadowed,
            camera_level=False, indirect_scaled=indirect_scaled,
        )
        rgb = rgb + self._spec_direct_secondary(surf, matg, frame, wo, key)
        if refr_left > 0 and self.static.has_refract:
            o2, d2, wgt, ok = self._j_refr_spawn(
                surf, matg, frame, wo, rng.fold(key, 900), 1
            )
            _, sub_rgb, _, _ = self.shade_generation(
                o2, d2, rng.fold(key, 33), VIS_REFRACTED,
                camera_level=False, indirect_scaled=indirect_scaled,
                refr_left=refr_left - 1, is_refraction=True,
            )
            n = surf.p.shape[0]
            add = (wgt * sub_rgb.reshape(n, 1, 3))[:, 0, :]
            rgb = rgb + jnp.where(ok[:, 0][..., None], add, 0.0)
        return (surf, matg, frame, wo), rgb, aov_d, aov_s


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
        out = render(scene, accel, seed=seed + p * 7919,
                     tile_pixels=tile_pixels, aa_samples=aa_samples,
                     xres=xres, yres=yres)
        stats = out.pop("__stats__", {})
        if acc is None:
            acc = {k: v.astype(np.float64) for k, v in out.items()}
        else:
            for k in acc:
                acc[k] += out[k]
        if flush_path is not None:
            exrmod.write_rgb(flush_path, (acc["RGBA"] / (p + 1)).astype(np.float32))
        if verbose:
            print(f"[rls] pass {p + 1}/{passes} done")
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

    tr = TileRenderer(scene, accel, aa)

    tile_rays = tile_pixels * n_sub
    n_rays = n_pix * n_sub
    image = None
    wsum = None
    names = None

    for ti, start in enumerate(range(0, n_rays, tile_rays)):
        end = min(start + tile_rays, n_rays)
        sub_rays = _slice_rays(cam_rays, start, end, tile_rays)
        rgb, aovs = tr.render_tile(sub_rays, rng.fold(key, 1000 + ti))
        vals, names = splatmod.pack_aovs(rgb, aovs)
        img_t, ws_t = splatmod.splat(
            vals, sub_rays.pixel, sub_rays.sub_xy, xres, yres,
            float(opts.filter_width),
        )
        image = img_t if image is None else image + img_t
        wsum = ws_t if wsum is None else wsum + ws_t

    norm = jnp.maximum(wsum, 1e-12)[:, None]
    planes = splatmod.unpack_aovs(image / norm, names)
    out = {
        name: np.asarray(p, np.float32).reshape(yres, xres, 3)
        for name, p in planes.items()
    }
    out["__stats__"] = dict(tr.stats)
    return out


def _slice_rays(cam_rays, start, end, tile_rays):
    """Slice one tile's rays, zero-padding the final partial tile (padding
    samples carry pixel=-1 and are dropped by the splat)."""
    sl = slice(start, end)
    sub_rays = cameramod.CameraRays(
        origin=cam_rays.origin[sl],
        direction=cam_rays.direction[sl],
        pixel=cam_rays.pixel[sl],
        weight=cam_rays.weight[sl],
        sub_xy=cam_rays.sub_xy[sl],
    )
    if end - start < tile_rays:
        pad = tile_rays - (end - start)
        sub_rays = cameramod.CameraRays(
            origin=jnp.pad(sub_rays.origin, ((0, pad), (0, 0))),
            direction=jnp.pad(
                sub_rays.direction, ((0, pad), (0, 0)), constant_values=1.0
            ),
            pixel=jnp.pad(sub_rays.pixel, (0, pad), constant_values=-1),
            weight=jnp.pad(sub_rays.weight, (0, pad)),
            sub_xy=jnp.pad(sub_rays.sub_xy, ((0, pad), (0, 0))),
        )
    return sub_rays
