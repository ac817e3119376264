"""BSSRDF probe-ray subsurface scattering stage (rlSkin's SSS integral).

Wavefront rebuild of the reference's SssSampler (src/rlSss.h:100-554): the
recursive message-state probe tracing becomes explicit SoA probe buffers:

1. per camera hit on a subsurface material, spawn GI_sss_samples^2 probe
   rays — axis chosen N/U/V with probability 0.5/0.25/0.25, entry offset on
   a disk at a radius drawn from the normalized-diffusion inverse CDF,
   segment length 2*sqrt(rmax^2 - r^2) (rlSss.h:487-533);
2. march each probe segment through up to K_PROBE nearest-hit queries
   (replaces the AiTraceProbe chain; kMaxProbeDepth = 12 at rlSss.h:105),
   keeping only same-mesh hits within the profile radius;
3. shade every accepted probe hit: Lambert direct lighting x R(r) with the
   optional cavity fadeout sqrt((1+cos)/2) (rlSss.h:401-413), plus one
   cosine-sampled indirect diffuse bounce x R(r)/pi (rlSss.h:456-483);
4. combine with the 3-axis MIS pdf — project the displacement onto the
   probe frame, pdf = sum_axis profile_pdf(r_axis) * |axis.N_hit| * w_axis
   (rlSss.h:251-263) — and average over samples.

The whole stage is ONE fused jitted program (traces included) taking the
scene as a device pytree argument, shared across tiles and same-shape
scenes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..accel import trace as tracemod
from ..bsdf import sss_profiles as sp
from ..core import rng
from ..core.frame import build_frame_polar, to_world
from ..core.vecmath import cosine_sample_hemisphere, dot, normalize
from ..scene.build import VIS_SHADOW
from . import lights as lightsmod

K_PROBE = 12  # probe chain length (kMaxProbeDepth = 12, rlSss.h:105)
RAY_EPS = 1e-3
# Effective exitance factor of Arnold 4's raytraced standard-shader SSS on
# the unit-mass cubic falloff — calibrated against golden 0004's logo disc
# (see the albedo application in _j_sss for the measurement chain).
STD_SSS_ENERGY = 0.567


def _probe_rays(profile, frame, p, u1, u2):
    """Build probe segments (origin, dir, maxdist, radius) per rlSss.h:487-533."""
    idx = jnp.where(u1 < 0.5, 0, jnp.where(u1 < 0.75, 2, 3))
    rx = jnp.where(
        u1 < 0.5,
        u1 / 0.5,
        jnp.where(u1 < 0.75, (u1 - 0.5) / 0.25, (u1 - 0.75) / 0.25),
    )
    r = sp.nd_sample_radius(profile, rx)
    rmax = profile.max_radius
    phi = 2.0 * jnp.pi * u2
    off_x = jnp.cos(phi) * r
    off_z = jnp.sin(phi) * r
    off_y = jnp.sqrt(jnp.maximum(rmax * rmax - r * r, 0.0))
    maxdist = off_y * 2.0

    un, vn, nn = frame.u, frame.v, frame.n
    # axis N (idx<2): dir=-N, offset in (U, N, V)
    o_n = off_x[..., None] * un + off_y[..., None] * nn + off_z[..., None] * vn
    d_n = -nn
    # axis U (idx==2): dir=+U, offset in (V, -U, N)
    o_u = off_x[..., None] * vn - off_y[..., None] * un + off_z[..., None] * nn
    d_u = un
    # axis V (idx==3): dir=+V, offset in (N, -V, U)
    o_v = off_x[..., None] * nn - off_y[..., None] * vn + off_z[..., None] * un
    d_v = vn

    is_n = (idx < 2)[..., None]
    is_u = (idx == 2)[..., None]
    off = jnp.where(is_n, o_n, jnp.where(is_u, o_u, o_v))
    dirs = jnp.where(is_n, d_n, jnp.where(is_u, d_u, d_v))
    return p + off, dirs, maxdist, r


def _lambert_direct(sc, static, surf_p, surf_n, exclude_tri, key, sq=None,
                    cam_budget=False):
    """Direct Lambert irradiance-reflectance at probe hits: per-light area
    samples MIS-combined with one cosine-hemisphere sample (the two
    strategies AiEvaluateLightSample runs for the reference's OrenNayar(0)
    light loop, rlSss.h:439-454 — pure area sampling explodes when a large
    light nearly touches the surface, e.g. testsuite case 0010).
    Returns (N, 3).

    cam_budget=True draws each light's full camera-level budget
    (samples^2 area samples per light, like the reference's camera-context
    light loop at probe hits) instead of 1 — a pure variance reduction for
    the converged skin renders; MIS nl tracks the per-light count. Per-light
    affect_diffuse * diffuse-weight factors (LightGrid.w_d semantics) apply
    to every strategy.

    sq = (pix, sidx, salt, purpose_base) switches the draws to the
    per-pixel Owen-Sobol streams (core/rng.py): lane i's draw for slot s of
    light li comes from stream (pix[i], purpose_base*slot*li) at index
    sidx[i] — jointly stratified over the pixel's whole probe budget.
    purpose_base may be traced (the probe-chain step index)."""
    n = surf_p.shape[0]
    out = jnp.zeros((n, 3))

    def draw(slot, k):
        """(n, k, 1, 2) sample pairs for k parallel light columns."""
        if sq is None:
            return rng.uniform2(rng.fold(key, slot), (n, k, 1))
        pix, sidx, salt, pb = sq
        purpose = (
            jnp.asarray(pb, jnp.uint32) * jnp.uint32(0x1003)
            ^ (jnp.uint32(slot) * jnp.uint32(0x10007)
               + jnp.arange(k, dtype=jnp.uint32))
        )
        seed = rng._stream_seed(pix[:, None], purpose[None, :], salt)
        idx = jnp.broadcast_to(sidx[:, None], (n, k))
        return rng.sobol2(idx.reshape(-1), seed.reshape(-1)).reshape(
            n, k, 1, 2
        )

    def _counts(lsel, samples):
        return [max(samples[i], 1) ** 2 if cam_budget else 1 for i in lsel]

    dirs, dists, rads, pdfs = [], [], [], []
    col_w, col_nl = [], []  # per-column 1/S_li estimator weight, MIS count
    ql = sc.quad_lights
    quad_nl = {}
    if sum(static.quad_valid):
        lsel = [i for i, v in enumerate(static.quad_valid) if v
                and static.quad_w_d[i] != 0.0]
        ns = _counts(lsel, static.quad_samples)
        quad_nl = dict(zip(lsel, ns))
        if lsel:
            idx_rep = [li for li, s in zip(lsel, ns) for _ in range(s)]
            u = draw(11, len(idx_rep))
            idx = jnp.asarray(idx_rep)
            fac = jnp.asarray(
                [static.quad_w_d[li] for li in idx_rep], jnp.float32)
            ls = lightsmod.sample_quads_batched(
                ql.verts[idx], ql.normal[idx], ql.area[idx],
                ql.radiance[idx] * fac[:, None], surf_p, u,
            )
            k = len(idx_rep)
            dirs.append(ls.direction.reshape(n, k, 3))
            dists.append(ls.dist.reshape(n, k))
            rads.append(ls.radiance.reshape(n, k, 3))
            pdfs.append(ls.pdf.reshape(n, k))
            col_w += [1.0 / s for li, s in zip(lsel, ns) for _ in range(s)]
            col_nl += [float(s) for li, s in zip(lsel, ns) for _ in range(s)]
    dl = sc.disk_lights
    disk_nl = {}
    if sum(static.disk_valid):
        lsel = [i for i, v in enumerate(static.disk_valid) if v
                and static.disk_w_d[i] != 0.0]
        ns = _counts(lsel, static.disk_samples)
        disk_nl = dict(zip(lsel, ns))
        if lsel:
            idx_rep = [li for li, s in zip(lsel, ns) for _ in range(s)]
            u = draw(12, len(idx_rep))
            idx = jnp.asarray(idx_rep)
            fac = jnp.asarray(
                [static.disk_w_d[li] for li in idx_rep], jnp.float32)
            ls = lightsmod.sample_disks_batched(
                dl.center[idx], dl.u[idx], dl.v[idx], dl.normal[idx],
                dl.area[idx], dl.radiance[idx] * fac[:, None], surf_p, u,
            )
            k = len(idx_rep)
            dirs.append(ls.direction.reshape(n, k, 3))
            dists.append(ls.dist.reshape(n, k))
            rads.append(ls.radiance.reshape(n, k, 3))
            pdfs.append(ls.pdf.reshape(n, k))
            col_w += [1.0 / s for li, s in zip(lsel, ns) for _ in range(s)]
            col_nl += [float(s) for li, s in zip(lsel, ns) for _ in range(s)]
    if static.sky_exists and static.sky_w_d != 0.0:
        u = draw(13, 1)
        ls = lightsmod.sample_sky_batched(
            sc.sky_radiance * static.sky_w_d, surf_n, u)
        dirs.append(ls.direction.reshape(n, 1, 3))
        dists.append(ls.dist.reshape(n, 1))
        rads.append(ls.radiance.reshape(n, 1, 3))
        pdfs.append(ls.pdf.reshape(n, 1))
        col_w.append(1.0)
        col_nl.append(1.0)
    if not dirs:
        return out

    wi = jnp.concatenate(dirs, axis=1)
    dist = jnp.concatenate(dists, axis=1)
    rad = jnp.concatenate(rads, axis=1)
    pdf_l = jnp.concatenate(pdfs, axis=1)
    k = wi.shape[1]
    col_w_a = jnp.asarray(col_w, jnp.float32)[None, :]
    col_nl_a = jnp.asarray(col_nl, jnp.float32)[None, :]

    cos_i = jnp.maximum(jnp.sum(wi * surf_n[:, None, :], -1), 0.0)
    f_cos = cos_i / jnp.pi
    p_cos = cos_i / jnp.pi  # cosine-strategy pdf at the light directions
    w_l = (col_nl_a * pdf_l) / jnp.maximum(
        col_nl_a * pdf_l + p_cos, 1e-12) * col_w_a

    # normal+ray origin offset, same policy as the main grid's shadow rays
    # (wavefront._gen_shade_t): the wi-only offset falsely self-occludes in
    # the grazing band; 3*RAY_EPS t_max margin covers the normal offset's
    # projection along the ray (ADVICE r4)
    p_off = surf_p + surf_n * RAY_EPS
    p_flat = jnp.broadcast_to(p_off[:, None, :], (n, k, 3)).reshape(-1, 3)
    ex_flat = jnp.broadcast_to(exclude_tri[:, None], (n, k)).reshape(-1)
    shadowed = tracemod.occluded(
        sc.accel, sc.geometry,
        p_flat + wi.reshape(-1, 3) * RAY_EPS, wi.reshape(-1, 3),
        dist.reshape(-1) - 3 * RAY_EPS,
        vis_mask=VIS_SHADOW, exclude_tri=ex_flat,
    ).reshape(n, k)

    inv_pdf = jnp.where(pdf_l > 0, 1.0 / jnp.maximum(pdf_l, 1e-12), 0.0)
    out = jnp.sum(rad * (f_cos * w_l * inv_pdf * ~shadowed)[..., None], axis=1)

    # cosine-hemisphere strategy: one sample; pick up area-light emission
    # analytically with the complementary MIS weight
    ub = draw(77, 1)[:, 0, 0]
    local = cosine_sample_hemisphere(ub[..., 0], ub[..., 1])
    cframe = build_frame_polar(surf_n)
    bdir = to_world(cframe, local)
    p_b = jnp.maximum(local[..., 2], 0.0) / jnp.pi

    emit = jnp.zeros((n, 3))
    hit_t = jnp.full((n,), 1e30)
    for li in range(len(static.quad_valid)):
        if not static.quad_valid[li] or static.quad_w_d[li] == 0.0:
            continue
        hq, tq = lightsmod.intersect_quad(ql.verts[li], ql.normal[li], surf_p, bdir)
        pl_q = lightsmod.pdf_quad(ql.verts[li], ql.normal[li], ql.area[li],
                                  surf_p, bdir, tq)
        nl = float(quad_nl.get(li, 1))
        w_b = p_b / jnp.maximum(p_b + nl * pl_q, 1e-12)
        take = hq & (tq < hit_t)
        emit = jnp.where(
            take[..., None],
            ql.radiance[li] * (static.quad_w_d[li] * w_b)[..., None], emit)
        hit_t = jnp.where(take, tq, hit_t)
    for li in range(len(static.disk_valid)):
        if not static.disk_valid[li] or static.disk_w_d[li] == 0.0:
            continue
        hq, tq = lightsmod.intersect_disk(dl.center[li], dl.u[li], dl.v[li],
                                          dl.normal[li], surf_p, bdir)
        cos_ld = jnp.abs(jnp.sum(-bdir * dl.normal[li], -1))
        pl_q = (tq * tq) / jnp.maximum(cos_ld * dl.area[li], 1e-12)
        nl = float(disk_nl.get(li, 1))
        w_b = p_b / jnp.maximum(p_b + nl * pl_q, 1e-12)
        take = hq & (tq < hit_t)
        emit = jnp.where(
            take[..., None],
            dl.radiance[li] * (static.disk_w_d[li] * w_b)[..., None], emit)
        hit_t = jnp.where(take, tq, hit_t)

    any_emit = hit_t < 1e30
    b_shadow = tracemod.occluded(
        sc.accel, sc.geometry,
        p_off + bdir * RAY_EPS, bdir,
        jnp.where(any_emit, hit_t, 0.0) - 3 * RAY_EPS,
        vis_mask=VIS_SHADOW, exclude_tri=exclude_tri,
    )
    # f/p_b for a cosine sample of Lambert is exactly 1/pi * cos / (cos/pi) = 1
    out = out + jnp.where((any_emit & ~b_shadow)[..., None], emit, 0.0)
    # skydome seen by the cosine sample (no scene hit)
    if static.sky_exists and static.sky_w_d != 0.0:
        sky_vis = ~tracemod.occluded(
            sc.accel, sc.geometry,
            p_off + bdir * RAY_EPS, bdir, jnp.full((n,), 1e12),
            vis_mask=VIS_SHADOW, exclude_tri=exclude_tri,
        ) & ~any_emit
        # MIS vs the sky's cosine sampler (identical pdfs -> weight 1/2)
        out = out + jnp.where(
            sky_vis[..., None], sc.sky_radiance * (0.5 * static.sky_w_d), 0.0)
    return out


@partial(jax.jit, static_argnames=("static", "n_sss", "gi_diffuse", "k_probe",
                                   "use_sobol", "cam_budget"))
def _j_sss(sc, static, surf_p, surf_ns, surf_mesh, is_sss, sss_dist,
           sss_color, sss_weight, cavity_flag, cubic_flag, key, pix=None,
           aa=None, salt=None, *, n_sss, gi_diffuse, k_probe,
           use_sobol=False, cam_budget=False):
    """The fused probe-march SSS program (all K_PROBE traces inside)."""
    if salt is not None and getattr(salt, "ndim", 0) == 1:
        # salt arrives as (1,) — rank-0 jit params land in host memory S(6)
        # and cost a per-use DMA on the axon backend (docs/perf.md)
        salt = salt[0]
    n0 = surf_p.shape[0]
    # Arnold-4 cubic falloff for `standard` Ksss lanes, Burley for rlSkin
    profile0 = sp.make_nd_profile(sss_dist, cubic_flag)  # fields (N0, ...)
    # probe frame: smooth normal up-axis (rlSss.h:147-158)
    frame0 = build_frame_polar(surf_ns)

    # flatten (N0, S) probe batch, ray-major
    s_total = n_sss
    rep = lambda a: jnp.repeat(a, s_total, axis=0)
    prof_f = jax.tree_util.tree_map(rep, profile0)
    frame_f = jax.tree_util.tree_map(rep, frame0)
    p_f = rep(surf_p)
    ns_f = rep(surf_ns)
    mesh_f = rep(surf_mesh)
    skin_f = rep(is_sss)
    cav_f = rep(cavity_flag)
    nf_total = n0 * s_total

    if use_sobol:
        # per-pixel jointly-stratified disc samples: lane-major layout
        # matches the jnp.repeat(..., s_total) probe batch above.
        # 604<<8 = wavefront.P_SSS (kept literal: no circular import).
        u = rng.sobol2_rep(pix, aa, s_total, 604 << 8, salt)
    else:
        u = rng.stratified2(
            rng.fold(key, 1), (n0,), int(n_sss ** 0.5)
        ).reshape(nf_total, 2)
    o_probe, d_probe, maxdist, _r = _probe_rays(
        prof_f, frame_f, p_f, u[:, 0], u[:, 1]
    )
    if use_sobol:
        # per-lane sobol addressing for the probe-hit lighting draws:
        # lane i*s_total + c belongs to pixel pix[i], global sample index
        # aa[i]*s_total + c — the whole (AA x s_total) probe budget of one
        # pixel shares each (pixel, step, slot) stream
        pix_f = rep(pix)
        sidx_f = rep(aa).astype(jnp.uint32) * jnp.uint32(s_total) + (
            jnp.arange(nf_total, dtype=jnp.uint32) % jnp.uint32(s_total)
        )
    else:
        pix_f = sidx_f = None

    accum = jnp.zeros((nf_total, 3))
    origin = o_probe
    remaining = maxdist
    exclude = jnp.full((nf_total,), -1, jnp.int32)
    g = sc.geometry

    # lax.fori_loop over the probe chain: the step body (2 traces + the
    # lighting occlusions) is compiled ONCE and iterated k_probe times —
    # unrolling 12 steps put ~120 pallas calls into one program and made the
    # (remote) compiler take minutes
    def probe_step(k_step, carry):
        origin, remaining, exclude, accum = carry
        hit = tracemod.nearest(
            sc.accel, g, origin + d_probe * RAY_EPS, d_probe,
            vis_mask=0xFF, exclude_tri=exclude,
        )
        seg_ok = skin_f & (hit.tri >= 0) & (hit.t < remaining)
        tri = jnp.maximum(hit.tri, 0)
        hp = origin + d_probe * (hit.t[..., None] + RAY_EPS)
        w = 1.0 - hit.u - hit.v
        hn = normalize(
            w[..., None] * g.n0[tri] + hit.u[..., None] * g.n1[tri]
            + hit.v[..., None] * g.n2[tri]
        )
        same_mesh = g.mesh_id[tri] == mesh_f

        disp = hp - p_f
        r_hit = jnp.sqrt(jnp.maximum(dot(disp, disp), 1e-20))
        within = r_hit <= prof_f.max_radius
        shade_ok = seg_ok & same_mesh & within

        # align the hit normal with the geometric reference (rlSss.h:393-399)
        hn = jnp.where(dot(hn, g.n0[tri])[..., None] < 0.0, -hn, hn)

        # cavity fadeout (rlSss.h:401-413)
        cavity = jnp.ones_like(r_hit)
        disp_dir = disp / r_hit[..., None]
        cos_cav_out = jnp.abs(dot(hn, ns_f))
        cos_cav_in = jnp.clip(dot(hn, ns_f), -1.0, 1.0)
        inward = dot(ns_f, disp_dir) < 0.0
        cos_cav = jnp.where(inward, cos_cav_out, cos_cav_in)
        fade = jnp.sqrt(jnp.clip((1.0 + cos_cav) * 0.5, 0.0, 1.0))
        cavity = jnp.where(cav_f, fade, cavity)

        def sq_of(base):
            if not use_sobol:
                return None
            return (pix_f, sidx_f, salt,
                    jnp.uint32(base) + jnp.asarray(k_step, jnp.uint32))

        # direct Lambert at the probe hit (camera-level light budget when
        # the stage runs at camera hits; the bounce below stays 1-sample)
        direct = _lambert_direct(
            sc, static, hp, hn, jnp.where(shade_ok, hit.tri, -1),
            rng.fold(key, 100 + k_step), sq=sq_of(100),
            cam_budget=cam_budget,
        )

        # one cosine-sampled indirect diffuse bounce (rlSss.h:456-483)
        if gi_diffuse > 0:
            if use_sobol:
                ub = rng.sobol2(sidx_f, rng._stream_seed(
                    pix_f,
                    jnp.uint32(200) + jnp.asarray(k_step, jnp.uint32),
                    salt,
                ))
            else:
                ub = rng.uniform2(
                    rng.fold(key, 200 + k_step), (nf_total, 1)
                )[:, 0]
            local = cosine_sample_hemisphere(ub[..., 0], ub[..., 1])
            hframe = build_frame_polar(hn)
            bdir = to_world(hframe, local)
            bhit = tracemod.nearest(
                sc.accel, g, hp + bdir * RAY_EPS, bdir,
                vis_mask=0xFF, exclude_tri=jnp.where(shade_ok, hit.tri, -1),
            )
            btri = jnp.maximum(bhit.tri, 0)
            bp = hp + bdir * bhit.t[..., None]
            bw = 1.0 - bhit.u - bhit.v
            bn = normalize(
                bw[..., None] * g.n0[btri] + bhit.u[..., None] * g.n1[btri]
                + bhit.v[..., None] * g.n2[btri]
            )
            bn = jnp.where(dot(bn, -bdir)[..., None] < 0.0, -bn, bn)
            b_direct = _lambert_direct(
                sc, static, bp, bn, jnp.where(bhit.tri >= 0, bhit.tri, -1),
                rng.fold(key, 300 + k_step), sq=sq_of(300),
            )
            # bounce hit shades as the skin fallback: albedo * direct
            b_albedo = sc.materials.sss_color[g.mat_id[btri]] * (
                sc.materials.sss_weight[g.mat_id[btri]][..., None]
            )
            bounce = jnp.where(
                (bhit.tri >= 0)[..., None], b_direct * b_albedo, 0.0
            )
            # cos/pdf = pi/(pi) -> estimator is just the mean of incoming
            indirect = bounce
        else:
            indirect = jnp.zeros((nf_total, 3))

        r_prof = sp.nd_eval(prof_f, r_hit)  # (NF, 3)
        irr = (direct + indirect) * r_prof * cavity[..., None]

        # 3-axis MIS pdf combine (rlSss.h:251-263)
        off_u = dot(disp, frame_f.u)
        off_v = dot(disp, frame_f.v)
        off_n = dot(disp, frame_f.n)
        rr_u = jnp.sqrt(jnp.maximum(off_v * off_v + off_n * off_n, 1e-20))
        rr_v = jnp.sqrt(jnp.maximum(off_u * off_u + off_n * off_n, 1e-20))
        rr_n = jnp.sqrt(jnp.maximum(off_u * off_u + off_v * off_v, 1e-20))
        pdf = (
            sp.nd_pdf(prof_f, rr_u) * jnp.abs(dot(frame_f.u, hn)) * 0.25
            + sp.nd_pdf(prof_f, rr_v) * jnp.abs(dot(frame_f.v, hn)) * 0.25
            + sp.nd_pdf(prof_f, rr_n) * jnp.abs(dot(frame_f.n, hn)) * 0.5
        )
        contrib = irr / jnp.maximum(pdf, 1e-9)[..., None]
        accum = accum + jnp.where(shade_ok[..., None], contrib, 0.0)

        # march the probe past this hit. Reference semantics (rlSss.h:
        # 298-314): a hit on a FOREIGN object `continue`s WITHOUT re-arming
        # the ray, so AiTraceProbe returns the same hit until the trial
        # budget dies — i.e. the probe TERMINATES at the first foreign hit.
        # Only same-object hits march the segment forward. (Measured on
        # 0009: skipping past foreign hits over-gathers the lower plane by
        # +0.02 — the probes' disk origins sit up to rmax above the surface,
        # in front of the upper plane.)
        foreign = seg_ok & ~same_mesh
        step = jnp.where(seg_ok, hit.t + 2 * RAY_EPS, remaining)
        origin = origin + d_probe * step[..., None]
        remaining = jnp.where(foreign, 0.0, remaining - step)
        exclude = jnp.where(seg_ok, hit.tri, -1)
        return origin, remaining, exclude, accum

    origin, remaining, exclude, accum = jax.lax.fori_loop(
        0, k_probe, probe_step, (origin, remaining, exclude, accum)
    )

    sss = accum.reshape(n0, s_total, 3).mean(axis=1)
    albedo = sss_color * sss_weight[..., None]
    # Arnold 4's raytraced standard-shader SSS returns measurably LESS than
    # its profile's unit diffusion mass. Calibrated against golden 0004's
    # logo disc (the only standard-Ksss surface in the testsuite): Burley
    # (mass 0.7117) overshoots the golden's SSS contribution by 1.26x, the
    # unit-mass cubic by 1.76x — both consistent with an effective exitance
    # factor of 0.567 on the cubic falloff (plausibly a half-space/dipole
    # boundary loss in Arnold's estimator). rlSkin lanes keep the reference
    # plugin's exact Burley estimator (mass 0.7117, rlSss.cpp:20-106).
    albedo = albedo * jnp.where(cubic_flag, STD_SSS_ENERGY, 1.0)[..., None]
    return jnp.where(is_sss[..., None], sss * albedo, 0.0)


def SSS_FIELDS(surf, matg, is_sss):
    """Bundle the (surf, matg) fields the SSS program needs (used by the
    traced secondary-ray path inside the tile program). The V3-form MatG's
    color fields convert back to (N, 3) at this AoS-stage boundary."""
    def aos(c):
        return c.aos() if hasattr(c, "aos") else c

    from ..models.dispatch import MAT_STANDARD

    return (surf.p, surf.ns, surf.mesh_id, is_sss, aos(matg.sss_dist),
            aos(matg.sss_color), matg.sss_weight, matg.cavity_fadeout,
            matg.mtype == MAT_STANDARD)


def sss_eval(sc, static, fields, key, n_sss, gi_diffuse, k_probe=K_PROBE):
    """Direct (traced-context) SSS evaluation on pre-bundled fields."""
    p, ns_, mesh, mask, dist, color, weight, cav, cubic = fields
    s = max(int(np.sqrt(n_sss)) ** 2, 1)
    return _j_sss(sc, static, p, ns_, mesh, mask, dist, color, weight, cav,
                  cubic, key, n_sss=s, gi_diffuse=int(gi_diffuse),
                  k_probe=k_probe)


def sss_stage(tr, sss_in, key, n_sss=None, k_probe=K_PROBE):
    """Compute the SSS radiance for camera hits on subsurface materials:
    rlSkin (rlSss.h:170-277) and the Arnold `standard` shader's Ksss lobe
    (sss_weight = Ksss, sss_dist = sss_radius; e.g. the test scene's logo
    disc, test_geo.ass SA_logo Ksss 0.2 sss_radius 1).

    Returns (N, 3); zero for non-SSS hits. `tr` is the TileRenderer (device
    scene, statics, options); `sss_in` a wavefront.SSSIn bundle.

    The probe batch is COMPACTED to the SSS-material lanes first (bucketed
    to power-of-two sizes to bound compile variants): scenes where SSS
    covers a few percent of the frame (the logo disc) pay a few percent of
    the probe cost, not all of it. Compaction needs a host sync on the lane
    count, so it is skipped when called under an outer trace (shard_map)."""
    opts = tr.scene.options
    n = int(n_sss or opts.gi_sss_samples ** 2)
    s = max(int(np.sqrt(n)) ** 2, 1)  # stratified grid needs a square count
    is_sss = (sss_in.sss_weight > 1e-5) & sss_in.valid
    n0 = sss_in.p.shape[0]

    def run(p, ns_, mesh, mask, dist, color, weight, cav, cubic, pix, aa,
            nlanes):
        tr.stats["nearest_rays"] += nlanes * s * k_probe
        return _j_sss(
            tr.sc, tr.static, p, ns_, mesh, mask, dist, color, weight, cav,
            cubic, key, pix, aa, sss_in.salt, n_sss=s,
            gi_diffuse=int(opts.gi_diffuse_depth), k_probe=k_probe,
            use_sobol=tr.conf.use_sobol, cam_budget=True,
        )

    full = (sss_in.p, sss_in.ns, sss_in.mesh_id, is_sss, sss_in.sss_dist,
            sss_in.sss_color, sss_in.sss_weight, sss_in.cavity_fadeout,
            sss_in.cubic, sss_in.pix, sss_in.aa)
    if isinstance(is_sss, jax.core.Tracer):
        return run(*full, n0)

    cnt = int(jnp.sum(is_sss))
    if cnt == 0:
        return jnp.zeros((n0, 3), jnp.float32)
    # floor at 4096 so tiles with slightly different SSS coverage share one
    # compiled bucket size
    bucket = 4096
    while bucket < cnt:
        bucket *= 2
    if bucket >= n0:
        return run(*full, n0)
    idx = jnp.argsort(~is_sss)[:bucket]  # SSS lanes first
    out = run(
        sss_in.p[idx], sss_in.ns[idx], sss_in.mesh_id[idx], is_sss[idx],
        sss_in.sss_dist[idx], sss_in.sss_color[idx], sss_in.sss_weight[idx],
        sss_in.cavity_fadeout[idx], sss_in.cubic[idx], sss_in.pix[idx],
        sss_in.aa[idx], bucket,
    )
    return jnp.zeros((n0, 3), jnp.float32).at[idx].set(out)
